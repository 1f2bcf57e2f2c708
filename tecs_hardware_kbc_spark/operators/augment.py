"""Image augmentation transforms as pure column expressions.

The reference's connectors task trains its CNN under an augmentation
policy (hack/circular_connectors/augment_policy.py + transforms/ — flips,
rotations, crops, cutout, brightness/contrast, normalize, compose). Those
transforms are per-image pixel maps, which in Spark are best expressed as
JVM column expressions over a flat grayscale pixel array — no UDF, no
codec, whole-stage codegen, and every transform is replayable in ANSI SQL
(the ``media_augment`` driver entry hash-checks a composed policy against
DuckDB).

Image model: ``(width, height, pixels array<double>)``, row-major
grayscale in [0, 1] — the shape the tiered decoder's feature path
produces. Geometric transforms are index permutations (output pixel i
reads input ``src(i)``); photometric transforms are arithmetic maps.
At scale each transform is a narrow map over one column: no shuffle, no
Python, and Catalyst fuses a composed policy into one projection.

Determinism: the reference's policy samples magnitudes per image; here
parameters are explicit arguments (callers derive per-image parameters
from md5 bits when they want variety, as the corpus harness does) — same
math, reproducible plans.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _idx(w: Column, h: Column):
    """0-based output pixel indices [0, w*h)."""
    return F.sequence(F.lit(0), w * h - 1)


def _permute(pixels: Column, w: Column, h: Column, src) -> Column:
    """Output[i] = pixels[src(row, col)] — the geometric-transform kernel.
    ``src(r, c)`` returns the 0-based SOURCE flat index for output (r, c).
    """
    return F.transform(
        _idx(w, h),
        lambda i: F.element_at(
            pixels, (src(F.floor(i / w).cast("int"), i % w) + 1).cast("int")
        ),
    )


def flip_horizontal(pixels: Column, w: Column, h: Column) -> Column:
    """Mirror along the vertical axis (transforms/horizontal_filp.py)."""
    return _permute(pixels, w, h, lambda r, c: r * w + (w - 1 - c))


def flip_vertical(pixels: Column, w: Column, h: Column) -> Column:
    """Mirror along the horizontal axis (transforms/vertical_flip.py)."""
    return _permute(pixels, w, h, lambda r, c: (h - 1 - r) * w + c)


def rotate90(pixels: Column, w: Column, h: Column) -> Column:
    """90° clockwise: the output is h wide x w tall; output (r, c) reads
    input (h-1-c, r) (transforms/rotate.py's right-angle case). Callers
    must swap their width/height columns for downstream transforms."""
    # output row r = i // h, output col c = i % h (output width is h)
    return F.transform(
        F.sequence(F.lit(0), w * h - 1),
        lambda i: F.element_at(
            pixels,
            ((h - 1 - (i % h)) * w + F.floor(i / h).cast("int") + 1)
            .cast("int")),
    )


def crop(pixels: Column, w: Column, h: Column,
         x0: Column, y0: Column, cw: Column, ch: Column) -> Column:
    """Axis-aligned crop to a cw x ch window at (x0, y0)
    (transforms/random_crop.py with explicit offsets)."""
    return F.transform(
        F.sequence(F.lit(0), cw * ch - 1),
        lambda i: F.element_at(
            pixels,
            ((y0 + F.floor(i / cw).cast("int")) * w + x0 + i % cw + 1)
            .cast("int")),
    )


def cutout(pixels: Column, w: Column, h: Column,
           x0: Column, y0: Column, size: Column,
           fill: float = 0.0) -> Column:
    """Zero (or ``fill``) a size x size square at (x0, y0)
    (transforms/cutout.py)."""
    return F.transform(
        _idx(w, h),
        lambda i: F.when(
            (F.floor(i / w) >= y0) & (F.floor(i / w) < y0 + size)
            & (i % w >= x0) & (i % w < x0 + size),
            F.lit(float(fill)),
        ).otherwise(F.element_at(pixels, (i + 1).cast("int"))),
    )


def brightness(pixels: Column, factor: Column) -> Column:
    """Scale toward black: p * factor, clipped to [0, 1]
    (transforms/brightness.py)."""
    return F.transform(
        pixels, lambda p: F.least(F.greatest(p * factor, F.lit(0.0)),
                                  F.lit(1.0)))


def contrast(pixels: Column, factor: Column) -> Column:
    """Blend with the image mean: mean + factor * (p - mean), clipped
    (transforms/contrast.py)."""
    mean = F.aggregate(pixels, F.lit(0.0), lambda a, p: a + p) \
        / F.size(pixels)
    return F.transform(
        pixels,
        lambda p: F.least(
            F.greatest(mean + factor * (p - mean), F.lit(0.0)), F.lit(1.0)))


def invert(pixels: Column) -> Column:
    """1 - p (transforms/invert.py)."""
    return F.transform(pixels, lambda p: F.lit(1.0) - p)


def normalize(pixels: Column, mean: float, std: float) -> Column:
    """(p - mean) / std (transforms/normalize.py) — NOT clipped, as the
    reference feeds the result straight to the model."""
    return F.transform(pixels, lambda p: (p - F.lit(mean)) / F.lit(std))
