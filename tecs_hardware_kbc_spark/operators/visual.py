"""Visual-coordinate alignment (SURVEY W3 / J2's visual leg).

The reference's throttlers and LFs read PDF bounding boxes through
fonduer's visual utilities: ``is_horz_aligned`` / ``is_vert_aligned``
(center-of-either-box within the other's range on the cross axis) and
``get_page_vert_percentile`` (box top / page height) —
``transistor_throttlers.py:56-65``, ``transistor_lfs.py:231-241``. An
HTML-only corpus has no such coordinates, so the engine's default is the
structural proxy (same row / same column, candidates.aligned()).

This module adds the real thing for corpora that DO carry coordinates
(e.g. HTML paired with PDF renders): a sentence-granularity sidecar table

    (url, position, v_top, v_left, v_bottom, v_right)   -- points, per page

left-joined onto candidate pairs per side. Every predicate falls back to
its structural proxy when either side's bbox is null, so one pipeline
serves mixed corpora — coordinate-bearing docs get visual semantics,
HTML-only docs keep the proxy. The sidecar join is an equi-join on
(url, position): broadcast-able when the visual slice is small, or a
co-partitioned merge join on url at scale (same key as every other
context table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.candidates import aligned

VISUAL_COLS = ["v_top", "v_left", "v_bottom", "v_right"]

# US-Letter points; fonduer reads the true page height from the PDF —
# callers with other page geometry pass their own.
DEFAULT_PAGE_HEIGHT = 792.0


def attach_visual(pairs: DataFrame, visual: DataFrame) -> DataFrame:
    """Left-join the bbox sidecar onto BOTH sides of a candidate pair
    table: adds ``p_v_*`` and ``a_v_*`` (null where no coords exist)."""
    for prefix in ("p_", "a_"):
        side = visual.select(
            F.col("url"),
            F.col("position").alias(f"{prefix}position"),
            *[F.col(c).alias(f"{prefix}{c}") for c in VISUAL_COLS],
        )
        pairs = pairs.join(side, ["url", f"{prefix}position"], "left")
    return pairs


def has_visual() -> Column:
    """Both sides carry a bbox (fonduer: ``sentence.is_visual()``)."""
    return (F.col("p_v_top").isNotNull() & F.col("a_v_top").isNotNull())


def horz_aligned_viz() -> Column:
    """Same page and the vertical CENTER of either box lies within the
    other's vertical range — fonduer's ``bbox_horz_aligned``."""
    pc = (F.col("p_v_top") + F.col("p_v_bottom")) / 2.0
    ac = (F.col("a_v_top") + F.col("a_v_bottom")) / 2.0
    return (
        (F.col("p_page") == F.col("a_page"))
        & (((pc >= F.col("a_v_top")) & (pc <= F.col("a_v_bottom")))
           | ((ac >= F.col("p_v_top")) & (ac <= F.col("p_v_bottom"))))
    )


def vert_aligned_viz() -> Column:
    """Same page and the horizontal CENTER of either box lies within the
    other's horizontal range — fonduer's ``bbox_vert_aligned``."""
    pc = (F.col("p_v_left") + F.col("p_v_right")) / 2.0
    ac = (F.col("a_v_left") + F.col("a_v_right")) / 2.0
    return (
        (F.col("p_page") == F.col("a_page"))
        & (((pc >= F.col("a_v_left")) & (pc <= F.col("a_v_right")))
           | ((ac >= F.col("p_v_left")) & (ac <= F.col("p_v_right"))))
    )


def aligned_hybrid() -> Column:
    """is_horz_aligned OR is_vert_aligned when both bboxes exist, else the
    structural proxy (same row / same column) — the drop-in replacement
    for ``candidates.aligned()`` on a coordinate-bearing corpus."""
    return F.when(has_visual(), horz_aligned_viz() | vert_aligned_viz()) \
        .otherwise(aligned())


def page_vert_percentile(prefix: str,
                         page_height: float = DEFAULT_PAGE_HEIGHT) -> Column:
    """fonduer's ``get_page_vert_percentile``: box top / page height in
    [0, 1]; null when the side has no bbox."""
    return F.col(f"{prefix}v_top") / F.lit(page_height)


def both_in_top_third_viz(page_height: float = DEFAULT_PAGE_HEIGHT,
                          structural: Column | None = None) -> Column:
    """LF_both_in_top_third (transistor_lfs.py:231-241): both spans on
    page 1 with vertical percentile < 1/3 — true bbox form when coords
    exist, else the caller's structural proxy."""
    viz = (
        (F.col("p_page") == 1) & (F.col("a_page") == 1)
        & (page_vert_percentile("p_", page_height) < 1.0 / 3.0)
        & (page_vert_percentile("a_", page_height) < 1.0 / 3.0)
    )
    if structural is None:
        return viz
    return F.when(has_visual(), viz).otherwise(structural)


def synthetic_visual_coords(sentences: DataFrame,
                            line_height: float = 18.0,
                            col_width: float = 120.0,
                            doc_fraction_mod: int = 2,
                            wrap_k: int = 2) -> DataFrame:
    """Deterministic bbox layout for a slice of the corpus (test/bench
    harness for the visual path; a real corpus gets coords from its PDF
    renderer). Docs whose url-hash % ``doc_fraction_mod`` == 0 get
    coordinates — the rest stay HTML-only, exercising the fallback.

    Layout: tabular cells sit at y = table row, x = table column — cells
    in one row share a y-band (visually horz-aligned) and one column
    shares an x-band (vert-aligned), mirroring a rendered table; prose
    sentences stack by reading position.

    WRAPPED slice: half of the covered docs (url-hash % 2*mod == 0)
    render NARROW tables (width <= 4 columns) in a wrapped two-column
    float — each structural row occupies two lines, columns >= ``wrap_k``
    on the second at x = (col % k) — so a structural row lands on
    different y-bands and the visual predicates genuinely DISAGREE with
    the structural proxy (the corpus's two-record |part|Tstg|part|Tstg|
    quick-reference rows are the planted case: the cross-record pairs are
    structurally aligned but visually rejected, while every same-column
    and same-record pair keeps its band). The per-table width is one
    window over (url, table_id) — harness-only cost."""
    from pyspark.sql.window import Window

    covered = F.pmod(F.xxhash64("url"), F.lit(doc_fraction_mod)) == 0
    wrapped_doc = (
        F.pmod(F.xxhash64("url"), F.lit(2 * doc_fraction_mod)) == 0)
    width = F.max("col").over(
        Window.partitionBy("url", "table_id")) + 1
    wrap = (wrapped_doc & F.col("table_id").isNotNull()
            & (width <= 4))
    line = F.when(
        wrap, F.col("row") * 2 + (F.col("col") >= wrap_k).cast("int"))
    y0 = F.coalesce(line, F.col("row"),
                    F.col("position") % 40) * line_height
    xcol = F.when(wrap, F.pmod(F.col("col"), F.lit(wrap_k))) \
            .otherwise(F.coalesce(F.col("col"), F.lit(0)))
    x0 = xcol * col_width
    return (
        sentences.filter(covered)
        .select(
            "url", "position",
            y0.alias("v_top"),
            x0.alias("v_left"),
            (y0 + line_height).alias("v_bottom"),
            (x0 + col_width).alias("v_right"),
        )
    )
