"""Figure mentions + thumbnail classification (the connectors task).

The reference's third pipeline (circular_connectors.py) is figure-driven:
``MentionFigures`` lifts every ``Figure`` context node (an ``<img>``) into
a mention, ``HasFigures`` keeps only figures whose decoded image has
``min(width, height) > 50`` (:85-100), candidates are unary with no
throttler (:112-121), ground truth is a ``doc::filename`` membership set
(:135-151), and an image classifier scores each thumbnail. Spark form:

* figure scan       — ``extract.parse_figures`` (Arrow-batched ``<img>``
                      walk; column-prunes to (url, html)),
* media join        — payload bytes joined on (url, src); the synthetic
                      corpus derives each payload deterministically from
                      md5(url:fig:src) via ``synthesize_media`` (a REAL
                      PNG header carrying the planted dimensions, so the
                      pure-Python header decoder does real work),
* HasFigures        — ``figure_mentions``: decode (multimodal tiers) +
                      the ``min(w, h) > 50`` filter,
* ground truth      — ``connector_gold``: the planted md5 class bit as a
                      (doc, src) membership table (LF_gt_label analog),
* classify & score  — ``score_connectors``: aspect/size features, dense
                      LR trained on the dev doc slice, P/R on test
                      (dev-tune/test-report discipline, as in scoring.py).

The classifier is a declared stand-in for the reference's ResNet
(circular_connectors/modules/, task.py:1-62): fixed 3x3 conv kernels
(Sobel-x/y, center-surround — convolve.py) pooled into
translation-invariant statistics over the thumbnail pixels, feeding a
dense logistic-regression head. The conv layer is fixed rather than
learned, and the thumbnail pixels come from the deterministic harness
raster (``synthesize_thumbnail`` — the container has no image codec);
the feature extraction, pooling, fit/predict split and inference plan
are the real machinery. COST CONTRACT: the fit collects 4 floats + a
label per dev-slice figure to the driver (~40 B per figure; 10^6 figures
~ 40 MB — beyond that, use spark.ml LBFGS as in
features.fit_logreg_distributed). The conv maps themselves never leave
the executors; inference is a broadcast-weights column expression —
fully distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from tecs_hardware_kbc_spark.operators.scoring import is_dev_doc

MIN_THUMB_DIM = 50  # HasFigures threshold (circular_connectors.py:99)


# --------------------------------------------------------------------------
# Deterministic planted media (corpus harness; a real corpus joins actual
# image bytes by (url, src))
# --------------------------------------------------------------------------

def _fig_hash(url: Column, src: Column) -> Column:
    return F.md5(F.concat(url, F.lit(":fig:"), src))


def _byte(h: Column, j: int) -> Column:
    return F.conv(F.substring(h, 2 * j + 1, 2), 16, 10).cast("int")


def planted_dims(url: Column, src: Column) -> tuple[Column, Column, Column]:
    """(width, height, is_connector) as pure column expressions of
    md5(url:fig:src) — byte0 LSB is the class bit; connectors are
    near-square (±10%), negatives 1.6-2.8x elongated either way, and
    byte4 % 5 == 0 shrinks the figure below the HasFigures threshold
    (class-independent, so the filter removes both kinds)."""
    h = _fig_hash(url, src)
    is_conn = (_byte(h, 0) % 2) == 1
    s = 64 + _byte(h, 1) % 128
    jitter = F.floor(s / 10).cast("int")
    near = s + (_byte(h, 2) % (2 * jitter + 1)) - jitter
    ratio_x100 = 160 + (_byte(h, 2) % 121)           # 1.60 .. 2.80
    # floor, not cast: DuckDB's ::int rounds half-up while Spark's cast
    # truncates — floor() agrees in both engines for the oracle replay
    elong = F.floor(s * ratio_x100 / 100.0).cast("int")
    flip = (_byte(h, 3) % 2) == 1
    w = F.when(is_conn, F.lit(s)).otherwise(F.when(flip, elong).otherwise(s))
    hh = F.when(is_conn, near).otherwise(F.when(flip, F.lit(s)).otherwise(elong))
    small = (_byte(h, 4) % 5) == 0
    w = F.when(small, 8 + _byte(h, 1) % 40).otherwise(w).cast("int")
    hh = F.when(small, 8 + _byte(h, 2) % 40).otherwise(hh).cast("int")
    return w, hh, is_conn


def synthesize_media(figures: DataFrame) -> DataFrame:
    """(url, src, payload): a REAL PNG container header (signature + IHDR)
    carrying the planted dimensions — the pure-Python header decoder in
    multimodal.py reads them back without any codec library."""
    w, h, _ = planted_dims(F.col("url"), F.col("src"))
    dims = figures.select("url", "src", w.alias("_w"), h.alias("_h")) \
                  .dropDuplicates(["url", "src"])

    @F.pandas_udf(T.BinaryType())
    def _png(ws: pd.Series, hs: pd.Series) -> pd.Series:
        sig = b"\x89PNG\r\n\x1a\n"
        return pd.Series([
            sig + (13).to_bytes(4, "big") + b"IHDR"
            + int(wv).to_bytes(4, "big") + int(hv).to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00"
            for wv, hv in zip(ws, hs)
        ])

    return dims.select("url", "src",
                       _png(F.col("_w"), F.col("_h")).alias("payload"))


THUMB = 16  # thumbnail raster side for the conv feature path


def synthesize_thumbnail(url: Column, src: Column,
                         size: int = THUMB,
                         salt: str = "") -> Column:
    """Deterministic ``size x size`` grayscale pixel raster for a figure —
    the corpus-harness stand-in for DECODED thumbnail content (the
    container ships no codec; a real deployment's decode tier would fill
    this column from the payload bytes).

    Content is class-dependent so the conv classifier learns from pixel
    STRUCTURE, not planted aspect geometry: connectors render a jittered
    annulus (the circular-connector silhouette), negatives render
    axis-aligned stripes. All integer index math — the ``media_conv``
    oracle replays it exactly in SQL.

    ``salt`` redraws every APPEARANCE parameter (center, radius, stripe
    orientation/period/phase) from an independent md5 stream while the
    class bit stays tied to the unsalted figure hash — the knob
    ``test_figures`` uses to prove the classifier gate separates the
    classes for a DIFFERENT parameter draw, not just the default one."""
    h = _fig_hash(url, src)
    is_conn = (_byte(h, 0) % 2) == 1           # the SAME class bit
    hp = F.md5(F.concat(h, F.lit(salt))) if salt else h
    cx = 5 + _byte(hp, 5) % 6
    cy = 5 + _byte(hp, 6) % 6
    rad = 3 + _byte(hp, 7) % 4
    horiz = (_byte(hp, 8) % 2) == 0
    period = 3 + _byte(hp, 9) % 3
    phase = _byte(hp, 10) % period

    def val(i):
        r = F.floor(i / size).cast("int")
        c = (i % size).cast("int")
        d2 = (r - cy) * (r - cy) + (c - cx) * (c - cx)
        on_ring = F.abs(d2 - rad * rad) <= rad
        stripe_pos = F.when(horiz, r).otherwise(c) + phase
        on_stripe = F.pmod(stripe_pos, period) == 0
        lit = F.when(is_conn, on_ring).otherwise(on_stripe)
        return F.when(lit, F.lit(0.9)).otherwise(F.lit(0.1))

    return F.transform(F.sequence(F.lit(0), F.lit(size * size - 1)), val)


def connector_gold(figures: DataFrame) -> DataFrame:
    """(url, src) membership table of the planted positives — the analog
    of the reference's ground_truth.txt ``doc::filename`` set consumed by
    LF_gt_label (circular_connectors.py:135-151)."""
    _, _, is_conn = planted_dims(F.col("url"), F.col("src"))
    return figures.filter(is_conn).select("url", "src").distinct()


# --------------------------------------------------------------------------
# The pipeline operators
# --------------------------------------------------------------------------

def figure_mentions(figures: DataFrame, media: DataFrame) -> DataFrame:
    """MentionFigures + HasFigures: join payload bytes, decode dimensions
    (PIL tier -> header tier -> stub), keep ``min(w, h) > 50``. Output
    adds width/height/features columns to the figure rows."""
    from tecs_hardware_kbc_spark.operators.multimodal import decode_media

    out_schema = T.StructType(
        figures.schema.fields
        + [T.StructField("width", T.IntegerType(), True),
           T.StructField("height", T.IntegerType(), True)]
    )
    fig_cols = [f.name for f in figures.schema.fields]
    joined = figures.join(media, ["url", "src"])

    def _decode(batches):
        for pdf in batches:
            dec = [decode_media(p, "image") for p in pdf["payload"]]
            out = pdf[fig_cols].copy()
            out["width"] = [d.get("width") for d in dec]
            out["height"] = [d.get("height") for d in dec]
            yield out

    decoded = joined.mapInPandas(_decode, schema=out_schema)
    return decoded.filter(
        F.least("width", "height") > MIN_THUMB_DIM)


def _fig_features(raster_salt: str = "") -> list[Column]:
    """The classifier feature vector: pooled |Sobel-x|, |Sobel-y| and
    |center-surround| responses over the thumbnail pixels (convolve.py's
    fixed 3x3 bank — translation-invariant conv statistics standing in
    for the reference ResNet's learned features), plus the gradient
    anisotropy ||sx|-|sy|| (rings are isotropic, stripes are not — a
    nonlinearity the LR head could not synthesize from sx/sy alone)."""
    from tecs_hardware_kbc_spark.operators.convolve import conv_features
    side = F.lit(THUMB)
    px = synthesize_thumbnail(F.col("url"), F.col("src"), salt=raster_salt)
    sx, sy, cs = conv_features(px, side, side)
    return [sx, sy, cs, F.abs(sx - sy)]


N_FEATURES = 4


def fit_connector_lr(mentions_dev: DataFrame, gold: DataFrame,
                     epochs: int = 200, lr: float = 1.0,
                     seed: int = 7, raster_salt: str = "") -> dict:
    """Dense logistic regression over the conv features, fit on the dev
    slice (see the COST CONTRACT in the module docstring — the conv maps
    themselves stay distributed; only the pooled feature vector is
    collected). Deterministic full-batch GD."""
    feats = _fig_features(raster_salt)
    rows = (
        mentions_dev
        .join(gold.withColumn("_y", F.lit(1.0)), ["url", "src"], "left")
        .select(*(f.alias(f"x{i}") for i, f in enumerate(feats)),
                F.coalesce("_y", F.lit(0.0)).alias("y"))
        .collect()
    )
    if not rows:
        return {"w": [0.0] * N_FEATURES, "b": 0.0}
    X = np.array([[r[f"x{i}"] for i in range(N_FEATURES)] for r in rows])
    y = np.array([r["y"] for r in rows])
    w = np.zeros(N_FEATURES)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= lr * (X.T @ err) / len(y)
        b -= lr * float(err.mean())
    return {"w": [float(v) for v in w], "b": float(b)}


def predict_connector(mentions: DataFrame, model: dict,
                      threshold: float = 0.5,
                      raster_salt: str = "") -> DataFrame:
    """Broadcast-weights inference as a column expression; keeps rows with
    p > threshold."""
    feats = _fig_features(raster_salt)
    z = F.lit(model["b"])
    for wi, f in zip(model["w"], feats):
        z = z + F.lit(wi) * f
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return mentions.withColumn("prob", prob).filter(F.col("prob") > threshold)


def score_connectors(pages: DataFrame, raster_salt: str = "") -> dict:
    """End-to-end connectors run over a pages corpus: figure scan ->
    planted media -> HasFigures -> LR (fit on dev docs) -> P/R on the
    disjoint test doc slice."""
    from tecs_hardware_kbc_spark.operators.extract import parse_figures

    # re-crawled urls repeat their figure rows; one mention per
    # (url, fig_id, src), as ingest() dedups pages
    figures = parse_figures(pages).dropDuplicates(["url", "fig_id", "src"])
    media = synthesize_media(figures)
    mentions = figure_mentions(figures, media).localCheckpoint()
    gold = connector_gold(figures)

    dev = is_dev_doc(F.col("url"))
    model = fit_connector_lr(mentions.filter(dev), gold,
                             raster_salt=raster_salt)
    pred = predict_connector(mentions.filter(~dev), model,
                             raster_salt=raster_salt)

    gold_test = gold.filter(~dev).join(
        mentions.filter(~dev).select("url", "src"), ["url", "src"],
        "left_semi")
    tp = pred.join(gold_test, ["url", "src"], "left_semi").count()
    fp = pred.count() - tp
    fn = gold_test.count() - tp
    precision = tp / (tp + fp) if tp + fp else float("nan")
    recall = tp / (tp + fn) if tp + fn else float("nan")
    return {"model": model, "tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall}
