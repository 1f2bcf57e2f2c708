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

The classifier is a declared stand-in for the reference's CNN: the
synthetic connectors are near-square (|log aspect| ~ 0) and negatives are
1.6-2.8x elongated, so a 2-feature logistic regression on
(|log(w/h)|, min_dim) learns the boundary. COST CONTRACT: the fit
collects 2 floats + a label per dev-slice figure to the driver (~16 B per
figure; 10^7 figures ~ 160 MB — beyond that, use spark.ml LBFGS as in
features.fit_logreg_distributed). Inference is a broadcast-weights column
expression — fully distributed.
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


def _fig_features() -> tuple[Column, Column]:
    """(|log(w/h)|, min_dim / 256) — the decode-derived signal the LR
    stand-in separates on."""
    aspect = F.abs(F.log(F.col("width") / F.col("height")))
    return aspect, F.least("width", "height") / F.lit(256.0)


def fit_connector_lr(mentions_dev: DataFrame, gold: DataFrame,
                     epochs: int = 200, lr: float = 1.0,
                     seed: int = 7) -> dict:
    """Dense 2-feature logistic regression on the dev slice (see the COST
    CONTRACT in the module docstring). Deterministic full-batch GD."""
    a, m = _fig_features()
    rows = (
        mentions_dev
        .join(gold.withColumn("_y", F.lit(1.0)), ["url", "src"], "left")
        .select(a.alias("x1"), m.alias("x2"),
                F.coalesce("_y", F.lit(0.0)).alias("y"))
        .collect()
    )
    if not rows:
        return {"w": [0.0, 0.0], "b": 0.0}
    X = np.array([[r["x1"], r["x2"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    w = np.zeros(2)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        w -= lr * (X.T @ err) / len(y)
        b -= lr * float(err.mean())
    return {"w": [float(w[0]), float(w[1])], "b": float(b)}


def predict_connector(mentions: DataFrame, model: dict,
                      threshold: float = 0.5) -> DataFrame:
    """Broadcast-weights inference as a column expression; keeps rows with
    p > threshold."""
    a, m = _fig_features()
    z = (F.lit(model["w"][0]) * a + F.lit(model["w"][1]) * m
         + F.lit(model["b"]))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return mentions.withColumn("prob", prob).filter(F.col("prob") > threshold)


def score_connectors(pages: DataFrame) -> dict:
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
    model = fit_connector_lr(mentions.filter(dev), gold)
    pred = predict_connector(mentions.filter(~dev), model)

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
