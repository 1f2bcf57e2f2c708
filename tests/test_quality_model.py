"""Model-based quality filter: training recipe + frozen-artifact gate."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.quality_model import (
    hashed_features,
    score_quality,
    train_quality_model,
    weights_array,
)
from tecs_hardware_kbc_spark.operators.quality_weights import (
    FROZEN_QUALITY_MODEL,
)
from tecs_hardware_kbc_spark.operators.sampling import hash_u

POS = " editorial archive longform verified citation"
NEG = " clickbait spam adfarm popup tracker"


def _planted(spark, sf_dir="/root/testdata/sf0.001"):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = F.col("source").isin("src0", "src2")
    return d.select(
        "doc_id", pos.cast("int").alias("label"),
        F.when(pos, F.concat(F.col("text"), F.lit(POS)))
        .otherwise(F.concat(F.col("text"), F.lit(NEG))).alias("text"))


def test_hashed_features_deterministic_and_bounded(spark):
    d = spark.createDataFrame([(0, "alpha beta alpha")],
                              "doc_id long, text string")
    idx = hashed_features(d).collect()[0]["feature_idx"]
    assert len(idx) == 3 and idx[0] == idx[2]  # repetition kept
    assert all(0 <= i < 1024 for i in idx)
    again = hashed_features(d).collect()[0]["feature_idx"]
    assert again == idx


def test_train_and_heldout_accuracy(spark):
    planted = _planted(spark)
    dev = planted.filter(hash_u(F.col("doc_id"), "qmdev") < 0.5)
    test = planted.filter(hash_u(F.col("doc_id"), "qmdev") >= 0.5)
    model = train_quality_model(dev)
    scored = score_quality(test, model).join(
        test.select("doc_id", "label"), "doc_id")
    acc = scored.select(F.avg(
        ((F.col("qm_score") > 0.5).cast("int") == F.col("label"))
        .cast("double"))).collect()[0][0]
    assert acc >= 0.9


def test_frozen_model_separates_planted_classes(spark):
    scored = score_quality(_planted(spark), FROZEN_QUALITY_MODEL).join(
        _planted(spark).select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    pos = [r["qm_score"] for r in rows if r["label"] == 1]
    neg = [r["qm_score"] for r in rows if r["label"] == 0]
    assert pos and neg
    assert min(pos) > 0.5 > max(neg)


def test_frozen_artifact_shape():
    w = weights_array(FROZEN_QUALITY_MODEL)
    assert len(w) == 1024
    assert sum(1 for v in w if v != 0.0) >= 10  # learned something
    assert any(v > 0 for v in w) and any(v < 0 for v in w)
