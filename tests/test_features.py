"""Feature layer + discriminative model + weighted voting (SURVEY A5/A2)."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.features import (
    encode_features,
    feature_vocabulary,
    featurize,
    fit_logreg,
    predict_logreg,
)
from tecs_hardware_kbc_spark.operators.labeling import weighted_marginals


@pytest.fixture(scope="module")
def cands_ctx(spark):
    """Hand-built candidate frame with context arrays (post with_context)."""
    rows = [
        # (a_page, a_tag, a_is_tabular, a_span, _a_row, _a_col, label)
        (1, "td", True, "150", ["Storage", "Temperature", "150"], ["150"], 1),
        (1, "td", True, "175", ["Junction", "Temperature", "175"], ["175"], 0),
        (2, "td", True, "150", ["Storage", "Tstg", "150"], ["150"], 1),
        (3, "p", False, "125", ["Operating", "125"], [], 0),
    ]
    return spark.createDataFrame(
        rows,
        "a_page int, a_tag string, a_is_tabular boolean, a_span string, "
        "_a_row array<string>, _a_col array<string>, label int",
    ).withColumn("cand_id", F.monotonically_increasing_id())


def test_featurize_keys(spark, cands_ctx):
    fz = featurize(cands_ctx)
    feats = fz.filter(F.col("label") == 1).select("features").first()[0]
    assert "row:storage" in feats
    assert "page:1" in feats
    assert "span_shape:999" in feats
    assert len(feats) == len(set(feats))


def test_vocabulary_and_encoding(spark, cands_ctx):
    fz = featurize(cands_ctx)
    vocab = feature_vocabulary(fz)
    v = {r["key"]: r["idx"] for r in vocab.collect()}
    assert sorted(v.values()) == list(range(len(v)))  # dense indices
    enc = encode_features(fz, vocab, ["cand_id", "label"])
    row = enc.first()
    assert row["feature_idx"] == sorted(row["feature_idx"])


def test_logreg_end_to_end(spark, cands_ctx):
    fz = featurize(cands_ctx)
    vocab = feature_vocabulary(fz)
    enc = encode_features(fz, vocab, ["cand_id", "label"]).cache()
    model = fit_logreg(enc, "label", vocab_size=vocab.count(), epochs=200)
    pred = predict_logreg(enc, model)
    rows = pred.select("label", "prob_lr").collect()
    # separable toy data: the model must rank positives above negatives
    pos = [r["prob_lr"] for r in rows if r["label"] == 1]
    neg = [r["prob_lr"] for r in rows if r["label"] == 0]
    assert min(pos) > max(neg)


def test_weighted_marginals(spark):
    # LF0 is always right, LF1 always abstains, LF2 is anti-correlated
    rows = [
        ([1, -1, 0],), ([1, -1, 0],), ([1, -1, 0],),
        ([0, -1, 1],), ([0, -1, 1],),
    ]
    scored = spark.createDataFrame(rows, "lf_votes array<int>")
    out = weighted_marginals(scored).collect()
    probs = [r["prob"] for r in out]
    # majority label follows LF0 -> its weight positive, LF2 negative;
    # candidates voted TRUE by LF0 must score higher
    high = probs[:3]
    low = probs[3:]
    assert min(high) > max(low)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_encode_survives_zero_invocab_keys(spark, cands_ctx):
    """A candidate whose features are all out-of-vocab must survive encoding
    with an empty index array (scored at bias-only), not vanish."""
    fz = featurize(cands_ctx)
    vocab = feature_vocabulary(fz.filter(F.col("label") == 1))
    enc = encode_features(fz, vocab, ["cand_id", "label"])
    assert enc.count() == cands_ctx.count()
    oov = enc.filter(F.size("feature_idx") == 0)
    model = {"weights": {0: 2.0}, "bias": -1.0}
    scored = predict_logreg(enc, model)
    # bias-only rows get sigmoid(bias) exactly
    import math
    for r in scored.filter(F.size("feature_idx") == 0).collect():
        assert abs(r["prob_lr"] - 1 / (1 + math.exp(1.0))) < 1e-12
    assert oov.count() >= 0  # presence checked above via total count


def test_multitask_logreg_shares_strength(spark, cands_ctx):
    """Shared-trunk multi-task LR (transistors.py:476-553 stand-in): both
    heads separate their task, and the data-starved task's accuracy is >=
    its single-task accuracy (it borrows the trunk learned by the rich
    task)."""
    from tecs_hardware_kbc_spark.operators.features import (
        fit_logreg_multitask)

    fz = featurize(cands_ctx)
    vocab = feature_vocabulary(fz)
    vsize = vocab.count()
    enc_rich = encode_features(fz, vocab, ["cand_id", "label"]).cache()
    # the starved task sees ONE example per class (same concept)
    enc_poor = enc_rich.orderBy("cand_id").limit(2).cache()

    def accuracy(pred, col):
        rows = pred.select("label", col).collect()
        return sum(1 for r in rows
                   if (r[col] > 0.5) == (r["label"] == 1)) / len(rows)

    multi = fit_logreg_multitask(
        {"rich": enc_rich, "poor": enc_poor}, "label", vsize, epochs=200)
    single_poor = fit_logreg(enc_poor, "label", vsize, epochs=200)

    acc_multi = accuracy(
        predict_logreg(enc_rich, multi["heads"]["poor"]), "prob_lr")
    acc_single = accuracy(
        predict_logreg(enc_rich, single_poor), "prob_lr")
    assert acc_multi >= acc_single
    # the rich head fully separates its own training data
    acc_rich = accuracy(
        predict_logreg(enc_rich, multi["heads"]["rich"]), "prob_lr")
    assert acc_rich == 1.0


def test_distributed_logreg_matches_driver_side(spark, cands_ctx):
    """spark.ml LBFGS path (the 100x-scale trainer) separates the toy data
    like the driver-side GD trainer and plugs into the same
    predict_logreg inference."""
    from tecs_hardware_kbc_spark.operators.features import (
        fit_logreg_distributed)

    fz = featurize(cands_ctx)
    vocab = feature_vocabulary(fz)
    enc = encode_features(fz, vocab, ["cand_id", "label"]).cache()
    model = fit_logreg_distributed(enc, "label", vocab_size=vocab.count())
    pred = predict_logreg(enc, model)
    rows = pred.select("label", "prob_lr").collect()
    pos = [r["prob_lr"] for r in rows if r["label"] == 1]
    neg = [r["prob_lr"] for r in rows if r["label"] == 0]
    assert min(pos) > max(neg)
