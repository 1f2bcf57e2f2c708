"""ngram_lm: add-k conditional LM correctness, separation, edge cases."""

import math

import pytest
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.ngram_lm import (
    NgramLM, doc_perplexity, ngrams_col, perplexity_buckets,
    suggest_cutoffs, train_ngram_lm, words_col)


CLEAN = "the quick brown fox jumps over the lazy dog near the old barn"
GIBBERISH = "zxq vbnm qwerty plok mnbv xswz qazx edcr tgbv yhnm ujmk iolp"


@pytest.fixture(scope="module")
def ref(spark):
    # reference corpus: clean sentence repeated with small variations so
    # bigrams have real counts
    rows = [(i, CLEAN) for i in range(8)] + [
        (8, "the quick red fox jumps over the lazy cat"),
        (9, "a slow brown dog walks under the old barn"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngrams_col_positions(spark):
    df = spark.createDataFrame([("a b c d",), ("a",), ("",)], "text string")
    out = [r[0] for r in
           df.select(ngrams_col(F.col("text"), 2).alias("g")).collect()]
    assert out[0] == ["a b", "b c", "c d"]
    assert out[1] == []
    assert out[2] == []


def test_trained_lm_is_a_distribution(spark, ref):
    """For any prefix, sum over the FULL vocab of the smoothed
    conditional P(w|prefix) must be exactly 1 — the add-k invariant."""
    lm = train_ngram_lm(ref, n=2, k=1.0)
    V = lm.vocab_size
    vocab = [r[0] for r in
             ref.select(F.explode(words_col(F.col("text"))).alias("w"))
             .distinct().collect()]
    assert V == len(vocab)
    cnts = {r["ngram"]: r["cnt"] for r in lm.ngrams.collect()}
    pcnts = {r["prefix"]: r["pcnt"] for r in lm.prefixes.collect()}
    for prefix in ["the", "fox", "zzz-unseen"]:
        pc = pcnts.get(prefix, 0)
        total = sum((cnts.get(f"{prefix} {w}", 0) + 1.0) / (pc + V)
                    for w in vocab)
        assert total == pytest.approx(1.0, abs=1e-9)
    # prefix marginal is derived from the ngram table: sums must agree
    assert sum(pcnts.values()) == sum(cnts.values())


def test_perplexity_separates_clean_from_gibberish(spark, ref):
    lm = train_ngram_lm(ref, n=2)
    docs = spark.createDataFrame(
        [(1, CLEAN), (2, GIBBERISH)], "doc_id long, text string")
    ppl = {r["doc_id"]: r["ppl"] for r in doc_perplexity(docs, lm).collect()}
    assert ppl[1] < ppl[2] / 3  # in-domain text is FAR more probable
    # gibberish (all-unseen prefixes) lands exactly at ppl = V
    assert ppl[2] == pytest.approx(lm.vocab_size, rel=1e-9)


def test_perplexity_matches_hand_computation(spark, ref):
    lm = train_ngram_lm(ref, n=2, k=1.0)
    cnts = {r["ngram"]: r["cnt"] for r in lm.ngrams.collect()}
    pcnts = {r["prefix"]: r["pcnt"] for r in lm.prefixes.collect()}
    text = "the quick brown fox sings"
    words = text.split()
    lps = []
    for a, b in zip(words, words[1:]):
        c = cnts.get(f"{a} {b}", 0)
        pc = pcnts.get(a, 0)
        lps.append(math.log((c + 1.0) / (pc + lm.vocab_size)))
    expect = math.exp(-sum(lps) / len(lps))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = doc_perplexity(docs, lm).collect()[0]
    assert got["n_grams"] == len(lps)
    assert got["ppl"] == pytest.approx(expect, rel=1e-12)


def test_short_docs_are_unscored(spark, ref):
    lm = train_ngram_lm(ref, n=2)
    docs = spark.createDataFrame(
        [(1, "solitary"), (2, ""), (3, CLEAN)], "doc_id long, text string")
    out = perplexity_buckets(doc_perplexity(docs, lm), 10.0, 20.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["ppl"] is None
    assert rows[1]["ppl_bucket"] == "unscored"
    assert rows[2]["ppl_bucket"] == "unscored"
    assert rows[3]["ppl"] is not None


def test_buckets_and_cutoff_validation(spark, ref):
    lm = train_ngram_lm(ref, n=2)
    docs = spark.createDataFrame(
        [(i, CLEAN) for i in range(3)] + [(10, GIBBERISH)],
        "doc_id long, text string")
    scored = doc_perplexity(docs, lm)
    clean_ppl = scored.filter(F.col("doc_id") == 0).collect()[0]["ppl"]
    out = perplexity_buckets(scored, clean_ppl + 1, lm.vocab_size - 1)
    buckets = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}
    assert buckets[0] == "head" and buckets[10] == "tail"
    with pytest.raises(ValueError):
        perplexity_buckets(scored, 5.0, 5.0)
    with pytest.raises(ValueError):
        train_ngram_lm(ref, n=1)


def test_determinism_and_trigram_order(spark, ref):
    lm3 = train_ngram_lm(ref, n=3)
    docs = spark.createDataFrame([(1, CLEAN)], "doc_id long, text string")
    a = doc_perplexity(docs, lm3).collect()[0]
    b = doc_perplexity(docs, lm3).collect()[0]
    assert a["ppl"] == b["ppl"]
    # trigram positions: len(words) - 2 of them
    assert a["n_grams"] == len(CLEAN.split()) - 2


def test_suggest_cutoffs_orders(spark, ref):
    lm = train_ngram_lm(ref, n=2)
    docs = spark.createDataFrame(
        [(i, CLEAN) for i in range(4)]
        + [(10 + i, GIBBERISH) for i in range(4)]
        + [(20, "the quick brown dog walks near the old barn")],
        "doc_id long, text string")
    lo, hi = suggest_cutoffs(doc_perplexity(docs, lm))
    assert lo <= hi


def test_scoring_plan_broadcasts_lm(spark, ref):
    """The 100 TB posture: the corpus side must not shuffle for the LM
    join — both count tables broadcast."""
    lm = train_ngram_lm(ref, n=2)
    docs = spark.createDataFrame([(1, CLEAN)], "doc_id long, text string")
    plan = doc_perplexity(docs, lm)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
