"""BPE trainer semantics: hand-computed merge order on the classic
corpus, greedy leftmost application, char fallback, early stop."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.bpe import (
    apply_bpe,
    train_bpe,
    word_frequencies,
)

# Sennrich et al.'s example vocabulary: low*5 lower*2 newest*6 widest*3
CLASSIC = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                   + ["widest"] * 3)


@pytest.fixture(scope="module")
def classic(spark):
    return spark.createDataFrame([(1, CLASSIC)],
                                 "doc_id long, text string")


def test_word_frequencies(spark, classic):
    wf = {r["word"]: r["freq"]
          for r in word_frequencies(classic).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_hand_computed_merge_order(spark, classic):
    """Round 1 ties (e,s) and (s,t) at 9 — the (left, right) tiebreak
    must pick (e,s); rounds 3-4 tie (l,o) and (o,w) at 7 -> (l,o)."""
    model = train_bpe(classic, n_merges=4)
    assert model.merges == [("e", "s"), ("es", "t"), ("l", "o"),
                            ("lo", "w")]
    seg = {r["word"]: r["tokens"] for r in model.vocab.collect()}
    assert seg["low"] == ["low"]
    assert seg["lower"] == ["low", "e", "r"]
    assert seg["newest"] == ["n", "e", "w", "est"]
    assert seg["widest"] == ["w", "i", "d", "est"]


def test_apply_bpe_and_char_fallback(spark, classic):
    model = train_bpe(classic, n_merges=4)
    docs = spark.createDataFrame(
        [(7, "newest lower low"), (8, "LOWEST")],  # LOWEST: unseen word
        "doc_id long, text string")
    out = {r["doc_id"]: r["tokens"]
           for r in apply_bpe(docs, model).collect()}
    assert out[7] == ["n", "e", "w", "est", "low", "e", "r", "low"]
    # unseen word (normalized to 'lowest') falls back to characters
    assert out[8] == list("lowest")


def test_train_bpe_early_stop_and_min_freq(spark):
    """No pair repeats -> zero merges at the default min_pair_freq."""
    docs = spark.createDataFrame([(1, "abc def")],
                                 "doc_id long, text string")
    assert train_bpe(docs, n_merges=5).merges == []
    # min_pair_freq=1 merges even singleton pairs, deterministically:
    # all pairs tie at 1 -> lexicographic (a,b) wins first
    m = train_bpe(docs, n_merges=1, min_pair_freq=1)
    assert m.merges == [("a", "b")]


def test_train_bpe_greedy_leftmost_within_word(spark):
    """'aaa'*k: merging (a,a) must produce [aa, a], never [a, aa]."""
    docs = spark.createDataFrame([(1, "aaa aaa")],
                                 "doc_id long, text string")
    model = train_bpe(docs, n_merges=1, min_pair_freq=1)
    assert model.merges == [("a", "a")]
    seg = {r["word"]: r["tokens"] for r in model.vocab.collect()}
    assert seg["aaa"] == ["aa", "a"]
