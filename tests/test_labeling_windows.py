"""Pin the left/right token-window widths (get_left_ngrams/get_right_ngrams
parity, transistor_lfs.py:74,85): _left_words(k) must return exactly the k
words at 0-based indices [wi-k, wi-1], _right_words(k) the k words after the
mention."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.labeling import _left_words, _right_words


def _frame(spark):
    words = ["w0", "w1", "w2", "w3", "w4", "w5", "w6"]
    return spark.createDataFrame(
        [(4, 1, words)], "a_wi int, a_n int, _a_words array<string>")


def test_left_window_width(spark):
    df = _frame(spark)
    for k, expect in [(1, ["w3"]), (2, ["w2", "w3"]),
                      (4, ["w0", "w1", "w2", "w3"]),
                      (6, ["w0", "w1", "w2", "w3"])]:  # clipped at 0
        got = df.select(_left_words("a_", k).alias("w")).first()["w"]
        assert got == expect, (k, got)


def test_right_window_width(spark):
    df = _frame(spark)
    for k, expect in [(1, ["w5"]), (2, ["w5", "w6"]), (4, ["w5", "w6"])]:
        got = df.select(_right_words("a_", k).alias("w")).first()["w"]
        assert got == expect, (k, got)


def test_left_window_at_sentence_start(spark):
    df = spark.createDataFrame(
        [(0, 1, ["w0", "w1"])], "a_wi int, a_n int, _a_words array<string>")
    got = df.select(_left_words("a_", 3).alias("w")).first()["w"]
    assert got == []
