"""Skew salting operator (north_rule explicit skew handling)."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.candidates import salt_hot_keys


def test_salt_hot_keys(spark):
    hot = [(f"https://hot/x.html", i) for i in range(500)]
    cold = [(f"https://cold/{i}.html", i) for i in range(50)]
    df = spark.createDataFrame(hot + cold, "url string, v int")
    salted = salt_hot_keys(df, key="url", buckets=4, threshold=100)
    assert salted.count() == 550  # no rows lost or duplicated
    hot_salts = salted.filter(F.col("url").contains("hot")) \
        .select("_salt").distinct().count()
    cold_salts = salted.filter(F.col("url").contains("cold")) \
        .select("_salt").distinct().collect()
    assert hot_salts > 1                      # hot key split across buckets
    assert [r["_salt"] for r in cold_salts] == [0]  # cold keys untouched


def test_salted_pair_join_identical_results(spark):
    """pair_mentions_salted must produce exactly the pair set of the plain
    join, while splitting hot-url work across salt buckets."""
    from tecs_hardware_kbc_spark.operators.candidates import (
        pair_mentions, pair_mentions_salted)

    parts = spark.createDataFrame(
        [("hot", f"P{i}") for i in range(20)] + [("cold", "P0")],
        "url string, span string")
    attrs = spark.createDataFrame(
        [("hot", f"A{i}") for i in range(30)] + [("cold", "A0")],
        "url string, span string")
    plain = {(r["url"], r["p_span"], r["a_span"])
             for r in pair_mentions(parts, attrs).collect()}
    salted = [(r["url"], r["p_span"], r["a_span"])
              for r in pair_mentions_salted(parts, attrs, buckets=4,
                                            threshold=10).collect()]
    assert set(salted) == plain
    assert len(salted) == len(plain)  # no duplicate pairs from salting
