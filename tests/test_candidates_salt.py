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


def test_pair_mentions_default_is_salted(spark):
    """The skew guard is wired into the DEFAULT pairing plan: above the
    threshold the join key is (url, _salt) with the part side exploded
    over the salt range; results stay identical to the unguarded join."""
    import contextlib
    import io

    from tecs_hardware_kbc_spark.operators.candidates import pair_mentions

    parts = spark.createDataFrame(
        [("hot", f"P{i}") for i in range(20)] + [("cold", "P0")],
        "url string, span string")
    attrs = spark.createDataFrame(
        [("hot", f"A{i}") for i in range(30)] + [("cold", "A0")],
        "url string, span string")

    def plan(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    guarded = pair_mentions(parts, attrs, salt_threshold=10)
    assert "_salt" in plan(guarded)       # salted join key in the plan
    plain = pair_mentions(parts, attrs, salt_threshold=None)
    assert "_salt" not in plan(plain)
    key = lambda r: (r["url"], r["p_span"], r["a_span"])  # noqa: E731
    assert (sorted(map(key, guarded.collect()))
            == sorted(map(key, plain.collect())))
    # default threshold (10k) on a cold dataset: the guard is present but
    # every salt is 0 — result equivalence holds there too
    cold_default = pair_mentions(parts, attrs)
    assert (sorted(map(key, cold_default.collect()))
            == sorted(map(key, plain.collect())))
