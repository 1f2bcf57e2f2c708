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
