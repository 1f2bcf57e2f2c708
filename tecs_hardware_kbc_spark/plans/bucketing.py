"""Bucketed stage tables — co-partitioned joins without per-query shuffles.

The KBC dataflow joins almost everything on ``url`` (mention pairing,
context probes, sentence windows). At 100 TB the winning layout is to
write the big intermediates bucketed by ``url`` once, so every downstream
equi-join on url is shuffle-free: both sides arrive pre-hashed into the
same bucket scheme and Catalyst plans SortMergeJoin over the existing
distribution (no Exchange on either side — pinned by
tests/test_plans.py::test_bucketed_join_has_no_exchange).

On a real cluster the same declaration targets Iceberg's
``bucket(N, url)`` partition transform; here it uses the session catalog's
parquet bucketing (``writeTo``/``saveAsTable``), which is the local-mode
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist ``df`` as a bucketed managed table (overwrite). Clears an
    orphaned managed-table location left by an interrupted earlier write
    (DROP TABLE doesn't remove a location the catalog no longer owns)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table.split('.')[-1]}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
