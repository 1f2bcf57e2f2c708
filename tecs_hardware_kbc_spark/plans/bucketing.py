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


def _managed_location(spark: SparkSession, table: str) -> str | None:
    """Resolve where the managed data for ``table`` lives (or would live).

    If the table is cataloged, use its actual location (and only if it is
    MANAGED — never delete an EXTERNAL table's data). Otherwise derive the
    default managed location from the owning database's locationUri
    (``<wh>/<db>.db/<tbl>`` for a non-default db, ``<wh>/<tbl>`` for
    default) so the orphan cleanup hits the right directory and never an
    unrelated same-named table in another database."""
    from urllib.parse import urlparse

    parts = table.split(".")
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    name = parts[-1]
    try:
        t = spark.catalog.getTable(f"{db}.{name}")
        if t.tableType != "MANAGED":
            return None
        loc = (spark.sql(f"DESCRIBE EXTENDED {db}.{name}")
               .filter("col_name = 'Location'").collect())
        return urlparse(loc[0]["data_type"]).path if loc else None
    except Exception:
        pass  # not cataloged — fall through to the default location
    try:
        db_uri = spark.catalog.getDatabase(db).locationUri
    except Exception:
        return None
    return f"{urlparse(db_uri).path}/{name}"


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist ``df`` as a bucketed managed table (overwrite). Clears an
    orphaned managed-table location left by an interrupted earlier write
    (DROP TABLE doesn't remove a location the catalog no longer owns);
    the location is resolved from the catalog, never guessed from the
    bare table name."""
    import shutil

    spark = df.sparkSession
    loc = _managed_location(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc:
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
