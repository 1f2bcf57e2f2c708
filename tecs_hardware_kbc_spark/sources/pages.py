"""Pages source (SURVEY S1): the engine's sole primary input.

Reads the Common-Crawl-style pages table ``(url, warc_ts, html, text,
lang)``. On a production cluster this is an Iceberg table
(``spark.read.table``) partitioned by crawl date / url-hash bucket so that
ingest dedup and the candidate join reuse the layout; here it is parquet
with the same schema. Column pruning matters: the ``html`` blob is only
read by the parse stage — every other consumer must select away from it
(Catalyst prunes it at the scan; ``.explain`` shows ReadSchema without
html).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])


def read_pages(spark: SparkSession, path_or_table: str,
               max_docs: int | None = None) -> DataFrame:
    """Load the pages table; ``max_docs`` caps like HTMLDocPreprocessor's
    max_docs (hack/utils/utils.py:46) — LIMIT is pushed to the scan."""
    if "/" in path_or_table:
        df = spark.read.schema(PAGES_SCHEMA).parquet(path_or_table)
    else:
        df = spark.read.table(path_or_table)
    if max_docs:
        df = df.limit(max_docs)
    return df
