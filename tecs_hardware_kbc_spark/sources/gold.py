"""Gold-label CSV source (SURVEY S3).

Schema exactly as the reference parses it (``transistor_utils.py:80-97``):
``(filename, manuf, part, attribute, value)``, uppercased doc/part, filtered
by attribute, dedup'd. The opamp variant additionally normalizes quantities
and doubles ± values (``opamp_utils.py:56-100``) — that normalization lives
in functions.units and is applied by the caller when the gold file carries
raw unit spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

GOLD_SCHEMA = T.StructType([
    T.StructField("filename", T.StringType(), False),
    T.StructField("manuf", T.StringType(), True),
    T.StructField("part", T.StringType(), False),
    T.StructField("attribute", T.StringType(), False),
    T.StructField("value", T.StringType(), False),
])


def read_gold_csv(spark: SparkSession, path: str,
                  attribute: str | None = None,
                  docs: DataFrame | None = None) -> DataFrame:
    """Load gold CSV(s); optionally restrict to one attribute and to a doc
    list (the reference's ``docs=`` filter)."""
    df = spark.read.schema(GOLD_SCHEMA).csv(path, header=False)
    df = df.select(
        F.upper("filename").alias("filename"), "manuf",
        F.upper("part").alias("part"), "attribute", "value",
    )
    if attribute:
        df = df.filter(F.col("attribute") == attribute)
    if docs is not None:
        df = df.join(
            F.broadcast(docs.select(F.upper("filename").alias("filename"))),
            "filename", "left_semi")
    return df.dropDuplicates()
