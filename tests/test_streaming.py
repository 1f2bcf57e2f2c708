"""AvailableNow streaming ingest: exactly-once drain + recrawl dedup."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.corpus import write_corpus
from tecs_hardware_kbc_spark.pipeline import ingest
from tecs_hardware_kbc_spark.streaming.ingest import ingest_available_now


def test_ingest_available_now(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    landing = str(base / "landing")
    out = str(base / "pages_clean")
    ckpt = str(base / "ckpt")

    write_corpus(spark, str(base / "c"), n_pages=8, seed=9)
    src = spark.read.parquet(str(base / "c") + "/pages.parquet")
    src.write.mode("overwrite").parquet(landing)

    ingest_available_now(spark, landing, out, ckpt)
    drained = spark.read.parquet(out)
    assert drained.count() > 0
    # per-batch latest-wins: at most one row per url (single batch here)
    assert drained.groupBy("url").count().filter("count > 1").count() == 0

    # second drain with no new files must be a no-op (exactly-once)
    n1 = drained.count()
    ingest_available_now(spark, landing, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # batch-pipeline ingest() over the drained table stays idempotent
    clean = ingest(spark.read.parquet(out))
    assert clean.count() == clean.select("url").distinct().count()
