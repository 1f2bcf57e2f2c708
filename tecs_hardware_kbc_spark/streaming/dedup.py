"""Streaming content dedup: the continuous-crawl near-dedup loop.

Batch dedup answers "collapse THIS corpus"; a crawl never stops, so the
production question is "is this NEW page a near-dup of anything we have
ever kept?" — answered incrementally, without ever re-shingling
history. This module is the Structured-Streaming composition of the
batch operators (``operators/dedup.py``):

    micro-batch -> incremental_near_duplicates(batch, persisted index)
                -> append survivors to the corpus
                -> append minhash_index(survivors) to the index

The index is the ONLY state, and it lives in the table, not in stream
state: (doc_id, sig, band, bucket) rows, one per (kept doc, band).
Stream-engine state stays empty, so the watermark/TTL questions that
constrain ``streaming/stateful.py`` do not arise — a restart resumes
from the checkpoint and the index table alone. On a real cluster both
sinks are Iceberg appends (atomic snapshot commits); here they are the
parquet-append analog, with the same idempotency caveat as
``ingest_available_now``: a replayed micro-batch re-appends, and the
downstream batch read re-dedups exactly (first-id-wins is deterministic,
so replays converge).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.dedup import (
    incremental_near_duplicates,
    minhash_index,
)


def dedup_stream_available_now(spark: SparkSession, input_dir: str,
                               out_dir: str, index_dir: str,
                               checkpoint_dir: str, schema,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               threshold: float = 0.7) -> None:
    """Drain everything currently landed, keeping only documents that
    near-duplicate neither the persisted index nor an earlier-id doc of
    their own micro-batch; survivors and their index rows are appended.

    Each micro-batch reads the index FRESH (it grew by the previous
    batch's survivors) — the self-reinforcing loop pinned by
    ``tests/test_dedup.py::test_incremental_dedup_closes_the_loop``,
    run here under the streaming engine across restarts."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(os.path.join(index_dir, "_SUCCESS")):
            index = spark.read.parquet(index_dir)
        else:
            index = minhash_index(
                batch.filter(F.lit(False)), id_col, text_col)
        dups = incremental_near_duplicates(
            batch, index, id_col, text_col, threshold=threshold)
        survivors = batch.join(
            dups.select(F.col("doc_id").alias(id_col)).dropDuplicates(),
            id_col, "left_anti")
        survivors.write.mode("append").parquet(out_dir)
        minhash_index(survivors, id_col, text_col).write \
            .mode("append").parquet(index_dir)

    (
        stream.writeStream
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
