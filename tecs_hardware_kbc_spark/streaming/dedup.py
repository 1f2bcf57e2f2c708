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
from the checkpoint and the index table alone. Both sinks are snapshot
tables (plans/snapshots.py, the Iceberg commit-protocol analog) with
the micro-batch id as idempotency key, so replayed micro-batches are
exactly-once; on a real cluster they become Iceberg appends with no
call-site change.
"""

from __future__ import annotations

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
    run here under the streaming engine across restarts. Both sinks are
    snapshot tables committed with the batch id as idempotency key
    (plans/snapshots.py), so a replayed micro-batch re-commits only the
    table that missed its commit: exactly-once, like streaming/kbc.py.
    Read results back via ``SnapshotTable(spark, out_dir).read()``."""
    from tecs_hardware_kbc_spark.plans.snapshots import SnapshotTable

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))
    out_t = SnapshotTable(spark, out_dir)
    index_t = SnapshotTable(spark, index_dir)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        key = f"batch-{batch_id}"
        if index_t.current_version() > 0:
            index = index_t.read()
        else:
            index = minhash_index(
                batch.filter(F.lit(False)), id_col, text_col)
        dups = incremental_near_duplicates(
            batch, index, id_col, text_col, threshold=threshold)
        survivors = batch.join(
            dups.select(F.col("doc_id").alias(id_col)).dropDuplicates(),
            id_col, "left_anti").localCheckpoint()
        out_t.append(survivors, idempotency_key=key)
        index_t.append(minhash_index(survivors, id_col, text_col),
                       idempotency_key=key)

    (
        stream.writeStream
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
