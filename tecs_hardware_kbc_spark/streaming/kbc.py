"""Streaming KBC: incremental triple extraction over a continuous crawl.

The batch pipeline answers "extract THIS corpus"; a crawl never stops,
so the production loop is "extract every page we have never extracted,
as it lands" — the reference's nightly re-run
(`hack/transistors/transistors.py` runs parse→supervision over the
whole corpus each time) re-imagined as a Structured-Streaming
micro-batch job that only ever pays for NEW urls:

    micro-batch -> latest crawl per url within the batch
                -> anti-join the persisted seen-url table
                -> run_kbc (fixed-threshold, no gold) on the new pages
                -> append triples (partitioned by pred) + seen urls
                -> append a per-batch metrics row (lineage)

Like streaming/dedup.py, the ONLY state is table-backed (the seen-url
table — the Iceberg-append analog); stream-engine state stays empty, so
no watermark/TTL questions arise and a restart resumes from the
checkpoint plus the tables alone. Idempotency caveat is shared with
``ingest_available_now``: a micro-batch replayed after a crash between
the two appends can duplicate triples of that batch; on a real cluster
both appends are ONE Iceberg transaction, and here the downstream read
can always `dropDuplicates(subj, pred, obj)` — extraction is
deterministic per url, so replays converge to the same triple set.

A recrawl of an already-extracted url is SKIPPED (extract-once
semantics): triple extraction depends only on page content, and the
reference corpus's datasheets are immutable once crawled. Content-
changing recrawl handling belongs to ``streaming/stateful.py``'s CDC
operator — compose it upstream to re-admit urls whose content hash
moved, which then requires retracting that url's prior triples (an
Iceberg MERGE on a real cluster; out of scope for the parquet analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F


def kbc_stream_available_now(spark: SparkSession, input_dir: str,
                             gazetteer: DataFrame, triples_dir: str,
                             seen_dir: str, checkpoint_dir: str,
                             metrics_dir: str | None = None,
                             schema=None,
                             relations: list[str] | None = None,
                             default_threshold: float = 0.5) -> None:
    """Drain every page file currently landed, extracting triples from
    urls never extracted before; append triples partitioned by ``pred``
    (the north_star's predicate-partitioned triple tables), the new
    urls to the seen table, and one metrics row per micro-batch."""
    from tecs_hardware_kbc_spark.pipeline import run_kbc

    if schema is None:
        schema = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # latest crawl per url within the batch (ties: keep one, by ts
        # then url order — deterministic), then extract-once anti-join
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        latest = (batch.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
        if os.path.exists(os.path.join(seen_dir, "_SUCCESS")):
            seen = spark.read.parquet(seen_dir)
            new_pages = latest.join(seen, "url", "left_anti")
        else:
            new_pages = latest
        new_pages = new_pages.localCheckpoint()
        n_new = new_pages.count()
        n_triples = 0
        if n_new > 0:
            res = run_kbc(spark, new_pages, gazetteer, gold=None,
                          relations=relations,
                          default_threshold=default_threshold)
            triples = res.triples.localCheckpoint()
            n_triples = triples.count()
            triples.write.mode("append").partitionBy("pred") \
                .parquet(triples_dir)
            new_pages.select("url").write.mode("append").parquet(seen_dir)
        if metrics_dir is not None:
            spark.createDataFrame(
                [(int(batch_id), int(batch.count()), int(n_new),
                  int(n_triples))],
                "batch_id long, n_rows long, n_new_urls long, "
                "n_triples long",
            ).coalesce(1).write.mode("append").parquet(metrics_dir)

    (
        stream.writeStream
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
