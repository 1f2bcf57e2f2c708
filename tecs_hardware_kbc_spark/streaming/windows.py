"""Event-time windowed aggregation over the crawl stream (SURVEY §2.9 —
the windowed-aggregation leg Structured Streaming exists for).

``crawl_rate`` counts crawls per (domain, event-time window) with a
watermark bounding state: the streaming analog of the batch
``groupBy(window(...))`` monitoring query an operator would run over a
live crawl — per-domain fetch rates, politeness auditing, dead-domain
detection. At web scale the state is one row per (domain, open window)
— the watermark closes windows ``allowed_lateness`` behind the max
event time seen, so state is bounded by (#domains x windows-in-flight)
regardless of corpus size, and late rows beyond the watermark are
dropped rather than reopening state (the documented trade every
watermarked aggregation makes).

In append output mode a window emits exactly once, when the watermark
passes its end — so a bounded ``availableNow`` drain emits every window
whose end <= max(warc_ts) - allowed_lateness, and the still-open tail
windows stay in state (asserted in ``test_streaming``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def url_domain(url: Column) -> Column:
    """scheme://host/... -> host (the politeness/grouping key)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)


def crawl_rate(pages_stream: DataFrame,
               window_duration: str = "1 hour",
               allowed_lateness: str = "2 hours") -> DataFrame:
    """(domain, window_start, window_end, n_crawls, n_urls) per closed
    event-time window. Works identically on a batch DataFrame (no
    watermark semantics, every window emits) — the property the test
    uses as its oracle."""
    src = pages_stream
    if pages_stream.isStreaming:
        src = pages_stream.withWatermark("warc_ts", allowed_lateness)
    return (
        src.groupBy(
            F.window("warc_ts", window_duration).alias("w"),
            url_domain(F.col("url")).alias("domain"))
        .agg(F.count("*").alias("n_crawls"),
             F.approx_count_distinct("url").alias("n_urls"))
        .select("domain",
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_crawls", "n_urls")
    )
