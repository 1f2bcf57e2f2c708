"""Custom stateful streaming operator (SURVEY §2.9 — the stateful leg).

``streaming_latest_crawl`` is a change-data-capture tracker over the page
stream: per-url ``GroupState`` holds the newest crawl timestamp seen so
far, and a row is emitted ONLY when a strictly newer crawl supersedes it —
the streaming form of the batch ``ingest()`` latest-per-url dedup, with
state instead of a shuffle-the-world window. Built on
``applyInPandasWithState`` (Arrow-batched per group, bounded state via
processing-time timeout).

At 10^12 urls the state store is the scaling concern: state is one
timestamp per url, partitioned by the stream's groupBy hash — RocksDB
state store on a real cluster; timeouts age out urls that stop
re-crawling.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("prev_ts", T.TimestampType(), True),
    T.StructField("n_crawls", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("max_ts", T.LongType(), False),     # epoch micros
    T.StructField("n_crawls", T.LongType(), False),
])


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    url = key[0]
    batch_max = None
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
        m = pdf["warc_ts"].max()
        batch_max = m if batch_max is None else max(batch_max, m)
    if state.exists:
        old_us, n_seen = state.get
    else:
        old_us, n_seen = None, 0
    batch_us = int(pd.Timestamp(batch_max).value // 1000)
    n_total = n_seen + n_new
    if old_us is None or batch_us > old_us:
        state.update((batch_us, n_total))
        prev = (pd.Timestamp(old_us * 1000) if old_us is not None
                else pd.NaT)
        yield pd.DataFrame([{
            "url": url,
            "warc_ts": pd.Timestamp(batch_us * 1000),
            "prev_ts": prev,
            "n_crawls": n_total,
        }])
    else:
        state.update((old_us, n_total))


def streaming_latest_crawl(pages_stream: DataFrame) -> DataFrame:
    """(url, warc_ts, prev_ts, n_crawls) — one row per url per micro-batch
    in which a strictly newer crawl arrived. ``prev_ts`` is the superseded
    timestamp (null on first sight); ``n_crawls`` counts every crawl row
    ever seen for the url, including stale replays that emit nothing."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
