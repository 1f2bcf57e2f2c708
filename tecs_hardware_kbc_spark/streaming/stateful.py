"""Custom stateful streaming operator (SURVEY §2.9 — the stateful leg).

``streaming_latest_crawl`` is a change-data-capture tracker over the page
stream: per-url ``GroupState`` holds the newest crawl timestamp seen so
far, and a row is emitted ONLY when a strictly newer crawl supersedes it —
the streaming form of the batch ``ingest()`` latest-per-url dedup, with
state instead of a shuffle-the-world window. Built on
``applyInPandasWithState`` (Arrow-batched per group).

At 10^12 urls the state store is the scaling concern: state is one
timestamp per url, partitioned by the stream's groupBy hash — RocksDB
state store on a real cluster — and bounded by a processing-time timeout:
urls that stop re-crawling for ``state_ttl_minutes`` are evicted
(``state.remove()`` on ``hasTimedOut``). The documented tradeoff: after
eviction, a *stale* replay of an evicted url re-emits as a first sight;
size the TTL above the source's replay horizon (Common Crawl re-crawl
cadence is weeks, replays are hours).

Trigger caveat: with ProcessingTimeTimeout registered, the engine's
``shouldRunAnotherBatch`` stays true (it must keep running batches to
fire future timeouts), so an ``availableNow``/``once`` backfill never
terminates. Use the TTL only on continuously-running streams; pass
``state_ttl_minutes=0`` (NoTimeout) for bounded drains.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator
from typing import Any

import pandas as pd

_log = logging.getLogger(__name__)

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

# Default is NoTimeout: with ProcessingTimeTimeout registered the engine's
# shouldRunAnotherBatch stays true, so availableNow/once backfills never
# terminate (see module docstring). Continuous-stream callers opt INTO the
# TTL explicitly, e.g. state_ttl_minutes=SUGGESTED_STATE_TTL_MINUTES.
DEFAULT_STATE_TTL_MINUTES = 0
SUGGESTED_STATE_TTL_MINUTES = 7 * 24 * 60


def _make_update(ttl_minutes: int):
    def _update(key: Any, pdfs: Iterator[pd.DataFrame],
                state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle url aged out: drop its timestamp; a later crawl row
            # (fresh or stale replay) will re-register as first sight
            state.remove()
            return
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
            out = pd.DataFrame([{
                "url": url,
                "warc_ts": pd.Timestamp(batch_us * 1000),
                "prev_ts": prev,
                "n_crawls": n_total,
            }])
        else:
            state.update((old_us, n_total))
            out = None
        if ttl_minutes > 0:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if out is not None:
            yield out

    return _update


def streaming_latest_crawl(pages_stream: DataFrame,
                           state_ttl_minutes: int = DEFAULT_STATE_TTL_MINUTES,
                           bounded: bool | None = None) -> DataFrame:
    """(url, warc_ts, prev_ts, n_crawls) — one row per url per micro-batch
    in which a strictly newer crawl arrived. ``prev_ts`` is the superseded
    timestamp (null on first sight); ``n_crawls`` counts every crawl row
    ever seen for the url, including stale replays that emit nothing.

    ``state_ttl_minutes`` bounds per-url state on continuously-running
    streams: urls with no activity for the TTL are evicted via
    processing-time timeout. Default 0 (NoTimeout) because a registered
    timeout makes bounded availableNow/once drains loop forever; pass
    ``SUGGESTED_STATE_TTL_MINUTES`` (7 days) on a real continuous stream.

    The trigger mode is chosen at ``writeStream`` time, after this
    function returns, so it cannot be introspected here — declare it via
    ``bounded``: True pins ttl=0 (an availableNow/once drain must not
    register a timeout), False means a continuous trigger and warns if
    ttl=0 (per-url state then grows without bound), None keeps the
    caller's ttl as-is with a warning only when it selected an explicit
    positive TTL that a bounded drain would hang on (no reliable signal
    either way)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if bounded is True and state_ttl_minutes > 0:
        _log.warning(
            "streaming_latest_crawl: bounded drain requested with "
            "state_ttl_minutes=%d — forcing NoTimeout (a registered "
            "ProcessingTimeTimeout makes availableNow/once loop forever)",
            state_ttl_minutes)
        state_ttl_minutes = 0
    elif bounded is False and state_ttl_minutes == 0:
        _log.warning(
            "streaming_latest_crawl: continuous stream with ttl=0 "
            "(NoTimeout) accumulates per-url state unboundedly — pass "
            "state_ttl_minutes=SUGGESTED_STATE_TTL_MINUTES (or size to "
            "the source's replay horizon)")

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_minutes > 0 else GroupStateTimeout.NoTimeout)
    return (
        pages_stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _make_update(state_ttl_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
