"""Deterministic sampling, splitting and sequence packing.

The three data-selection operators every large-scale training pipeline
needs between "corpus" and "batches", built on the engine's
cross-engine-stable hash primitive (first 4 md5 bytes / 2^32 — the same
uniform the augment policy coins use) instead of ``rand()``:
reproducible across runs, engines and partitionings, replayable in ANSI
SQL (the ``doc_sample`` / ``doc_pack`` driver entries hash-check them
against DuckDB), and stable under re-execution — a retried task samples
the same rows, which Bernoulli ``rand()`` does not guarantee.

* ``sample_by_hash`` — keep a deterministic ``fraction`` of keys.
* ``split_by_hash`` — disjoint, exhaustive train/val/test labels from
  cumulative weight boundaries (the doc-hash generalization of
  scoring.is_dev_doc's 50/50 split).
* ``resample_by_weight`` / ``temperature_multipliers`` — domain-mixture
  resampling with repetition (multiplier > 1 duplicates rows, the
  fractional part is a deterministic per-key coin; temperature alpha
  flattens the domain distribution the multilingual-pretraining way).
* ``token_budget`` — "first N tokens" corpus cut in deterministic hash
  order, without a global sort: per-bucket totals -> tiny exclusive
  prefix sum -> one within-bucket window; only the boundary bucket
  actually cuts.
* ``pack_sequences`` — concat-and-chunk sequence packing: shard the
  corpus by key hash, order each shard deterministically, lay documents
  end-to-end on a per-shard token tape and cut it every ``budget``
  tokens. One window per shard (running token sum), one explode (a doc
  emits one row per sequence it overlaps) — no driver loop, no
  quadratic bin search. At 100 TB the shard count bounds the window
  partition size; packing is embarrassingly parallel across shards and
  sequence ids are globally unique as (shard, seq).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def hash_u(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1): first 4 md5 bytes of
    ``key || ':' || salt`` over 2^32 (DuckDB:
    ('0x'||substr(md5(..),1,8))::ubigint / 4294967296.0)."""
    return (F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                              F.lit(":" + salt))), 1, 8),
                   16, 10).cast("double") / F.lit(4294967296.0))


def sample_by_hash(df: DataFrame, key: str, fraction: float,
                   salt: str = "sample") -> DataFrame:
    """Keep rows whose key-hash uniform falls below ``fraction`` —
    deterministic Bernoulli-by-key sampling (all rows of one key are
    kept or dropped together; change ``salt`` for an independent
    draw)."""
    return df.filter(hash_u(F.col(key), salt) < F.lit(float(fraction)))


def split_by_hash(df: DataFrame, key: str,
                  weights: dict[str, float],
                  salt: str = "split",
                  col_name: str = "split") -> DataFrame:
    """Label every row with a split name by cumulative weight boundaries
    over the key-hash uniform — disjoint and exhaustive by construction
    (weights are normalized; the last split absorbs the rounding tail).
    E.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = hash_u(F.col(key), salt)
    names = list(weights)
    expr = F.lit(names[-1])  # tail absorbs FP rounding
    acc = 0.0
    rev: list[tuple[str, float]] = []
    for name in names[:-1]:
        acc += weights[name] / total
        rev.append((name, acc))
    for name, bound in reversed(rev):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(col_name, expr)


def resample_by_weight(df: DataFrame, key: str, domain_col: str,
                       multipliers: dict[str, float],
                       salt: str = "resample",
                       copy_col: str = "copy") -> DataFrame:
    """Weighted resampling with repetition — the domain-mixing step of a
    pretraining data recipe (each domain d is up-/down-sampled by a
    multiplier ``m_d``, possibly > 1): every row of domain d is emitted
    ``floor(m_d)`` times, plus one more with probability ``frac(m_d)``
    decided by the row's key-hash uniform — deterministic per key, so a
    retried task emits the same copies and the realized count per domain
    is ``n_d * m_d`` in expectation with per-key reproducibility.

    Output = the input columns plus ``copy`` (0-based repetition index,
    dense per key). Rows whose domain is missing from ``multipliers``
    get m = 1.0 (pass-through). Zero-copy rows are dropped by exploding
    an empty sequence — no join, no shuffle: the whole operator is one
    projection + explode, which is the only shape that holds at 100 TB
    (a sample-with-replacement join would shuffle the corpus)."""
    m = F.lit(1.0)
    for name, mult in multipliers.items():
        if mult < 0:
            raise ValueError(f"negative multiplier for domain {name!r}")
        m = F.when(F.col(domain_col) == F.lit(name),
                   F.lit(float(mult))).otherwise(m)
    base = F.floor(m).cast("int")
    extra = (hash_u(F.col(key), salt) < (m - base)).cast("int")
    n = base + extra
    copies = F.when(n >= 1, F.sequence(F.lit(0), n - 1)) \
              .otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def temperature_multipliers(df: DataFrame, domain_col: str,
                            alpha: float) -> dict[str, float]:
    """Per-domain multipliers for temperature-based mixture sampling
    (multilingual pretraining convention: sampling share q_d ∝ p_d^alpha
    where p_d is the domain's corpus share; alpha < 1 flattens the mix,
    alpha = 1 is the natural distribution). The multiplier that realizes
    q_d while keeping the EXPECTED total row count unchanged is
    ``m_d = p_d^(alpha-1) / sum_e p_e^alpha``.

    Driver-side O(#domains) collect — domains are a handful of sources
    or languages, never corpus-scale. Feed the result to
    ``resample_by_weight``."""
    counts = {r[0]: r[1]
              for r in df.groupBy(domain_col).count().collect()}
    total = sum(counts.values())
    if total == 0:
        return {}
    z = sum((c / total) ** alpha for c in counts.values())
    return {d: (c / total) ** (alpha - 1.0) / z
            for d, c in counts.items()}


def pack_sequences(df: DataFrame, key: str, token_col: str,
                   budget: int, shards: int = 64,
                   salt: str = "pack") -> DataFrame:
    """Concat-and-chunk packing: assign every document the training
    sequence(s) it occupies when the shard's documents are laid
    end-to-end and cut every ``budget`` tokens (the standard LLM
    pretraining packing — documents ARE split across sequence
    boundaries; no padding, no bin-search).

    Output: one row per (document, overlapped sequence) with
      ``shard``    — hash(key) % shards (the parallel unit),
      ``seq``      — 0-based sequence ordinal within the shard,
      ``doc_start``/``doc_end`` — the document's token interval
                     [start, end) on the shard tape,
      ``seq_off``  — where this document's slice begins inside the
                     sequence, ``slice_len`` — its length there.

    Within a shard documents are ordered by (hash uniform, key) — a
    deterministic shuffle, so adjacent documents are unrelated. The
    running token sum is ONE window per shard; a shard's tape length is
    corpus_tokens/shards, so ``shards`` sizes the window partitions.
    Every token of every document lands in exactly one (seq, offset) —
    pinned by tests; the ``doc_pack`` driver entry replays the whole map
    in SQL."""
    k = F.col(key)
    toks = F.col(token_col).cast("long")
    shard = F.pmod(F.conv(F.substring(F.md5(k.cast("string")), 1, 8),
                          16, 10).cast("long"), F.lit(shards)).cast("int")
    u = hash_u(k, salt)
    w = (Window.partitionBy("shard").orderBy("_u", key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tape = (
        df.select(k.alias(key), toks.alias("_toks"),
                  shard.alias("shard"), u.alias("_u"))
        .filter(F.col("_toks") > 0)
        .withColumn("_end", F.sum("_toks").over(w))
        .withColumn("_start", F.col("_end") - F.col("_toks"))
    )
    first_seq = F.floor(F.col("_start") / budget)
    last_seq = F.floor((F.col("_end") - 1) / budget)
    out = tape.select(
        key, "shard",
        F.col("_start").alias("doc_start"),
        F.col("_end").alias("doc_end"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
    )
    seq_start = F.col("seq") * budget
    slice_start = F.greatest(seq_start, F.col("doc_start"))
    slice_end = F.least(seq_start + budget, F.col("doc_end"))
    return out.select(
        key, "shard", F.col("seq").cast("int").alias("seq"),
        "doc_start", "doc_end",
        (slice_start - seq_start).cast("int").alias("seq_off"),
        (slice_end - slice_start).cast("int").alias("slice_len"),
    )


def token_budget(df: DataFrame, key: str, token_col: str,
                 budget: int, buckets: int = 1024,
                 salt: str = "budget") -> DataFrame:
    """Cut the corpus at a global token budget: keep the deterministic
    hash-order prefix whose cumulative token count fits ``budget`` (the
    "train on the first N tokens" selection, without a global sort).

    The global order is (bucket, hash uniform, key) where bucket =
    floor(u * buckets) — i.e. just the hash order read bucket-by-bucket.
    The scale trick mirrors ``pack_sequences``: a GLOBAL running sum
    would be one totally-ordered window (a single-partition scale
    killer), so instead (1) per-bucket token totals — one small agg,
    ``buckets`` rows; (2) an exclusive prefix sum over that tiny table
    gives each bucket its starting offset; (3) ONE window per bucket
    computes the within-bucket running sum. A document is kept when
    bucket_offset + within_cumsum <= budget — so full buckets keep
    everything cheaply and only the boundary bucket actually cuts.

    Output: (key, tokens, cum_tokens) for the SURVIVORS, where
    ``cum_tokens`` is the inclusive global running total (max row's
    cum_tokens is the realized budget, <= ``budget``). Deterministic
    across engines/retries/partitionings; the under-fill is at most one
    document (the first one that would cross the line is dropped)."""
    k = F.col(key)
    toks = F.col(token_col).cast("long")
    u = hash_u(k, salt)
    bucket = F.least(F.floor(u * buckets), F.lit(buckets - 1)).cast("int")
    d = df.select(k.alias(key), toks.alias("tokens"),
                  u.alias("_u"), bucket.alias("_b")) \
        .filter(F.col("tokens") > 0)

    totals = d.groupBy("_b").agg(F.sum("tokens").alias("_btoks"))
    w_off = (Window.orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.withColumn(
        "_off", F.sum("_btoks").over(w_off) - F.col("_btoks")) \
        .select("_b", "_off")

    w_in = (Window.partitionBy("_b").orderBy("_u", key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        d.join(F.broadcast(offsets), "_b")
        .withColumn("_cum", F.col("_off") + F.sum("tokens").over(w_in))
        .filter(F.col("_cum") <= F.lit(int(budget)))
        .select(key, "tokens", F.col("_cum").alias("cum_tokens"))
    )
