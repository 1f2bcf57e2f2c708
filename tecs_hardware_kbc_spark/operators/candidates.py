"""Candidate extraction (SURVEY J1/J2): per-doc pairing join + throttlers.

The reference's ``CandidateExtractor`` (``transistors.py:266-298``) takes a
per-document cross product of typed mentions and prunes it with throttlers
(``transistor_throttlers.py:30-81``). In Spark this is *the* classic KBC
join: an equi-join on ``url`` with the throttler written as join-adjacent
predicates so Catalyst pushes them into the join. Hot crawl domains make
``url`` skewed; AQE skew-join is on by default (session.py) and
``salt_hot_keys`` gives an explicit pre-split for the pathological tail.

Alignment semantics: the default is the structural projection of
fonduer's visual checks — ``same_table`` = equal table_id; horizontally
aligned = same row; vertically aligned = same column. When a visual
bbox sidecar is supplied (``visual=`` on the candidate builders), the
true interval-overlap predicates take over per-row where coordinates
exist (operators/visual.py), structural proxy elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

PART_LIKE_RGX = r"^(?:[0-9]+[A-Z]+|[A-Z]+[0-9]+)[0-9A-Z]*$"  # throttlers.py:17


def _prefixed(cols: DataFrame, prefix: str) -> DataFrame:
    return cols.select(
        [F.col("url")] + [F.col(c).alias(f"{prefix}{c}")
                          for c in cols.columns if c != "url"]
    )


def pair_mentions(parts: DataFrame, attrs: DataFrame,
                  salt_threshold: int | None = 10_000,
                  salt_buckets: int = 8) -> DataFrame:
    """Per-doc cross product: one row per (part mention, attr mention).

    The explicit skew guard is ON by default (north_rule): urls with more
    than ``salt_threshold`` attr mentions are salted across
    ``salt_buckets`` sub-keys (``pair_mentions_salted``), so one hot crawl
    domain cannot pin a single join task at 100x scale — below the
    threshold every salt is 0 and the join degenerates to the plain
    equi-join on url. Pass ``salt_threshold=None`` for the unguarded
    join (test/verification path)."""
    if salt_threshold is not None:
        return pair_mentions_salted(parts, attrs, salt_buckets,
                                    salt_threshold)
    return _prefixed(parts, "p_").join(_prefixed(attrs, "a_"), "url")


def pair_mentions_salted(parts: DataFrame, attrs: DataFrame,
                         buckets: int = 8,
                         threshold: int = 10_000) -> DataFrame:
    """The explicit-salting variant of the pairing join for hot crawl
    domains beyond what AQE's skew split handles (north_rule): attr rows
    on hot urls get a random salt in [0, buckets); part rows on hot urls
    replicate over the full salt range; the join key becomes
    (url, _salt), splitting each hot url's work across ``buckets`` tasks.
    Result set is identical to ``pair_mentions`` (pinned by test)."""
    hot = F.broadcast(
        attrs.groupBy("url").count()
        .filter(F.col("count") > threshold)
        .select("url", F.lit(True).alias("_hot")))
    a = (
        _prefixed(attrs, "a_").join(hot, "url", "left")
        .withColumn("_salt",
                    F.when(F.col("_hot"),
                           (F.rand(seed=7) * buckets).cast("int"))
                    .otherwise(0))
        .drop("_hot")
    )
    p = (
        _prefixed(parts, "p_").join(hot, "url", "left")
        .withColumn("_salt", F.explode(
            F.when(F.col("_hot"),
                   F.sequence(F.lit(0), F.lit(buckets - 1)))
            .otherwise(F.array(F.lit(0)))))
        .drop("_hot")
    )
    return p.join(a, ["url", "_salt"]).drop("_salt")


def same_table():
    return (
        F.col("p_table_id").isNotNull()
        & (F.col("p_table_id") == F.col("a_table_id"))
    )


def aligned():
    """same row (horz) or same column (vert) within one table."""
    return same_table() & (
        (F.col("p_row") == F.col("a_row")) | (F.col("p_col") == F.col("a_col"))
    )


def _pair_with_alignment(parts: DataFrame, attrs: DataFrame,
                         visual: DataFrame | None):
    """Shared throttler plumbing: the pairing join plus the alignment
    predicate — true bbox alignment (visual.aligned_hybrid, falling back
    per-row to the structural proxy) when a visual sidecar is supplied,
    else the structural proxy alone."""
    pairs = pair_mentions(parts, attrs)
    if visual is None:
        return pairs, aligned()
    from tecs_hardware_kbc_spark.operators.visual import (
        aligned_hybrid, attach_visual)
    return attach_visual(pairs, visual), aligned_hybrid()


def stg_temp_candidates(parts: DataFrame, temps: DataFrame,
                        visual: DataFrame | None = None) -> DataFrame:
    """stg_temp_filter (transistor_throttlers.py:30-36): inside one table the
    pair must be aligned (is_horz_aligned/is_vert_aligned when coords
    exist); across contexts the part must be tabular."""
    pairs, al = _pair_with_alignment(parts, temps, visual)
    return pairs.filter(
        F.when(same_table(), al).otherwise(F.col("p_is_tabular"))
    )


def polarity_candidates(parts: DataFrame, pols: DataFrame,
                        row_ngrams: DataFrame,
                        visual: DataFrame | None = None) -> DataFrame:
    """polarity_filter (transistor_throttlers.py:39-59): if the part's table
    row names a polarity, the attr must prefix-match one of them; aligned
    when same table."""
    pairs, al = _pair_with_alignment(parts, pols, visual)
    prn = row_ngrams.select(
        F.col("url"), F.col("table_id").alias("p_table_id"),
        F.col("row").alias("p_row"), F.col("grams").alias("_p_row_grams"),
    )
    cands = (
        pairs
        .join(prn, ["url", "p_table_id", "p_row"], "left")
        .withColumn("_p_row_grams", F.coalesce(F.col("_p_row_grams"), F.array()))
    )
    row_pols = F.filter(
        F.col("_p_row_grams"),
        lambda g: F.regexp_like(g, F.lit(r"^(?i)(?:NPN|PNP)")),
    )
    pol_matches = F.exists(
        row_pols,
        lambda g: F.startswith(F.lower(F.col("a_span")), F.lower(g)),
    )
    return (
        cands.filter((F.size(row_pols) == 0) | pol_matches)
        .filter(F.when(same_table(), al).otherwise(F.lit(True)))
        .drop("_p_row_grams")
    )


def ce_v_max_candidates(parts: DataFrame, volts: DataFrame,
                        row_ngrams: DataFrame,
                        col_ngrams: DataFrame,
                        visual: DataFrame | None = None) -> DataFrame:
    """ce_v_max_filter (transistor_throttlers.py:62-81): aligned when same
    table; otherwise, if the attr's row/column context names part-like
    tokens, the part must prefix-match one of them."""
    pairs, al = _pair_with_alignment(parts, volts, visual)
    arn = row_ngrams.select(
        "url", F.col("table_id").alias("a_table_id"),
        F.col("row").alias("a_row"), F.col("grams").alias("_a_row_grams"),
    )
    acn = col_ngrams.select(
        "url", F.col("table_id").alias("a_table_id"),
        F.col("col").alias("a_col"), F.col("grams").alias("_a_col_grams"),
    )
    cands = (
        pairs
        .join(arn, ["url", "a_table_id", "a_row"], "left")
        .join(acn, ["url", "a_table_id", "a_col"], "left")
        .withColumn("_ctx", F.concat(
            F.coalesce(F.col("_a_row_grams"), F.array()),
            F.coalesce(F.col("_a_col_grams"), F.array()),
        ))
    )
    ctx_parts = F.filter(
        F.col("_ctx"),
        lambda g: F.regexp_like(F.upper(g), F.lit(PART_LIKE_RGX))
        & (F.length(g) > 2),
    )
    part_matches = F.exists(
        ctx_parts,
        lambda g: F.startswith(F.lower(F.col("p_span")), F.lower(g)),
    )
    return (
        cands.filter(
            F.when(same_table(), al).otherwise(
                (F.size(ctx_parts) == 0) | part_matches
            )
        )
        .drop("_a_row_grams", "_a_col_grams", "_ctx")
    )


def unary_candidates(attrs: DataFrame) -> DataFrame:
    """Opamp-style unary candidates: the subject is the document itself
    (``opamps.py:263-267``)."""
    return _prefixed(attrs, "a_")


def salt_hot_keys(df: DataFrame, key: str = "url", buckets: int = 8,
                  threshold: int = 10_000) -> DataFrame:
    """Explicit skew salting (north_rule): append a salt column that splits
    keys with > ``threshold`` rows into ``buckets`` sub-keys. Joins then use
    (key, salt) after exploding the small side over the salt range. The
    pairing join applies this guard by default (``pair_mentions``); this
    standalone form salts any other skewed join. AQE's skew-join split
    additionally handles runtime-detected skew below the threshold."""
    counts = df.groupBy(key).count().filter(F.col("count") > threshold)
    return (
        df.join(F.broadcast(counts.select(key)), key, "left_semi")
        .withColumn("_salt", (F.rand(seed=7) * buckets).cast("int"))
        .unionByName(
            df.join(F.broadcast(counts.select(key)), key, "left_anti")
            .withColumn("_salt", F.lit(0))
        )
    )
