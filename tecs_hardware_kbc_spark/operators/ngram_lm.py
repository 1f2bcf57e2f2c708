"""CCNet-style n-gram language-model perplexity scoring.

CCNet (Wenzek et al. 2020) ranks every crawled document by the
perplexity of a language model trained on a known-clean reference
corpus (they use Wikipedia + KenLM) and keeps the low-perplexity
head/middle buckets.  This module is that signal re-expressed as pure
DataFrame ops — the last of the three standard web-curation quality
signals next to the heuristic gate (``textstats.quality_score``) and
the hashed-linear classifier (``quality_model``):

* TRAINING (``train_ngram_lm``) — reference docs -> one groupBy over
  exploded word n-grams -> a small (ngram, count) table plus its
  (prefix, count) marginal and the unigram vocabulary size.  The
  reference corpus is by construction tiny next to the crawl (CCNet
  trains on Wikipedia, scores Common Crawl), so at 100 TB the trained
  tables stay broadcast-sized no matter how large the scored corpus is.
* SCORING (``doc_perplexity``) — the hot path: explode each document's
  n-grams (narrow), two BROADCAST left joins against the frozen count
  tables (narrow — the 100 TB side never shuffles), then ONE
  map-side-combined groupBy on doc_id for the per-document average.
  Per n-gram, add-k (Laplace) smoothed conditional probability

      P(w_i | w_{i-n+1..i-1}) = (c(ngram) + k) / (c(prefix) + k*V)

  which stays a proper distribution for unseen n-grams and unseen
  prefixes alike (unseen prefix -> 1/V), so every document gets a
  finite perplexity

      ppl = exp(-avg_i ln P(w_i | prefix_i)).

* BUCKETING (``perplexity_buckets``) — CCNet's head/middle/tail split
  at fixed cutoffs.  Cutoffs are train-time artifacts (the frozen
  constants pattern of ``quality_weights.py`` / ``ivf_centroids.py``),
  NOT a runtime global sort: an exact corpus-wide tertile would be a
  single-partition ordering at 10^12 docs.

No reference counterpart — the hardware-KBC pipeline has no document
LM (beyond-the-reference LLM-data axis, like the rest of the curation
funnel).  Every arithmetic step is md5-free integer counts + ln/exp,
so a SQL oracle replays training AND scoring bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.dedup import norm_text


@dataclass(frozen=True)
class NgramLM:
    """A trained LM: two small count tables + scalars baked at training.

    ``ngrams``: (ngram string, cnt long); ``prefixes``: (prefix string,
    pcnt long); ``vocab_size``: |V| of the reference corpus' unigrams;
    ``n``: the order; ``k``: the add-k smoothing constant.
    """
    ngrams: DataFrame
    prefixes: DataFrame
    vocab_size: int
    n: int
    k: float


def words_col(text) -> Column:
    """Shared tokenization (identical to dedup/textstats): lowercase,
    whitespace collapse, split on single spaces."""
    return F.split(norm_text(text), " ")


def ngrams_col(text, n: int) -> Column:
    """All word n-grams of ``text`` in order, WITH repetition (an LM
    scores every position).  Docs with fewer than ``n`` words yield an
    empty array (they get no LM score; filter or coalesce downstream)."""
    words = words_col(text)
    # positions 1 .. len-n+1; sequence() on an empty range yields a
    # descending sequence, so gate on size >= n explicitly
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def train_ngram_lm(ref_docs: DataFrame, n: int = 2, k: float = 1.0,
                   text_col: str = "text",
                   materialize: bool = True) -> NgramLM:
    """One pass over the (small) reference corpus: n-gram counts, their
    prefix marginal, and the unigram vocabulary size.

    The three aggregations share the single exploded-n-gram scan; the
    prefix table is derived from the n-gram table (sum of cnt by
    prefix), not re-counted from text, so they can never disagree.

    ``materialize`` localCheckpoints both count tables: the LM is a
    build-once frozen artifact, and every scoring query broadcasts it —
    without this, each scoring run would re-run training lineage."""
    if n < 2:
        raise ValueError("train_ngram_lm needs n >= 2 (conditional LM)")
    grams = ref_docs.select(
        F.explode(ngrams_col(F.col(text_col), n)).alias("ngram"))
    ngram_counts = (grams.groupBy("ngram")
                    .agg(F.count("*").alias("cnt")))
    prefix_of = F.substring_index(F.col("ngram"), " ", n - 1)
    prefix_counts = (ngram_counts
                     .groupBy(prefix_of.alias("prefix"))
                     .agg(F.sum("cnt").alias("pcnt")))
    if materialize:
        ngram_counts = ngram_counts.localCheckpoint()
        prefix_counts = prefix_counts.localCheckpoint()
    vocab_size = (ref_docs
                  .select(F.explode(words_col(F.col(text_col)))
                          .alias("w"))
                  .agg(F.countDistinct("w"))
                  .collect()[0][0]) or 0
    if vocab_size == 0:
        raise ValueError("reference corpus has no tokens")
    return NgramLM(ngrams=ngram_counts, prefixes=prefix_counts,
                   vocab_size=int(vocab_size), n=n, k=float(k))


def doc_perplexity(docs: DataFrame, lm: NgramLM, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_grams, ppl): add-k smoothed n-gram perplexity of every
    document under ``lm``.  Docs with fewer than ``lm.n`` words are
    returned with n_grams = 0 and ppl = NULL (no evidence either way —
    the caller decides; ``curate`` keeps them).

    Plan shape: narrow explode -> two broadcast left joins (the corpus
    side never moves) -> one groupBy(doc_id) whose partial aggregation
    reduces each partition to one row per doc before the only shuffle.
    """
    k, V = lm.k, lm.vocab_size
    positions = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(ngrams_col(F.col(text_col), lm.n)).alias("ngram"))
    prefix_of = F.substring_index(F.col("ngram"), " ", lm.n - 1)
    scored = (positions
              .withColumn("prefix", prefix_of)
              .join(F.broadcast(lm.ngrams), "ngram", "left")
              .join(F.broadcast(lm.prefixes), "prefix", "left")
              .select(
                  "doc_id",
                  F.col("ngram").isNotNull().alias("has_gram"),
                  (F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(k))
                         / (F.coalesce(F.col("pcnt"), F.lit(0))
                            + F.lit(k * V)))).alias("lp")))
    return (scored.groupBy("doc_id")
            .agg(F.sum(F.col("has_gram").cast("long")).alias("n_grams"),
                 F.sum(F.when(F.col("has_gram"), F.col("lp"))).alias("_slp"))
            .select("doc_id", "n_grams",
                    F.when(F.col("n_grams") > 0,
                           F.exp(-F.col("_slp") / F.col("n_grams")))
                    .alias("ppl")))


def perplexity_buckets(scored: DataFrame, head_cutoff: float,
                       tail_cutoff: float,
                       ppl_col: str = "ppl") -> DataFrame:
    """CCNet's head/middle/tail labels at FIXED cutoffs (train-time
    artifacts — never a runtime global sort).  NULL ppl (too-short
    docs) buckets as 'unscored'."""
    if not head_cutoff < tail_cutoff:
        raise ValueError("head_cutoff must be < tail_cutoff")
    p = F.col(ppl_col)
    return scored.withColumn(
        "ppl_bucket",
        F.when(p.isNull(), "unscored")
        .when(p <= head_cutoff, "head")
        .when(p <= tail_cutoff, "middle")
        .otherwise("tail"))


def suggest_cutoffs(scored: DataFrame, ppl_col: str = "ppl",
                    probs: tuple[float, float] = (1 / 3, 2 / 3),
                    relative_error: float = 0.001) -> tuple[float, float]:
    """Train-time helper: approximate tertile cutoffs over a scored
    SAMPLE (distributed approx_percentile sketch — O(1) driver memory,
    unlike an exact percentile which collects per-group values).  Freeze
    the result next to the model; do not call this on the full corpus
    per run."""
    row = scored.filter(F.col(ppl_col).isNotNull()).agg(
        F.percentile_approx(ppl_col, list(probs),
                            int(1 / relative_error)).alias("q")
    ).collect()[0]["q"]
    return float(row[0]), float(row[1])
