"""Lexical retrieval: inverted-index postings, TF-IDF, BM25 top-k.

The missing lexical half of the similarity surface (similarity.py is
the embedding half): benchmark decontamination, query-based corpus
audits and hard-negative mining all start from "find the documents
containing these terms, ranked". At 100 TB the inverted index IS a
DataFrame — ``postings`` builds (term, doc_id, tf) with one tokenize +
explode + map-combinable groupBy, and query scoring is a join of the
KB-sized query-term table (broadcast) against the postings, so the
corpus shuffles once on term and the score agg combines map-side on
(query_id, doc_id).

Skew axis: stopword-grade terms. A term in half the corpus produces a
posting list with billions of rows and near-zero idf; ``max_df_ratio``
drops such terms BEFORE the join (the dedup.py hot-shingle guard on
the retrieval axis — Lucene ships the same cap as stopword filtering).

Determinism discipline (matches fusion.py): scores are per-term
products of fixed-shape double expressions — cross-engine-exact, ln
included (pinned by the doc_perplexity oracle) — summed by a SORTED
left fold, never a partition-order-dependent SUM, then snapped to the
1e-6 grid. Tokenization reuses dedup.norm_text so the retrieval
vocabulary is byte-identical to the dedup/textstats vocabulary.

Reference scope note: the reference pipeline has no retrieval stage
(its corpus fits a manual gold set); this module is part of the
LLM-training-data toolkit the task mandates beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tecs_hardware_kbc_spark.operators.dedup import norm_text

SCORE_DECIMALS = 6


def doc_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, term) — one row per token occurrence, norm_text-lowered,
    whitespace-split, empties dropped. One projection + one explode."""
    return (docs
            .select(F.col(id_col),
                    F.explode(F.split(norm_text(F.col(text_col)), " "))
                    .alias("term"))
            .filter(F.col("term") != ""))


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """The inverted index as a table: (term, id, tf). Partitioned by
    term after the groupBy, which is exactly the layout the scoring
    join wants."""
    return (doc_terms(docs, id_col, text_col)
            .groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf")))


def term_df(post: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) — document frequency per term. ``post`` already has
    one row per (term, doc), so this is a plain count."""
    return post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_vectors(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_df_ratio: float = 1.0) -> DataFrame:
    """(id, term, tf, df, weight): sublinear-tf TF-IDF,
    ``weight = (1 + ln tf) * ln(N / df)`` on the 1e-6 grid. Terms with
    df > max_df_ratio * N are dropped before any weighting (their
    posting lists are the skew axis and their idf ~ 0)."""
    post = postings(docs, id_col, text_col)
    n_docs = float(docs.count())
    dfs = term_df(post, id_col)
    if max_df_ratio < 1.0:
        dfs = dfs.filter(F.col("df") <= max_df_ratio * n_docs)
    w = ((1.0 + F.log(F.col("tf").cast("double")))
         * F.log(F.lit(n_docs) / F.col("df").cast("double")))
    return (post.join(dfs, "term")
            .select(id_col, "term", "tf", "df",
                    F.round(w, SCORE_DECIMALS).alias("weight")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              max_df_ratio: float = 0.5,
              id_col: str = "doc_id", text_col: str = "text",
              qid_col: str = "query_id",
              qtext_col: str = "qtext") -> DataFrame:
    """(query_id, id, score, rank): Okapi BM25 top-k per query.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (Lucene's
    never-negative form); per-term contribution
    ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)) * qtf``.
    Per-(query, doc) totals use a sorted fold, not SUM, so the score is
    identical under any partitioning; rank breaks score ties on id so
    the cut at k is deterministic. The query-term table broadcasts (a
    query workload is KB-to-MB); the postings shuffle once on term,
    already their groupBy layout. max_df_ratio drops stopword-grade
    terms before the join — see module docstring."""
    # the index feeds df counts, doc lengths AND the scoring join —
    # pin it so the corpus is tokenized once, not once per consumer
    post = postings(docs, id_col, text_col).localCheckpoint()
    n_docs = float(docs.count())
    dl = post.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # degenerate corpora (all-empty texts) have no postings: avg(dl) is
    # NULL — scoring would be empty anyway, so guard the scalar
    avgdl = float(dl.agg(F.avg("dl")).collect()[0][0] or 1.0)
    qterms = (doc_terms(queries, qid_col, qtext_col)
              .groupBy(qid_col, "term")
              .agg(F.count(F.lit(1)).alias("qtf"))
              .localCheckpoint())
    # df counts are corpus-vocabulary sized — restrict them to the query
    # vocabulary BEFORE broadcasting (the query workload is the KB-sized
    # table; the full term_df table is not broadcastable at web scale)
    dfs = (term_df(post, id_col)
           .filter(F.col("df") <= max_df_ratio * n_docs)
           .join(F.broadcast(qterms.select("term").distinct()), "term"))
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl").cast("double")
                       / F.lit(avgdl))
    contrib = (idf * (tf * (k1 + 1.0)) / denom
               * F.col("qtf").cast("double"))
    scored = (post
              .join(F.broadcast(qterms), "term")
              .join(F.broadcast(dfs), "term")
              .join(dl, id_col)
              .select(qid_col, id_col, contrib.alias("_c")))
    totals = (scored.groupBy(qid_col, id_col)
              .agg(F.round(
                  F.aggregate(F.array_sort(F.collect_list("_c")),
                              F.lit(0.0), lambda a, q: a + q),
                  SCORE_DECIMALS).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"),
                                            F.asc(id_col))
    return (totals.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
