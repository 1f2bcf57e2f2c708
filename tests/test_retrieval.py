"""Lexical retrieval: postings, TF-IDF, BM25 top-k
(operators/retrieval.py)."""

import math

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.retrieval import (
    bm25_topk, postings, term_df, tfidf_vectors)

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple cherry cherry the the the"),
    (4, "the quick fox"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestPostings:
    def test_tf_and_df(self, spark):
        post = postings(_docs(spark))
        got = {(r.term, r.doc_id): r.tf for r in post.collect()}
        assert got[("apple", 1)] == 2
        assert got[("apple", 3)] == 1
        assert got[("the", 3)] == 3
        assert ("banana", 3) not in got
        dfs = {r.term: r.df for r in term_df(post).collect()}
        assert dfs == {"apple": 2, "banana": 2, "cherry": 2,
                       "the": 2, "quick": 1, "fox": 1}

    def test_normalization(self, spark):
        d = spark.createDataFrame([(1, "  Apple\n\nBANANA  apple ")],
                                  ["doc_id", "text"])
        got = {(r.term): r.tf for r in postings(d).collect()}
        assert got == {"apple": 2, "banana": 1}


class TestTfIdf:
    def test_weights_hand_computed(self, spark):
        out = tfidf_vectors(_docs(spark))
        got = {(r.doc_id, r.term): r.weight for r in out.collect()}
        # apple in doc 1: tf=2, df=2, N=4
        exp = round((1 + math.log(2)) * math.log(4 / 2), 6)
        assert got[(1, "apple")] == exp
        # quick in doc 4: tf=1, df=1
        assert got[(4, "quick")] == round(math.log(4.0), 6)

    def test_max_df_cap(self, spark):
        out = tfidf_vectors(_docs(spark), max_df_ratio=0.26)
        terms = {r.term for r in out.collect()}
        assert terms == {"quick", "fox"}  # df=2 terms capped at N=4


def _bm25_expected(q_terms, doc_id, k1=1.2, b=0.75):
    """Independent plain-python BM25 for the DOCS corpus."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    score = 0.0
    for term, qtf in q_terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0 or df > 0.5 * n:
            continue
        tf = toks[doc_id].count(term)
        if tf == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        score += (idf * (tf * (k1 + 1))
                  / (tf + k1 * (1 - b + b * dls[doc_id] / avgdl)) * qtf)
    return round(score, 6)


class TestBm25:
    def test_scores_vs_reference(self, spark):
        qs = spark.createDataFrame(
            [(1, "apple cherry"), (2, "quick quick fox")],
            ["query_id", "qtext"])
        out = bm25_topk(_docs(spark), qs, k=10)
        got = {(r.query_id, r.doc_id): (r.score, r.rank)
               for r in out.collect()}
        assert got[(1, 3)][0] == _bm25_expected(
            [("apple", 1), ("cherry", 1)], 3)
        assert got[(1, 1)][0] == _bm25_expected([("apple", 1)], 1)
        assert got[(2, 4)][0] == _bm25_expected(
            [("quick", 2), ("fox", 1)], 4)
        # ranks: dense 1..m per query, ordered by score desc
        for qid in (1, 2):
            ranked = sorted(
                ((v[1], v[0]) for (q, _), v in got.items() if q == qid))
            assert [r for r, _ in ranked] == list(
                range(1, len(ranked) + 1))
            scores = [s for _, s in ranked]
            assert scores == sorted(scores, reverse=True)

    def test_stopword_cap_drops_hot_term(self, spark):
        # 'the' is in 2/4 docs = exactly 0.5 -> kept at 0.5, dropped
        # below it; a query of ONLY capped terms returns no rows
        qs = spark.createDataFrame([(1, "the")], ["query_id", "qtext"])
        assert bm25_topk(_docs(spark), qs, max_df_ratio=0.49).count() == 0
        assert bm25_topk(_docs(spark), qs, max_df_ratio=0.5).count() == 2

    def test_top_k_cut_and_tiebreak(self, spark):
        # identical docs tie on score; the cut at k=1 must take min id
        d = spark.createDataFrame(
            [(1, "apple pie"), (2, "apple pie"), (3, "nothing")],
            ["doc_id", "text"])
        qs = spark.createDataFrame([(1, "apple")],
                                   ["query_id", "qtext"])
        out = bm25_topk(d, qs, k=1, max_df_ratio=1.0).collect()
        assert len(out) == 1 and out[0].doc_id == 1

    def test_query_side_broadcasts(self, spark):
        qs = spark.createDataFrame([(1, "apple")],
                                   ["query_id", "qtext"])
        plan = bm25_topk(_docs(spark), qs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
