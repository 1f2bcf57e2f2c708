"""Similarity search: exact top-k correctness + LSH recall vs exact."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 16)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()


def _exact_topk_numpy(emb_rows, k=5):
    ids = [r["vec_id"] for r in emb_rows]
    m = np.array([r["embedding"] for r in emb_rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    out = {}
    for qi, q in enumerate(ids):
        order = sorted(
            ((float(sims[qi, j]), ids[j]) for j in range(len(ids)) if j != qi),
            key=lambda t: (-t[0], t[1]))
        out[q] = [v for _, v in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    expect = _exact_topk_numpy(rows, k=5)
    queries = emb.filter(F.col("vec_id") < 10) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for q in range(10):
        assert by_q[q] == expect[q], q


def test_lsh_topk_recall(spark, emb):
    rows = emb.collect()
    expect = _exact_topk_numpy(rows, k=5)
    queries = emb.filter(F.col("vec_id") < 20) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_topk(emb, queries, k=5, planes=6, probe_bits=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for q in range(20):
        total += 5
        hits += len(set(expect[q]) & by_q.get(q, set()))
    recall = hits / total
    # 2-bit multi-probe over 6 planes scans ~1/3 of buckets; on uniform
    # random data (the worst case for LSH) recall should still clear 0.6
    assert recall >= 0.6, recall


def test_cosine_pairs_threshold(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]) for r in cosine_pairs(emb, 0.9).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_lsh_topk_recall_clustered(spark):
    """Recall gate at default planes/probes on clustered data (the regime
    ANN serves): recall@5 vs exact >= 0.9."""
    rng = np.random.RandomState(5)
    rows = []
    vid = 0
    for c in range(30):
        base = rng.randn(16)
        for _ in range(6):
            v = base + rng.randn(16) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    expect = _exact_topk_numpy(emb.collect(), k=5)
    queries = emb.filter(F.col("vec_id") < 30) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_topk(emb, queries, k=5)  # defaults: planes=6, probe_bits=1
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(set(expect[q]) & by_q.get(q, set())) for q in range(30))
    assert hits / (30 * 5) >= 0.9, hits / 150


def test_ivf_topk_recall_clustered(spark):
    """IVF (k-means cells + n_probe) recall gate vs exact on clustered
    data at defaults: recall@5 >= 0.9."""
    from tecs_hardware_kbc_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(20):
        base = rng.randn(16) * 3
        for _ in range(8):
            v = base + rng.randn(16) * 0.1
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    expect = _exact_topk_numpy(emb.collect(), k=5)
    queries = emb.filter(F.col("vec_id") < 20) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_topk(emb, queries, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(set(expect[q]) & by_q.get(q, set())) for q in range(20))
    assert hits / (20 * 5) >= 0.9, hits / 100
