"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk``   — brute-force exact top-k: broadcast the (small) query
  set against the corpus, per-query window top-k. The dot product is a JVM
  higher-order function (``zip_with`` + ``aggregate``) — no Python.
* ``cosine_pairs``  — exact all-pairs cosine >= threshold (verification
  path; quadratic, test-scale only).
* ``lsh_topk``      — the scale path: random-hyperplane sign buckets with
  multi-probe (hamming-adjacent buckets), exact rerank within probed
  buckets. Sub-linear candidate sets at 10^12 vectors; recall tunable via
  ``planes``/``probe_bits``.

IVF-style partition pruning falls out of the bucket column: store the
corpus partitioned by bucket and Catalyst prunes non-probed buckets at the
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-k per query in two levels (guide §2.5): first a
    row_number over (query_id, input partition) prunes each scan
    partition to its local k candidates per query — the global top-k
    is necessarily a subset of the union of per-partition top-ks — so
    the final per-query window ranks <= k x #partitions survivors
    instead of the full scored set. A single window partitioned by
    query_id alone funnels EVERY scored row of a query through one
    task (a handful of hot queries = a handful of busy cores at any
    corpus size); the pruning level spreads that work across the
    (query_id, partition) grid. The partition id only selects a
    superset, so the result is identical under any physical split."""
    ord_ = (F.desc("cosine"), F.asc("vec_id"))
    local = (
        scored.withColumn("_p", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(
            Window.partitionBy("query_id", "_p").orderBy(*ord_)))
        .filter(F.col("_r") <= k).drop("_p", "_r"))
    w = Window.partitionBy("query_id").orderBy(*ord_)
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """(query_id, vec_id, cosine, rank<=k). Queries are broadcast; ties
    break by vec_id for determinism."""
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("vec_id")) \
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    return _topk_per_query(scored, k)


def cosine_pairs(emb: DataFrame, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b).filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _sign_bucket(vec_col, planes_matrix) -> Column:
    bits = None
    for p, plane in enumerate(planes_matrix):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        term = F.when(dot(vec_col, arr) > 0, 2 ** p).otherwise(0)
        bits = term if bits is None else bits + term
    return bits


def train_centroids(corpus: DataFrame, n_cells: int = 16, seed: int = 42,
                    vec_col: str = "embedding") -> list[list[float]]:
    """Coarse quantizer training (spark.ml k-means) — run ONCE, then pass
    the converged centroids to ``ivf_topk`` (and embed them as literals in
    any oracle replay; see operators/ivf_centroids.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>"))
        .alias("features"))
    km = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    return [[float(x) for x in c] for c in km.clusterCenters()]


def nearest_cells(vec, centers, n: int):
    """Indices of the n nearest centroids, as an array column (the
    centroid table is tiny — unrolled literals stay JVM-side).

    "Nearest" is scored as ``dot(v, c) - |c|²/2`` (argmax), identical to
    euclidean argmin but one fused dot product per centroid — and exactly
    replayable in DuckDB as ``list_inner_product(v, c) - |c|²/2``. Ties
    break toward the lower cell index in both engines."""
    # Fold starts at 0.0 and the -|c|²/2 constant is subtracted AFTER the
    # sum (finish lambda) so the FP summation order matches the DuckDB
    # oracle's `list_inner_product(v, c) - |c|²/2` exactly — seeding the
    # accumulator with the constant can flip a near-tie cell assignment.
    scores = F.array(*[
        F.aggregate(
            F.zip_with(vec,
                       F.array(*[F.lit(float(x)) for x in centers[c]]),
                       lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
            lambda acc: acc - F.lit(
                0.5 * sum(float(x) * float(x) for x in centers[c])),
        ).alias(f"_s{c}")
        for c in range(len(centers))
    ])
    idx = F.sequence(F.lit(0), F.lit(len(centers) - 1))
    pairs = F.array_sort(F.zip_with(
        scores, idx, lambda s, i: F.struct((-s).alias("d"), i.alias("i"))))
    return F.slice(F.transform(pairs, lambda p: p["i"]), 1, n)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 3, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the partition-pruning scale
    path: a coarse k-means quantizer assigns every corpus vector to a
    cell; each query probes only its ``n_probe`` nearest cells and reranks
    exactly inside them.

    ``centroids``: a frozen quantizer (list of vectors). When omitted,
    k-means is trained on the corpus per call — convenient, but at scale
    (and for deterministic replay) train once via ``train_centroids`` and
    pass the result.

    At 10^12 vectors the corpus is WRITTEN partitioned by ``cell`` so the
    probe becomes Catalyst partition pruning at the scan — the fraction of
    data touched is n_probe / n_cells. Centroids are a broadcast-sized
    table. Recall vs the exact baseline is pinned by tests/test_similarity.
    """
    centers = (centroids if centroids is not None
               else train_centroids(corpus, n_cells, seed, vec_col))

    cvec = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("vec_id"), cvec.alias("cv"),
        F.element_at(nearest_cells(cvec, centers, 1), 1).alias("cell"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(nearest_cells(F.col(vec_col).cast("array<double>"),
                                centers, n_probe)).alias("cell"),
    )
    scored = (
        F.broadcast(q).join(c, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    return _topk_per_query(scored, k)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             planes: int = 6, probe_bits: int = 1, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: compare only vectors whose sign bucket is within
    ``probe_bits`` bit flips of the query's bucket (multi-probe LSH)."""
    import numpy as np

    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} bigint, {id_col} bigint, cosine double, rank int")
    hp = np.random.RandomState(seed).randn(planes, first["d"])

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"),
                      _sign_bucket(F.col(vec_col), hp).alias("bucket"))
    # probe set: the query bucket plus every bucket within probe_bits flips
    probes = [0]
    if probe_bits >= 1:
        probes += [2 ** p for p in range(planes)]
    if probe_bits >= 2:
        probes += [2 ** p | 2 ** q
                   for p in range(planes) for q in range(p + 1, planes)]
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _sign_bucket(F.col(vec_col), hp).alias("qbucket"),
    ).withColumn(
        "bucket",
        F.explode(F.array(*[
            F.col("qbucket").bitwiseXOR(F.lit(m)) for m in probes
        ])),
    )
    scored = (
        F.broadcast(q).join(c, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    # no (query, vec) duplicates possible: the probe masks are distinct,
    # so the probed buckets of one query are distinct, and each corpus
    # vector lives in exactly one bucket
    return _topk_per_query(scored, k)
