"""Distributed k-means (Lloyd's iterations) as pure DataFrame plans.

Embedding-space clustering is the organizing primitive of several
curation recipes this engine ships consumers for — SemDeDup's cells
(dedup.semantic_dedup), IVF partition pruning (similarity.ivf_topk),
and cluster-balanced training mixes. ``similarity.train_centroids``
already wraps spark.ml's float k-means for production quantizer
training; this module adds ``kmeans_fixed_point``, a Lloyd's trainer
whose every step is EXACT integer arithmetic so the whole training run
(not just a frozen artifact) can be replayed bit-for-bit by any SQL
engine:

* vectors are quantized once to a fixed-point grid:
  ``xf_i = floor((x_i + shift) * scale)`` — floor of an IEEE double
  product is deterministic across engines (no round-half ties, unlike
  round()); ``shift`` makes every component non-negative so integer
  division below has one semantics (Python ``//`` floors, DuckDB ``//``
  truncates — they agree only at >= 0);
* assignment = argmin of the exact integer squared distance, ties to
  the lowest cell label (both engines: sort by (dist, label), take the
  first);
* update = per-dimension integer sums // member count; cells that lose
  every member are DROPPED (labels of surviving cells never renumber).

Scale shape per iteration: one narrow projection for the assignment
(centroids are unrolled literals — k x dim doubles is broadcast-sized
by construction) + one groupBy(cell) with map-side partial aggregation;
driver state is O(k x dim) integers. The quantized grid costs ~1e-6
resolution per component — irrelevant for cluster geometry, decisive
for cross-engine replay (the same reasoning as the frozen md5-seeded
coins elsewhere in this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

DEFAULT_SCALE = 1_000_000
DEFAULT_SHIFT = 4.0


def quantize(vec, scale: int = DEFAULT_SCALE,
             shift: float = DEFAULT_SHIFT) -> Column:
    """array<long> fixed-point image of a float vector column.

    floor((x + shift) * scale): the double product is computed from the
    same parquet bits in every engine, and floor has no tie semantics,
    so the grid is engine-independent. shift MUST make every component
    non-negative (callers own that bound; default 4.0 covers unit-scale
    embeddings many times over)."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor((x + F.lit(float(shift))) * F.lit(int(scale)))
        .cast("long"))


def _sq_dist(xf, centroid: list[int]) -> Column:
    """Exact integer squared distance to one fixed-point centroid."""
    lit = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(xf, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def assign_cells(xf, centroids: dict[int, list[int]]) -> Column:
    """struct(cell, dist): nearest centroid by exact integer distance,
    ties to the lowest cell label. ``centroids`` maps label -> vector;
    labels need not be contiguous (cells drop out across iterations)."""
    labels = sorted(centroids)
    dists = F.array(*[_sq_dist(xf, centroids[l]) for l in labels])
    labs = F.array(*[F.lit(int(l)) for l in labels])
    pairs = F.array_sort(F.zip_with(
        dists, labs,
        lambda d, l: F.struct(d.alias("dist"), l.alias("cell"))))
    best = F.element_at(pairs, 1)
    return F.struct(best["cell"].alias("cell"), best["dist"].alias("dist"))


def kmeans_fixed_point(emb: DataFrame, k: int = 8, iters: int = 2,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       scale: int = DEFAULT_SCALE,
                       shift: float = DEFAULT_SHIFT,
                       ) -> tuple[dict[int, list[int]], DataFrame]:
    """Deterministic Lloyd's k-means on the fixed-point grid.

    Init = the quantized vectors of the k smallest ids (label = rank in
    id order), the standard deterministic seeding for replayable runs.
    Then ``iters`` rounds of (assign -> update); the returned DataFrame
    is the FINAL assignment (vec_id, cell, dist) against the last
    centroids, and the dict maps surviving cell label -> fixed-point
    centroid. Every returned number is an exact integer, so a SQL
    engine replaying the same chain produces identical rows — see the
    emb_kmeans driver entry, which replays the entire training run
    (init, both iterations, final assignment) as one DuckDB query.

    Per iteration: one projection (centroid literals, no shuffle) + one
    groupBy(cell) aggregation (map-side combine; k cells). Driver holds
    O(k x dim) ints. At 10^12 rows the assignment is embarrassingly
    parallel and the update shuffle carries k x dim longs per
    partition."""
    # pin the quantized vectors: init, every assign/update round and the
    # final assignment all scan q, and without the checkpoint each of the
    # iters+2 actions re-reads the source and re-quantizes (guide §5 —
    # reused AND non-trivial to recompute). O(rows x dim) ints, the same
    # footprint every consumer materializes anyway.
    q = (emb.select(F.col(id_col).alias("vec_id"),
                    quantize(F.col(vec_col), scale, shift).alias("xf"))
         .localCheckpoint(eager=True))
    seeds = q.orderBy("vec_id").limit(k).collect()
    cents: dict[int, list[int]] = {
        i: [int(v) for v in r["xf"]] for i, r in enumerate(seeds)}
    dim = len(next(iter(cents.values())))

    for _ in range(iters):
        assigned = q.select(
            "vec_id", "xf", assign_cells(F.col("xf"), cents)["cell"]
            .alias("cell"))
        stats = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("xf", i + 1)).alias(f"s{i}")
              for i in range(dim)]).collect()
        # non-negative grid => Python // (floor) == SQL // (trunc)
        cents = {int(r["cell"]): [int(r[f"s{i}"]) // int(r["n"])
                                  for i in range(dim)]
                 for r in stats}

    final = q.select("vec_id",
                     assign_cells(F.col("xf"), cents).alias("a")) \
        .select("vec_id", F.col("a.cell").alias("cell"),
                F.col("a.dist").alias("dist"))
    return cents, final
