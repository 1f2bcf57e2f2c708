"""Fixed-point Lloyd's k-means: planted-cluster recovery, cross-engine
determinism properties (partition-count invariance), tie and empty-cell
semantics."""

import pytest

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.clustering import (
    assign_cells,
    kmeans_fixed_point,
    quantize,
)


def _emb(spark, rows, parts=4):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts)


@pytest.fixture(scope="module")
def planted(spark):
    """Three tight 4-d clusters around distinct corners; ids interleaved
    so the k seed ids (0, 1, 2) land one per true cluster."""
    centers = [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0],
               [0.0, 0.0, 1.0, 1.0]]
    rows = []
    for j in range(30):
        c = centers[j % 3]
        jitter = ((j * 37) % 11 - 5) / 1000.0
        rows.append((j, [v + jitter for v in c]))
    return _emb(spark, rows)


def test_recovers_planted_clusters(spark, planted):
    cents, final = kmeans_fixed_point(planted, k=3, iters=2)
    got = {r["vec_id"]: r["cell"] for r in final.collect()}
    for j in range(30):
        assert got[j] == got[j % 3], f"vec {j} split from its plant"
    assert len({got[0], got[1], got[2]}) == 3
    # centroid of cluster 0 sits near the fixed-point image of origin
    origin = cents[got[0]]
    assert all(abs(v - 4_000_000) < 10_000 for v in origin)


def test_partition_count_invariance(spark, planted):
    """The trainer's integer arithmetic makes the result independent of
    physical partitioning — the property the SQL oracle relies on."""
    a = sorted(map(tuple, kmeans_fixed_point(
        planted.repartition(1), k=3, iters=2)[1].collect()))
    b = sorted(map(tuple, kmeans_fixed_point(
        planted.repartition(13), k=3, iters=2)[1].collect()))
    assert a == b


def test_duplicate_seed_cell_drops_out(spark):
    """vec 0 == vec 1, so seed cells 0 and 1 are identical; every vector
    tie-breaks to the lower label, cell 1 starves and is dropped after
    the first update while surviving labels keep their values."""
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]),
            (3, [0.01, 0.0]), (4, [0.99, 1.0])]
    cents, final = kmeans_fixed_point(_emb(spark, rows, 2), k=3, iters=1)
    cells = {r["vec_id"]: r["cell"] for r in final.collect()}
    assert set(cents) == {0, 2}
    assert cells[0] == cells[1] == cells[3] == 0
    assert cells[2] == cells[4] == 2


def test_assign_cells_tie_breaks_low_label(spark):
    df = spark.createDataFrame([(0, [0.5, 0.5])],
                               "vec_id long, embedding array<double>")
    q = df.select(quantize(F.col("embedding")).alias("xf"))
    cents = {7: [4_000_000, 4_000_000], 3: [5_000_000, 5_000_000]}
    # equidistant by construction: (.5,.5) between (0,0) and (1,1) grids
    got = q.select(assign_cells(F.col("xf"), cents)["cell"]).collect()[0][0]
    assert got == 3
