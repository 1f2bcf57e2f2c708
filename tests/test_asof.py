"""asof_pair row-consistency semantics (linking.py).

The partner must be the latest right ROW as a unit: a NULL field in that
row travels with it (never back-filled from an older row), and right rows
tying on the order column resolve deterministically via struct ordering.
"""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.linking import asof_pair


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_latest_at_or_before(spark):
    left = _df(spark, [("d1", 5, "L5"), ("d1", 1, "L1")],
               "doc string, pos int, lval string")
    right = _df(spark, [("d1", 2, "R2"), ("d1", 4, "R4"), ("d1", 9, "R9")],
                "doc string, pos int, rval string")
    out = asof_pair(left, right, ["doc"], "pos", ["lval"], ["rval"])
    got = {(r["lval"], r["rval"]) for r in out.collect()}
    # pos=1 has no right row at-or-before -> dropped; pos=5 pairs with R4
    assert got == {("L5", "R4")}


def test_asof_exact_alignment_visible(spark):
    left = _df(spark, [("d1", 3, "L3")], "doc string, pos int, lval string")
    right = _df(spark, [("d1", 3, "R3")], "doc string, pos int, rval string")
    out = asof_pair(left, right, ["doc"], "pos", ["lval"], ["rval"])
    assert [(r["lval"], r["rval"]) for r in out.collect()] == [("L3", "R3")]


def test_asof_partner_is_one_row_not_stitched(spark):
    """ADVICE r4: a NULL field in the latest right row must NOT be
    back-filled from an earlier right row — all carried values come from
    the same row."""
    left = _df(spark, [("d1", 10, "L")], "doc string, pos int, lval string")
    right = _df(spark,
                [("d1", 2, "old_a", "old_b"), ("d1", 5, "new_a", None)],
                "doc string, pos int, ra string, rb string")
    out = asof_pair(left, right, ["doc"], "pos", ["lval"], ["ra", "rb"])
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["ra"], rows[0]["rb"]) == ("new_a", None)


def test_asof_tied_right_rows_deterministic(spark):
    """Two right rows at the same pos: the pick is the struct-greatest one,
    stable across shuffles/partitionings."""
    left = _df(spark, [("d1", 7, "L")], "doc string, pos int, lval string")
    right = _df(spark, [("d1", 7, "aaa"), ("d1", 7, "zzz")],
                "doc string, pos int, rval string")
    expect = None
    for parts in (1, 7):
        out = asof_pair(left.repartition(parts),
                        right.repartition(parts).sortWithinPartitions(
                            F.rand(seed=parts)),
                        ["doc"], "pos", ["lval"], ["rval"])
        got = [r["rval"] for r in out.collect()]
        assert got == ["zzz"]  # struct ordering -> last(ignorenulls) = max
        expect = expect or got
        assert got == expect
