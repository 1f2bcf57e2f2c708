"""Fuzzy entity resolution (canonicalize.normalize_name /
fuzzy_alias_edges / resolve_entity_names)."""

from tecs_hardware_kbc_spark.operators.canonicalize import (
    fuzzy_alias_edges, resolve_entity_names)


def _names(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "name string")


def test_edges_within_block_and_distance(spark):
    got = {tuple(r) for r in fuzzy_alias_edges(
        _names(spark, ["BC546", "BC546A", "BC547", "LM324", "LM-324"]),
        max_dist=1).collect()}
    # bc546~bc546a (1 insert, same 'bc54' block), bc546~bc547 (1 sub)
    assert ("bc546", "bc546a") in got
    assert ("bc546", "bc547") in got
    # LM324 and LM-324 normalize to the SAME string -> no self edge
    assert not any(u == v for u, v in got)
    assert not any("lm324" in e for e in got)


def test_blocking_limits_comparisons(spark):
    # 'bc5' vs 'bc5a': prefix-4 blocks differ -> pair out of reach
    got = fuzzy_alias_edges(_names(spark, ["BC5", "BC5A"]),
                            max_dist=1).collect()
    assert got == []
    # shrink the block and the pair is found
    got = {tuple(r) for r in fuzzy_alias_edges(
        _names(spark, ["BC5", "BC5A"]), max_dist=1,
        block_chars=3).collect()}
    assert got == {("bc5", "bc5a")}


def test_hot_block_capped(spark):
    hot = ["PART%03d" % i for i in range(20)]  # all share block 'part'
    assert fuzzy_alias_edges(_names(spark, hot), max_dist=1,
                             max_block=10).collect() == []
    assert len(fuzzy_alias_edges(_names(spark, hot), max_dist=1,
                                 max_block=100).collect()) > 0


def test_resolve_transitive_and_identity(spark):
    out = {r.name: r.canonical for r in resolve_entity_names(
        _names(spark, ["BC546", "BC546A", "BC546AB", "bc-546",
                       "LM324", "NE555"]), max_dist=1).collect()}
    # chain bc546 - bc546a - bc546ab unifies transitively; the raw
    # spelling variant rides along via normalization
    assert out["BC546"] == out["BC546A"] == out["BC546AB"] \
        == out["bc-546"] == "bc546"
    # singletons canonicalize to their own normalized form
    assert out["LM324"] == "lm324"
    assert out["NE555"] == "ne555"


def test_resolve_partition_invariance(spark):
    names = _names(spark, ["P%04dX" % (i % 37) for i in range(300)]
                   + ["P%04d" % (i % 37) for i in range(300)])
    a = sorted(map(tuple,
                   resolve_entity_names(names.repartition(1)).collect()))
    b = sorted(map(tuple,
                   resolve_entity_names(names.repartition(7)).collect()))
    assert a == b
