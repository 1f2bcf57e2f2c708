"""KG query surface: BGP matching and path-rule mining."""

import pytest

from tecs_hardware_kbc_spark.operators.kg_query import (
    match_bgp, mine_path_rules, _order_patterns)

TRIPLES = [
    # made_by: part -> maker
    ("p1", "made_by", "m1"),
    ("p2", "made_by", "m1"),
    ("p3", "made_by", "m2"),
    # located_in: maker -> country
    ("m1", "located_in", "de"),
    ("m2", "located_in", "jp"),
    # product_country: part -> country (p2 missing, p3 contradicts)
    ("p1", "product_country", "de"),
    ("p3", "product_country", "de"),
    # an unrelated fact p3 also asserts (PCA vs std denominator)
    ("p1", "likes", "p1"),
]


@pytest.fixture(scope="module")
def kb(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def test_bgp_two_hop_join(kb):
    rows = match_bgp(kb, [("?p", "made_by", "?m"),
                          ("?m", "located_in", "?c")]).collect()
    got = {(r["p"], r["m"], r["c"]) for r in rows}
    assert got == {("p1", "m1", "de"), ("p2", "m1", "de"),
                   ("p3", "m2", "jp")}


def test_bgp_constant_object_prunes(kb):
    rows = match_bgp(kb, [("?p", "made_by", "?m"),
                          ("?m", "located_in", "de")]).collect()
    assert {r["p"] for r in rows} == {"p1", "p2"}
    assert set(rows[0].asDict()) == {"p", "m"}


def test_bgp_repeated_var_within_pattern(kb):
    rows = match_bgp(kb, [("?x", "likes", "?x")]).collect()
    assert [(r["x"],) for r in rows] == [("p1",)]


def test_bgp_all_constant_pattern_is_existence_gate(kb):
    pat = [("?p", "made_by", "?m"), ("m1", "located_in", "de")]
    assert match_bgp(kb, pat).count() == 3         # fact holds: no-op
    pat_missing = [("?p", "made_by", "?m"), ("m1", "located_in", "jp")]
    assert match_bgp(kb, pat_missing).count() == 0  # fact absent: empty


def test_bgp_order_avoids_cartesian(kb):
    # given in the worst order: the two var-only-connected patterns
    # are NOT adjacent; the planner must reorder to join on ?m first.
    pats = [("?p", "made_by", "?m"), ("?q", "product_country", "?c"),
            ("?m", "located_in", "?c")]
    ordered = _order_patterns(pats)
    # every pattern after the first shares a var with the prefix
    bound = set(t for t in ordered[0] if t.startswith("?"))
    for pat in ordered[1:]:
        vs = {t for t in pat if t.startswith("?")}
        assert vs & bound
        bound |= vs
    df = match_bgp(kb, pats)
    assert "CartesianProduct" not in df._jdf.queryExecution().toString()
    got = {(r["p"], r["q"]) for r in df.collect()}
    # ?c bindings: de via m1 (p1,p2) x {p1,p3}; jp via m2 (p3) x {}
    assert got == {("p1", "p1"), ("p1", "p3"),
                   ("p2", "p1"), ("p2", "p3")}


def test_bgp_rejects_bad_patterns(kb):
    with pytest.raises(ValueError):
        match_bgp(kb, [])
    with pytest.raises(ValueError):
        match_bgp(kb, [("?x", "made_by")])
    with pytest.raises(ValueError):
        match_bgp(kb, [("?", "made_by", "?m")])


def test_mine_path_rules_metrics(kb):
    rules = {(r["r1"], r["r2"], r["r3"]): r
             for r in mine_path_rules(kb, min_support=1).collect()}
    r = rules[("made_by", "located_in", "product_country")]
    # body pairs: (p1,de) (p2,de) (p3,jp); heads match only (p1,de)
    assert r["support"] == 1 and r["n_body"] == 3
    assert r["confidence"] == pytest.approx(1 / 3, abs=1e-5)
    # PCA: x with ANY product_country fact -> p1, p3 -> 2 body pairs
    assert r["pca_confidence"] == pytest.approx(1 / 2)


def test_mine_path_rules_min_support_filters(kb):
    assert mine_path_rules(kb, min_support=2).where(
        "r3 = 'product_country'").count() == 0


def test_mine_path_rules_mid_degree_cap(spark):
    # hub mid 'h' (degree 11) is dropped; quiet chain survives
    rows = ([(f"a{i}", "r1", "h") for i in range(10)]
            + [("h", "r2", "z"), ("a0", "r3", "z"),
               ("q1", "r1", "q2"), ("q2", "r2", "q3"),
               ("q1", "r3", "q3")])
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    uncapped = mine_path_rules(t, min_support=1)
    got = {tuple(r) for r in uncapped.select("r1", "r2", "r3",
                                             "support").collect()}
    assert ("r1", "r2", "r3", 2) in got
    capped = mine_path_rules(t, min_support=1, max_mid_degree=5)
    got = {tuple(r) for r in capped.select("r1", "r2", "r3",
                                           "support").collect()}
    assert ("r1", "r2", "r3", 1) in got     # only the quiet chain


def test_reachability_cycle_safe_min_hops(spark):
    from tecs_hardware_kbc_spark.operators.kg_query import reachability
    e = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"),
         ("d", "r", "a")], ["subj", "pred", "obj"])
    got = {(r["src"], r["dst"]): r["hops"]
           for r in reachability(e, max_hops=3).collect()}
    assert got[("a", "b")] == 1 and got[("d", "a")] == 1
    assert got[("a", "c")] == 2 and got[("d", "b")] == 2
    assert got[("a", "a")] == 3 and got[("d", "c")] == 3
    assert len(got) == 12                   # 4 + 4 + 4, no dup pairs


def test_reachability_early_stop_and_bounds(spark):
    from tecs_hardware_kbc_spark.operators.kg_query import reachability
    line = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c")], ["subj", "pred", "obj"])
    assert reachability(line, max_hops=5).count() == 3  # drains at h=2
    assert reachability(line, max_hops=1).count() == 2  # edges only
    with pytest.raises(ValueError):
        reachability(line, max_hops=0)


def test_predicate_stats_values(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import predicate_stats
    got = {r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
           for r in predicate_stats(kb).collect()}
    assert got == {"made_by": (3, 3, 2), "located_in": (2, 2, 2),
                   "product_country": (2, 2, 1), "likes": (1, 1, 1)}


def test_stats_aware_ordering_beats_constant_count():
    from tecs_hardware_kbc_spark.operators.kg_query import (
        _estimate_card, _order_patterns)
    stats = {"big": (1000, 100, 100), "small": (2, 2, 2)}
    pats = [("?x", "big", "?y"), ("?x", "small", "?z")]
    # constant-count heuristic ties -> keeps original order
    assert _order_patterns(pats)[0][1] == "big"
    # cardinality estimates put the 2-row scan first
    assert _order_patterns(pats, stats)[0][1] == "small"
    # constant subject divides by distinct subjects: 1000/100 = 10
    assert _estimate_card(("c1", "big", "?y"), stats, 1002.0) == 10.0
    # variable predicate costs the whole table
    assert _estimate_card(("?s", "?p", "?o"), stats, 1002.0) == 1002.0
    # unknown predicate is provably empty -> estimate 0, runs first
    assert _estimate_card(("?s", "nope", "?o"), stats, 1002.0) == 0.0


def test_match_bgp_accepts_stats_dataframe(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import predicate_stats
    rows = match_bgp(kb, [("?p", "made_by", "?m"),
                          ("?m", "located_in", "?c")],
                     stats=predicate_stats(kb)).collect()
    got = {(r["p"], r["m"], r["c"]) for r in rows}
    assert got == {("p1", "m1", "de"), ("p2", "m1", "de"),
                   ("p3", "m2", "jp")}


def test_infer_types_rdfs_entailment(spark):
    from tecs_hardware_kbc_spark.operators.kg_query import infer_types
    t = spark.createDataFrame(
        [("q1", "type", "npn"), ("q2", "type", "mosfet"),
         ("r1", "type", "resistor"),
         ("npn", "subclass_of", "bjt"),
         ("bjt", "subclass_of", "transistor"),
         ("mosfet", "subclass_of", "transistor"),
         ("transistor", "subclass_of", "component"),
         # shortcut edge: q1's transistor must keep the SMALLER depth
         ("npn", "subclass_of", "transistor")],
        ["subj", "pred", "obj"])
    got = {(r["subj"], r["type"]): r["depth"]
           for r in infer_types(t).collect()}
    assert got[("q1", "npn")] == 0
    assert got[("q1", "bjt")] == 1
    assert got[("q1", "transistor")] == 1       # shortcut beats 2-hop
    assert got[("q1", "component")] == 2
    assert got[("q2", "transistor")] == 1
    assert got[("q2", "component")] == 2
    assert got[("r1", "resistor")] == 0         # no hierarchy: asserted only
    assert got[("q2", "mosfet")] == 0
    assert len(got) == 8


def test_bgp_optional_left_join(kb):
    rows = match_bgp(kb, [("?p", "made_by", "?m")],
                     optional=[[("?p", "product_country", "?c")]]
                     ).collect()
    got = {(r["p"], r["c"]) for r in rows}
    assert got == {("p1", "de"), ("p2", None), ("p3", "de")}


def test_bgp_optional_varfree_rejected(kb):
    with pytest.raises(ValueError):
        match_bgp(kb, [("?p", "made_by", "?m")],
                  optional=[[("?a", "located_in", "?b")]])


def test_bgp_filter_expressions(kb):
    rows = match_bgp(kb, [("?p", "made_by", "?m"),
                          ("?m", "located_in", "?c")],
                     filters=["c <> 'jp'", "p > 'p1'"]).collect()
    assert {(r["p"], r["c"]) for r in rows} == {("p2", "de")}


def test_bgp_filter_on_optional_var_uses_sql_null_semantics(kb):
    rows = match_bgp(kb, [("?p", "made_by", "?m")],
                     optional=[[("?p", "product_country", "?c")]],
                     filters=["c IS NULL OR c = 'de'"]).collect()
    assert {r["p"] for r in rows} == {"p1", "p2", "p3"}


def test_group_bgp_aggregates(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import group_bgp
    rows = group_bgp(
        kb, [("?p", "made_by", "?m")],
        group_vars=["?m"],
        aggs=[("count", "*", "n"),
              ("count_distinct", "?p", "n_p"),
              ("sample", "?p", "first_p"),
              ("group_concat", "?p", "parts")]).collect()
    got = {r["m"]: (r["n"], r["n_p"], r["first_p"], r["parts"])
           for r in rows}
    assert got == {"m1": (2, 2, "p1", "p1;p2"),
                   "m2": (1, 1, "p3", "p3")}


def test_group_bgp_having_order_limit(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import group_bgp
    rows = group_bgp(
        kb, [("?p", "made_by", "?m")],
        group_vars=["?m"],
        aggs=[("count", "*", "n")],
        having="n >= 2",
        order_by=["n DESC", "m ASC"],
        limit=1).collect()
    assert [(r["m"], r["n"]) for r in rows] == [("m1", 2)]


def test_group_bgp_rejects_bad_agg(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import group_bgp
    with pytest.raises(ValueError):
        group_bgp(kb, [("?p", "made_by", "?m")], ["?m"],
                  [("median", "?p", "x")])
    with pytest.raises(ValueError):
        group_bgp(kb, [("?p", "made_by", "?m")], ["?m"],
                  [("sum", "*", "x")])


def test_construct_derives_graph(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import construct
    got = {tuple(r) for r in construct(
        kb,
        [("?p", "made_by", "?m"), ("?m", "located_in", "?c")],
        [("?p", "origin", "?c"), ("?m", "type", "maker")]).collect()}
    assert got == {("p1", "origin", "de"), ("p2", "origin", "de"),
                   ("p3", "origin", "jp"),
                   ("m1", "type", "maker"), ("m2", "type", "maker")}


def test_construct_skips_null_optional_bindings(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import construct
    got = {tuple(r) for r in construct(
        kb, [("?p", "made_by", "?m")],
        [("?p", "claimed_origin", "?c")],
        optional=[[("?p", "product_country", "?c")]]).collect()}
    # p2 has no product_country -> NULL binding -> no derived triple
    assert got == {("p1", "claimed_origin", "de"),
                   ("p3", "claimed_origin", "de")}


def test_construct_rejects_unbound_template_var(kb):
    from tecs_hardware_kbc_spark.operators.kg_query import construct
    with pytest.raises(ValueError):
        construct(kb, [("?p", "made_by", "?m")], [("?p", "x", "?zz")])
