"""Connected components + alias canonicalization."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.canonicalize import (
    canonicalize_entities,
    connected_components,
    doc_alias_edges,
    part_alias_edges,
)


def test_cc_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),  # chain -> one component
         ("x", "y"),                           # pair
         ("m", "m")],                          # self loop ignored
        "src string, dst string")
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert "m" not in comp  # self-loops contribute no nodes


def test_cc_long_chain_beyond_diameter_caps(spark):
    """A 120-edge path — boilerplate drifting one edit per page. Label
    propagation converges in O(diameter) rounds and would need 120; star
    contraction must resolve it inside its O(log^2 n) bound."""
    n = 121
    ids = [f"n{i:04d}" for i in range(n)]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)],
        "src string, dst string")
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {ids[0]}


def test_cc_matches_union_find_oracle(spark):
    """Random graph vs a driver-side union-find: same partition, and
    every component labeled by its min member."""
    import random

    rng = random.Random(7)
    n = 200
    edges = [(f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}")
             for _ in range(160)]
    edges = [e for e in edges if e[0] != e[1]]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for a, b in edges:
        groups.setdefault(find(a), set()).update((a, b))
    want = {node: min(members) for members in groups.values()
            for node in members}

    got = {r["node"]: r["component"]
           for r in connected_components(
               spark.createDataFrame(edges, "src string, dst string")
           ).collect()}
    assert got == want


def test_part_alias_edges_from_expansions(spark):
    mentions = spark.createDataFrame(
        [("u", 0, 5, 20, "BC546A/B", "BC546A"),
         ("u", 0, 5, 20, "BC546A/B", "BC546B"),
         ("u", 0, 5, 20, "BC546A/B", "BC546A/B")],
        "url string, position int, char_start int, char_end int, "
        "raw_span string, span string")
    edges = part_alias_edges(mentions)
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp["BC546B"] == comp["BC546A/B"] == comp["BC546A"] == "BC546A"


def test_doc_alias_edges_and_canonicalize(spark):
    pages = spark.createDataFrame(
        [("https://a.com/bc546.html", "SAME TEXT", "en"),
         ("https://b.com/bc546-m.html", "SAME TEXT", "en"),
         ("https://c.com/other.html", "OTHER", "en")],
        "url string, text string, lang string")
    edges = doc_alias_edges(pages)
    comps = connected_components(edges)
    ents = spark.createDataFrame(
        [("BC546-M", "BC547", "polarity", "NPN", 0.9),   # mirror binary
         ("BC546", "BC547", "polarity", "NPN", 0.8),     # original
         ("BC546-M", "BC546-M", "typ_gbp", "1100", 0.7)],  # mirror unary
        "doc string, part string, attribute string, value string, prob double")
    out = canonicalize_entities(ents, comps, on="doc").collect()
    rows = {(r["doc"], r["part"], r["attribute"], r["value"]): r["prob"]
            for r in out}
    assert ("BC546", "BC547", "polarity", "NPN") in rows
    assert rows[("BC546", "BC547", "polarity", "NPN")] == 0.9  # max prob kept
    assert ("BC546", "BC546", "typ_gbp", "1100") in rows  # unary doc+part
    assert len(rows) == 2


def test_rewrite_sameas_chain_and_collision(spark):
    from tecs_hardware_kbc_spark.operators.canonicalize import (
        rewrite_sameas)
    kb = spark.createDataFrame([
        # facts under three names of one entity (A < X < Y)
        ("X", "made_by", "M"),
        ("Y", "made_by", "M"),
        ("A", "made_by", "M"),
        ("B", "located_in", "X"),   # alias in object position
        ("C", "made_by", "M2"),     # untouched entity
        # the identity chain X -> Y -> A (transitive closure required)
        ("X", "same_as", "Y"),
        ("Y", "same_as", "A"),
    ], ["subj", "pred", "obj"])
    got = {(r["subj"], r["pred"], r["obj"])
           for r in rewrite_sameas(kb).collect()}
    assert got == {("A", "made_by", "M"),      # three facts collapsed
                   ("B", "located_in", "A"),   # object rewritten
                   ("C", "made_by", "M2")}     # untouched


def test_rewrite_sameas_no_assertions_is_identity(spark):
    from tecs_hardware_kbc_spark.operators.canonicalize import (
        rewrite_sameas)
    kb = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    assert [tuple(r) for r in rewrite_sameas(kb).collect()] == [
        ("a", "p", "b")]
