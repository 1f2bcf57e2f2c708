"""Link-graph construction + fixed-point PageRank (operators/graph.py)."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.graph import (
    DEFAULT_DAMPING_PCT, DEFAULT_SCALE, degree_stats, extract_links,
    pagerank_fixed_point)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_links_resolves_every_href_shape(spark):
    pages = _pages(spark, [(
        "HTTP://Site.COM:80/docs/page.html?utm_source=x&b=1",
        '<p><a href="https://Other.com/abs?utm_campaign=z&k=v">abs</a>'
        '<a class="x" href="//cdn.site.com/proto">proto-rel</a>'
        '<a href="/root.html">root-rel</a>'
        '<a href="sibling.html">doc-rel</a>'
        '<a href="#frag">frag-only</a>'
        '<a href="mailto:a@b.com">mail</a>'
        '<a href="javascript:void(0)">js</a></p>',
    )])
    got = {(r.src, r.dst) for r in extract_links(pages).collect()}
    src = "http://site.com/docs/page.html?b=1"
    assert got == {
        (src, "https://other.com/abs?k=v"),
        (src, "http://cdn.site.com/proto"),
        (src, "http://site.com/root.html"),
        (src, "http://site.com/docs/sibling.html"),
    }


def test_extract_links_dedups_and_drops_self_loops(spark):
    pages = _pages(spark, [(
        "https://a.com/p",
        '<a href="/q">1</a><a href="/q">2</a>'
        '<a href="https://A.com/p">self</a>',
    )])
    rows = extract_links(pages).collect()
    assert [(r.src, r.dst) for r in rows] == [
        ("https://a.com/p", "https://a.com/q")]


def _pagerank_py(edges, iters, d=DEFAULT_DAMPING_PCT, scale=DEFAULT_SCALE):
    """Independent pure-Python replica of the documented integer rule."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    base = scale // n
    rank = {v: base for v in nodes}
    for _ in range(iters):
        dang = sum(rank[v] for v in nodes if v not in out)
        inflow = {v: 0 for v in nodes}
        for s, t in edges:
            inflow[t] += rank[s] // out[s]
        dang_per = dang // n
        rank = {v: ((100 - d) * base + d * (inflow[v] + dang_per)) // 100
                for v in nodes}
    return rank


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "c"), ("e", "c")]  # f is reached from c? no — add dangling
EDGES += [("c", "f")]  # f: dangling (no out-links)


def test_pagerank_matches_integer_reference(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank
           for r in pagerank_fixed_point(e, iters=3).collect()}
    assert got == _pagerank_py(EDGES, iters=3)


def test_pagerank_authority_ordering_and_partition_invariance(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    r1 = {r.node: r.rank for r in pagerank_fixed_point(e, iters=3).collect()}
    # c has 4 in-links, a 1, b 1; d/e have none (base + dangling only)
    assert r1["c"] == max(r1.values())
    assert r1["c"] > r1["a"] > r1["d"]
    assert r1["d"] == r1["e"]
    r2 = {r.node: r.rank
          for r in pagerank_fixed_point(e.repartition(7), iters=3).collect()}
    assert r1 == r2


def test_pagerank_dangling_mass_redistributes(spark):
    # two nodes, one edge: b is dangling; without redistribution b's
    # whole rank would leak and a would collapse to the (1-d) floor
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank for r in pagerank_fixed_point(e, iters=2).collect()}
    assert got == _pagerank_py([("a", "b")], iters=2)
    base = DEFAULT_SCALE // 2
    assert got["a"] > (100 - DEFAULT_DAMPING_PCT) * base // 100


def test_degree_stats(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: (r.out_deg, r.in_deg) for r in degree_stats(e).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (2, 4),
                   "d": (1, 0), "e": (1, 0), "f": (0, 1)}
