"""Link-graph construction + fixed-point PageRank (operators/graph.py)."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.graph import (
    DEFAULT_DAMPING_PCT, DEFAULT_SCALE, degree_stats, extract_anchor_texts,
    extract_links, frontier_batch, pagerank_fixed_point)


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


def test_extract_anchor_texts_normalizes_and_dedups(spark):
    pages = _pages(spark, [
        ("https://a.com/p",
         '<a href="/q?utm_source=s">  Buy   NOW </a>'
         '<a href="/q">buy now</a>'          # same pair after normalize
         '<a href="/r"></a>'                 # empty text drops
         '<a href="#x">frag</a>'),
        ("https://b.com/p", '<a href="https://a.com/q">Other name</a>'),
    ])
    got = {(r.dst, r.anchor_text)
           for r in extract_anchor_texts(pages).collect()}
    assert got == {("https://a.com/q", "buy now"),
                   ("https://a.com/q", "other name")}


def test_frontier_batch_scores_and_caps(spark):
    # crawled: a, b (appear as src); frontier: c, d, e — c has two
    # in-links and must outscore d/e; cap=1 keeps only the best per
    # domain (c.com vs d.com share no domain here, e shares with c)
    edges = spark.createDataFrame(
        [("https://a.com/1", "https://c.com/x"),
         ("https://b.com/1", "https://c.com/x"),
         ("https://a.com/1", "https://d.com/y"),
         ("https://b.com/1", "https://www.c.com/z"),
         ("https://a.com/1", "https://b.com/1")],
        "src string, dst string")
    ranks = pagerank_fixed_point(edges, iters=1)
    out = frontier_batch(edges, ranks, max_per_domain=1)
    rows = {r.url: (r.score, r.domain, r.domain_rank) for r in out.collect()}
    # b.com/1 is crawled (it is a src) so it is NOT in the frontier
    assert "https://b.com/1" not in rows
    assert set(rows) <= {"https://c.com/x", "https://d.com/y",
                         "https://www.c.com/z"}
    # c.com/x (2 in-links) wins the c.com domain over www.c.com/z
    assert rows["https://c.com/x"][1] == "c.com"
    assert "https://www.c.com/z" not in rows  # capped out by c.com/x
    assert rows["https://c.com/x"][0] > rows["https://d.com/y"][0]
    assert all(v[2] == 1 for v in rows.values())


def test_degree_stats(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: (r.out_deg, r.in_deg) for r in degree_stats(e).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (2, 4),
                   "d": (1, 0), "e": (1, 0), "f": (0, 1)}
