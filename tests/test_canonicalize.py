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
