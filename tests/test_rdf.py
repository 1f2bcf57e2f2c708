"""RDF export (functions/rdf.py): N-Triples escaping, prob annotation
statements, adjacency lists."""

from tecs_hardware_kbc_spark.functions.rdf import (
    adjacency_lists, to_ntriples)

T = "subj string, pred string, obj string, prob double"


def test_ntriples_grammar_and_escaping(spark):
    triples = spark.createDataFrame(
        [("bc546", "polarity", "NPN", 0.9),
         ("bc 546", "note", 'say "hi"\n\tdone\\', 0.5)], T)
    got = {r.subj: r.line for r in to_ntriples(triples).collect()}
    assert got["bc546"] == ("<http://kb.example/bc546> "
                            "<http://kb.example/polarity> \"NPN\" .")
    # IRI space percent-encoded; literal quote/newline/tab/backslash
    # escaped with the five N-Triples escapes
    assert got["bc 546"] == (
        "<http://kb.example/bc%20546> <http://kb.example/note> "
        '"say \\"hi\\"\\n\\tdone\\\\" .')


def test_ntriples_percent_encodes_percent_first(spark):
    # a raw '%20' in the data must NOT collide with the encoding of ' '
    triples = spark.createDataFrame([("a%20b", "p", "o", 1.0)], T)
    r = to_ntriples(triples).collect()[0]
    assert "<http://kb.example/a%2520b>" in r.line


def test_ntriples_prob_annotation(spark):
    triples = spark.createDataFrame([("s", "p", "o", 0.75)], T)
    r = to_ntriples(triples, with_prob=True).collect()[0]
    assert r.prob_line == (
        '<http://kb.example/fact/s/p/o> <http://kb.example/prob> '
        '"0.750000"^^<http://www.w3.org/2001/XMLSchema#double> .')


def test_adjacency_sorted_and_truncated(spark):
    triples = spark.createDataFrame(
        [("s", "b", "2", 1.0), ("s", "a", "1", 1.0),
         ("s", "a", "1", 0.5),      # duplicate fact folds away
         ("s", "c", "3", 1.0), ("t", "a", "x", 1.0)], T)
    rows = {r.subj: r for r in adjacency_lists(triples).collect()}
    assert rows["s"].n_facts == 3
    assert [(e.pred, e.obj) for e in rows["s"].adj] == \
        [("a", "1"), ("b", "2"), ("c", "3")]
    cap = {r.subj: r for r in
           adjacency_lists(triples, max_degree=2).collect()}
    assert cap["s"].n_facts == 3            # true count survives
    assert len(cap["s"].adj) == 2           # visible truncation
    assert [(e.pred, e.obj) for e in cap["s"].adj] == \
        [("a", "1"), ("b", "2")]
