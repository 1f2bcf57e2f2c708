"""Lingual-lite tagger: truth table, words alignment, count helper."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.lingual import (
    count_tag,
    ner_tag_col,
    pos_tag_col,
    with_lingual,
)


def _tag_one(spark, words):
    row = (
        spark.createDataFrame([(words,)], "words: array<string>")
        .select(pos_tag_col().alias("pos"), ner_tag_col().alias("ner"))
        .first()
    )
    return list(zip(row["pos"], row["ner"]))


def test_tag_truth_table(spark):
    got = _tag_one(spark, [
        "42", "-3.5", "3,5",          # numbers (comma form is NOT numeric)
        "mA", "µA", "V",              # units
        "2N3904", "BC546B",           # part-shaped
        "the", "of", "and",           # closed classes
        "Storage", "temperature",     # PROPN vs NOUN
        "...", "±",                   # punct vs symbol
    ])
    assert got == [
        ("NUM", "number"), ("NUM", "number"), ("NOUN", "o"),
        ("NOUN", "unit"), ("NOUN", "unit"), ("PROPN", "unit"),
        ("NOUN", "part"), ("PROPN", "part"),
        ("DET", "o"), ("ADP", "o"), ("CCONJ", "o"),
        ("PROPN", "o"), ("NOUN", "o"),
        ("PUNCT", "o"), ("SYM", "o"),
    ]


def test_with_lingual_alignment(spark):
    df = spark.createDataFrame(
        [("u", ["Max", "150", "°c"]), ("v", [])],
        "url: string, words: array<string>")
    out = {r["url"]: r for r in with_lingual(df).collect()}
    assert len(out["u"]["pos_tags"]) == len(out["u"]["words"]) == 3
    assert out["u"]["ner_tags"] == ["o", "number", "unit"]
    assert out["v"]["pos_tags"] == [] and out["v"]["ner_tags"] == []


def test_count_tag_matches_row_number_counts(spark):
    """The ner 'number' tag and the structural row count share one numeric
    definition — counting tags over a row's words must equal the regex
    count build_row_number_counts applies to unigram spans."""
    words = ["2N2222", "150", "-65", "to", "+150", "°c", "1.5e3", "0.25"]
    df = spark.createDataFrame([(words,)], "words: array<string>")
    n = df.select(
        count_tag(ner_tag_col(), "number").alias("n")).first()["n"]
    import re

    from tecs_hardware_kbc_spark.operators.lingual import NUMBER_RE
    assert n == sum(bool(re.match(NUMBER_RE + "$", w)) for w in words) == 4


def test_dep_lite_hand_example(spark):
    """'The BC546 is rated at -55 .' — det->nominal, forward compounds,
    last nominal is root, SYM->NUM, PUNCT->root."""
    from tecs_hardware_kbc_spark.operators.lingual import with_dependencies

    df = spark.createDataFrame(
        [(["The", "BC546", "amplifier", "gain", ",", "at", "150"],)],
        "words array<string>")
    r = with_dependencies(df).first()
    words = ["The", "BC546", "amplifier", "gain", ",", "at", "150"]
    # pos: DET PROPN NOUN NOUN PUNCT ADP NUM -> root = idx 3 ("gain")
    assert r["dep_parents"] == [1, 2, 3, -1, 3, 3, 3]
    assert r["dep_labels"] == [
        "det", "compound", "compound", "root", "punct", "case", "nummod"]
    assert len(r["dep_parents"]) == len(words)


def test_dep_lite_is_a_tree(spark, tiny_tables):
    """Property over real corpus sentences: exactly one root per sentence,
    every parent in range, and parents are acyclic (non-root arcs point
    forward to a nominal or to the root)."""
    from tecs_hardware_kbc_spark.operators.extract import parse_pages
    from tecs_hardware_kbc_spark.operators.lingual import with_dependencies
    from tecs_hardware_kbc_spark.pipeline import ingest

    sents = with_dependencies(
        parse_pages(ingest(tiny_tables["pages"])).limit(400))
    rows = sents.select("words", "dep_parents").collect()
    assert rows
    for r in rows:
        ps = r["dep_parents"]
        n = len(r["words"])
        assert len(ps) == n
        assert sum(1 for p in ps if p == -1) == 1
        root = ps.index(-1)
        for i, p in enumerate(ps):
            if i == root:
                continue
            assert 0 <= p < n and p != i
            # walking up must terminate at the root (acyclic)
            seen, j = set(), i
            while ps[j] != -1:
                assert j not in seen
                seen.add(j)
                j = ps[j]
