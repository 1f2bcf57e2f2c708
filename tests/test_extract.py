"""Parse + byte-identical extraction invariant (BASELINE.json input_hint)."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.extract import (
    check_extraction_invariant,
    extract_text,
    parse_html,
    parse_pages,
)

HTML = b"""<html><head><title>BC546 Datasheet</title></head><body>
<h1>BC546 NPN Silicon Transistor</h1>
<p>BC546 thru BC548 are NPN transistors. They switch fast.</p>
<table>
<tr><th>Parameter</th><th>Symbol</th><th>BC546</th><th>Unit</th></tr>
<tr><td>Storage Temperature</td><td>Tstg</td><td>-55 to 150</td><td>\xc2\xb0C</td></tr>
</table>
<script>ignore_me();</script>
</body></html>"""


def test_structure():
    sents = parse_html(HTML)
    texts = [s["text"] for s in sents]
    assert texts[0] == "BC546 Datasheet"
    assert texts[1] == "BC546 NPN Silicon Transistor"
    # prose split into two sentences
    assert "BC546 thru BC548 are NPN transistors." in texts
    assert "They switch fast." in texts
    assert "ignore_me();" not in " ".join(texts)
    # table coords
    cell = next(s for s in sents if s["text"] == "-55 to 150")
    assert (cell["table_id"], cell["row"], cell["col"]) == (0, 1, 2)
    assert cell["is_tabular"]
    header = next(s for s in sents if s["text"] == "Symbol")
    assert (header["row"], header["col"]) == (0, 1)
    h1 = next(s for s in sents if s["tag"] == "h1")
    assert not h1["is_tabular"] and h1["page"] == 1


def test_xhtml_img_keeps_skip_ancestors():
    # <img/> routes through handle_startendtag → handle_endtag; the void
    # element must not drain open ancestors, or text after the img inside a
    # script/style subtree would leak into the extraction.
    html = (b"<html><body><p>before.</p>"
            b"<script>junk <img src='x.png'/> leaked();</script>"
            b"<p>after.</p></body></html>")
    texts = [s["text"] for s in parse_html(html)]
    assert "leaked();" not in " ".join(texts)
    assert "before." in texts and "after." in texts


def _grams_of(spark, text):
    from tecs_hardware_kbc_spark.functions.text import tokenize
    from tecs_hardware_kbc_spark.operators.extract import grams_col
    df = spark.createDataFrame([(text, tokenize(text))],
                               "text string, words array<string>")
    return df.select(F.explode(grams_col()).alias("g"), "text") \
        .select("g.*", "text").collect()


def test_gram_space_offsets(spark):
    grams = _grams_of(spark, "-55 to 150")
    spans = {g["span"] for g in grams}
    assert {"-55", "to", "150", "-55 to", "to 150", "-55 to 150", "55"} <= spans
    for g in grams:
        assert g["text"][g["char_start"]: g["char_end"] + 1] == g["span"]


def test_subtoken_grams(spark):
    grams = _grams_of(spark, "BC337-16/BC338-16 works")
    spans = {g["span"] for g in grams}
    assert {"BC337-16/BC338-16", "BC337", "16", "BC338"} <= spans


def test_punct_stripped_grams(spark):
    grams = _grams_of(spark, "the BC556.")
    by_span = {g["span"]: g for g in grams}
    assert "BC556" in by_span
    g = by_span["BC556"]
    assert "the BC556."[g["char_start"]: g["char_end"] + 1] == "BC556"
    assert g["n"] == 0


def test_extract_text_deterministic():
    assert extract_text(HTML) == extract_text(HTML)
    assert extract_text(HTML).split("\n")[0] == "BC546 Datasheet"


def test_invariant_on_corpus(spark, tiny_tables):
    violations = check_extraction_invariant(tiny_tables["pages"])
    assert violations.count() == 0


def test_parse_pages_distributed(spark, tiny_tables):
    from tecs_hardware_kbc_spark.pipeline import ingest

    sents = parse_pages(ingest(tiny_tables["pages"]))
    assert sents.count() > 0
    # reconstructing text from sentences == stored text, per url (the same
    # invariant, asserted through the distributed path)
    rebuilt = sents.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("position", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("t")
    )
    joined = rebuilt.join(
        tiny_tables["pages"].select("url", "text").dropDuplicates(["url"]),
        "url",
    )
    assert joined.filter(F.col("t") != F.col("text")).count() == 0
