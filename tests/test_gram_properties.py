"""Property-based invariants (hypothesis) for the pure kernels:

* gram offsets: for ANY word list, every word n-gram's (char_start,
  char_end) slices the space-joined sentence text to exactly its span;
* expansion determinism + self-containment: expand_part_range always
  returns the input span among its results and is deterministic.
"""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from tecs_hardware_kbc_spark.functions.expand import expand_part_range

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           max_codepoint=0x7F),
    min_size=1, max_size=8)


@settings(max_examples=20, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=8))
def test_gram_offsets_slice_back_to_span(spark, words):
    from tecs_hardware_kbc_spark.operators.extract import grams_col

    text = " ".join(words)
    df = spark.createDataFrame([(words,)], "words array<string>")
    rows = df.select(F.explode(grams_col(F.col("words"))).alias("g")) \
        .select("g.*").collect()
    assert rows, words
    for r in rows:
        if r["n"] == 0:
            continue  # sub-token grams anchor inside a word, not the join
        assert text[r["char_start"]:r["char_end"] + 1] == r["span"], \
            (words, r)
    # word-gram count = sum over i of min(3, len-i)
    n_word_grams = sum(min(3, len(words) - i) for i in range(len(words)))
    assert sum(1 for r in rows if r["n"] > 0) == n_word_grams


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=20))
def test_expand_part_range_total_and_deterministic(span):
    a = expand_part_range(span)
    b = expand_part_range(span)
    assert list(a) == list(b)          # deterministic
    assert span in set(a) | {span}     # never loses the anchor surface


@settings(max_examples=20, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=6))
def test_subtoken_grams_anchor_inside_their_word(spark, words):
    from tecs_hardware_kbc_spark.operators.extract import grams_col

    # plant '-'-joined compounds so sub-token grams exist
    words = [w + "-" + w[::-1] for w in words]
    text = " ".join(words)
    df = spark.createDataFrame([(words,)], "words array<string>")
    rows = df.select(F.explode(grams_col(F.col("words"))).alias("g")) \
        .select("g.*").collect()
    subs = [r for r in rows if r["n"] == 0]
    assert subs
    for r in subs:
        assert text[r["char_start"]:r["char_end"] + 1] == r["span"], \
            (words, r)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=9, max_codepoint=0x2FF),
               max_size=400))
def test_parser_total_on_garbage_html(html):
    """Common-Crawl reality: the structural parser must be TOTAL on
    arbitrary byte soup — never raise, always deterministic, and the
    byte-identical invariant must hold on its own output."""
    from tecs_hardware_kbc_spark.operators.extract import (
        extract_text, parse_html)

    s1 = parse_html(html)
    s2 = parse_html(html)
    assert s1 == s2                          # deterministic
    assert extract_text(html) == "\n".join(x["text"] for x in s1)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.sampled_from(["<table>", "</table>", "<tr>", "</tr>", "<td>x 1</td>",
                     "<td>", "</td>", "<p>a b.</p>", "<h1>T</h1>", "</p>",
                     "<script>var x=1;</script>", "text &amp; more",
                     "<li>item</li>", "<table><tr><td>n</td>"]),
    max_size=20))
def test_parser_total_on_malformed_structure(parts):
    """Unclosed/mismatched tags, stray close tags, nested tables: the
    parser must stay total and self-consistent."""
    from tecs_hardware_kbc_spark.operators.extract import (
        extract_text, parse_html)

    html = "<html><body>" + "".join(parts)  # deliberately unterminated
    rows = parse_html(html)
    assert extract_text(html) == "\n".join(x["text"] for x in rows)
    for r in rows:
        assert r["text"].strip() == r["text"] and r["text"]
        if r["is_tabular"]:
            assert r["table_id"] is not None


def test_grams_precomputed_offsets_equivalent(spark):
    """grams_col(offsets=<parse-computed>) must emit the identical gram
    set as the O(n^2) in-expression aggregate fallback, and the parse's
    char_offsets column must equal the prefix sums of word lengths."""
    import pyspark.sql.functions as F

    from tecs_hardware_kbc_spark.operators.extract import (
        grams_col, parse_html)

    html = ("<html><body><p>BC546 thru BC548 storage temp -55 to +150.</p>"
            "<table><tr><td>V(BR)CEO min 45 V</td></tr></table>"
            "</body></html>")
    for s in parse_html(html):
        acc, offs = 0, []
        for w in s["words"]:
            offs.append(acc)
            acc += len(w) + 1
        assert s["char_offsets"] == offs

    df = spark.createDataFrame(
        [(s["words"], s["char_offsets"]) for s in parse_html(html)],
        "words: array<string>, char_offsets: array<int>")
    a = df.select(F.explode(grams_col()).alias("g")).collect()
    b = df.select(F.explode(
        grams_col(offsets=F.col("char_offsets"))).alias("g")).collect()
    assert sorted(map(str, a)) == sorted(map(str, b)) and len(a) > 10
