"""Figure source + connectors pipeline (S8: MentionFigures/HasFigures +
thumbnail classification, circular_connectors.py:82-151)."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.corpus import corpus_to_dataframes, generate_corpus
from tecs_hardware_kbc_spark.operators.extract import (
    extract_text,
    parse_figures,
    parse_html_figures,
)
from tecs_hardware_kbc_spark.operators.figures import (
    MIN_THUMB_DIM,
    connector_gold,
    figure_mentions,
    planted_dims,
    score_connectors,
    synthesize_media,
)
from tecs_hardware_kbc_spark.operators.multimodal import _parse_image_header


def test_parse_html_figures_forms():
    html = (b"<html><body><p>text</p>"
            b'<img src="a.png" alt="first">'
            b'<img src="b.png"/>'
            b"<img alt='no src'>"
            b'<table><tr><td><img src="c.png" alt="cell"></td></tr></table>'
            b"</body></html>")
    figs = parse_html_figures(html)
    assert [(f["fig_id"], f["src"], f["alt"]) for f in figs] == [
        (0, "a.png", "first"), (1, "b.png", ""), (2, "c.png", "cell")]
    # image tags contribute no text: the extraction invariant is untouched
    assert extract_text(html) == "text"


def test_corpus_figures_and_invariant(spark):
    pages, _, _ = corpus_to_dataframes(spark, generate_corpus(40, seed=42))
    figs = parse_figures(pages)
    assert figs.count() > 0
    # every page's text column still equals extract_text(html)
    bad = pages.filter(
        F.col("lang") == "en").toPandas()
    assert all(extract_text(h) == t for h, t in zip(bad["html"], bad["text"]))


def test_planted_payload_decodes_via_header_tier(spark):
    """The synthesized payload is a REAL PNG container: the pure-Python
    header parser (not the md5 stub) must read back the planted dims."""
    figs = spark.createDataFrame(
        [("https://x.example/p.html", 0, "fig0.png", "")],
        "url string, fig_id int, src string, alt string")
    row = synthesize_media(figs).first()
    parsed = _parse_image_header(bytes(row["payload"]))
    assert parsed is not None
    w, h = parsed
    exp = figs.select(*[c.alias(n) for c, n in
                        zip(planted_dims(F.col("url"), F.col("src")),
                            ["w", "h", "conn"])]).first()
    assert (w, h) == (exp["w"], exp["h"])


def test_has_figures_filter(spark):
    pages, _, _ = corpus_to_dataframes(spark, generate_corpus(60, seed=42))
    figs = parse_figures(pages).dropDuplicates(["url", "fig_id", "src"])
    kept = figure_mentions(figs, synthesize_media(figs))
    rows = kept.collect()
    assert rows and all(
        min(r["width"], r["height"]) > MIN_THUMB_DIM for r in rows)
    assert kept.count() < figs.count()  # the small plants were dropped


def test_connectors_e2e_gate(spark):
    """Full connectors run: dev-fit LR separates the planted classes on
    the held-out test docs."""
    pages, _, _ = corpus_to_dataframes(spark, generate_corpus(200, seed=42))
    r = score_connectors(pages)
    assert r["precision"] >= 0.9 and r["recall"] >= 0.9
    # the gradient anisotropy ||sx|-|sy|| must be the dominant NEGATIVE
    # signal (axis-aligned stripes are anisotropic, rings are not) — the
    # conv features, not planted aspect geometry, do the separating
    w = r["model"]["w"]
    assert w[3] < 0
    assert abs(w[3]) == max(abs(v) for v in w)


def test_connectors_gate_survives_raster_redraw(spark):
    """VERDICT r4 #6: the gate must hold for a PERTURBED raster parameter
    draw (different centers/radii/orientations/periods, same class bits) —
    proof the conv features separate ring-vs-stripe structure in general,
    not one hand-fit byte pattern. Two independent salts, both >= 0.9."""
    pages, _, _ = corpus_to_dataframes(spark, generate_corpus(200, seed=42))
    for salt in (":perturb1", ":perturb2"):
        r = score_connectors(pages, raster_salt=salt)
        assert r["precision"] >= 0.9 and r["recall"] >= 0.9, (salt, r)
        # anisotropy stays the dominant negative signal under the redraw
        w = r["model"]["w"]
        assert w[3] < 0


def test_connectors_cli(spark, tmp_path, capsys):
    import json

    from tecs_hardware_kbc_spark.__main__ import main
    from tecs_hardware_kbc_spark.corpus import write_corpus

    write_corpus(spark, str(tmp_path / "c"), n_pages=60, seed=42)
    rc = main(["connectors", "--pages", str(tmp_path / "c/pages.parquet")])
    assert rc == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["precision"] >= 0.9 and r["recall"] >= 0.9


def test_connector_gold_is_class_bit(spark):
    pages, _, _ = corpus_to_dataframes(spark, generate_corpus(40, seed=42))
    figs = parse_figures(pages).dropDuplicates(["url", "fig_id", "src"])
    gold = connector_gold(figs)
    _, _, is_conn = planted_dims(F.col("url"), F.col("src"))
    assert gold.count() == figs.filter(is_conn).select(
        "url", "src").distinct().count()
