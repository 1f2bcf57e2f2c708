"""Boilerplate removal (operators/boilerplate.py)."""

from tecs_hardware_kbc_spark.operators.boilerplate import main_content

NAV = ('<nav><a href="/">Home</a> <a href="/p">Products and parts</a> '
       '<a href="/d">Downloads</a> <a href="/s">Support center</a></nav>')
PROSE1 = ("<p>The BC546 is a general purpose NPN transistor rated for "
          "65 volts collector emitter and 100 mA of current.</p>")
PROSE_WITH_LINK = ('<p>See the <a href="/ds">datasheet</a> for thermal '
                   'limits, packaging drawings and soldering notes.</p>')
SHORT = "<p>Fig 3.</p>"
FOOTER = ('<footer><a href="/privacy">Privacy policy</a> '
          '<a href="/terms">Terms of service</a> '
          '<a href="/imprint">Imprint and legal</a></footer>')


def test_keeps_prose_drops_nav_footer_short(spark):
    pages = spark.createDataFrame(
        [("u1", NAV + PROSE1 + PROSE_WITH_LINK + SHORT + FOOTER)],
        "url string, html string")
    row = main_content(pages).collect()[0]
    assert "general purpose NPN transistor" in row.main_text
    assert "thermal limits, packaging drawings" in row.main_text
    assert "datasheet" in row.main_text          # anchor text kept inline
    assert "Home" not in row.main_text           # nav dropped (link-dense)
    assert "Privacy" not in row.main_text        # footer dropped
    assert "Fig 3." not in row.main_text         # short block dropped
    assert row.n_blocks_kept == 2
    assert row.main_text.count("\n") == 1        # document order, joined


def test_density_gate_is_integer_exact(spark):
    # 30 visible chars, exactly 10 of them anchor text: 10*3 <= 30*1
    # keeps; one more anchor char tips it out
    block_ok = '<p>' + 'x' * 20 + '<a href="/l">' + 'y' * 10 + '</a></p>'
    block_no = '<p>' + 'x' * 19 + '<a href="/l">' + 'y' * 11 + '</a></p>'
    pages = spark.createDataFrame(
        [("ok", block_ok), ("no", block_no)], "url string, html string")
    got = {r.url: r.n_blocks_kept for r in main_content(pages).collect()}
    assert got == {"ok": 1, "no": 0}


def test_empty_and_tagless_pages(spark):
    pages = spark.createDataFrame(
        [("e", ""), ("t", "just bare text long enough to clear the "
                          "minimum character bar easily")],
        "url string, html string")
    got = {r.url: (r.main_text, r.n_blocks_kept)
           for r in main_content(pages).collect()}
    assert got["e"] == ("", 0)
    assert got["t"][1] == 1 and "bare text" in got["t"][0]
