"""Structured-data harvest: JSON-LD islands, meta/OpenGraph tags,
sitemap XML (operators/structured.py)."""

import pytest

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.structured import (
    extract_jsonld, jsonld_parse_stats, jsonld_triples, meta_triples,
    parse_sitemaps)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


JSONLD_PAGE = (
    '<html><head>\n'
    '<script type="application/ld+json">\n'
    '{"@context":"https://schema.org","@type":"Product","@id":"urn:p1",'
    '"name":"Acme Widget","sku":123,"inStock":true,'
    '"brand":{"@type":"Brand","name":"Acme"},"tags":["a","b"],'
    '"note":null}\n'
    '</script>\n'
    "<script type='application/ld+json'>"
    '{"@type":"Organization","name":"No Id Inc"}</script>\n'
    '<script type="application/ld+json">{bad json</script>\n'
    '<script type="text/javascript">{"@type":"NotLd"}</script>\n'
    '</head></html>')


class TestJsonLd:
    def test_island_harvest_order_and_trim(self, spark):
        out = (extract_jsonld(_pages(spark, [("u1", JSONLD_PAGE)]))
               .orderBy("block_idx").collect())
        # the text/javascript block is not an island; the bad one is
        assert [r.block_idx for r in out] == [0, 1, 2]
        assert out[0].json.startswith('{"@context"')
        assert out[0].json.endswith('}')  # trimmed trailing newline
        assert out[2].json == "{bad json"

    def test_triples(self, spark):
        out = jsonld_triples(_pages(spark, [("u1", JSONLD_PAGE)]))
        got = {(r.subj, r.pred, r.obj) for r in out.collect()}
        assert got == {
            ("urn:p1", "rdf:type", "Product"),
            ("urn:p1", "name", "Acme Widget"),
            ("urn:p1", "sku", "123"),                 # number -> text
            ("urn:p1", "inStock", "true"),            # bool -> text
            # nested object / array kept as raw JSON text (WDC-style
            # blank-node deferral), @context dropped, null dropped
            ("urn:p1", "brand", '{"@type":"Brand","name":"Acme"}'),
            ("urn:p1", "tags", '["a","b"]'),
            # blank node mints url#jsonld<idx>; bad island vanishes
            ("u1#jsonld1", "rdf:type", "Organization"),
            ("u1#jsonld1", "name", "No Id Inc"),
        }
        assert all(r.url == "u1" for r in out.collect())

    def test_parse_stats_count_bad(self, spark):
        out = jsonld_parse_stats(_pages(spark, [("u1", JSONLD_PAGE)]))
        r = out.collect()[0]
        assert (r.url, r.n_blocks, r.n_bad) == ("u1", 3, 1)

    def test_no_islands_no_rows(self, spark):
        p = _pages(spark, [("u2", "<html><p>plain</p></html>")])
        assert jsonld_triples(p).count() == 0
        assert jsonld_parse_stats(p).count() == 0

    def test_single_projection_no_udf_no_shuffle(self, spark):
        plan = jsonld_triples(
            _pages(spark, [("u1", JSONLD_PAGE)]))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


META_PAGE = (
    '<html><head><title> Acme  Widget \n Catalog </title>\n'
    '<meta property="og:title" content="Acme Widget">\n'
    "<meta content='Hardware  catalog' name='description'>\n"  # reversed
    '<meta property="og:locale" content="">\n'                 # empty ok
    '<meta charset="utf-8">\n'                                 # no key
    '<meta name="keywords">\n'                                 # no content
    '</head></html>')


class TestMeta:
    def test_meta_and_title_triples(self, spark):
        out = meta_triples(_pages(spark, [("u1", META_PAGE)]))
        got = {(r.subj, r.pred, r.obj) for r in out.collect()}
        assert got == {
            ("u1", "og:title", "Acme Widget"),
            ("u1", "description", "Hardware  catalog"),
            ("u1", "og:locale", ""),
            ("u1", "title", "Acme Widget Catalog"),
        }

    def test_untitled_page(self, spark):
        out = meta_triples(_pages(
            spark, [("u2", '<html><meta name="a" content="b"></html>')]))
        assert {(r.pred, r.obj) for r in out.collect()} == {("a", "b")}


SITEMAP_XML = (
    '<?xml version="1.0"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    '<url><loc> https://a.example/p1 </loc>'
    '<lastmod>2026-01-02</lastmod><changefreq>daily</changefreq>'
    '<priority>0.8</priority></url>\n'
    '<url><loc>https://a.example/p2</loc></url>\n'
    '<url><lastmod>2026-01-03</lastmod></url>\n'  # no loc: dropped
    '</urlset>')

SITEMAP_INDEX_XML = (
    '<sitemapindex>\n'
    '<sitemap><loc>https://a.example/sm-news.xml</loc>'
    '<lastmod>2026-02-01T10:00:00Z</lastmod></sitemap>\n'
    '</sitemapindex>')


class TestSitemaps:
    def test_url_entries(self, spark):
        sm = spark.createDataFrame(
            [("https://a.example/sitemap.xml", SITEMAP_XML)],
            ["sitemap_url", "xml"])
        rows = {r.loc: r for r in parse_sitemaps(sm).collect()}
        assert set(rows) == {"https://a.example/p1", "https://a.example/p2"}
        p1 = rows["https://a.example/p1"]
        assert (p1.lastmod, p1.changefreq, p1.priority, p1.is_index) == \
            ("2026-01-02", "daily", 0.8, False)
        p2 = rows["https://a.example/p2"]
        # spec defaults: priority 0.5, optional fields NULL
        assert (p2.lastmod, p2.changefreq, p2.priority, p2.is_index) == \
            (None, None, 0.5, False)

    def test_index_entries(self, spark):
        sm = spark.createDataFrame(
            [("https://a.example/sitemap.xml",
              SITEMAP_XML + SITEMAP_INDEX_XML)],
            ["sitemap_url", "xml"])
        out = parse_sitemaps(sm).filter("is_index").collect()
        assert len(out) == 1
        assert out[0].loc == "https://a.example/sm-news.xml"
        assert out[0].lastmod == "2026-02-01T10:00:00Z"
        assert out[0].priority is None  # no spec default for children


MICRO_PAGE = (
    '<html><body>\n'
    '<div itemscope itemtype="https://schema.org/Product" '
    'itemid="urn:p9">\n'
    '  <meta itemprop="name" content="Gizmo Nine">\n'
    '  <img itemprop="image" src="/img/9.png">\n'
    '  <span itemprop="sku">TEXT-VALUE-DROPPED</span>\n'
    '</div>\n'
    '<div itemscope>\n'
    '  <meta itemprop="note" content="blank node">\n'
    '  <a itemprop="url" href="https://x.example/p9">link</a>\n'
    '</div>\n'
    '</body></html>')


class TestMicrodata:
    def test_scopes_props_and_minting(self, spark):
        from tecs_hardware_kbc_spark.operators.structured import (
            microdata_triples)
        out = microdata_triples(_pages(spark, [("u1", MICRO_PAGE)]))
        got = {(r.subj, r.pred, r.obj) for r in out.collect()}
        assert got == {
            ("urn:p9", "rdf:type", "https://schema.org/Product"),
            ("urn:p9", "name", "Gizmo Nine"),
            ("urn:p9", "image", "/img/9.png"),
            # scope 2 has no itemid -> minted url#item2, no itemtype
            # -> no type triple; href supplies the url prop value
            ("u1#item2", "note", "blank node"),
            ("u1#item2", "url", "https://x.example/p9"),
            # text-content prop (sku) is dropped — documented trade
        }

    def test_prop_before_any_scope_dropped(self, spark):
        from tecs_hardware_kbc_spark.operators.structured import (
            microdata_triples)
        p = _pages(spark, [
            ("u2", '<meta itemprop="orphan" content="x">'
                   '<div itemscope itemid="urn:a"></div>'
                   '<meta itemprop="kept" content="y">')])
        got = {(r.subj, r.pred, r.obj)
               for r in microdata_triples(p).collect()}
        assert got == {("urn:a", "kept", "y")}

    def test_no_microdata_no_rows(self, spark):
        from tecs_hardware_kbc_spark.operators.structured import (
            microdata_triples)
        p = _pages(spark, [("u3", "<html><p>plain</p></html>")])
        assert microdata_triples(p).count() == 0
