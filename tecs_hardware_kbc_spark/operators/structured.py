"""Structured-data harvest: JSON-LD and meta-tag triples, sitemaps.

The Web Data Commons pipeline (Meusel et al. 2014) is the canonical
web-scale KG-construction shortcut: before any NLP runs, a crawl's
pages already carry publisher-authored structured data — schema.org
JSON-LD islands in ``<script type="application/ld+json">`` blocks,
schema.org microdata (``itemscope``/``itemprop`` attributes),
OpenGraph/meta annotations, and ``<title>`` — that map directly onto
(subj, pred, obj) triples. This module harvests all four as pure
column expressions and feeds the same triple schema the NLP pipeline
emits (``operators/fusion.py`` fuses both sources; the reference's
pipeline has no structured-data leg because its corpus is datasheet
PDFs/HTML without annotations — this is the web-corpus complement).

Operators:

* ``extract_jsonld`` — harvest every JSON-LD script island into
  ``(url, block_idx, json)`` rows: one ``regexp_extract_all`` with a
  dotall lazy body + one ``posexplode``. Malformed JSON survives to
  this layer (the crawl is full of it) and is dropped by the parse
  in ``jsonld_triples`` — visibly, via the ``n_bad`` metric column of
  ``jsonld_parse_stats``.
* ``jsonld_triples`` — flatten TOP-LEVEL JSON-LD objects into triples:
  ``@id`` (or a deterministic ``url#jsonldN`` fragment for blank
  nodes) becomes the subject, ``@type`` becomes an ``rdf:type``
  triple, every other key becomes a predicate. Values keep JSON
  scalars as text (numbers/bools exactly as engines render them) and
  nested objects/arrays as their raw JSON text — the WDC treatment of
  blank-node children at harvest time; a second pass over the JSON
  column can recurse when a consumer needs depth. The parse is
  Spark's ``from_json`` to ``map<string,string>``, whose per-token
  text semantics were pinned against DuckDB's ``json_keys`` +
  ``->>`` extraction (the ``web_jsonld`` driver entry replays the
  whole harvest in SQL).
* ``meta_triples`` — ``<meta property|name=... content=...>`` pairs
  (both attribute orders) plus ``<title>``, subject = the page URL.
* ``parse_sitemaps`` — sitemaps.org XML: ``<url>`` entry blocks to
  ``(sitemap_url, loc, lastmod, changefreq, priority)`` rows and
  ``<sitemap>`` index entries to child-sitemap rows (``is_index``) —
  the discovery-side complement of ``graph.frontier_batch`` (robots
  compliance lives in ``operators/robots.py``).

Scale shape: every operator is one narrow projection + one explode —
output rows are bounded by the number of islands/tags/entries on the
page, nothing shuffles, and the scan parallelism is the page table's.
All regexes stay in the Java-regex/RE2 common dialect so the driver
oracles replay them verbatim in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window

# JSON-LD script island; group 1 = the raw JSON body. Lazy + dotall:
# islands are multi-line, and two islands on one page must not merge.
# The type attribute tolerates whitespace and single/double quotes.
JSONLD_RGX = (r'(?s)<script\s[^>]*type\s*=\s*["\']application/ld\+json'
              r'["\'][^>]*>(.*?)</script>')

# A whole <meta ...> tag (group 0); per-tag key/value extraction below
# tolerates either attribute order.
META_TAG_RGX = r"<meta\s[^>]*>"
META_KEY_RGX = r'(?:property|name)\s*=\s*["\']([^"\']+)["\']'
META_CONTENT_RGX = r'content\s*=\s*["\']([^"\']*)["\']'
TITLE_RGX = r"(?s)<title[^>]*>(.*?)</title>"

# sitemaps.org entry blocks and their child fields.
SITEMAP_URL_BLOCK_RGX = r"(?s)<url>(.*?)</url>"
SITEMAP_IDX_BLOCK_RGX = r"(?s)<sitemap>(.*?)</sitemap>"
LOC_RGX = r"(?s)<loc>\s*(.*?)\s*</loc>"
LASTMOD_RGX = r"<lastmod>\s*([0-9T:+Z.-]+)\s*</lastmod>"
CHANGEFREQ_RGX = r"<changefreq>\s*([a-z]+)\s*</changefreq>"
PRIORITY_RGX = r"<priority>\s*([0-9.]+)\s*</priority>"

RDF_TYPE = "rdf:type"


def extract_jsonld(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """``(url, block_idx, json)`` — one row per JSON-LD island, in page
    order. ``json`` is the raw body (trimmed); validity is the next
    layer's concern so bad islands stay countable."""
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_RGX), 1)
    # F.trim strips only 0x20; islands are newline-padded, so regex-trim
    ws_trim = F.regexp_replace(
        F.regexp_replace("json", r"^\s+", ""), r"\s+$", "")
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.posexplode(blocks).alias("block_idx", "json"))
            .withColumn("json", ws_trim))


def jsonld_triples(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Top-level JSON-LD objects as ``(url, subj, pred, obj)`` triples.

    Blank-node subjects (no ``@id``) mint ``<url>#jsonld<block_idx>``
    — deterministic per page, so re-crawls of an unchanged page fuse
    (``fusion.fuse_triples``) instead of multiplying. ``@type`` maps
    to ``rdf:type``; other ``@``-keywords (``@context``, ``@graph``)
    carry no flat-triple meaning and are dropped. Null-valued keys are
    dropped (JSON ``null`` asserts nothing). Malformed islands parse
    to a NULL map and vanish here; ``jsonld_parse_stats`` counts them.
    """
    islands = extract_jsonld(pages, url_col, html_col)
    parsed = islands.select(
        "url", "block_idx",
        F.from_json("json", "map<string,string>").alias("m"))
    parsed = parsed.filter(F.col("m").isNotNull())
    subj = F.coalesce(
        F.col("m")["@id"],
        F.concat(F.col("url"), F.lit("#jsonld"),
                 F.col("block_idx").cast("string")))
    kv = parsed.select(
        "url", subj.alias("subj"),
        F.explode("m").alias("key", "val"))
    # one pass over the exploded map (a typed/plain branch UNION would
    # re-evaluate the from_json + explode lineage once per branch): @type
    # maps to rdf:type, other non-@ keys pass through with non-null values
    keep = (F.col("key") == "@type") | (
        ~F.col("key").startswith("@") & F.col("val").isNotNull())
    pred = (F.when(F.col("key") == "@type", F.lit(RDF_TYPE))
            .otherwise(F.col("key")))
    return kv.filter(keep).select(
        "url", "subj", pred.alias("pred"), F.col("val").alias("obj"))


def jsonld_parse_stats(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Per-page harvest accounting: ``(url, n_blocks, n_bad)`` — the
    visibility metric for the malformed-island drop (a crawl-quality
    signal worth tracking per snapshot, not silently discarding)."""
    islands = extract_jsonld(pages, url_col, html_col)
    bad = F.from_json("json", "map<string,string>").isNull()
    return (islands
            .groupBy("url")
            .agg(F.count("*").alias("n_blocks"),
                 F.sum(bad.cast("long")).alias("n_bad")))


def meta_triples(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """OpenGraph/meta annotations + ``<title>`` as page-subject triples.

    ``(url, subj, pred, obj)`` with ``subj = url``: one row per
    ``<meta>`` tag carrying BOTH a ``property``/``name`` key and a
    ``content`` value (either attribute order — the pairs are pulled
    per-tag, never across tags), plus a ``title`` triple when the page
    has a non-empty ``<title>``. Whitespace inside title text is
    collapsed; meta content is kept verbatim (publishers meaningfully
    pad og:description)."""
    tags = F.regexp_extract_all(F.col(html_col), F.lit(META_TAG_RGX), 0)

    # per-tag key/value extraction inside the array (one page pass): keep
    # tags carrying BOTH a key and a content match. regexp_extract returns
    # '' on no-match, so a content match must be distinguished from
    # content="" via the rlike flag.
    def _kv(tag):
        return F.struct(
            F.regexp_extract(tag, META_KEY_RGX, 1).alias("pred"),
            F.regexp_extract(tag, META_CONTENT_RGX, 1).alias("obj"),
            tag.rlike(META_CONTENT_RGX).alias("_has_c"))

    metas = F.filter(F.transform(tags, _kv),
                     lambda s: (s["pred"] != "") & s["_has_c"])
    title_txt = F.trim(F.regexp_replace(
        F.regexp_extract(F.col(html_col), TITLE_RGX, 1), r"\s+", " "))
    title = F.filter(
        F.array(F.struct(F.lit("title").alias("pred"),
                         title_txt.alias("obj"),
                         F.lit(True).alias("_has_c"))),
        lambda s: s["obj"] != "")
    # meta rows + the optional title row from ONE projection and ONE
    # explode — the metas/titles UNION re-built the html and re-scanned it
    # per branch (two page passes; the title regex is the expensive one)
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.explode(F.concat(metas, title)).alias("kv"))
            .select("url", F.col("url").alias("subj"),
                    F.col("kv.pred").alias("pred"),
                    F.col("kv.obj").alias("obj")))


def parse_sitemaps(sitemaps: DataFrame, url_col: str = "sitemap_url",
                   xml_col: str = "xml") -> DataFrame:
    """sitemaps.org XML to long rows, ``<url>`` entries and
    ``<sitemap>`` index children in one pass.

    Output: ``(sitemap_url, loc, lastmod, changefreq, priority,
    is_index)`` — ``lastmod`` stays the raw W3C datetime STRING
    (callers ``to_date``/``to_timestamp`` at the precision they need;
    sitemaps mix date-only and full-datetime forms), ``priority`` is
    a double defaulting per spec to 0.5 for ``<url>`` entries (NULL
    for index children, where the spec defines none). Entries without
    a ``<loc>`` are dropped — the only required field. A sitemap file
    is KB-to-50k-entries sized, so this is one narrow projection +
    two explodes; a full crawl's sitemap set parallelizes by file like
    ``robots.parse_robots``."""
    def _entries(block_rgx: str, is_index: bool):
        blocks = F.regexp_extract_all(
            F.col(xml_col), F.lit(block_rgx), 1)
        prio = (F.when(F.col("b").rlike(PRIORITY_RGX),
                       F.regexp_extract("b", PRIORITY_RGX, 1)
                       .cast("double"))
                .otherwise(F.lit(None if is_index else 0.5)
                           .cast("double")))
        return (sitemaps
                .select(F.col(url_col).alias("sitemap_url"),
                        F.explode(blocks).alias("b"))
                .select("sitemap_url",
                        F.regexp_extract("b", LOC_RGX, 1).alias("loc"),
                        F.when(F.col("b").rlike(LASTMOD_RGX),
                               F.regexp_extract("b", LASTMOD_RGX, 1))
                        .alias("lastmod"),
                        F.when(F.col("b").rlike(CHANGEFREQ_RGX),
                               F.regexp_extract("b", CHANGEFREQ_RGX, 1))
                        .alias("changefreq"),
                        prio.alias("priority"),
                        F.lit(is_index).alias("is_index"))
                .filter(F.col("loc") != ""))

    return (_entries(SITEMAP_URL_BLOCK_RGX, False)
            .unionByName(_entries(SITEMAP_IDX_BLOCK_RGX, True)))


# Any tag carrying itemscope or itemprop, in document order. One pass:
# scopes and props must share an ordering for the window below.
MICRODATA_TAG_RGX = r"<[^>]*\bitem(?:scope|prop)\b[^>]*>"
ITEMPROP_RGX = r'itemprop\s*=\s*["\']([^"\']+)["\']'
ITEMTYPE_RGX = r'itemtype\s*=\s*["\']([^"\']+)["\']'
ITEMID_RGX = r'itemid\s*=\s*["\']([^"\']+)["\']'
# value of a prop tag: content= (meta-style), else src/href (media and
# link elements). Element TEXT content is out of regex reach; prop tags
# carrying their value as body text are dropped, visibly (see below).
MD_CONTENT_RGX = r'content\s*=\s*["\']([^"\']*)["\']'
MD_SRC_RGX = r'(?:src|href)\s*=\s*["\']([^"\']+)["\']'


def microdata_triples(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Flat schema.org microdata harvest: ``(url, subj, pred, obj)``.

    The third WDC format next to JSON-LD and meta/OpenGraph. Model: a
    single tag-stream pass — every tag with ``itemscope`` or
    ``itemprop``, in document order — then each prop attaches to the
    NEAREST PRECEDING itemscope on its page (a running count over one
    per-page window). Subjects: ``itemid`` when present, else a minted
    ``url#item<k>`` (k = scope ordinal, deterministic across
    re-crawls); ``itemtype`` adds an ``rdf:type`` triple. Prop values
    come from ``content=`` or ``src=``/``href=`` attributes; props
    whose value is element TEXT (out of regex reach — the documented
    flat-harvest trade, same as WDC's own lossy common-crawl extractor
    for malformed pages) and props before any scope are dropped.
    Closing-tag scope nesting is intentionally NOT modelled: nested
    scopes re-bind following props to the inner item, which matches
    the flat reading of the dominant single-item page.

    Scale shape: one extract + posexplode + ONE window per page keyed
    by (url, tag order) — a page's microdata tags are tens-to-hundreds
    of rows, so window partitions stay tiny at any corpus size.
    """
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(MICRODATA_TAG_RGX), 0)
    t = (pages
         .select(F.col(url_col).alias("url"),
                 F.posexplode(tags).alias("idx", "tag"))
         .withColumn("is_scope", F.col("tag").rlike(r"\bitemscope\b")))
    w = Window.partitionBy("url").orderBy("idx")
    t = t.withColumn(
        "scope_k", F.sum(F.col("is_scope").cast("int")).over(w))
    scopes = (t.filter("is_scope")
              .select("url", "scope_k",
                      F.when(F.col("tag").rlike(ITEMID_RGX),
                             F.regexp_extract("tag", ITEMID_RGX, 1))
                      .alias("itemid"),
                      F.when(F.col("tag").rlike(ITEMTYPE_RGX),
                             F.regexp_extract("tag", ITEMTYPE_RGX, 1))
                      .alias("itemtype")))
    subj = F.coalesce(
        F.col("itemid"),
        F.concat(F.col("url"), F.lit("#item"),
                 F.col("scope_k").cast("string")))
    typed = (scopes.filter(F.col("itemtype").isNotNull())
             .select("url", subj.alias("subj"),
                     F.lit(RDF_TYPE).alias("pred"),
                     F.col("itemtype").alias("obj")))
    val = F.coalesce(
        F.when(F.col("tag").rlike(MD_CONTENT_RGX),
               F.regexp_extract("tag", MD_CONTENT_RGX, 1)),
        F.when(F.col("tag").rlike(MD_SRC_RGX),
               F.regexp_extract("tag", MD_SRC_RGX, 1)))
    props = (t.filter(~F.col("is_scope")
                      & F.col("tag").rlike(ITEMPROP_RGX)
                      & (F.col("scope_k") > 0))
             .select("url", "scope_k",
                     F.regexp_extract("tag", ITEMPROP_RGX, 1)
                     .alias("pred"),
                     val.alias("obj"))
             .filter(F.col("obj").isNotNull()))
    plain = (props.join(scopes, ["url", "scope_k"])
             .select("url", subj.alias("subj"), "pred", "obj"))
    return typed.unionByName(plain)
