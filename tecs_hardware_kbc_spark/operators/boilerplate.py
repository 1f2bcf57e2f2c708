"""Boilerplate removal / main-content extraction (the jusText /
trafilatura pass every web-text corpus runs between "crawled HTML" and
"document text").

The heuristic is the classic block-level link-density rule (Kohlschütter
et al., WSDM 2010; jusText): split the page into blocks at block-level
tag boundaries, measure each block's visible text and how much of it is
anchor text, and keep blocks that are long enough and link-sparse
enough — navigation, headers, footers and related-links sidebars are
short and link-dense; body prose is long and link-sparse.

Everything is column expressions (regex + higher-order array functions
in the Java-regex/RE2 common dialect):

* blocks      = split on closing block tags (p, div, li, td, h1-6, …)
* visible     = tags stripped, whitespace collapsed, trimmed
* anchor text = lazy ``<a …>…</a>`` captures, tags stripped, summed
* keep        = len(visible) >= min_chars AND
                link_chars * link_density_den <= len(visible) *
                link_density_num

The density gate is an INTEGER cross-multiplication (default 1/3), not
a float division, so any SQL engine replays the verdict exactly — the
same determinism trick as gopher_keep's rounded signals. One narrow
projection per page, no shuffle, no UDF; at 100 TB this runs at scan
speed next to the other per-document passes in the curation funnel.

A model-based extractor (trafilatura's DOM scoring, a learned block
classifier) would beat this on hard layouts — documented stand-in,
same pattern as the PSL suffix list; the operator shape (block array →
per-block signals → filtered rebuild) is what a swap-in would keep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

BLOCK_SPLIT_RGX = (r"(?i)</(?:p|div|li|td|th|h[1-6]|table|tr|ul|ol|"
                   r"article|section|header|footer|nav|aside|"
                   r"blockquote)>")
ANCHOR_TEXT_RGX = r"(?is)<a\b[^>]*>(.*?)</a>"
_STRIP_TAGS_RGX = r"(?is)<[^>]*>"


def _visible(block: Column) -> Column:
    """Tag-stripped, whitespace-collapsed, trimmed text of a block."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(block, _STRIP_TAGS_RGX, " "), r"\s+", " "))


def block_signals(html: Column) -> Column:
    """array<struct<text, n_chars, link_chars>> — one element per
    block-level segment of the page, in document order."""
    blocks = F.split(html, BLOCK_SPLIT_RGX)
    return F.transform(blocks, lambda b: F.struct(
        _visible(b).alias("text"),
        F.length(_visible(b)).alias("n_chars"),
        F.aggregate(
            F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RGX), F.lit(1)),
            F.lit(0),
            lambda acc, a: acc + F.length(_visible(a)))
        .alias("link_chars")))


def main_content(pages: DataFrame, html_col: str = "html",
                 min_chars: int = 25,
                 link_density_num: int = 1,
                 link_density_den: int = 3) -> DataFrame:
    """pages + (main_text, n_blocks_kept, n_blocks_total): the
    link-sparse long blocks, rebuilt in document order and joined with
    newlines. The link-density gate keeps a block iff
    ``link_chars * den <= n_chars * num`` — integer arithmetic, exact
    in any engine."""
    sig = block_signals(F.col(html_col))
    kept = F.filter(
        sig, lambda s: (s["n_chars"] >= F.lit(min_chars))
        & (s["link_chars"] * F.lit(link_density_den)
           <= s["n_chars"] * F.lit(link_density_num)))
    return (pages
            .withColumn("_sig", sig).withColumn("_kept", kept)
            .withColumn("main_text",
                        F.array_join(F.transform("_kept",
                                                 lambda s: s["text"]),
                                     "\n"))
            .withColumn("n_blocks_kept", F.size("_kept"))
            .withColumn("n_blocks_total", F.size("_sig"))
            .drop("_sig", "_kept"))
