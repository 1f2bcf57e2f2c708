"""Text analysis operators for training-data curation (all JVM built-ins).

* ``token_stats``   — whitespace + BPE-ish regex token counts, char stats;
* ``language_id``   — stopword-hit-ratio n-gram heuristic over a small
  per-language function-word table (broadcast literal arrays);
* ``quality_score`` — length/punctuation/stopword/word-length components
  combined into [0,1] (the usual web-text quality gate);
* ``fingerprint``   — md5 content fingerprint + rolling winnowing-style
  min-hash fingerprint set;
* ``redact_pii``    — pattern-based PII scrubbing (emails, IPv4, long
  digit runs) with per-category counts — the redaction gate a web-text
  corpus passes through before training.

Everything is expressible as one select over the documents table — no
shuffle at all until an aggregation is asked for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.dedup import norm_text

# tiny function-word inventories; enough signal for a heuristic lang-id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "for", "are", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "kein", "hier",
           "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "pas"],
}

# BPE-ish tokenizer: words, numbers, or single non-space symbols
BPE_TOKEN_RGX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _words(text_col) -> Column:
    return F.split(norm_text(text_col), " ")


# PII patterns restricted to syntax valid in BOTH Java regex (Spark) and
# RE2 (DuckDB, the oracle) — no lookarounds, no backrefs. Order matters:
# redaction applies them in dict order, so an address is consumed by the
# email rule before its digits could match a later rule.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "long_digits": r"\b\d{9,}\b",   # account/card/phone-sized digit runs
}


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               token: str = "[PII]") -> DataFrame:
    """(doc_id, redacted, n_email, n_ipv4, n_long_digits): replace every
    PII match with ``token`` and count matches per category — counts are
    taken on the ORIGINAL text (what was found), replacements chain in
    ``PII_PATTERNS`` order (what remains). Pure column expressions — one
    narrow projection, no UDF, no shuffle; at 100 TB this runs at scan
    speed alongside the other per-document curation ops."""
    out_text = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
            .alias(f"n_{name}"))
        out_text = F.regexp_replace(out_text, pat, token)
    return docs.select(F.col(id_col).alias("doc_id"),
                       out_text.alias("redacted"), *counts)


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    words = _words(F.col(text_col))
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RGX), 0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        F.size(bpe).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        (F.length(text_col) / F.greatest(F.size(words), F.lit(1)))
        .alias("chars_per_word"),
        F.size(F.array_distinct(words)).alias("n_unique_words"),
    )


def _stopword_ratio(text_col, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    words = _words(text_col)
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words), F.lit(1))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax stopword-hit ratio; 'und'
    (undetermined) when no language scores above zero."""
    scores = F.array(*[
        F.struct(_stopword_ratio(F.col(text_col), lang).alias("score"),
                 F.lit(lang).alias("lang"))
        for lang in sorted(STOPWORDS)
    ])
    best = F.array_max(scores)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["score"] > 0, best["lang"]).otherwise("und")
        .alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length, alpha-ratio, stopword and word-length components, averaged.
    Each component is clamped to [0,1]; the composite is their mean."""
    text = F.col(text_col)
    words = _words(text)
    n_chars = F.length(text)
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")) /
        F.greatest(n_chars, F.lit(1))
    )
    len_component = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    sw_component = F.least(_stopword_ratio(text, "en") * 5, F.lit(1.0))
    mean_wlen = n_chars / F.greatest(F.size(words), F.lit(1))
    wlen_component = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0) \
        .otherwise(0.0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(len_component, 6).alias("len_score"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(sw_component, 6).alias("stopword_score"),
        wlen_component.alias("word_len_score"),
        F.round((len_component + alpha_ratio + sw_component + wlen_component)
                / 4.0, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = 4,
                shingle_n: int = 5) -> DataFrame:
    """(doc_id, fp_md5, fp_set): full-content md5 plus the k smallest
    shingle hashes (winnowing-style fingerprint set for containment
    checks)."""
    words = _words(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - shingle_n, F.lit(0)))
    hashes = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(words, i + 1, shingle_n), " ")),
                1, 8),
            16, 10).cast("bigint"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm_text(F.col(text_col))).alias("fp_md5"),
        F.slice(F.array_sort(F.array_distinct(hashes)), 1, k).alias("fp_set"),
    )
