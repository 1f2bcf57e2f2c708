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
  corpus passes through before training;
* ``repetition_stats`` — the Gopher repetition signals (Rae et al. 2021,
  table A1): duplicate-line fraction, duplicate-line character fraction,
  top-n-gram character fraction (n=2..4) and duplicate-n-gram character
  fraction (n=5..10), all computed per document via sorted-array
  run-length folds — no explode, no shuffle;
* ``gopher_quality`` — the Gopher outlier-removal rule set (word count,
  mean word length, symbol-to-word ratio, bullet/ellipsis line
  fractions, alphabetic-word fraction, required-stopword count) as one
  narrow projection with a composite ``gopher_keep`` verdict.

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
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()]
    return docs.select(F.col(id_col).alias("doc_id"),
                       redact_col(F.col(text_col), token).alias("redacted"),
                       *counts)


def redact_col(text, token: str = "[PII]") -> Column:
    """The chained-replacement redaction expression (shared by
    ``redact_pii`` and the fused curation funnel)."""
    out_text = text
    for pat in PII_PATTERNS.values():
        out_text = F.regexp_replace(out_text, pat, token)
    return out_text


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


def _stopword_ratio(text_col, lang: str, words=None) -> Column:
    """``words`` (a pre-bound word-array column, e.g. a ``_let`` lambda
    variable) lets callers share ONE split across several ratios —
    without it each ratio re-splits the text (Spark has no subexpression
    cache across HOF lambda invocations, see augment._let)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    if words is None:
        words = _words(text_col)
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words), F.lit(1))


def lang_pred_cols(text_col) -> tuple[Column, Column]:
    """(lang_pred, lang_score) column expressions — the single source of
    truth shared by ``language_id`` and the fused curation funnel. The
    word array is ``_let``-bound so the text is split ONCE per row, not
    once per language (measured 5x on the funnel's language gate)."""
    from tecs_hardware_kbc_spark.operators.augment import _let

    def best_of(words):
        scores = F.array(*[
            F.struct(_stopword_ratio(text_col, lang, words).alias("score"),
                     F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ])
        return F.array_max(scores)

    best = _let(_words(text_col), best_of)
    return (F.when(best["score"] > 0, best["lang"]).otherwise("und"),
            best["score"])


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax stopword-hit ratio; 'und'
    (undetermined) when no language scores above zero."""
    pred, score = lang_pred_cols(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        score.alias("lang_score"),
    )


def quality_components(text, words=None) \
        -> tuple[Column, Column, Column, Column]:
    """(len, alpha, stopword, word-length) component expressions, each
    clamped to [0,1] — shared by ``quality_score`` and the fused
    curation funnel. The composite quality is their mean. ``words``
    optionally supplies a pre-bound word array (see _stopword_ratio)."""
    if words is None:
        words = _words(text)
    n_chars = F.length(text)
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")) /
        F.greatest(n_chars, F.lit(1))
    )
    len_component = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    sw_component = F.least(_stopword_ratio(text, "en", words) * 5,
                          F.lit(1.0))
    mean_wlen = n_chars / F.greatest(F.size(words), F.lit(1))
    wlen_component = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0) \
        .otherwise(0.0)
    return len_component, alpha_ratio, sw_component, wlen_component


def quality_col(text) -> Column:
    """The composite quality score in [0,1], rounded to 6dp (the
    oracle-stable convention). The word array is ``_let``-bound so the
    composite splits the text once per row."""
    from tecs_hardware_kbc_spark.operators.augment import _let

    def composite(words):
        ln, al, sw, wl = quality_components(text, words)
        return F.round((ln + al + sw + wl) / 4.0, 6)

    return _let(_words(text), composite)


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length, alpha-ratio, stopword and word-length components, averaged.
    Each component is clamped to [0,1]; the composite is their mean."""
    text = F.col(text_col)
    len_component, alpha_ratio, sw_component, wlen_component = \
        quality_components(text)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(len_component, 6).alias("len_score"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(sw_component, 6).alias("stopword_score"),
        wlen_component.alias("word_len_score"),
        F.round((len_component + alpha_ratio + sw_component + wlen_component)
                / 4.0, 6).alias("quality"),
    )


def _trimmed_lines(text) -> Column:
    """Non-empty trimmed lines of the RAW text (norm_text collapses
    newlines, so line-level signals must precede normalization)."""
    return F.filter(F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
                    lambda l: l != "")


def _word_grams(words, n: int) -> Column:
    """All word n-grams as space-joined strings; empty when the document
    is shorter than n words."""
    return F.when(F.size(words) < n,
                  F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.array_join(F.slice(words, i + 1, n), " ")))


def _adjacent_dup_chars(sorted_arr) -> Column:
    """Sum of lengths over occurrences BEYOND the first of each repeated
    value in a sorted array — i.e. sum((count-1) * len) per distinct
    value. This is the deterministic surrogate for Gopher's "characters
    contained in duplicates" (which char-marks overlapping spans); the
    surrogate is monotone in repetition and exactly SQL-replayable."""
    return F.when(F.size(sorted_arr) < 2, F.lit(0)).otherwise(
        F.aggregate(
            F.zip_with(F.slice(sorted_arr, 1, F.size(sorted_arr) - 1),
                       F.slice(sorted_arr, 2, F.size(sorted_arr) - 1),
                       lambda a, b: F.when(a == b,
                                           F.length(b)).otherwise(F.lit(0))),
            F.lit(0), lambda acc, x: acc + x))


def _top_run(sorted_arr) -> Column:
    """struct(cnt, gram): the most frequent value of a sorted array and
    its count; ties broken toward the lexicographically smallest value
    (the first run to reach the maximum, since runs complete in sorted
    order and a later equal-length run never strictly exceeds it)."""
    init = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"), F.lit("").alias("gram"))

    def merge(s, g):
        run = F.when(g == s["prev"], s["run"] + 1).otherwise(F.lit(1))
        better = run > s["best"]
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(s["best"]).alias("best"),
            F.when(better, g).otherwise(s["gram"]).alias("gram"))

    return F.aggregate(sorted_arr, init, merge,
                       lambda s: F.struct(s["best"].alias("cnt"),
                                          s["gram"].alias("gram")))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_ns: tuple = (2, 3, 4),
                     dup_ns: tuple = (5, 6, 7, 8, 9, 10)) -> DataFrame:
    """The Gopher repetition-filter signals, one row per document:

    * ``dup_line_frac``       — duplicate lines / lines;
    * ``dup_line_char_frac``  — chars in duplicate line occurrences
                                ((count-1)*len per distinct line) / total
                                line chars;
    * ``top_{n}gram_char_frac`` (n in ``top_ns``) — chars covered by the
      most frequent word n-gram (count * len / normalized text length,
      ties to the lexicographically smallest gram);
    * ``dup_{n}gram_char_frac`` (n in ``dup_ns``) — chars in repeated
      n-gram occurrences ((count-1)*len summed) / normalized text
      length, clamped to 1 (overlapping grams may double-count).

    Pure column expressions: each signal is an array build + sort + fold
    per row — no explode, no shuffle; at 100 TB this is scan-speed
    per-document math like the rest of the curation signals. Cost note:
    one O(L log L) sort per (row, n) over ~doc-length string arrays —
    ~9 sorts/row at the defaults, the price of shuffle-freedom."""
    text = F.col(text_col)
    norm = norm_text(text)
    words = F.split(norm, " ")
    lines = _trimmed_lines(text)
    n_lines = F.size(lines)
    line_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    denom = F.greatest(F.length(norm), F.lit(1))
    cols = [
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        F.round(F.when(n_lines > 0,
                       (n_lines - F.size(F.array_distinct(lines)))
                       / n_lines).otherwise(0.0), 6).alias("dup_line_frac"),
        F.round(F.when(line_chars > 0,
                       _adjacent_dup_chars(F.array_sort(lines)) / line_chars)
                .otherwise(0.0), 6).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        top = _top_run(F.array_sort(_word_grams(words, n)))
        cols.append(
            F.round(F.least(top["cnt"] * F.length(top["gram"]) / denom,
                            F.lit(1.0)), 6)
            .alias(f"top_{n}gram_char_frac"))
    for n in dup_ns:
        dup = _adjacent_dup_chars(F.array_sort(_word_grams(words, n)))
        cols.append(
            F.round(F.least(dup / denom, F.lit(1.0)), 6)
            .alias(f"dup_{n}gram_char_frac"))
    return docs.select(*cols)


# the stopwords whose presence Gopher requires (>= 2 distinct)
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_cols(text,
                min_words: int = 50, max_words: int = 100_000,
                min_word_len: float = 3.0, max_word_len: float = 10.0,
                max_symbol_ratio: float = 0.1,
                max_bullet_frac: float = 0.9,
                max_ellipsis_frac: float = 0.3,
                min_alpha_frac: float = 0.8,
                min_stopwords: int = 2) -> dict[str, Column]:
    """The Gopher rule-set signal expressions plus the composite
    ``gopher_keep`` — the single source of truth shared by
    ``gopher_quality`` and the fused curation funnel. ``gopher_keep``
    is computed from the ROUNDED signal values so a SQL replay of the
    rounded columns reproduces the verdict bit-for-bit."""
    norm = norm_text(text)
    words = F.split(norm, " ")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1))
    mean_wlen = F.round(
        F.length(F.regexp_replace(norm, " ", "")) / nw, 6)
    n_sym = (F.size(F.regexp_extract_all(text, F.lit("#"), 0))
             + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0)))
    symbol_ratio = F.round(n_sym / nw, 6)
    lines = _trimmed_lines(text)
    nl = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.round(
        F.size(F.filter(lines,
                        lambda l: l.rlike("^[-*•‣]"))) / nl, 6)
    ellipsis_frac = F.round(
        F.size(F.filter(lines,
                        lambda l: l.rlike("(\\.\\.\\.|…)$"))) / nl, 6)
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / nw, 6)
    req = F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), req))
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_wlen >= min_word_len) & (mean_wlen <= max_word_len)
            & (symbol_ratio <= max_symbol_ratio)
            & (bullet_frac <= max_bullet_frac)
            & (ellipsis_frac <= max_ellipsis_frac)
            & (alpha_frac >= min_alpha_frac)
            & (n_stop >= min_stopwords))
    return {
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_req_stopwords": n_stop,
        "gopher_keep": keep,
    }


def gopher_quality(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", **thresholds) -> DataFrame:
    """The Gopher quality rule set (Rae et al. 2021, table A1) as one
    narrow projection: every signal column plus the composite
    ``gopher_keep`` conjunction at the (configurable) paper thresholds
    — see ``gopher_cols`` for the expressions and threshold names."""
    sig = gopher_cols(F.col(text_col), **thresholds)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in sig.items()],
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
