"""Byte-pair-encoding tokenizer training and application (Sennrich et
al. 2016), Spark-first.

The reference counts whitespace/regex tokens (SURVEY §2 A4); a training
pipeline additionally needs to TRAIN its tokenizer on the corpus. The
classical trick makes this cheap at 100 TB: BPE statistics depend only
on the WORD-FREQUENCY table, not the corpus — so training runs over a
vocabulary of ~10^7 rows (one groupBy of the corpus, then n_merges tiny
aggregations that never touch the corpus again), and applying the
trained tokenizer to the full corpus is ONE broadcast join of the
segmented vocabulary.

Representation: each word is carried as its "wrapped" symbol string —
symbols separated by double spaces with a single leading/trailing
space, e.g. ``low`` -> ``' l  o  w '``. A merge of (a, b) is then a
plain (non-regex) substring replace of ``' a  b '`` with ``' ab '``:
every symbol owns its surrounding spaces, so adjacent candidate pairs
never share a boundary character and left-to-right non-overlapping
replacement implements exactly BPE's greedy leftmost merge order. The
same replace exists verbatim in DuckDB, which is what makes the whole
trainer SQL-replayable for the oracle harness.

Determinism: the winning pair is argmax by (count DESC, left ASC,
right ASC) — a total order, so training is reproducible across engines
and partitionings. The per-merge driver round-trip collects exactly ONE
row; n_merges round-trips is the control-plane cost every production
BPE trainer pays (the merge list is inherently sequential).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.ngram_lm import words_col


def chars_col(word) -> Column:
    """Character array of ``word`` (substring-based: multibyte-safe)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.transform(F.sequence(F.lit(1), F.char_length(w)),
                       lambda i: F.substring(w, i, 1))


def wrap_symbols(symbols: Column) -> Column:
    """Symbol array -> the wrapped rep string ``' a  b  c '``."""
    return F.concat(F.lit(" "), F.array_join(symbols, "  "), F.lit(" "))


def unwrap_symbols(rep: Column) -> Column:
    """Wrapped rep string -> symbol array."""
    return F.split(F.trim(rep), "  ")


@dataclass
class BPEModel:
    """``merges``: the ordered (left, right) merge list. ``vocab``: the
    trained words with their final segmentation — (word, freq,
    tokens array<string>) — ready to broadcast-join against a corpus."""
    merges: list[tuple[str, str]]
    vocab: DataFrame

    @property
    def n_merges(self) -> int:
        return len(self.merges)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the shared tokenizer (lowercase, whitespace
    collapse) — the ONLY corpus-wide pass BPE training makes."""
    return (docs.select(F.explode(words_col(F.col(text_col)))
                        .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _adjacent_pairs(toks: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(0),
                   F.greatest(F.size(toks) - 2, F.lit(-1))),
        lambda i: F.struct(F.element_at(toks, i + 1).alias("l"),
                           F.element_at(toks, i + 2).alias("r")))


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text",
              min_pair_freq: int = 2,
              checkpoint_every: int = 8) -> BPEModel:
    """Learn ``n_merges`` BPE merges from ``docs``; stops early when the
    best remaining pair's corpus frequency drops below
    ``min_pair_freq``. Each round costs one aggregation over the
    word-frequency table (NOT the corpus) plus a single-row collect."""
    vocab = (word_frequencies(docs, text_col)
             .select("word", "freq",
                     wrap_symbols(chars_col("word")).alias("rep"))
             .localCheckpoint())
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        toks = unwrap_symbols(F.col("rep"))
        best = (vocab
                .filter(F.size(toks) > 1)
                .select("freq", F.explode(_adjacent_pairs(toks))
                        .alias("p"))
                .groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best or best[0]["cnt"] < min_pair_freq:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        vocab = vocab.withColumn(
            "rep", F.replace(F.col("rep"),
                             F.lit(f" {left}  {right} "),
                             F.lit(f" {left}{right} ")))
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return BPEModel(
        merges=merges,
        vocab=vocab.select("word", "freq",
                           unwrap_symbols(F.col("rep")).alias("tokens"))
        .localCheckpoint())


def apply_bpe(docs: DataFrame, model: BPEModel, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, tokens array<string>): the corpus segmented by the
    trained model — words explode, ONE broadcast join against the
    segmented vocabulary, per-doc reassembly in word order. Words the
    training corpus never saw fall back to their character split (the
    byte-fallback analog)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "word"),
    ).filter(F.col("word") != "")
    seg = model.vocab.select("word", "tokens")
    joined = words.join(F.broadcast(seg), "word", "left").select(
        "doc_id", "pos",
        F.coalesce("tokens", chars_col("word")).alias("tokens"))
    ordered = F.array_sort(
        F.collect_list(F.struct("pos", "tokens")))
    return (joined.groupBy("doc_id")
            .agg(F.flatten(F.transform(ordered, lambda s: s["tokens"]))
                 .alias("tokens")))
