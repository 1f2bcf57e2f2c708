"""Standalone analysis driver (SURVEY §2 analysis entry point).

The reference's pure-relational post-processing pass
(``hack/transistors/analysis.py:73-281``): read per-relation probability
CSVs dumped by the pipeline, alias-widen each entity through the per-doc
implied-part table (``get_implied_parts``, ``analysis.py:73-88``),
optionally restrict to a doc-set file (their 66-doc evaluation subset,
``analysis.py:116-125``), tune the decision threshold on the sweep, and
write FP/FN discrepancy CSVs (``compare_entities``,
``transistor_utils.py:296-369``).

Everything is a DataFrame job: the CSV scan, the broadcast prefix
theta-join of alias widening, the one-pass sweep and the semi/anti-join
confusion — no driver-side entity sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.linking import widen_aliases
from tecs_hardware_kbc_spark.operators.scoring import (
    best_threshold,
    entity_scores,
    threshold_sweep,
)
from tecs_hardware_kbc_spark.pipeline import gold_entities
from tecs_hardware_kbc_spark.sources.sinks import write_discrepancies


def read_prob_csv(spark: SparkSession, path: str,
                  attribute: str) -> DataFrame:
    """A probability CSV as written by ``sinks.write_prob_csv``:
    (doc, part, value, prob) with header — one file per relation, so the
    attribute comes from the caller (the reference names it in the
    filename, ``ce_v_max_test_probs.csv``)."""
    return (
        spark.read.option("header", True).csv(path)
        .select(
            F.upper("doc").alias("doc"),
            F.upper("part").alias("part"),
            F.lit(attribute).alias("attribute"),
            F.col("value"),
            F.col("prob").cast("double").alias("prob"),
        )
    )


def _read_gold(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv") or path.endswith(".csv/"):
        raw = spark.read.option("header", True).csv(path)
    else:
        raw = spark.read.parquet(path)
    return gold_entities(raw)


def _read_doc_set(spark: SparkSession, path: str) -> DataFrame:
    """One-doc-per-line file (the reference's dev/test filename lists)."""
    return spark.read.csv(path).select(
        F.upper(F.col("_c0")).alias("doc")).dropDuplicates()


def analyze(spark: SparkSession, probs_path: str, gold_path: str,
            attribute: str, out_dir: str,
            dev_probs_path: str | None = None,
            docs_path: str | None = None,
            threshold: float | None = None) -> dict:
    """The analysis flow of ``analysis.py:main``:

    1. read the (test) probability CSV; alias-widen through parts_by_doc;
    2. optionally restrict entities AND gold to a doc-set file;
    3. pick b: explicit ``threshold``, else tune on ``dev_probs_path``
       (the reference tunes on the dev CSV), else tune on the test CSV;
    4. score at b, write ``<attribute>_discrepancies`` FP/FN CSV under
       ``out_dir`` and return the score dict.
    """
    gold = _read_gold(spark, gold_path).filter(
        F.col("attribute") == attribute)
    parts_by_doc = gold.select("doc", "part").dropDuplicates()

    def load(path: str) -> DataFrame:
        ents = widen_aliases(read_prob_csv(spark, path, attribute),
                             parts_by_doc)
        if docs_path:
            docs = F.broadcast(_read_doc_set(spark, docs_path))
            ents = ents.join(docs, "doc", "left_semi")
        return ents

    test = load(probs_path)
    if docs_path:
        gold = gold.join(F.broadcast(_read_doc_set(spark, docs_path)),
                         "doc", "left_semi")

    if threshold is not None:
        b = threshold
    else:
        tune_on = load(dev_probs_path) if dev_probs_path else test
        b = float(best_threshold(threshold_sweep(tune_on, gold))["b"])

    final = test.filter(F.col("prob") > b)
    scores = entity_scores(final, gold)
    scores["b"] = b
    write_discrepancies(final, gold,
                        f"{out_dir}/{attribute}_discrepancies")
    return scores


def compare_kb(spark: SparkSession, kb_path: str, gold_path: str,
               attribute: str, out_dir: str,
               docs_path: str | None = None) -> dict:
    """Cross-KB scoring (``digikey_analysis.py:20-60``): score one
    knowledge base's entity set against another used as the metric —
    the reference scores Digi-Key's catalog gold against their own gold
    over the 66-doc overlap set — and write the FP/FN discrepancy CSV.
    Both inputs are gold-format tables (filename, manuf, part, attribute,
    value), parquet or CSV."""
    kb = _read_gold(spark, kb_path).filter(F.col("attribute") == attribute)
    gold = _read_gold(spark, gold_path).filter(
        F.col("attribute") == attribute)
    if docs_path:
        docs = F.broadcast(_read_doc_set(spark, docs_path))
        kb = kb.join(docs, "doc", "left_semi")
        gold = gold.join(docs, "doc", "left_semi")
    scores = entity_scores(kb, gold)
    write_discrepancies(kb, gold,
                        f"{out_dir}/{attribute}_kb_discrepancies")
    return scores
