"""End-to-end KBC pipeline: pages -> triples (SURVEY §3 lifecycle).

The reference's hard-coded operator DAG (parse -> mentions -> candidates ->
featurize -> label -> models -> score, ``transistors.py:138-618``) becomes a
declarative chain of DataFrame stages; Catalyst plans each one. Differences
that matter at scale:

* parse + mention + context stages are computed once per corpus and shared
  by ALL relations (the reference re-walks Postgres per relation);
* supervision = LF-matrix vote aggregation (north_star replacement for the
  Snorkel LabelModel) — fully distributed, no driver-side fit;
* threshold tuning = the one-pass sweep (scoring.threshold_sweep);
* canonicalization = connected components over alias edges;
* triples land partitioned by predicate (``partitionBy("pred")``).

``run_kbc`` is the in-memory form (tests, ``__spark_entry__``);
``run_kbc_checkpointed`` adds resumable parquet stage checkpoints + lineage
metrics via ``plans.lineage.StageRunner`` (bench + cluster runs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tecs_hardware_kbc_spark.operators import candidates as C
from tecs_hardware_kbc_spark.operators import context as X
from tecs_hardware_kbc_spark.operators import mentions as M
from tecs_hardware_kbc_spark.operators.canonicalize import (
    canonicalize_entities,
    connected_components,
    doc_alias_edges,
)
from tecs_hardware_kbc_spark.operators.extract import parse_pages
from tecs_hardware_kbc_spark.operators.labeling import apply_lfs, with_context
from tecs_hardware_kbc_spark.operators.linking import (
    entities_to_triples,
    opamp_entities,
    to_entities,
    widen_aliases,
)
from tecs_hardware_kbc_spark.operators.scoring import (
    best_threshold,
    entity_scores,
    threshold_sweep,
)

BINARY_RELATIONS = ["stg_temp_min", "stg_temp_max", "polarity", "ce_v_max"]
UNARY_RELATIONS = ["typ_gbp", "typ_supply_current"]
ALL_RELATIONS = BINARY_RELATIONS + UNARY_RELATIONS


def ingest(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """Latest crawl per url (late re-crawl dedup) + language filter.

    One shuffle on url; at scale the pages table is already partitioned by
    url-hash so this collapses into the existing distribution.
    """
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    out = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if lang:
        out = out.filter(F.col("lang") == lang)
    return out


@dataclass
class KBCResult:
    triples: DataFrame
    entities: DataFrame
    scores: dict[str, dict] = field(default_factory=dict)
    thresholds: dict[str, float] = field(default_factory=dict)
    stage_counts: dict[str, int] = field(default_factory=dict)


def gold_entities(gold: DataFrame) -> DataFrame:
    """Gold CSV rows (filename, manuf, part, attribute, value) -> entity
    tuples, uppercased like the reference scorer (transistor_utils.py:146-159)."""
    return gold.select(
        F.upper("filename").alias("doc"),
        F.upper("part").alias("part"),
        F.col("attribute"),
        F.col("value"),
    ).dropDuplicates()


def extract_mentions(sentences: DataFrame, gazetteer: DataFrame,
                     ctx: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {
        "part": M.part_mentions(sentences, gazetteer),
        "stg_temp_min": M.temp_mentions(sentences, "min"),
        "stg_temp_max": M.temp_mentions(sentences, "max"),
        "polarity": M.polarity_mentions(sentences),
        "ce_v_max": M.ce_v_max_mentions(sentences, ctx["row"]),
        "gain": M.gain_mentions(sentences, ctx["row"], ctx["row2"], ctx["col"]),
        "current": M.current_mentions(sentences, ctx["row"], ctx["row5"],
                                      ctx["col"]),
    }


def build_context(sentences: DataFrame) -> dict[str, DataFrame]:
    row = X.build_row_ngrams(sentences)
    return {
        "row": row,
        "col": X.build_col_ngrams(sentences),
        "row2": X.build_row_spread(row, 2),
        "row5": X.build_row_spread(row, 5),
    }


def relation_candidates(rel: str, mentions: dict[str, DataFrame],
                        ctx: dict[str, DataFrame]) -> DataFrame:
    parts = mentions["part"]
    if rel == "stg_temp_min":
        return C.stg_temp_candidates(parts, mentions["stg_temp_min"])
    if rel == "stg_temp_max":
        return C.stg_temp_candidates(parts, mentions["stg_temp_max"])
    if rel == "polarity":
        return C.polarity_candidates(parts, mentions["polarity"], ctx["row"])
    if rel == "ce_v_max":
        return C.ce_v_max_candidates(parts, mentions["ce_v_max"],
                                     ctx["row"], ctx["col"])
    if rel == "typ_gbp":
        return C.unary_candidates(mentions["gain"])
    if rel == "typ_supply_current":
        return C.unary_candidates(mentions["current"])
    raise ValueError(rel)


def relation_entities(rel: str, scored: DataFrame,
                      ctx: dict[str, DataFrame],
                      parts_by_doc: DataFrame | None) -> DataFrame:
    if rel in UNARY_RELATIONS:
        return opamp_entities(scored, rel, ctx["row"], ctx["row2"],
                              ctx["row5"])
    ents = to_entities(scored, rel)
    if parts_by_doc is not None:
        ents = widen_aliases(ents, parts_by_doc)
    return ents


def run_kbc(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer: DataFrame,
    gold: DataFrame | None = None,
    relations: list[str] | None = None,
    canonicalize: bool = True,
    sweep: bool = True,
    default_threshold: float = 0.5,
) -> KBCResult:
    """The flagship job. With ``gold``: per-relation threshold sweep and
    P/R/F1; without: fixed ``default_threshold``."""
    relations = relations or ALL_RELATIONS

    # localCheckpoint at every stage boundary: it caches AND truncates the
    # logical plan, so the ~30 downstream actions (per-relation sweeps,
    # counts) each plan against a flat LogicalRDD instead of re-analyzing
    # the full parse->grams->LF lineage. On a cluster the checkpointed
    # variant (parquet stage tables) plays this role.
    clean = ingest(pages)
    sentences = parse_pages(clean).localCheckpoint()
    ctx = build_context(sentences)
    ctx = {k: v.localCheckpoint() for k, v in ctx.items()}
    mentions = extract_mentions(sentences, gazetteer, ctx)
    mentions = {k: v.localCheckpoint() for k, v in mentions.items()}

    gold_ents = gold_entities(gold).persist() if gold is not None else None
    parts_by_doc = (
        gold_ents.select("doc", "part").dropDuplicates()
        if gold_ents is not None else None
    )

    components = (
        connected_components(doc_alias_edges(clean)).persist()
        if canonicalize else None
    )

    result_entities: list[DataFrame] = []
    scores: dict[str, dict] = {}
    thresholds: dict[str, float] = {}

    for rel in relations:
        cands = relation_candidates(rel, mentions, ctx)
        cands_ctx = with_context(cands, sentences, ctx["row"], ctx["col"])
        scored = apply_lfs(cands_ctx, rel)
        ents = relation_entities(rel, scored, ctx, parts_by_doc)
        if components is not None:
            ents = canonicalize_entities(ents, components, on="doc")
        ents = ents.localCheckpoint()

        if sweep and gold_ents is not None:
            rel_gold = gold_ents.filter(F.col("attribute") == rel)
            # the best sweep row already carries tp/fp/fn/P/R/F1 at the
            # chosen threshold — no re-scoring pass needed
            best = best_threshold(threshold_sweep(ents, rel_gold))
            b = float(best["b"])
            thresholds[rel] = b
            final = ents.filter(F.col("prob") > b)
            scores[rel] = {k: best[k] for k in
                           ("tp", "fp", "fn", "precision", "recall", "f1")}
            scores[rel]["b"] = b
        else:
            thresholds[rel] = default_threshold
            final = ents.filter(F.col("prob") > default_threshold)
        result_entities.append(final)

    entities = result_entities[0]
    for e in result_entities[1:]:
        entities = entities.unionByName(e)

    triples = entities_to_triples(entities)
    return KBCResult(triples=triples, entities=entities, scores=scores,
                     thresholds=thresholds)


def run_kbc_checkpointed(spark: SparkSession, pages_path: str,
                         gazetteer_path: str, out_dir: str,
                         gold_path: str | None = None,
                         relations: list[str] | None = None,
                         resume: bool = True) -> KBCResult:
    """Checkpointed variant: each stage is a resumable parquet table with
    lineage + metrics (plans/lineage.py). Used by bench.py and spark-submit
    cluster runs."""
    from tecs_hardware_kbc_spark.plans.lineage import StageRunner

    runner = StageRunner(spark, out_dir, resume=resume)
    relations = relations or ALL_RELATIONS

    pages = spark.read.parquet(pages_path)
    gazetteer = spark.read.parquet(gazetteer_path)
    gold = spark.read.parquet(gold_path) if gold_path else None

    sentences = runner.run(
        "sentences", lambda: parse_pages(ingest(pages)), inputs=["pages"]
    ).persist()
    ctx = {
        "row": runner.run("row_ngrams",
                          lambda: X.build_row_ngrams(sentences),
                          inputs=["sentences"]),
        "col": runner.run("col_ngrams",
                          lambda: X.build_col_ngrams(sentences),
                          inputs=["sentences"]),
    }
    ctx["row2"] = runner.run("row_spread2",
                             lambda: X.build_row_spread(ctx["row"], 2),
                             inputs=["row_ngrams"])
    ctx["row5"] = runner.run("row_spread5",
                             lambda: X.build_row_spread(ctx["row"], 5),
                             inputs=["row_ngrams"])
    mentions = extract_mentions(sentences, gazetteer, ctx)
    mentions = {
        k: runner.run(f"mentions_{k}", lambda df=v: df,
                      inputs=["sentences"])
        for k, v in mentions.items()
    }

    gold_ents = gold_entities(gold).persist() if gold is not None else None
    parts_by_doc = (
        gold_ents.select("doc", "part").dropDuplicates()
        if gold_ents is not None else None
    )

    components = connected_components(
        doc_alias_edges(ingest(pages))
    ).persist()

    result_entities = []
    scores: dict[str, dict] = {}
    thresholds: dict[str, float] = {}
    for rel in relations:
        scored = runner.run(
            f"scored_{rel}",
            lambda rel=rel: apply_lfs(
                with_context(relation_candidates(rel, mentions, ctx),
                             sentences, ctx["row"], ctx["col"]), rel),
            inputs=[f"mentions_{rel}", "mentions_part"],
        )
        ents = canonicalize_entities(
            relation_entities(rel, scored, ctx, parts_by_doc),
            components, on="doc",
        ).persist()
        if gold_ents is not None:
            rel_gold = gold_ents.filter(F.col("attribute") == rel)
            best = best_threshold(threshold_sweep(ents, rel_gold))
            b = float(best["b"])
            thresholds[rel] = b
            final = ents.filter(F.col("prob") > b)
            scores[rel] = entity_scores(final, rel_gold)
            scores[rel]["b"] = b
        else:
            thresholds[rel] = 0.5
            final = ents.filter(F.col("prob") > 0.5)
        result_entities.append(final)

    entities = result_entities[0]
    for e in result_entities[1:]:
        entities = entities.unionByName(e)

    triples = runner.run(
        "triples", lambda: entities_to_triples(entities),
        inputs=[f"scored_{r}" for r in relations],
        partition_by=["pred"],
    )
    runner.flush_metrics({"scores": scores, "thresholds": thresholds})
    return KBCResult(triples=triples, entities=entities, scores=scores,
                     thresholds=thresholds)
