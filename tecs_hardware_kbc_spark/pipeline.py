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
from tecs_hardware_kbc_spark.operators.labeling import (
    RELATION_NEEDS,
    apply_lfs,
    build_sentence_context,
    with_context,
)
from tecs_hardware_kbc_spark.operators.linking import (
    entities_to_triples,
    opamp_entities,
    to_entities,
    widen_aliases,
)
from tecs_hardware_kbc_spark.operators.scoring import (
    is_dev_doc,
    tune_and_score,
)

BINARY_RELATIONS = ["stg_temp_min", "stg_temp_max", "polarity", "ce_v_max"]
UNARY_RELATIONS = ["typ_gbp", "typ_supply_current"]
ALL_RELATIONS = BINARY_RELATIONS + UNARY_RELATIONS


def ingest(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """Latest crawl per url (late re-crawl dedup) + language filter.

    Order matters: latest-crawl selection FIRST, then the language filter —
    a url whose newest crawl is non-English is dropped, not resurrected via
    a stale superseded English crawl. This mirrors ``streaming_latest_crawl``,
    which tracks the true latest crawl per url regardless of language.

    ``max_by`` aggregation, not a row_number window: one shuffle with
    map-side partial aggregation (each mapper keeps only its local latest
    per url, so shuffle volume is bounded by distinct urls per mapper even
    without a pre-filter — the window variant shuffles every duplicate row
    in full), and downstream stages read the aggregation's partitioning
    directly — no second full shuffle of the html blobs before the parse
    UDF (the session's AQE coalesce floor keeps this exchange at full
    parallelism; see session.py).
    """
    others = [c for c in pages.columns if c != "url"]
    latest = (
        pages.groupBy("url")
        .agg(F.max_by(F.struct(*others), "warc_ts").alias("_s"))
        .select("url", *[F.col(f"_s.{c}").alias(c) for c in others])
    )
    if lang:
        latest = latest.filter(F.col("lang") == lang)
    return latest


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


def extract_mentions(grams: DataFrame, sentences: DataFrame,
                     gazetteer: DataFrame,
                     ctx: dict[str, DataFrame],
                     compact: DataFrame | None = None) -> dict[str, DataFrame]:
    # With the compact gram table available, each matcher explodes only
    # its pre-gated gram subset (mentions.gated_grams) — the explode is
    # where context columns get duplicated per gram, so gating before it
    # skips ~95% of that row traffic per matcher. Gates are supersets of
    # the matchers' own first filters; results are identical.
    if compact is None:
        gp = g1 = g2 = gpol = grams
    else:
        gp = M.gated_grams(compact, M.pregate_part)
        g1 = M.gated_grams(compact, M.pregate_numeric(1))
        g2 = M.gated_grams(compact, M.pregate_numeric(2))
        gpol = M.gated_grams(compact, M.pregate_polarity)
    return {
        "part": M.part_mentions(gp, gazetteer),
        "stg_temp_min": M.temp_mentions(g2, "min"),
        "stg_temp_max": M.temp_mentions(g2, "max"),
        "polarity": M.polarity_mentions(gpol, sentences),
        "ce_v_max": M.ce_v_max_mentions(g1, sentences, ctx["row"]),
        "gain": M.gain_mentions(g1, sentences, ctx["row"], ctx["row2"],
                                ctx["col"]),
        "current": M.current_mentions(g2, sentences, ctx["row"],
                                      ctx["row5"], ctx["col"]),
    }


def build_context(grams: DataFrame) -> dict[str, DataFrame]:
    row = X.build_row_ngrams(grams)
    return {
        "row": row,
        "col": X.build_col_ngrams(grams),
        "row2": X.build_row_spread(row, 2),
        "row5": X.build_row_spread(row, 5),
    }


def build_ce_context(grams: DataFrame) -> dict[str, DataFrame]:
    """The ce_v_max-only context tables (head grams, part-like expansions,
    numeric counts) backing the part-prefix/mismatch LF family. The
    expansion vocabulary is computed once and shared (localCheckpoint so
    the pandas expansion UDF runs exactly once); each table carries every
    column its LFs probe so with_context pays ONE join per table."""
    exp = X.build_part_expansions(grams).localCheckpoint()
    return {
        "rowhead": X.build_head_grams(grams, "row"),
        "colhead": X.build_head_context(grams, exp, "col"),
        "row_parts": X.build_axis_part_grams(grams, exp, "row"),
        "col_parts": X.build_axis_part_grams(grams, exp, "col"),
        "row_nnum": X.build_row_number_counts(grams),
    }


def relation_candidates(rel: str, mentions: dict[str, DataFrame],
                        ctx: dict[str, DataFrame],
                        visual: DataFrame | None = None) -> DataFrame:
    parts = mentions["part"]
    if rel == "stg_temp_min":
        return C.stg_temp_candidates(parts, mentions["stg_temp_min"],
                                     visual=visual)
    if rel == "stg_temp_max":
        return C.stg_temp_candidates(parts, mentions["stg_temp_max"],
                                     visual=visual)
    if rel == "polarity":
        return C.polarity_candidates(parts, mentions["polarity"], ctx["row"],
                                     visual=visual)
    if rel == "ce_v_max":
        return C.ce_v_max_candidates(parts, mentions["ce_v_max"],
                                     ctx["row"], ctx["col"], visual=visual)
    if rel == "typ_gbp":
        return C.unary_candidates(mentions["gain"])
    if rel == "typ_supply_current":
        return C.unary_candidates(mentions["current"])
    raise ValueError(rel)


def relation_entities(rel: str, scored: DataFrame,
                      ctx: dict[str, DataFrame],
                      parts_by_doc: DataFrame | None,
                      dedup: bool = True) -> DataFrame:
    """``dedup=False`` when a canonicalize step follows: its final
    (ENTITY_KEY, max(prob)) aggregation subsumes the per-stage dedups,
    so the intermediate groupBys (and their Exchanges) are skipped."""
    if rel in UNARY_RELATIONS:
        return opamp_entities(scored, rel, ctx["row"], ctx["row2"],
                              ctx["row5"],
                              neighbor_cells=ctx.get("ncell"),
                              dedup=dedup)
    ents = to_entities(scored, rel, dedup=False)
    if parts_by_doc is not None:
        ents = widen_aliases(ents, parts_by_doc, dedup=dedup)
    elif dedup:
        ents = (ents.groupBy("doc", "part", "attribute", "value")
                .agg(F.max("prob").alias("prob")))
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
    supervision: str = "votes",
    visual_coords: DataFrame | None = None,
) -> KBCResult:
    """The flagship job. With ``gold``: per-relation threshold sweep and
    P/R/F1; without: fixed ``default_threshold``.

    ``visual_coords``: optional per-sentence bbox sidecar (url, position,
    v_top/v_left/v_bottom/v_right). When provided, candidate throttlers
    use true visual alignment and the viz LFs their bbox forms, falling
    back per-row to the structural proxies (operators/visual.py).

    ``supervision``: "votes" (Laplace vote ratio), "weighted_votes"
    (agreement-statistics accuracy weighting — the LabelModel stand-in),
    or "multitask" (the reference's full flow: featurize -> frozen key
    space -> shared-trunk multi-task LR trained on the weak labels ->
    model marginals, transistors.py:350-567). The multitask trainer
    collects the per-relation sparse matrices to the driver — see the
    size bound in ``fit_logreg_multitask``'s COST CONTRACT; beyond it,
    use ``features.fit_logreg_distributed`` (spark.ml LBFGS) per task.
    """
    from concurrent.futures import ThreadPoolExecutor

    relations = relations or ALL_RELATIONS

    # localCheckpoint at every stage boundary: it caches AND truncates the
    # logical plan, so the ~30 downstream actions (per-relation sweeps,
    # counts) each plan against a flat LogicalRDD instead of re-analyzing
    # the full parse->grams->LF lineage. On a cluster the checkpointed
    # variant (parquet stage tables) plays this role.
    #
    # Independent stages — and the six per-relation sub-pipelines — are
    # submitted CONCURRENTLY (Spark's scheduler interleaves jobs): the
    # dominant cost at moderate scale is per-stage scheduling latency, and
    # overlapping jobs hides it while keeping every core busy.
    clean = ingest(pages)
    # the parse UDF reads the ingest aggregation's shuffle output directly
    # — no extra full shuffle of the html corpus. The session's AQE
    # coalesce floor (minPartitionSize, session.py) keeps that exchange at
    # full parallelism even though compressed html makes it look tiny.
    sentences = parse_pages(clean).localCheckpoint()
    # the gram table is materialized once: higher-order-function evaluation
    # is the expensive part (HOFs don't fully codegen), so ~10 downstream
    # consumers must read cached results, not re-derive them. The COMPACT
    # pre-explode array form is what gets checkpointed (context columns
    # stored once per sentence, not once per gram — ~25x less cached row
    # volume); consumers re-run only the cheap explode. Measured 1.75x
    # faster end-to-end at 64k pages than checkpointing the exploded rows.
    grams_compact = M.gram_space_compact(sentences)
    grams = M.explode_gram_arrays(grams_compact)

    def ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint()

    # 3 concurrent jobs is the sweet spot measured at both 8 and 32 cores:
    # enough overlap to hide stage latency, not enough to thrash the
    # scheduler/caches (8 concurrent jobs doubled wall time on 8 cores)
    pool = ThreadPoolExecutor(max_workers=3)
    try:
        row_f = pool.submit(ckpt, X.build_row_ngrams(grams))
        col_f = pool.submit(ckpt, X.build_col_ngrams(grams))
        sent_ctx_f = pool.submit(
            ckpt, build_sentence_context(sentences, grams,
                                         compact=grams_compact))
        parts_f = pool.submit(
            ckpt, M.part_mentions(
                M.gated_grams(grams_compact, M.pregate_part), gazetteer))
        comps_f = (
            pool.submit(
                lambda: connected_components(doc_alias_edges(clean)).persist())
            if canonicalize else None
        )
        gold_ents = (gold_entities(gold).persist()
                     if gold is not None else None)
        gold_totals: dict[tuple[str, bool], int] = {}
        if gold_ents is not None and sweep:
            gold_totals = {
                (r["attribute"], r["_dev"]): r["n"]
                for r in gold_ents
                .withColumn("_dev", is_dev_doc(F.col("doc")))
                .groupBy("attribute", "_dev")
                .agg(F.count("*").alias("n")).collect()
            }
        parts_by_doc = (
            gold_ents.select("doc", "part").dropDuplicates()
            if gold_ents is not None else None
        )

        row = row_f.result()
        row2_f = pool.submit(ckpt, X.build_row_spread(row, 2))
        row5_f = pool.submit(ckpt, X.build_row_spread(row, 5))
        extra_f = None
        if "ce_v_max" in relations:
            # one future per table so the pool interleaves their jobs
            extra_f = {k: pool.submit(ckpt, v)
                       for k, v in build_ce_context(grams).items()}
        ncell_f = (
            pool.submit(ckpt, X.build_neighbor_cell_ngrams(
                grams, directions=["RIGHT"]))
            if any(r in UNARY_RELATIONS for r in relations) else None
        )
        ctx = {"row": row, "col": col_f.result(),
               "row2": row2_f.result(), "row5": row5_f.result()}
        if ncell_f is not None:
            ctx["ncell"] = ncell_f.result()
        sent_ctx = sent_ctx_f.result()
        mentions = extract_mentions(grams, sentences, gazetteer, ctx,
                                    compact=grams_compact)
        mentions["part"] = parts_f.result()
        components = comps_f.result() if comps_f else None
        extra = {k: f.result() for k, f in extra_f.items()} if extra_f else {}

        def score_relation(rel: str) -> DataFrame:
            cands = relation_candidates(rel, mentions, ctx,
                                        visual=visual_coords)
            needs = set(RELATION_NEEDS[rel])
            if supervision == "multitask":
                # the feature layer reads the same context arrays the LFs do
                needs |= {"a_row", "a_col"}
            cands_ctx = with_context(cands, sent_ctx, ctx["row"], ctx["col"],
                                     needs=needs, extra=extra)
            if supervision == "multitask":
                from tecs_hardware_kbc_spark.operators.features import (
                    featurize)
                cands_ctx = featurize(cands_ctx)
            scored = apply_lfs(cands_ctx, rel)
            if supervision == "weighted_votes":
                from tecs_hardware_kbc_spark.operators.labeling import (
                    weighted_marginals)
                scored = weighted_marginals(scored)
            return scored

        multitask_scored: dict[str, DataFrame] = {}
        if supervision == "multitask":
            # Reference flow (transistors.py:350-567): featurize -> frozen
            # key space -> shared-trunk multi-task model trained on the
            # weak labels -> model marginals replace the vote ratio. The
            # joint fit is a barrier across relations, so stage it before
            # the per-relation entity phase.
            from tecs_hardware_kbc_spark.operators.features import (
                encode_features, feature_vocabulary, fit_logreg_multitask,
                predict_logreg)

            feats = {rel: pool.submit(
                lambda rel=rel: score_relation(rel)
                .withColumn("cand_id", F.monotonically_increasing_id())
                .localCheckpoint()) for rel in relations}
            feats = {rel: f.result() for rel, f in feats.items()}
            union = None
            for df in feats.values():
                sel = df.select("features")
                union = sel if union is None else union.unionByName(sel)
            vocab = feature_vocabulary(union).localCheckpoint()
            vsize = vocab.count()
            # soft targets: the vote marginals themselves (the reference
            # trains Emmental on the LabelModel's probabilistic labels,
            # not a hard threshold) — cross-entropy gradient (p - y)
            # handles y in [0, 1] directly
            encoded = {
                rel: encode_features(df, vocab, ["cand_id"])
                .join(df.select("cand_id", F.col("prob").alias("_y")),
                      "cand_id")
                .localCheckpoint()
                for rel, df in feats.items()
            }
            model = fit_logreg_multitask(encoded, "_y", vsize)
            for rel, df in feats.items():
                pred = predict_logreg(encoded[rel], model["heads"][rel],
                                      out_col="_prob_lr")
                multitask_scored[rel] = (
                    df.drop("prob", "features")
                    .join(pred.select("cand_id", "_prob_lr"), "cand_id")
                    .withColumnRenamed("_prob_lr", "prob")
                )

        def process(rel: str):
            scored = (multitask_scored[rel] if supervision == "multitask"
                      else score_relation(rel))
            ents = relation_entities(rel, scored, ctx, parts_by_doc,
                                     dedup=components is None)
            if components is not None:
                ents = canonicalize_entities(ents, components, on="doc")
            ents = ents.localCheckpoint()
            if sweep and gold_ents is not None:
                rel_gold = gold_ents.filter(F.col("attribute") == rel)
                # dev-tune/test-report (reference protocol): b = argmax-F1
                # on the dev doc slice; reported P/R/F1 comes from the
                # disjoint test slice at that b
                b, stats = tune_and_score(
                    ents, rel_gold,
                    dev_total=gold_totals.get((rel, True), 0),
                    test_total=gold_totals.get((rel, False), 0),
                    default_threshold=default_threshold)
            else:
                b, stats = default_threshold, None
            return ents.filter(F.col("prob") > b), b, stats

        futures = {rel: pool.submit(process, rel) for rel in relations}
        result_entities: list[DataFrame] = []
        scores: dict[str, dict] = {}
        thresholds: dict[str, float] = {}
        for rel in relations:
            final, b, stats = futures[rel].result()
            thresholds[rel] = b
            if stats is not None:
                scores[rel] = stats
            result_entities.append(final)
    finally:
        pool.shutdown(wait=False)

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
                         resume: bool = True,
                         visual_path: str | None = None) -> KBCResult:
    """Checkpointed variant: each stage is a resumable parquet table with
    lineage + metrics (plans/lineage.py). Used by bench.py and spark-submit
    cluster runs.

    ``visual_path``: optional parquet sidecar of per-sentence bboxes
    (url, position, v_top/v_left/v_bottom/v_right) — same semantics as
    ``run_kbc(visual_coords=...)``."""
    from tecs_hardware_kbc_spark.plans.lineage import StageRunner

    runner = StageRunner(spark, out_dir, resume=resume)
    relations = relations or ALL_RELATIONS

    pages = spark.read.parquet(pages_path)
    gazetteer = spark.read.parquet(gazetteer_path)
    gold = spark.read.parquet(gold_path) if gold_path else None
    visual_coords = (spark.read.parquet(visual_path)
                     if visual_path else None)

    sentences = runner.run(
        "sentences",
        lambda: parse_pages(ingest(pages)),
        inputs=["pages"],
    ).persist()
    # exploded-form parquet is the right shape HERE (unlike the in-memory
    # path's compact array checkpoint): dictionary/RLE encoding collapses
    # the repeated context columns on disk, and each consumer's scan
    # column-prunes — whereas an array<struct> column would force every
    # reader to fetch the whole gram payload
    grams = runner.run("grams", lambda: M.gram_space(sentences),
                       inputs=["sentences"])
    ctx = {
        "row": runner.run("row_ngrams",
                          lambda: X.build_row_ngrams(grams),
                          inputs=["grams"]),
        "col": runner.run("col_ngrams",
                          lambda: X.build_col_ngrams(grams),
                          inputs=["grams"]),
    }
    ctx["row2"] = runner.run("row_spread2",
                             lambda: X.build_row_spread(ctx["row"], 2),
                             inputs=["row_ngrams"])
    ctx["row5"] = runner.run("row_spread5",
                             lambda: X.build_row_spread(ctx["row"], 5),
                             inputs=["row_ngrams"])
    sent_ctx = runner.run("sentence_context",
                          lambda: build_sentence_context(sentences, grams),
                          inputs=["sentences", "grams"])
    extra = {}
    if "ce_v_max" in relations:
        ce_tables = build_ce_context(grams)
        extra = {
            k: runner.run(f"ce_ctx_{k}", lambda df=v: df, inputs=["grams"])
            for k, v in ce_tables.items()
        }
    if any(r in UNARY_RELATIONS for r in relations):
        ctx["ncell"] = runner.run(
            "neighbor_cells",
            lambda: X.build_neighbor_cell_ngrams(grams,
                                                 directions=["RIGHT"]),
            inputs=["grams"])
    mentions = extract_mentions(grams, sentences, gazetteer, ctx)
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
    # unary relations read the gain/current mention stages, not a stage
    # named after the relation itself
    mention_key = {"typ_gbp": "gain", "typ_supply_current": "current"}
    for rel in relations:
        scored = runner.run(
            f"scored_{rel}",
            lambda rel=rel: apply_lfs(
                with_context(relation_candidates(rel, mentions, ctx,
                                                 visual=visual_coords),
                             sent_ctx, ctx["row"], ctx["col"],
                             needs=RELATION_NEEDS[rel], extra=extra), rel),
            inputs=[f"mentions_{mention_key.get(rel, rel)}", "mentions_part"],
        )
        ents = canonicalize_entities(
            relation_entities(rel, scored, ctx, parts_by_doc, dedup=False),
            components, on="doc",
        ).persist()
        if gold_ents is not None:
            rel_gold = gold_ents.filter(F.col("attribute") == rel)
            # dev-tune/test-report, as in run_kbc
            b, stats = tune_and_score(ents, rel_gold)
            thresholds[rel] = b
            final = ents.filter(F.col("prob") > b)
            scores[rel] = stats
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
