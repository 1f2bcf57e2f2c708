"""The training-data curation recipe: documents in, training corpus out.

Composes the engine's LLM-pipeline operators into the standard web-text
curation funnel — the end-to-end job a pretraining data team actually
submits, with per-stage row accounting so every drop is attributable:

    exact dedup -> near-dup dedup (minhash LSH + connected components,
    keep-one-per-group) -> [corpus-wide paragraph dedup] -> language
    keep-list -> quality gate -> [Gopher outlier rules] -> [LM
    perplexity gate (CCNet)] -> PII redaction -> optional benchmark
    decontamination -> deterministic sample -> train/val/test split ->
    parquet partitioned by split

Every stage is one of the independently oracle-checked operators
(`dedup.py`, `textstats.py`, `sampling.py`); this module only wires
them, so the funnel inherits their scale postures: the corpus shuffles
once for exact dedup (fingerprint), once for the minhash bands, once
for the CC iterations — everything else (filters, redaction, sampling,
splitting) is narrow projections, and the benchmark side of
decontamination is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F


def curate(spark: SparkSession, docs: DataFrame,
           benchmark: DataFrame | None = None,
           min_quality: float = 0.3,
           langs: list[str] | None = None,
           sample_fraction: float = 1.0,
           splits: dict[str, float] | None = None,
           near_dup_threshold: float = 0.5,
           decontam_n: int = 8,
           dedup_paragraphs: bool = False,
           gopher_rules: bool = False,
           gopher_kwargs: dict | None = None,
           max_per_domain: int | None = None,
           url_col: str = "url",
           quality_model: dict | None = None,
           min_model_score: float = 0.5,
           ngram_lm=None,
           max_perplexity: float | None = None) -> tuple[DataFrame, dict]:
    """Run the curation funnel over ``docs`` (doc_id, text, ...).

    Returns ``(curated, funnel)``: the curated DataFrame (original
    columns, ``text`` replaced by its redacted form, plus ``split``) and
    a funnel dict of per-stage surviving row counts.

    The funnel counts force one action per stage; at corpus scale run
    with them (they are cheap counts over already-needed intermediates)
    or lift the stages directly if stage accounting is not wanted."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        decontaminate, exact_keepers, minhash_near_duplicates,
        near_duplicate_components, paragraph_dedup)
    from tecs_hardware_kbc_spark.operators.sampling import (
        sample_by_hash, split_by_hash)
    from tecs_hardware_kbc_spark.operators.textstats import (
        gopher_cols, lang_pred_cols, quality_col, redact_col)

    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    funnel: dict[str, int] = {"input": docs.count()}

    # 0 (optional). per-domain caps — the URL-level gate runs FIRST so
    # a hot domain never pays for text-side processing it won't survive
    if max_per_domain is not None:
        from tecs_hardware_kbc_spark.operators.urls import domain_cap
        capped = domain_cap(docs, url_col=url_col, id_col="doc_id",
                            max_per_domain=max_per_domain)
        docs = docs.join(capped.select("doc_id"), "doc_id", "left_semi")
        funnel["domain_cap"] = docs.count()

    # The expensive stages (fingerprint groupBy, minhash banding + CC,
    # benchmark shingle join) each reduce to a SMALL doc_id set; persist
    # THOSE — not the corpus — so every downstream count/action replays
    # them from cache instead of re-running the whole dedup lineage
    # (without this, the funnel's N counts re-execute minhash+CC N
    # times). Persisting ID sets is the scale-correct variant of the
    # cache: O(#docs) longs, never the 100 TB of text.

    # 1. exact dedup: keep the canonical row of every fingerprint group
    # (exact_keepers = the min-id-per-fingerprint agg, no mapping join)
    keep = exact_keepers(docs).persist()
    cur = docs.join(keep, "doc_id", "left_semi")
    funnel["exact_dedup"] = keep.count()

    # 2. near-dup dedup: banded minhash pairs -> CC -> keep min per group
    pairs = minhash_near_duplicates(cur, threshold=near_dup_threshold)
    comp = near_duplicate_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("canonical_id")) \
        .select("doc_id").persist()
    cur = cur.join(losers, "doc_id", "left_anti")
    funnel["near_dedup"] = funnel["exact_dedup"] - losers.count()

    # 2b (optional). corpus-wide paragraph dedup: boilerplate paragraphs
    # survive once corpus-wide; docs reduced to nothing are dropped here
    if dedup_paragraphs:
        pd = paragraph_dedup(cur)
        cur = (cur.drop("text")
               .join(pd.filter(F.col("n_paras_kept") > 0)
                       .select("doc_id",
                               F.col("text_dedup").alias("text")),
                     "doc_id"))
        funnel["para_dedup"] = cur.count()

    # 3-5 FUSED: every per-document gate (language keep-list, quality,
    # Gopher rules, model score) is a pure column expression over the
    # same row, so compute ALL of them in ONE narrow projection over
    # the post-dedup survivors — no doc_id joins, no per-stage re-scan
    # — and take ALL the funnel counts from ONE aggregation over the
    # cumulative flags. At 100 TB this is the difference between one
    # pass over the text and five. (The heuristic language gate uses
    # lang_pred, not the lang column — a crawl's self-declared language
    # lies.)
    text = F.col("text")
    flags: list[tuple[str, Column]] = []  # (funnel key, stage predicate)
    if langs:
        pred, _ = lang_pred_cols(text)
        flags.append(("lang_filter", pred.isin(list(langs))))
    flags.append(("quality_gate",
                  quality_col(text) >= F.lit(float(min_quality))))
    if gopher_rules:
        flags.append((
            "gopher_gate",
            gopher_cols(text, **(gopher_kwargs or {}))["gopher_keep"]))
    if quality_model is not None:
        from tecs_hardware_kbc_spark.operators.quality_model import (
            qm_score_col)
        flags.append(("model_gate",
                      qm_score_col(text, quality_model)
                      >= F.lit(float(min_model_score))))

    flagged = cur.select("*", *[c.alias(f"_f_{k}") for k, c in flags])
    cum, cum_sums = F.lit(True), []
    for k, _ in flags:
        cum = cum & F.col(f"_f_{k}")
        cum_sums.append(F.sum(cum.cast("long")).alias(k))
    counts = flagged.agg(*cum_sums).collect()[0].asDict()
    for k, _ in flags:
        funnel[k] = counts[k]
    cur = flagged.filter(cum).drop(*[f"_f_{k}" for k, _ in flags])

    n_cur = counts[flags[-1][0]]

    # 4b (optional). LM perplexity gate (CCNet): the trained reference
    # LM (a train-time artifact, like the frozen quality model) scores
    # the post-gate survivors; unlike the fused per-row gates this
    # needs the explode + broadcast-join + doc agg, so it runs as its
    # own stage on the already-thinned corpus.  Unscored (too-short)
    # docs are kept — no evidence either way.
    if ngram_lm is not None and max_perplexity is not None:
        from tecs_hardware_kbc_spark.operators.ngram_lm import (
            doc_perplexity)
        keep_ppl = (doc_perplexity(cur, ngram_lm)
                    .filter(F.col("ppl").isNull()
                            | (F.col("ppl") <= float(max_perplexity)))
                    .select("doc_id").persist())
        cur = cur.join(keep_ppl, "doc_id", "left_semi")
        n_cur = keep_ppl.count()
        funnel["lm_perplexity"] = n_cur

    # 5. PII redaction (text is REPLACED by its redacted form) — a
    # second narrow projection AFTER the gate filter so dropped rows
    # never pay for the chained regex replacements
    cur = cur.withColumn("text", redact_col(text))
    funnel["pii_redacted"] = n_cur  # row-preserving

    # 6. benchmark decontamination: drop any doc sharing an n-gram
    if benchmark is not None:
        contaminated = decontaminate(cur, benchmark, n=decontam_n) \
            .select("doc_id").persist()
        cur = cur.join(contaminated, "doc_id", "left_anti")
        n_cur -= contaminated.count()
        funnel["decontaminated"] = n_cur

    # 7. deterministic sample + split
    if sample_fraction < 1.0:
        cur = sample_by_hash(cur, "doc_id", sample_fraction)
        n_cur = cur.count()
        funnel["sampled"] = n_cur
    cur = split_by_hash(cur, "doc_id", splits)
    funnel["output"] = n_cur
    return cur, funnel


def curate_to_parquet(spark: SparkSession, docs_path: str, out_dir: str,
                      benchmark_path: str | None = None,
                      **kwargs) -> dict:
    """CLI surface: parquet in -> curated parquet (partitioned by split)
    out, returns the funnel stats."""
    docs = spark.read.parquet(docs_path)
    bench = (spark.read.parquet(benchmark_path)
             if benchmark_path else None)
    curated, funnel = curate(spark, docs, benchmark=bench, **kwargs)
    curated.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    return funnel
