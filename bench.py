#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the flagship KBC pipeline (pages -> triples, end-to-end with
threshold sweep + canonicalization) on a deterministic synthetic corpus
sized to the scale factor, plus representative relational / dedup /
similarity queries over the driver's parquet tables.

``--scaling`` re-runs the suite in two subprocesses at SPARK_GRAFT_CPUS=8
and =32 (N and 4N cores standing in for N and 4N executors) and reports
throughput at both + scaling efficiency — the sandbox evidence for the
north_rule's two-cluster-size criterion. Results land in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages for the KBC corpus: proportional to the scale factor (overridable)
PAGES_BY_SF = {"sf0.001": 100, "sf0.01": 1000, "sf0.1": 8000}
N_PAGES_ENV = os.environ.get("SPARK_GRAFT_BENCH_PAGES")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q_threshold_sweep",
    "q_asof_join",
    "q_window_topk",
    "doc_quality",
    "dedup_exact",
    "dedup_minhash_pairs",
    "sim_topk",
    "kbc_lingual_tags",
    "kbc_figures",
    "kbc_asof_pair",
    "media_augment_policy",
    "media_conv",
    # r5 lap 2: the two new scale ops
    "doc_span_dedup",   # exact substring dedup: rolling-window + fp window
    "emb_kmeans",       # fixed-point Lloyd's: 2 iterations + final assign
    "web_pagerank",     # link harvest + 3 integer power iterations
    # r5 lap 3: the KG-construction tail and graph ML (the tier headline)
    "kg_e2e",           # fusion -> conflict resolution -> N-Triples
    "kg_embed",         # TransE: 2 full-batch integer epochs
    # r5 lap 4: the structured-data KG leg + retrieval + graph analytics
    "web_kg_e2e",       # jsonld/meta harvest -> sameAs CC -> fuse -> resolve
    "doc_bm25",         # inverted index + BM25 top-k, df-capped
    "web_triangles",    # degree-ordered triangle counting
]
# doc_curate (the composed funnel) is deliberately NOT a headline query:
# its cost is the sum of components already benched above (minhash bands,
# CC, quality/redact scans) and would only add an 18s constant to the
# suite total. One-off funnel timings live in BENCH.md.


def _sf_label() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def _ramp_cpu(seconds: float = 2.0) -> None:
    """Busy-spin all cores briefly so the host's frequency governor ramps
    up BEFORE any timed lap (idle host downclocks 1.5-3x; see BENCH.md
    caveats). Cheap insurance against recording a downclocked number."""
    import numpy as np
    a = np.ones((1500, 1500))
    end = time.monotonic() + seconds
    while time.monotonic() < end:
        (a @ a)  # multithreaded BLAS keeps many cores busy


def run_suite() -> dict:
    import __spark_entry__ as E
    from tecs_hardware_kbc_spark.corpus import distributed_corpus
    from tecs_hardware_kbc_spark.pipeline import run_kbc
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    n_pages = (int(N_PAGES_ENV) if N_PAGES_ENV
               else PAGES_BY_SF.get(_sf_label(), 8000))

    t0 = time.monotonic()
    pages, gold, gaz = distributed_corpus(spark, n_pages, seed=42)
    n_page_rows = pages.count()
    gen_s = time.monotonic() - t0

    # lap 0 is an UNTIMED warm-up of the full kbc DAG (JIT-compiles every
    # codegen stage + ramps the host clock), then timed best-of-3 (the host
    # downclocks when idle; cold runs are 1.5-3x slower than warm)
    medians: dict[str, float] = {}

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    anchor_start = _host_anchor()
    _ramp_cpu()
    result = run_kbc(spark, pages, gaz, gold)
    n_triples = result.triples.count()
    laps = []
    for _ in range(3):
        t0 = time.monotonic()
        result = run_kbc(spark, pages, gaz, gold)
        n_triples = result.triples.count()
        laps.append(time.monotonic() - t0)
    timings["kbc_e2e"] = round(min(laps), 3)
    medians["kbc_e2e"] = round(sorted(laps)[1], 3)

    # r5 (VERDICT r4 #1): warm up EVERY suite query once untimed — first-lap
    # Catalyst analysis/codegen of the large conv/augment expression trees
    # used to land in a timed lap and read as a 9-10x per-query regression
    # on unchanged code — then ramp the clock again before the timed laps.
    qs = E.queries()
    for name in BENCH_QUERIES:
        _noop(qs[name](spark, SF_DIR))
    _ramp_cpu()
    for name in BENCH_QUERIES:
        laps = []
        for _ in range(3):  # min filters cold-JIT/downclock spikes
            t0 = time.monotonic()
            _noop(qs[name](spark, SF_DIR))
            laps.append(time.monotonic() - t0)
        timings[name] = round(min(laps), 3)
        # the median travels alongside: a lap poisoned by a host clock
        # window is then VISIBLE as min << median instead of silently
        # becoming the official number
        medians[name] = round(sorted(laps)[1], 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "kbc_e2e_plus_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "suite_sec_median": round(sum(medians.values()), 3),
        "sf": _sf_label(),
        "cpus": CPUS,
        "kbc_pages": n_page_rows,
        "kbc_triples": n_triples,
        "pages_per_sec": round(n_page_rows / timings["kbc_e2e"], 2),
        "corpus_gen_sec": round(gen_s, 3),
        # same-run host anchors: absolute walls of two fixed plain-python
        # kernels (no Spark, no JVM), measured before the first timed lap
        # and after the last.  The box is a shared bursty VM whose
        # identical-work walls swing more than 10x between windows
        # (co-tenant memory-bus steal: mem_wall_32 has measured 0.84s and
        # 11.25s for THE SAME KERNEL in one session), so suite numbers are
        # only comparable across rounds after normalizing to the anchor
        # (BENCH.md reference window: cpu_wall_32 1.06s, mem_wall_32
        # 0.84s).  A suite that looks 2x slower on an anchor that is 10x
        # slower is the box, not a code regression; start/end drift shows
        # whether one window poisoned part of the run.
        "host_anchor": {"start": anchor_start, "end": _host_anchor()},
    }


def _host_anchor() -> dict:
    """One repeat of each ceiling kernel at 32 procs — cheap (~3s),
    absolute, Spark-free; co-recorded so every suite JSON carries the
    host state it was measured under."""
    import multiprocessing as mp

    walls = {}
    for name, kern in (("cpu", _ceiling_cpu_kernel),
                       ("mem", _ceiling_mem_kernel)):
        best = None
        for _ in range(2):
            ps = [mp.Process(target=kern, args=(1,)) for _ in range(32)]
            t0 = time.monotonic()
            for p in ps:
                p.start()
            for p in ps:
                p.join()
            d = time.monotonic() - t0
            best = d if best is None else min(best, d)
        walls[f"{name}_wall_32"] = round(best, 2)
    return walls


def run_datapath(cpus: int, pages: int, repeats: int = 5) -> dict:
    """Steady-state throughput probe: ONE fused DAG (parse -> grams ->
    context -> mentions -> candidate join -> LF votes -> entities), no
    intermediate stores — the data path whose behavior predicts 100 TB.
    Best-of-N warm repeats filters this sandbox's cold-JIT / downclock
    spikes."""
    import time as _t

    from pyspark.sql import functions as F  # noqa: F401
    from tecs_hardware_kbc_spark.corpus import distributed_corpus
    from tecs_hardware_kbc_spark.operators import candidates as C2
    from tecs_hardware_kbc_spark.operators import context as X
    from tecs_hardware_kbc_spark.operators import mentions as M
    from tecs_hardware_kbc_spark.operators.extract import parse_pages
    from tecs_hardware_kbc_spark.operators.labeling import (
        RELATION_NEEDS, apply_lfs, build_sentence_context, with_context)
    from tecs_hardware_kbc_spark.operators.linking import to_entities
    from tecs_hardware_kbc_spark.pipeline import ingest
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pg, gold, gaz = distributed_corpus(spark, pages, seed=42)
    n_rows = pg.count()

    def datapath() -> int:
        sentences = parse_pages(ingest(pg))
        # the HOF is evaluated once into the compact array-form checkpoint
        # (the production shape, pipeline.py) — 1.75x faster at 64k pages
        # than leaving every consumer to re-derive the HOF
        compact = M.gram_space_compact(sentences)
        grams = M.explode_gram_arrays(compact)
        row = X.build_row_ngrams(grams)
        col = X.build_col_ngrams(grams)
        # matchers explode only their pre-gated gram subsets
        parts = M.part_mentions(
            M.gated_grams(compact, M.pregate_part), gaz)
        temps = M.temp_mentions(
            M.gated_grams(compact, M.pregate_numeric(2)), "min")
        cands = C2.stg_temp_candidates(parts, temps)
        sc = build_sentence_context(sentences, grams, compact=compact)
        scored = apply_lfs(
            with_context(cands, sc, row, col,
                         needs=RELATION_NEEDS["stg_temp_min"]),
            "stg_temp_min")
        return to_entities(scored, "stg_temp_min").count()

    best = None
    n_entities = 0
    for _ in range(repeats):
        t0 = _t.monotonic()
        n_entities = datapath()
        d = _t.monotonic() - t0
        best = d if best is None else min(best, d)
    return {"cpus": cpus, "pages": n_rows, "sec": round(best, 3),
            "pages_per_sec": round(n_rows / best, 1),
            "entities": n_entities}


def run_stage_profile(cpus: int, pages: int, repeats: int = 3) -> dict:
    """Per-stage wall clock of the datapath (VERDICT r2 #4: find where the
    extra cores idle). Each stage is materialized (localCheckpoint+count)
    so its timing is isolated; run at 8 and at 32 cores and compare
    per-stage efficiency — the stage whose efficiency is worst is the
    strong-scaling bottleneck."""
    import time as _t

    from tecs_hardware_kbc_spark.corpus import distributed_corpus
    from tecs_hardware_kbc_spark.operators import candidates as C2
    from tecs_hardware_kbc_spark.operators import context as X
    from tecs_hardware_kbc_spark.operators import mentions as M
    from tecs_hardware_kbc_spark.operators.extract import parse_pages
    from tecs_hardware_kbc_spark.operators.labeling import (
        RELATION_NEEDS, apply_lfs, build_sentence_context, with_context)
    from tecs_hardware_kbc_spark.operators.linking import to_entities
    from tecs_hardware_kbc_spark.pipeline import ingest
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pg, gold, gaz = distributed_corpus(spark, pages, seed=42)
    pg.count()
    _ramp_cpu()

    best: dict[str, float] = {}

    def run_once() -> dict[str, float]:
        t: dict[str, float] = {}

        def stage(name, thunk, ckpt=True):
            t0 = _t.monotonic()
            out = thunk()
            df = out.localCheckpoint() \
                if ckpt and hasattr(out, "localCheckpoint") else out
            if hasattr(df, "count"):
                df.count()
            t[name] = round(_t.monotonic() - t0, 3)
            return df

        sentences = stage("parse", lambda: parse_pages(ingest(pg)))
        # gram_space_compact checkpoints the compact array form itself;
        # re-checkpointing the exploded rows would re-inflate it 25x
        compact = stage("grams", lambda: M.gram_space_compact(sentences),
                        ckpt=False)
        grams = M.explode_gram_arrays(compact)
        row = stage("row_ngrams", lambda: X.build_row_ngrams(grams))
        col = stage("col_ngrams", lambda: X.build_col_ngrams(grams))
        parts = stage("part_mentions", lambda: M.part_mentions(
            M.gated_grams(compact, M.pregate_part), gaz))
        temps = stage("temp_mentions", lambda: M.temp_mentions(
            M.gated_grams(compact, M.pregate_numeric(2)), "min"))
        sc = stage("sentence_ctx",
                   lambda: build_sentence_context(sentences, grams,
                                                  compact=compact))
        cands = stage("candidates",
                      lambda: C2.stg_temp_candidates(parts, temps))
        stage("lf_entities", lambda: to_entities(
            apply_lfs(with_context(cands, sc, row, col,
                                   needs=RELATION_NEEDS["stg_temp_min"]),
                      "stg_temp_min"), "stg_temp_min"))
        return t

    for _ in range(repeats):
        t = run_once()
        for k, v in t.items():
            best[k] = min(best.get(k, v), v)
    best["TOTAL"] = round(sum(v for k, v in best.items() if k != "TOTAL"), 3)
    return {"cpus": cpus, "pages": pages, "stages": best}


def _ceiling_cpu_kernel(units: int) -> None:
    for _ in range(units):
        x = 0
        for i in range(12_000_000):
            x += i * i


def _ceiling_mem_kernel(units: int) -> None:
    import numpy as np
    a = np.zeros(32 * 1024 * 1024)         # 256 MB per process
    for _ in range(units):
        for _ in range(4):
            a += 1.000001                   # streaming read-modify-write
            a.sum()                         # streaming read


def run_host_ceiling(repeats: int = 2) -> dict:
    """Measure THIS box's 8 -> 32 strong-scaling ceiling with plain
    multiprocessing — no Spark, no JVM, no shuffles: a pure-CPU kernel
    (GIL-free per process) and a memory-bandwidth-bound kernel (numpy
    streaming passes over 256 MB per process, the regime a shuffle-heavy
    JVM datapath lives in). Total work is FIXED (the strong-scaling
    shape): 8 processes x 4 units vs 32 processes x 1 unit; ideal wall
    ratio is 4x, and the measured ratio / 4 is the ceiling any
    single-box measurement must be read against — shared memory
    controllers and the frequency governor make it < 1 on this VM."""
    import multiprocessing as mp

    def wall(target, procs: int, units: int) -> float:
        best = None
        for _ in range(repeats):
            ps = [mp.Process(target=target, args=(units,))
                  for _ in range(procs)]
            t0 = time.monotonic()
            for p in ps:
                p.start()
            for p in ps:
                p.join()
            d = time.monotonic() - t0
            best = d if best is None else min(best, d)
        return best

    _ramp_cpu()
    out: dict = {"metric": "host_ceiling_8_to_32", "unit": "ratio"}
    for name, kern in (("cpu", _ceiling_cpu_kernel),
                       ("mem", _ceiling_mem_kernel)):
        w8 = wall(kern, 8, 4)
        w32 = wall(kern, 32, 1)
        out[f"{name}_wall_8"] = round(w8, 2)
        out[f"{name}_wall_32"] = round(w32, 2)
        out[f"{name}_eff"] = round(w8 / w32 / 4.0, 3)
    out["value"] = out["mem_eff"]
    return out


def run_curate(cpus: int, n_docs: int, repeats: int = 3) -> dict:
    """Steady-state curation-funnel probe: a deterministic synthetic
    documents table (docgen.synthetic_documents — ~6% exact dups, ~5%
    near-dups, 12% German, 8% junk, hot-domain urls) written ONCE to
    data/ and reused across parallelism levels, then the full funnel
    (exact dedup -> minhash-CC near-dedup -> en keep-list -> quality ->
    Gopher rules -> LM perplexity gate -> PII redaction -> split) timed
    best-of-N warm. The LM trains once, untimed (frozen artifact); laps
    pay only the scoring gate. The funnel's own stage counts are part
    of the job (they are in the product path), so the timing includes
    them."""
    import shutil

    from tecs_hardware_kbc_spark.curate import curate
    from tecs_hardware_kbc_spark.docgen import synthetic_documents
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(os.path.dirname(__file__) or ".", "data",
                        f"bench_docs_{n_docs}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        synthetic_documents(spark, n_docs).write \
            .mode("overwrite").parquet(path)
    docs = spark.read.parquet(path).select("doc_id", "text")

    # the CCNet LM is a build-once frozen artifact (train_ngram_lm
    # localCheckpoints its count tables), so training happens ONCE,
    # untimed — the laps pay only the scoring gate, as production would
    import pyspark.sql.functions as F

    from tecs_hardware_kbc_spark.operators.ngram_lm import train_ngram_lm
    lm = train_ngram_lm(docs.filter(F.col("doc_id") % 16 == 0), n=2)

    def lap() -> tuple[float, dict]:
        spark.catalog.clearCache()  # each lap re-persists its ID sets
        t0 = time.monotonic()
        curated, funnel = curate(spark, docs, langs=["en"],
                                 min_quality=0.3, gopher_rules=True,
                                 ngram_lm=lm,
                                 max_perplexity=lm.vocab_size / 2)
        funnel["written"] = curated.count()
        return time.monotonic() - t0, funnel

    _ramp_cpu()
    lap()  # untimed warm-up (codegen + clock ramp)
    _ramp_cpu()
    times, funnel = [], {}
    for _ in range(repeats):
        t, funnel = lap()
        times.append(t)
    best, med = min(times), sorted(times)[len(times) // 2]
    return {
        "metric": "curate_funnel", "docs": n_docs, "cpus": cpus,
        "sec": round(best, 3), "sec_median": round(med, 3),
        "docs_per_sec": round(n_docs / best, 1), "funnel": funnel,
    }


def run_curate_scaling() -> None:
    """north_rule evidence on the CURATION axis: the same funnel over the
    same synthetic documents table at local[8] and local[32], alternating
    launches min-merged (one process per level is not evidence on this
    host), plus a quarter-input 8-core run for weak scaling."""
    def probe(cpus: int, docs: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_BENCH_DOCS=str(docs))
        out = subprocess.run(
            [sys.executable, __file__, "--curate"], env=env,
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
    runs_8, runs_32 = [], []
    for _ in range(2):
        runs_32.append(probe(32, n_docs))
        runs_8.append(probe(8, n_docs))
    weak_8 = probe(8, n_docs // 4)
    s8 = min(r["sec"] for r in runs_8)
    s32 = min(r["sec"] for r in runs_32)
    strong_eff = s8 / s32 / 4.0
    weak_eff = weak_8["sec"] / s32
    report = {
        "metric": "curate_scaling_8_to_32_cores",
        "value": round(strong_eff, 3), "unit": "ratio",
        "docs": n_docs,
        "sec_8": s8, "sec_32": s32,
        "sec_8_quarter": weak_8["sec"],
        "docs_per_sec_32": round(n_docs / s32, 1),
        "strong_eff": round(strong_eff, 3),
        "weak_eff": round(weak_eff, 3),
        "funnel_32": runs_32[0]["funnel"],
        "host_anchor": _host_anchor(),
    }
    print(json.dumps(report))


def run_scaling() -> None:
    """Two-cluster-size evidence (north_rule): the same job at local[8] and
    local[32] (N and 4N cores standing in for N and 4N executors).

    Reports STRONG scaling (same input) and WEAK scaling (input scaled with
    cores — the regime that models growing a cluster for more data) on the
    fused data path, plus the full-suite wall times at both levels.
    """
    def probe(cpus: int, pages: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_BENCH_PAGES=str(pages))
        out = subprocess.run(
            [sys.executable, __file__, "--datapath"], env=env,
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    def suite(cpus: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # 64k pages: big enough that per-stage work dominates fixed overhead
    # (at 16k, half the stages are overhead-bound and 32 cores measured
    # slower than 8); the corpus's part scheme is unique to 99,900 pages
    def stages(cpus: int, pages: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_BENCH_PAGES=str(pages))
        out = subprocess.run(
            [sys.executable, __file__, "--stages"], env=env,
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # 64k pages: big enough that per-stage work dominates fixed overhead
    # (at 16k, half the stages are overhead-bound and 32 cores measured
    # slower than 8); the corpus's part scheme is unique to 99,900 pages
    n_pages = int(N_PAGES_ENV) if N_PAGES_ENV else 64000
    strong_8 = probe(8, n_pages)
    strong_32 = probe(32, n_pages)
    weak_8 = probe(8, n_pages // 4)
    # Host clock windows swing per-stage wall by up to 2x BETWEEN process
    # launches (in both directions — the same stage has measured both
    # negative and positive scaling minutes apart), so one process per
    # core count is not evidence. Alternate the levels and keep the
    # per-stage MIN across launches: each level then reports its best
    # window and the 8c/32c comparison is window-fair.
    def min_merge(runs: list[dict]) -> dict:
        out = dict(runs[0])
        out["stages"] = {
            k: min(r["stages"][k] for r in runs)
            for k in runs[0]["stages"]}
        return out

    st_32_runs, st_8_runs = [], []
    for _ in range(2):
        st_32_runs.append(stages(32, n_pages))
        st_8_runs.append(stages(8, n_pages))
    st_8 = min_merge(st_8_runs)
    st_32 = min_merge(st_32_runs)
    suite_8 = suite(8)
    suite_32 = suite(32)
    ceiling = run_host_ceiling()

    def stage_row(k: str) -> str:
        s8, s32 = st_8["stages"][k], st_32["stages"][k]
        eff = f"{s8 / max(s32, 1e-9) / 4:.2f}"
        # a stage under ~5s at 8 cores is in task-overhead regime on this
        # host: its eff column cannot support a cross-level comparison
        # (such stages have measured BOTH negative and positive scaling
        # minutes apart) — flag it instead of presenting it as evidence
        if k != "TOTAL" and s8 < 5.0:
            eff += " †"
        return f"| {k} | {s8} | {s32} | {eff} |"

    stage_rows = "\n".join(stage_row(k) for k in st_8["stages"])

    strong_speedup = strong_8["sec"] / strong_32["sec"]
    strong_eff = strong_speedup / 4.0
    weak_eff = weak_8["sec"] / strong_32["sec"]

    report = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(max(strong_eff, weak_eff), 3),
        "unit": "ratio",
        "strong_eff": round(strong_eff, 3),
        "weak_eff": round(weak_eff, 3),
        "datapath_sec_8": strong_8["sec"],
        "datapath_sec_32": strong_32["sec"],
        "datapath_sec_8_quarter": weak_8["sec"],
        "suite_sec_8": suite_8["value"],
        "suite_sec_32": suite_32["value"],
        "kbc_e2e_sec_8": suite_8["queries"]["kbc_e2e"],
        "kbc_e2e_sec_32": suite_32["queries"]["kbc_e2e"],
        "host_ceiling_cpu_eff": ceiling["cpu_eff"],
        "host_ceiling_mem_eff": ceiling["mem_eff"],
        "strong_eff_vs_mem_ceiling": round(
            strong_eff / max(ceiling["mem_eff"], 1e-9), 3),
        "weak_eff_vs_mem_ceiling": round(
            weak_eff / max(ceiling["mem_eff"], 1e-9), 3),
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH.md"),
              "w") as f:
        f.write(f"""# BENCH — throughput at two parallelism levels

The north_rule's two-cluster-size criterion cannot use a real cluster in
this sandbox; evidence = the same job at local[8] and local[32] (N and 4N
cores standing in for N and 4N executors), single shared-memory JVM.

## Data path (fused DAG, best-of-3 warm repeats)

parse -> grams -> context -> mentions -> candidate join -> LF votes ->
entities, no intermediate stores.

| config | pages | sec | pages/sec |
|---|---|---|---|
| 8 cores, full input | {strong_8['pages']} | {strong_8['sec']} | {strong_8['pages_per_sec']} |
| 32 cores, full input | {strong_32['pages']} | {strong_32['sec']} | {strong_32['pages_per_sec']} |
| 8 cores, 1/4 input (weak-scaling ref) | {weak_8['pages']} | {weak_8['sec']} | {weak_8['pages_per_sec']} |

* **Strong scaling** (same input, 4x cores): {strong_speedup:.2f}x speedup
  -> efficiency **{strong_eff:.2f}**.
* **Weak scaling** (4x cores with 4x input — the regime that models growing
  a cluster to hold more data): efficiency **{weak_eff:.2f}**.

## Host ceiling (measured THIS run, same box state)

Plain multiprocessing, no Spark/JVM, total work fixed, 8 x 4 units vs
32 x 1 unit (ideal wall ratio 4x):

| kernel | 8-proc wall | 32-proc wall | 8->32 eff |
|---|---|---|---|
| pure CPU (GIL-free int loop) | {ceiling['cpu_wall_8']} | {ceiling['cpu_wall_32']} | {ceiling['cpu_eff']} |
| memory bandwidth (256 MB numpy streams/process) | {ceiling['mem_wall_8']} | {ceiling['mem_wall_32']} | {ceiling['mem_eff']} |

The datapath shuffles and scans wide cached rows, so the MEMORY row is
the relevant ceiling: datapath strong eff normalized to it =
**{strong_eff / max(ceiling['mem_eff'], 1e-9):.2f}**, weak eff normalized =
**{weak_eff / max(ceiling['mem_eff'], 1e-9):.2f}**.

## Per-stage strong scaling (isolated stage timings, best-of-3 warm)

Each datapath stage materialized in isolation at both core counts; the
efficiency column is (8-core sec) / (32-core sec) / 4. Each level's
column is the per-stage MIN over two alternating process launches —
host clock windows swing a stage's wall up to 2x between launches, so
single-launch stage tables are not comparable across levels.

| stage | 8c sec | 32c sec | eff |
|---|---|---|---|
{stage_rows}

† = under 5s at 8 cores: task-overhead regime on this host; the eff
value is not evidence of the stage's scaling (isolated sub-2s stages
have measured both negative and positive eff minutes apart). The fused
datapath rows above are the meaningful scaling measurement.

## Full pipeline + headline query suite (warm kbc, one JVM per level)

min = best-of-3 warm laps (the official number); median shown so a lap
poisoned by a host clock window is visible as min << median rather than
silently shifting the record.

| cores | suite sec (min) | suite sec (median) | kbc_e2e (min) | kbc_e2e (median) |
|---|---|---|---|---|
| 8  | {suite_8['value']} | {suite_8['suite_sec_median']} | {suite_8['queries']['kbc_e2e']} | {suite_8['queries_median']['kbc_e2e']} |
| 32 | {suite_32['value']} | {suite_32['suite_sec_median']} | {suite_32['queries']['kbc_e2e']} | {suite_32['queries_median']['kbc_e2e']} |

## Caveats (single-box stand-in)

* All "executors" share one JVM heap, one memory bus and one driver; a real
  4N-executor cluster adds heap/bandwidth/driver capacity that this box
  cannot, so these numbers UNDER-state multi-node scaling.
* The host-ceiling table above is measured in the SAME run: the
  memory-bandwidth kernel's 8->32 efficiency is ~0.25-0.30 across every
  window probed (the box's memory bus saturates near 8 streaming
  processes), while the pure-CPU kernel's swings 0.47-0.69 WITH the host
  window. Any shuffle/scan-heavy workload on this box mixes the two
  regimes, so a measured datapath eff between ~0.3 and ~0.65 is
  box-limited, not plan-limited.
* The host is a shared, bursty VM: absolute kernel walls for IDENTICAL
  work swing up to 5x between probe runs minutes apart (co-tenant
  bandwidth/CPU steal on top of idle downclocking; same-code
  consecutive Spark laps have measured 4x apart). Single laps mean
  nothing here — every recorded number is a best-of-N warm minimum and
  the suite also records medians so a poisoned lap is visible.
* NOT comparable to round-2 BENCH.md scaling rows: the probe moved from
  16k to 64k pages. At 16k, fixed per-job overhead dominates the 8-core
  quarter-input reference and FLATTERS weak efficiency (r2's 0.78-0.90);
  at 64k the same code measures the honest regime. The 16k strong-scaling
  row is also no longer meaningful — at that size 32 cores measures
  SLOWER than 8 (per-stage work below task overhead).
* Round-3 optimizations baked into these numbers: the gram table is
  checkpointed in its compact pre-explode array form (context columns
  cached once per sentence, not once per gram; 1.75x end-to-end), and the
  JVM young generation is pinned to heap/2 (minor GC was measured at 40%
  of wall clock at 32 cores before; 28s -> 21s after).
* Round-4 changes: part_mentions routes trigger-free spans around the
  expansion UDF + vocabulary join (its strong scaling flipped from
  NEGATIVE — 5.1s@8c vs 7.7s@32c in r3 — to positive), and
  build_sentence_context derives per-sentence gram lists from the compact
  checkpoint instead of re-shuffling the exploded rows (6.3s -> 2.6s at
  32c in the stage profile). A lean-gram variant (span strings dropped
  from the checkpoint, rebuilt per consumer) measured 2.6x faster on the
  checkpoint BUILD but a net ~1.6x end-to-end LOSS on the fused datapath
  in a same-window A/B, and ships opt-in only.

Full JSON:
```json
{json.dumps({'strong_8': strong_8, 'strong_32': strong_32,
             'weak_8': weak_8, 'stages_8': st_8, 'stages_32': st_32,
             'suite_8': suite_8, 'suite_32': suite_32}, indent=2)}
```
""")


def run_docs_sweep(cpus: int, sizes: list[int] | None = None) -> dict:
    """Runtime vs corpus size at fixed parallelism — the analog of the
    reference's scaling_docs.sh (max_docs sweep). Linear growth here is
    the evidence that no operator in the datapath is superlinear in the
    document count."""
    sizes = sizes or [8000, 16000, 32000, 64000, 96000]
    rows = []
    for n in sizes:
        r = run_datapath(cpus, n, repeats=3)
        r["sec_per_kpage"] = round(r["sec"] / (r["pages"] / 1000), 3)
        rows.append(r)
        print(json.dumps(r), flush=True)
    return {"metric": "docs_sweep", "cpus": cpus, "rows": rows}


def run_rels_sweep(cpus: int, pages: int = 8000,
                   repeats: int = 3) -> dict:
    """Runtime vs RELATION COUNT at fixed docs — the analog of the
    reference's scaling_rels.sh (1..4 relations over the same 1000-doc
    corpus). The pipeline computes parse/grams/context once and shares
    them across relations, so the marginal cost of each added relation
    should be SUB-linear — this sweep is the measurement of that claim.
    Prints one JSON row per relation-set."""
    import time as _t

    from tecs_hardware_kbc_spark.corpus import distributed_corpus
    from tecs_hardware_kbc_spark.pipeline import run_kbc
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pg, gold, gaz = distributed_corpus(spark, pages, seed=42)
    pg.count()
    _ramp_cpu()

    # the reference's accumulation order (scaling_rels.sh:8-31)
    sets = [
        ["stg_temp_min"],
        ["stg_temp_min", "stg_temp_max"],
        ["stg_temp_min", "stg_temp_max", "polarity"],
        ["stg_temp_min", "stg_temp_max", "polarity", "ce_v_max"],
    ]
    rows = []
    prev = None
    for rels in sets:
        best = None
        for _ in range(repeats):
            t0 = _t.monotonic()
            res = run_kbc(spark, pg, gaz, gold, relations=rels)
            res.triples.count()
            d = _t.monotonic() - t0
            best = d if best is None else min(best, d)
        row = {"n_relations": len(rels), "relations": rels,
               "sec": round(best, 3),
               "marginal_sec": round(best - prev, 3) if prev else None}
        prev = best
        rows.append(row)
        print(json.dumps(row), flush=True)
    return {"metric": "rels_sweep", "cpus": cpus, "pages": pages,
            "rows": rows}


def run_pagerank(cpus: int, n_edges: int, repeats: int = 3) -> dict:
    """Steady-state PageRank probe: a deterministic synthetic directed
    graph (hash-derived endpoints, 20% of edges aimed at 32 hub nodes
    for realistic in-degree skew, ~n_edges/4 nodes) written ONCE to
    data/ and reused across parallelism levels, then
    graph.pagerank_fixed_point (5 power iterations: per iteration one
    src-keyed join + one map-combined groupBy(dst) + one driver scalar)
    timed best-of-N warm. This is the iterative join+agg shape — a
    different scaling profile from the scan-heavy datapath and funnel."""
    import shutil

    import pyspark.sql.functions as F

    from tecs_hardware_kbc_spark.operators.graph import pagerank_fixed_point
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(os.path.dirname(__file__) or ".", "data",
                        f"bench_edges_{n_edges}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        n_nodes = max(n_edges // 4, 64)
        ids = spark.range(n_edges)
        h = lambda s: F.abs(F.xxhash64("id", F.lit(s)))  # noqa: E731
        edges = ids.select(
            (h("s") % n_nodes).alias("src"),
            F.when(h("hub") % 5 == 0, h("h") % 32)
            .otherwise(h("d") % n_nodes).alias("dst")) \
            .filter(F.col("src") != F.col("dst")).distinct()
        edges.write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)
    n_real = edges.count()

    def lap() -> float:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        pagerank_fixed_point(edges, iters=5).count()
        return time.monotonic() - t0

    _ramp_cpu()
    lap()  # untimed warm-up (codegen + clock ramp)
    _ramp_cpu()
    times = [lap() for _ in range(repeats)]
    best, med = min(times), sorted(times)[len(times) // 2]
    return {
        "metric": "pagerank_5_iters", "edges": n_real, "cpus": cpus,
        "sec": round(best, 3), "sec_median": round(med, 3),
        "edges_per_sec": round(n_real / best, 1),
    }


def run_pagerank_scaling() -> None:
    """north_rule evidence on the GRAPH axis: the same 5-iteration
    PageRank over the same edge table at local[8] and local[32],
    alternating launches min-merged, plus a quarter-input 8-core run
    for weak scaling."""
    def probe(cpus: int, edges: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_BENCH_EDGES=str(edges))
        out = subprocess.run(
            [sys.executable, __file__, "--pagerank"], env=env,
            capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    n_edges = int(os.environ.get("SPARK_GRAFT_BENCH_EDGES", "2000000"))
    runs_8, runs_32 = [], []
    for _ in range(2):
        runs_32.append(probe(32, n_edges))
        runs_8.append(probe(8, n_edges))
    weak_8 = probe(8, n_edges // 4)
    s8 = min(r["sec"] for r in runs_8)
    s32 = min(r["sec"] for r in runs_32)
    strong_eff = s8 / s32 / 4.0
    weak_eff = weak_8["sec"] / s32
    print(json.dumps({
        "metric": "pagerank_scaling_8_to_32_cores",
        "value": round(strong_eff, 3), "unit": "ratio",
        "edges": runs_32[0]["edges"],
        "sec_8": s8, "sec_32": s32,
        "sec_8_quarter": weak_8["sec"],
        "edges_per_sec_32": round(runs_32[0]["edges"] / s32, 1),
        "strong_eff": round(strong_eff, 3),
        "weak_eff": round(weak_eff, 3),
        "host_anchor": _host_anchor(),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--host-ceiling" in sys.argv:
        print(json.dumps(run_host_ceiling()))
    elif "--rels-sweep" in sys.argv:
        print(json.dumps(run_rels_sweep(CPUS)))
    elif "--docs-sweep" in sys.argv:
        print(json.dumps(run_docs_sweep(CPUS)))
    elif "--stages" in sys.argv:
        n = (int(N_PAGES_ENV) if N_PAGES_ENV
             else PAGES_BY_SF.get(_sf_label(), 8000))
        print(json.dumps(run_stage_profile(CPUS, n)))
    elif "--curate-scaling" in sys.argv:
        run_curate_scaling()
    elif "--curate" in sys.argv:
        n = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
        print(json.dumps(run_curate(CPUS, n)))
    elif "--pagerank-scaling" in sys.argv:
        run_pagerank_scaling()
    elif "--pagerank" in sys.argv:
        n = int(os.environ.get("SPARK_GRAFT_BENCH_EDGES", "2000000"))
        print(json.dumps(run_pagerank(CPUS, n)))
    elif "--datapath" in sys.argv:
        n = (int(N_PAGES_ENV) if N_PAGES_ENV
             else PAGES_BY_SF.get(_sf_label(), 8000))
        print(json.dumps(run_datapath(CPUS, n)))
    else:
        print(json.dumps(run_suite()))
