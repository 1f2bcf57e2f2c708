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
]


def _sf_label() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


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

    # two in-process runs, report the warm one (the host downclocks when
    # idle; cold-start JIT + frequency ramp inflate the first run ~1.5-3x)
    kbc_s = None
    for _ in range(2):
        t0 = time.monotonic()
        result = run_kbc(spark, pages, gaz, gold)
        n_triples = result.triples.count()
        run_s = time.monotonic() - t0
        kbc_s = run_s if kbc_s is None else min(kbc_s, run_s)
    timings["kbc_e2e"] = round(kbc_s, 3)

    qs = E.queries()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "kbc_e2e_plus_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(),
        "cpus": CPUS,
        "kbc_pages": n_page_rows,
        "kbc_triples": n_triples,
        "pages_per_sec": round(n_page_rows / kbc_s, 2),
        "corpus_gen_sec": round(gen_s, 3),
    }


def run_scaling(repeats: int = 2) -> None:
    """N-vs-4N evidence: same suite at 8 and 32 cores, min-of-N per level
    (fresh JVM per run; min filters JIT/scheduling noise)."""
    results = {}
    for cpus in (8, 32):
        best = None
        for _ in range(repeats):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True,
                text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        results[cpus] = best
    t8, t32 = results[8]["value"], results[32]["value"]
    p8 = results[8]["pages_per_sec"]
    p32 = results[32]["pages_per_sec"]
    speedup = t8 / t32
    efficiency = speedup / 4.0
    kbc_speedup = (results[8]["queries"]["kbc_e2e"]
                   / results[32]["queries"]["kbc_e2e"])
    report = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "sec_8": t8, "sec_32": t32,
        "pages_per_sec_8": p8, "pages_per_sec_32": p32,
        "kbc_speedup": round(kbc_speedup, 3),
        "suite_speedup": round(speedup, 3),
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH.md"),
              "w") as f:
        f.write(
            "# BENCH — throughput at two parallelism levels\n\n"
            "Same suite, same input, local[8] vs local[32] (N and 4N cores\n"
            "standing in for N and 4N executors; single-JVM stand-in for the\n"
            "north_rule's two-cluster-size criterion).\n\n"
            f"| cores | suite sec | kbc_e2e sec | pages/sec |\n|---|---|---|---|\n"
            f"| 8  | {t8} | {results[8]['queries']['kbc_e2e']} | {p8} |\n"
            f"| 32 | {t32} | {results[32]['queries']['kbc_e2e']} | {p32} |\n\n"
            f"Suite speedup 8→32: **{speedup:.2f}x** over 4x cores → "
            f"efficiency **{efficiency:.2f}**.\n"
            f"KBC end-to-end speedup: **{kbc_speedup:.2f}x**.\n\n"
            f"Full JSON:\n```json\n{json.dumps(results, indent=2)}\n```\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_suite()))
