#!/usr/bin/env python
"""Per-query isolation bench for the optimization round (guide §1.4).

NOT the official bench (bench.py is frozen for measurement); this file
exists so individual queries can be timed (noop sink, warm-up + best-of-N)
and their formatted plans dumped without re-running the whole suite.

Usage:
  python bench_extra.py --queries doc_span_dedup,dedup_minhash_pairs
  python bench_extra.py --explain plans/r06 --suffix before --queries ...
  python bench_extra.py --kbc              # time run_kbc end-to-end
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HOT = [
    "doc_span_dedup", "dedup_minhash_pairs", "web_kg_e2e", "emb_kmeans",
    "web_pagerank", "kg_embed", "doc_bm25", "web_triangles", "doc_quality",
    "dedup_exact", "sim_topk", "q_window_topk", "kg_e2e", "q3_top_orders",
    "media_augment_policy", "media_conv", "kbc_figures", "kbc_lingual_tags",
    "q1_pricing_summary", "q_threshold_sweep", "q_asof_join", "kbc_asof_pair",
]


def _ramp_cpu(seconds: float = 2.0) -> None:
    import numpy as np
    a = np.ones((1500, 1500))
    end = time.monotonic() + seconds
    while time.monotonic() < end:
        (a @ a)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HOT))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--kbc", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as E
    from tecs_hardware_kbc_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}

    if args.kbc:
        from tecs_hardware_kbc_spark.corpus import distributed_corpus
        from tecs_hardware_kbc_spark.pipeline import run_kbc
        pages, gold, gaz = distributed_corpus(spark, 8000, seed=42)
        pages.count()
        _ramp_cpu()
        run_kbc(spark, pages, gaz, gold).triples.count()  # warm-up
        laps = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            run_kbc(spark, pages, gaz, gold).triples.count()
            laps.append(time.monotonic() - t0)
        timings["kbc_e2e"] = round(min(laps), 3)
        medians["kbc_e2e"] = round(sorted(laps)[len(laps) // 2], 3)
    else:
        qs = E.queries()
        names = [n for n in args.queries.split(",") if n]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            for name in names:
                df = qs[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        args.explain, f"{name}_{args.suffix}.txt"),
                        "w") as f:
                    f.write(plan)
        for name in names:
            spark.sparkContext.setJobDescription(f"warmup: {name}")
            _noop(qs[name](spark, SF_DIR))
        _ramp_cpu()
        for name in names:
            spark.sparkContext.setJobDescription(f"timed: {name}")
            laps = []
            for _ in range(args.repeats):
                t0 = time.monotonic()
                _noop(qs[name](spark, SF_DIR))
                laps.append(time.monotonic() - t0)
            timings[name] = round(min(laps), 3)
            medians[name] = round(sorted(laps)[len(laps) // 2], 3)

    print(json.dumps({
        "metric": "bench_extra", "sf": os.path.basename(SF_DIR.rstrip("/")),
        "cpus": CPUS, "queries": timings, "queries_median": medians,
        "value": round(sum(timings.values()), 3), "unit": "sec",
    }))


if __name__ == "__main__":
    main()
