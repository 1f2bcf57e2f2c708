"""spark-submit entry point (north_rule: ``spark-submit --py-files`` on a
multi-executor cluster).

Usage (local or cluster — the master comes from spark-submit/env):

    # generate a synthetic corpus to parquet
    spark-submit --py-files kbc.zip -m tecs_hardware_kbc_spark gen \
        --out /data/corpus --pages 100000

    # run the full pipeline with resumable checkpoints + lineage
    spark-submit --py-files kbc.zip -m tecs_hardware_kbc_spark run \
        --pages /data/corpus/pages.parquet \
        --gazetteer /data/corpus/gazetteer.parquet \
        --gold /data/corpus/gold.parquet \
        --out /data/kbc_out

    # stream-ingest new crawls, exactly once
    ... ingest --in /data/landing --out /data/pages --checkpoint /data/ckpt
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tecs_hardware_kbc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate synthetic corpus parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("run", help="pages -> triples with checkpoints")
    r.add_argument("--pages", required=True)
    r.add_argument("--gazetteer", required=True)
    r.add_argument("--gold", default=None)
    r.add_argument("--out", required=True)
    r.add_argument("--relations", default=None,
                   help="comma-separated subset of relations")
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--visual", default=None,
                   help="optional bbox sidecar parquet "
                        "(url, position, v_top/v_left/v_bottom/v_right)")

    c = sub.add_parser(
        "connectors",
        help="figure scan -> HasFigures decode filter -> thumbnail "
             "classifier P/R (reference circular_connectors.py)")
    c.add_argument("--pages", required=True)

    cu = sub.add_parser(
        "curate",
        help="documents parquet -> curated training corpus (exact + "
             "near-dup dedup, language/quality gates, PII redaction, "
             "optional benchmark decontamination, deterministic "
             "sample/split; prints the per-stage funnel)")
    cu.add_argument("--docs", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--benchmark", default=None,
                    help="eval benchmark parquet (doc_id, text) to "
                         "decontaminate against")
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--langs", default=None,
                    help="comma-separated language keep-list (heuristic "
                         "language_id, e.g. en,de)")
    cu.add_argument("--sample", type=float, default=1.0)
    cu.add_argument("--dedup-paragraphs", action="store_true",
                    help="also remove duplicate paragraphs corpus-wide "
                         "(CCNet/C4 boilerplate pass)")
    cu.add_argument("--gopher", action="store_true",
                    help="also apply the Gopher outlier rule set")
    cu.add_argument("--lm-ref", default=None,
                    help="clean reference parquet (doc_id, text) to "
                         "train the CCNet-style n-gram LM on")
    cu.add_argument("--max-perplexity", type=float, default=None,
                    help="drop docs whose LM perplexity exceeds this "
                         "(requires --lm-ref)")
    cu.add_argument("--lm-order", type=int, default=2,
                    help="n-gram order of the perplexity LM")

    s = sub.add_parser("ingest", help="stream-ingest new page files")
    s.add_argument("--in", dest="input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", required=True)

    a = sub.add_parser(
        "analyze",
        help="prob CSV -> alias-widen -> sweep -> discrepancy CSV "
             "(reference hack/transistors/analysis.py)")
    a.add_argument("--probs", required=True,
                   help="probability CSV (doc,part,value,prob)")
    a.add_argument("--dev-probs", default=None,
                   help="dev CSV to tune the threshold on (default: --probs)")
    a.add_argument("--gold", required=True, help="gold parquet or CSV")
    a.add_argument("--attribute", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--docs", default=None,
                   help="optional doc-set file (one doc per line)")
    a.add_argument("--threshold", type=float, default=None)

    k = sub.add_parser(
        "compare-kb",
        help="score one KB's entity set against another as metric "
             "(reference digikey_analysis.py)")
    k.add_argument("--kb", required=True, help="KB gold-format parquet/CSV")
    k.add_argument("--gold", required=True, help="metric gold parquet/CSV")
    k.add_argument("--attribute", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--docs", default=None)

    args = p.parse_args(argv)

    from tecs_hardware_kbc_spark.session import get_spark
    spark = get_spark(app_name=f"kbc-{args.cmd}")

    if args.cmd == "gen":
        from tecs_hardware_kbc_spark.corpus import write_corpus
        write_corpus(spark, args.out, n_pages=args.pages, seed=args.seed)
        print(json.dumps({"out": args.out, "pages": args.pages}))
        return 0

    if args.cmd == "run":
        from tecs_hardware_kbc_spark.pipeline import run_kbc_checkpointed
        rels = args.relations.split(",") if args.relations else None
        result = run_kbc_checkpointed(
            spark, args.pages, args.gazetteer, args.out,
            gold_path=args.gold, relations=rels,
            resume=not args.no_resume, visual_path=args.visual,
        )
        print(json.dumps({
            "triples": result.triples.count(),
            "scores": result.scores,
            "thresholds": result.thresholds,
        }))
        return 0

    if args.cmd == "connectors":
        from tecs_hardware_kbc_spark.operators.figures import (
            score_connectors)
        r = score_connectors(spark.read.parquet(args.pages))
        print(json.dumps(r))
        return 0

    if args.cmd == "curate":
        from tecs_hardware_kbc_spark.curate import curate_to_parquet
        lm = None
        if args.lm_ref is not None and args.max_perplexity is not None:
            from tecs_hardware_kbc_spark.operators.ngram_lm import (
                train_ngram_lm)
            lm = train_ngram_lm(spark.read.parquet(args.lm_ref),
                                n=args.lm_order)
        funnel = curate_to_parquet(
            spark, args.docs, args.out,
            benchmark_path=args.benchmark,
            min_quality=args.min_quality,
            langs=args.langs.split(",") if args.langs else None,
            sample_fraction=args.sample,
            dedup_paragraphs=args.dedup_paragraphs,
            gopher_rules=args.gopher,
            ngram_lm=lm,
            max_perplexity=args.max_perplexity,
        )
        print(json.dumps(funnel))
        return 0

    if args.cmd == "ingest":
        from tecs_hardware_kbc_spark.streaming.ingest import ingest_available_now
        ingest_available_now(spark, args.input, args.out, args.checkpoint)
        print(json.dumps({"ingested_to": args.out}))
        return 0

    if args.cmd == "analyze":
        from tecs_hardware_kbc_spark.analysis import analyze
        scores = analyze(
            spark, args.probs, args.gold, args.attribute, args.out,
            dev_probs_path=args.dev_probs, docs_path=args.docs,
            threshold=args.threshold,
        )
        print(json.dumps(scores))
        return 0

    if args.cmd == "compare-kb":
        from tecs_hardware_kbc_spark.analysis import compare_kb
        scores = compare_kb(spark, args.kb, args.gold, args.attribute,
                            args.out, docs_path=args.docs)
        print(json.dumps(scores))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
