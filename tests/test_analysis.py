"""The standalone analyze driver (reference hack/transistors/analysis.py):
prob CSV -> alias widening -> doc-set filter -> sweep -> discrepancy CSV,
end-to-end through the CLI subcommand."""

import csv
import glob
import json

import pytest

from tecs_hardware_kbc_spark.__main__ import main
from tecs_hardware_kbc_spark.sources.sinks import write_prob_csv


@pytest.fixture()
def prob_and_gold(spark, tmp_path):
    """A prob CSV with one tunable FP plus gold parquet with one planted
    FN; the doc-known part BC546B is reachable only via alias widening."""
    ents = spark.createDataFrame(
        [
            ("BC546", "BC546", "45", 0.95),    # TP (direct)
            ("BC546", "BC546", "99", 0.40),    # FP below tuned threshold
            ("2N222", "2N222", "60", 0.90),    # TP
            ("2N222", "2N222", "75", 0.55),    # FP the sweep must cut
        ],
        "doc string, part string, value string, prob double",
    )
    probs_dir = str(tmp_path / "probs")
    write_prob_csv(ents, probs_dir)
    gold = spark.createDataFrame(
        [
            ("BC546", "m", "BC546", "ce_v_max", "45"),
            ("BC546", "m", "BC546B", "ce_v_max", "45"),  # via widening
            ("2N222", "m", "2N222", "ce_v_max", "60"),
            ("2N222", "m", "2N222", "ce_v_max", "80"),   # FN
        ],
        "filename string, manuf string, part string, attribute string, "
        "value string",
    )
    gold_path = str(tmp_path / "gold.parquet")
    gold.write.mode("overwrite").parquet(gold_path)
    return probs_dir, gold_path


def test_analyze_cli(spark, tmp_path, prob_and_gold, capsys):
    probs_dir, gold_path = prob_and_gold
    out = str(tmp_path / "out")
    rc = main(["analyze", "--probs", probs_dir, "--gold", gold_path,
               "--attribute", "ce_v_max", "--out", out])
    assert rc == 0
    scores = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # widening adds (BC546, BC546B, 45); sweep cuts both FPs -> P=1
    assert scores["precision"] == 1.0
    assert scores["tp"] == 3
    assert scores["fn"] == 1
    files = glob.glob(f"{out}/ce_v_max_discrepancies/*.csv")
    assert files
    with open(files[0]) as f:
        rows = list(csv.DictReader(f))
    kinds = {(r["kind"], r["doc"], r["value"]) for r in rows}
    assert ("FN", "2N222", "80") in kinds
    assert all(r["kind"] in ("FP", "FN") for r in rows)


def test_analyze_doc_set_filter(spark, tmp_path, prob_and_gold):
    from tecs_hardware_kbc_spark.analysis import analyze
    probs_dir, gold_path = prob_and_gold
    docs = tmp_path / "docs.txt"
    docs.write_text("BC546\n")
    scores = analyze(spark, probs_dir, gold_path, "ce_v_max",
                     str(tmp_path / "out2"), docs_path=str(docs))
    # only the BC546 doc is in scope: 2 TP (direct + widened), no FN
    assert scores["tp"] == 2
    assert scores["fn"] == 0


def test_analyze_fixed_threshold(spark, tmp_path, prob_and_gold):
    from tecs_hardware_kbc_spark.analysis import analyze
    probs_dir, gold_path = prob_and_gold
    scores = analyze(spark, probs_dir, gold_path, "ce_v_max",
                     str(tmp_path / "out3"), threshold=0.0)
    # everything above 0 is predicted: the 99-FP widens to BC546B too
    assert scores["fp"] == 3
    assert scores["tp"] == 3


def test_compare_kb_cli(spark, tmp_path, capsys):
    """Cross-KB scoring (digikey_analysis.py flow): score KB entities
    against a metric gold set, discrepancies to CSV."""
    import glob as _glob

    kb = spark.createDataFrame(
        [("BC546", "dk", "BC546", "ce_v_max", "45"),
         ("BC546", "dk", "BC546", "ce_v_max", "99"),   # FP vs our gold
         ("2N222", "dk", "2N222", "ce_v_max", "60")],
        "filename string, manuf string, part string, attribute string, "
        "value string")
    gold = spark.createDataFrame(
        [("BC546", "m", "BC546", "ce_v_max", "45"),
         ("2N222", "m", "2N222", "ce_v_max", "60"),
         ("2N222", "m", "2N222", "ce_v_max", "80")],   # FN for the KB
        "filename string, manuf string, part string, attribute string, "
        "value string")
    kb_p, gold_p = str(tmp_path / "kb.parquet"), str(tmp_path / "g.parquet")
    kb.write.parquet(kb_p)
    gold.write.parquet(gold_p)
    out = str(tmp_path / "out")
    rc = main(["compare-kb", "--kb", kb_p, "--gold", gold_p,
               "--attribute", "ce_v_max", "--out", out])
    assert rc == 0
    scores = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (scores["tp"], scores["fp"], scores["fn"]) == (2, 1, 1)
    assert _glob.glob(f"{out}/ce_v_max_kb_discrepancies/*.csv")
