"""One-pass threshold sweep vs a brute-force python reimplementation."""

import numpy as np
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.scoring import (
    best_threshold,
    confusion,
    entity_scores,
    threshold_sweep,
)


def _mk(spark, rows, cols="doc string, part string, attribute string, value string, prob double"):
    return spark.createDataFrame(rows, cols)


def test_confusion_and_scores(spark):
    pred = _mk(spark, [("D1", "P1", "a", "1", 0.9), ("D1", "P2", "a", "2", 0.8),
                       ("D2", "P1", "a", "3", 0.7)])
    gold = spark.createDataFrame(
        [("D1", "P1", "a", "1"), ("D2", "P1", "a", "3"), ("D3", "P9", "a", "9")],
        "doc string, part string, attribute string, value string")
    s = entity_scores(pred, gold)
    assert (s["tp"], s["fp"], s["fn"]) == (2, 1, 1)
    assert abs(s["precision"] - 2 / 3) < 1e-9
    assert abs(s["recall"] - 2 / 3) < 1e-9


def test_sweep_matches_bruteforce(spark):
    rng = np.random.RandomState(3)
    ents, gold = [], []
    for i in range(300):
        is_gold = rng.rand() < 0.5
        prob = float(rng.rand())
        key = ("D", f"P{i}", "a", str(i))
        ents.append((*key, prob))
        if is_gold:
            gold.append(key)
    # plus unrecovered gold
    for i in range(300, 330):
        gold.append(("D", f"P{i}", "a", str(i)))
    pred = _mk(spark, ents)
    gold_df = spark.createDataFrame(
        gold, "doc string, part string, attribute string, value string")
    swept = {r["b"]: r for r in threshold_sweep(pred, gold_df).collect()}
    gold_set = set(gold)
    for k in [0, 17, 50, 98, 99]:
        b = k / 99.0
        kept = [e for e in ents if e[4] > b]
        tp = sum(1 for e in kept if e[:4] in gold_set)
        fp = len(kept) - tp
        fn = len(gold_set) - tp
        row = swept[b]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn), (k, row)
    best = best_threshold(threshold_sweep(pred, gold_df))
    # brute-force best f1
    def f1_at(b):
        kept = [e for e in ents if e[4] > b]
        tp = sum(1 for e in kept if e[:4] in gold_set)
        p = tp / len(kept) if kept else float("nan")
        r = tp / len(gold_set)
        return 2 * p * r / (p + r) if p + r > 0 else float("nan")
    brute = max((f1_at(k / 99.0) for k in range(100)),
                key=lambda x: -1 if np.isnan(x) else x)
    assert abs(best["f1"] - brute) < 1e-9


def test_calibration_bins_and_ece(spark):
    from tecs_hardware_kbc_spark.operators.scoring import (
        calibration_bins, calibrate_histogram, expected_calibration_error)
    rows = [(0.05, 0), (0.08, 1), (0.55, 1), (0.52, 0),
            (0.58, 1), (0.95, 1), (0.99, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, ["prob", "correct"])
    b = {r["bin"]: (r["n"], r["mean_prob"], r["acc"], r["gap"])
         for r in calibration_bins(df).collect()}
    assert set(b) == {0, 5, 9}
    assert b[0] == (2, 0.065, 0.5, 0.435)
    n5, mp5, acc5, gap5 = b[5]
    assert (n5, acc5) == (3, round(2 / 3, 6))
    assert mp5 == 0.55
    assert b[9][0] == 3 and b[9][2] == 1.0  # prob=1.0 folds into bin 9
    ece = expected_calibration_error(calibration_bins(df))
    expected = (2 * 0.435 + 3 * gap5 + 3 * b[9][3]) / 8
    assert abs(ece - expected) < 1e-9
    cal = calibrate_histogram(df, calibration_bins(df))
    got = {r["prob"]: r["prob_cal"] for r in cal.collect()}
    assert got[0.05] == 0.5 and got[1.0] == 1.0
