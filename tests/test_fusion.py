"""Knowledge fusion (operators/fusion.py): noisy-or combination,
functional conflict resolution, SCD2 history, schema validation,
co-fact relatedness."""

import datetime

import pytest

from tecs_hardware_kbc_spark.operators.fusion import (
    fuse_triples, kb_history, related_subjects, resolve_functional,
    validate_kg)

T = "subj string, pred string, obj string, prob double, src string"


def test_noisy_or_combination(spark):
    rows = [
        ("p1", "ce_v_max", "45", 0.5, "u1"),
        ("p1", "ce_v_max", "45", 0.5, "u2"),
        ("p1", "ce_v_max", "65", 0.9, "u3"),
        ("p2", "polarity", "NPN", 0.4, "u4"),
    ]
    out = {(r.subj, r.pred, r.obj): r
           for r in fuse_triples(spark.createDataFrame(rows, T),
                                 src_col="src").collect()}
    # two independent 0.5 sightings -> 1 - 0.5*0.5 = 0.75
    assert out[("p1", "ce_v_max", "45")].prob == pytest.approx(0.75)
    assert out[("p1", "ce_v_max", "45")].n_src == 2
    assert out[("p1", "ce_v_max", "65")].prob == pytest.approx(0.9)
    assert out[("p2", "polarity", "NPN")].prob == pytest.approx(0.4)


def test_noisy_or_duplicate_source_counted_once(spark):
    rows = [("p1", "a", "x", 0.5, "u1"), ("p1", "a", "x", 0.5, "u1")]
    r = fuse_triples(spark.createDataFrame(rows, T),
                     src_col="src").collect()[0]
    assert r.n_src == 1            # distinct sources
    assert r.prob == pytest.approx(0.75)  # but both extractions combine


def test_resolve_functional_argmax_and_passthrough(spark):
    fused = spark.createDataFrame(
        [("p1", "ce_v_max", "45", 0.75, 2),
         ("p1", "ce_v_max", "65", 0.90, 1),
         ("p1", "alias", "bc546", 0.5, 1),
         ("p1", "alias", "bc547", 0.5, 1)],
        "subj string, pred string, obj string, prob double, n_src int")
    out = resolve_functional(fused, ["ce_v_max"]).collect()
    fn = [r for r in out if r.pred == "ce_v_max"]
    assert len(fn) == 1 and fn[0].obj == "65" and fn[0].n_alt == 2
    # non-functional predicate keeps both objects
    assert sorted(r.obj for r in out if r.pred == "alias") == \
        ["bc546", "bc547"]


def test_resolve_functional_tiebreak_deterministic(spark):
    fused = spark.createDataFrame(
        [("p1", "f", "b", 0.5, 1), ("p1", "f", "a", 0.5, 1)],
        "subj string, pred string, obj string, prob double, n_src int")
    assert resolve_functional(fused, ["f"]).collect()[0].obj == "a"


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_kb_history_scd2_intervals(spark):
    obs = spark.createDataFrame(
        [("p1", "v", "45", _ts(1)), ("p1", "v", "45", _ts(2)),
         ("p1", "v", "65", _ts(3)), ("p1", "v", "45", _ts(4)),
         ("p2", "v", "80", _ts(1))],
        "subj string, pred string, obj string, warc_ts timestamp")
    rows = sorted(kb_history(obs).collect(),
                  key=lambda r: (r.subj, r.valid_from))
    p1 = [r for r in rows if r.subj == "p1"]
    # a -> b -> a gives THREE intervals, first run has 2 observations
    assert [(r.obj, r.n_obs) for r in p1] == [("45", 2), ("65", 1),
                                              ("45", 1)]
    assert p1[0].valid_to == p1[1].valid_from == _ts(3)
    assert p1[2].valid_to is None          # current value is open-ended
    assert [r.valid_to for r in rows if r.subj == "p2"] == [None]


def test_validate_kg_all_violation_kinds(spark):
    schema = spark.createDataFrame(
        [("ce_v_max", "numeric", 0.0, 100.0, True),
         ("polarity", "string", None, None, True)],
        "pred string, dtype string, lo double, hi double, "
        "functional boolean")
    triples = spark.createDataFrame(
        [("p1", "ce_v_max", "45", 0.9),       # clean
         ("p1", "ce_v_max", "450", 0.8),      # out of range + conflict
         ("p2", "ce_v_max", "tall", 0.7),     # not numeric
         ("p3", "mystery", "x", 0.6),         # unknown pred
         ("p4", "polarity", "NPN", 0.9)],     # clean
        "subj string, pred string, obj string, prob double")
    v = {(r.subj, r.violation) for r in
         validate_kg(triples, schema).collect()}
    assert ("p3", "unknown_pred") in v
    assert ("p2", "not_numeric") in v
    assert ("p1", "out_of_range") in v
    assert ("p1", "functional_conflict") in v
    assert not any(s == "p4" for s, _ in v)


def test_related_subjects_and_df_cap(spark):
    triples = spark.createDataFrame(
        [("a", "pol", "NPN", 1.0), ("b", "pol", "NPN", 1.0),
         ("a", "v", "45", 1.0), ("b", "v", "45", 1.0),
         ("c", "v", "45", 1.0),
         # hot value shared by everyone: capped out at max_df=3
         ("a", "unit", "V", 1.0), ("b", "unit", "V", 1.0),
         ("c", "unit", "V", 1.0), ("d", "unit", "V", 1.0)],
        "subj string, pred string, obj string, prob double")
    got = {(r.subj_a, r.subj_b): r.strength
           for r in related_subjects(triples, max_df=3).collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_fusion_partition_invariance(spark):
    rows = [("p%d" % (i % 7), "v", "o%d" % (i % 3),
             round(0.1 + (i % 9) / 10.0, 6), "u%d" % i)
            for i in range(200)]
    df = spark.createDataFrame(rows, T)
    a = sorted(map(tuple, fuse_triples(df.repartition(1),
                                       src_col="src").collect()))
    b = sorted(map(tuple, fuse_triples(df.repartition(13),
                                       src_col="src").collect()))
    assert a == b


def test_kb_asof_point_in_time(spark):
    from datetime import datetime
    from tecs_hardware_kbc_spark.operators.fusion import (
        kb_asof, kb_history)
    obs = spark.createDataFrame(
        [("s", "p", "a", datetime(2024, 1, 1)),
         ("s", "p", "a", datetime(2024, 1, 2)),
         ("s", "p", "b", datetime(2024, 1, 5)),
         ("s", "p", "a", datetime(2024, 1, 9)),
         ("t", "p", "x", datetime(2024, 1, 7))],
        ["subj", "pred", "obj", "warc_ts"])
    hist = kb_history(obs)
    # mid-first-interval: the original 'a', not the later flip
    got = {(r["subj"], r["obj"]): r["n_obs"]
           for r in kb_asof(hist, "2024-01-03 00:00:00").collect()}
    assert got == {("s", "a"): 2}
    # during the 'b' run; 't' not yet observed
    got = {(r["subj"], r["obj"])
           for r in kb_asof(hist, "2024-01-06 00:00:00").collect()}
    assert got == {("s", "b")}
    # after everything: current open-ended intervals for both facts
    got = {(r["subj"], r["obj"])
           for r in kb_asof(hist, "2024-02-01 00:00:00").collect()}
    assert got == {("s", "a"), ("t", "x")}
    # before any observation: empty KB
    assert kb_asof(hist, "2023-12-01 00:00:00").count() == 0
