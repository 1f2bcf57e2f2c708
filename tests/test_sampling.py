"""Deterministic sampling / splitting / sequence packing invariants."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.sampling import (
    pack_sequences,
    sample_by_hash,
    split_by_hash,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, 90) + 10).alias("toks"))


def test_sample_by_hash_deterministic_and_calibrated(spark):
    d = _docs(spark)
    a = sample_by_hash(d, "doc_id", 0.3)
    b = sample_by_hash(d, "doc_id", 0.3)
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b                        # reproducible
    assert 0.25 < len(ids_a) / 2000 < 0.35       # calibrated
    # a larger fraction is a SUPERSET (same uniform, higher threshold)
    wider = {r["doc_id"]
             for r in sample_by_hash(d, "doc_id", 0.5).collect()}
    assert ids_a <= wider
    # an independent salt draws a different sample
    other = {r["doc_id"]
             for r in sample_by_hash(d, "doc_id", 0.3, salt="s2").collect()}
    assert other != ids_a


def test_split_by_hash_disjoint_exhaustive(spark):
    d = _docs(spark)
    s = split_by_hash(d, "doc_id", {"train": 2, "val": 1, "test": 1})
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000          # exhaustive
    assert 0.45 < counts["train"] / 2000 < 0.55  # ~2/4
    assert 0.20 < counts["val"] / 2000 < 0.30    # ~1/4
    # splits and sampling compose: the split of a sampled doc is stable
    sampled = split_by_hash(sample_by_hash(d, "doc_id", 0.3), "doc_id",
                            {"train": 2, "val": 1, "test": 1})
    full = {r["doc_id"]: r["split"] for r in s.collect()}
    for r in sampled.collect():
        assert full[r["doc_id"]] == r["split"]


def test_pack_sequences_tiles_the_tape(spark):
    budget, shards = 64, 4
    d = _docs(spark, n=500)
    p = pack_sequences(d, "doc_id", "toks", budget, shards=shards)
    rows = p.collect()
    toks = {r["doc_id"]: r["toks"] for r in d.collect()}

    # every document's slices sum to its token count
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["slice_len"]
    assert per_doc == {k: v for k, v in toks.items() if v > 0}

    # within a shard, every sequence except the last is EXACTLY full,
    # and slices tile each sequence contiguously without overlap
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq"]), []).append(r)
    for (shard, seq), slices in by_seq.items():
        spans = sorted((s["seq_off"], s["seq_off"] + s["slice_len"])
                       for s in slices)
        assert spans[0][0] == 0
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0                      # contiguous, no overlap
        filled = spans[-1][1]
        last_seq = max(q for (sh, q) in by_seq if sh == shard)
        assert filled == budget or seq == last_seq
        assert filled <= budget

    # deterministic
    again = pack_sequences(d, "doc_id", "toks", budget, shards=shards)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_resample_by_weight_calibrated_and_deterministic(spark):
    from tecs_hardware_kbc_spark.operators.sampling import (
        resample_by_weight, temperature_multipliers)

    d = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dom"), (F.col("id") % 4).cast("string"))
        .alias("source"))
    mults = {"dom0": 2.5, "dom1": 0.4, "dom2": 0.0}   # dom3 -> 1.0
    out = resample_by_weight(d, "doc_id", "source", mults)
    rows = out.collect()

    # per-domain calibration: realized count ~ n_d * m_d (750 per domain)
    counts = {}
    for r in rows:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    assert 0.9 * 750 * 2.5 < counts["dom0"] < 1.1 * 750 * 2.5
    assert 0.8 * 750 * 0.4 < counts["dom1"] < 1.2 * 750 * 0.4
    assert "dom2" not in counts                       # dropped entirely
    assert counts["dom3"] == 750                      # pass-through x1

    # copy indices are dense 0..n-1 per key; floor(m) copies guaranteed
    per_key = {}
    for r in rows:
        per_key.setdefault(r["doc_id"], []).append(r["copy"])
    for k, cs in per_key.items():
        assert sorted(cs) == list(range(len(cs)))
    dom0_keys = [k for k in per_key if k % 4 == 0]
    assert all(len(per_key[k]) >= 2 for k in dom0_keys)

    # deterministic under repartitioning
    again = resample_by_weight(d.repartition(13), "doc_id", "source", mults)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_temperature_multipliers_flatten_the_mix(spark):
    from tecs_hardware_kbc_spark.operators.sampling import (
        resample_by_weight, temperature_multipliers)

    # skewed corpus: 80% dom0, 15% dom1, 5% dom2
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 < 16, "dom0")
        .when(F.col("id") % 20 < 19, "dom1").otherwise("dom2")
        .alias("source"))
    m = temperature_multipliers(d, "source", alpha=0.5)
    # alpha<1 boosts rare domains, shrinks dominant ones
    assert m["dom2"] > m["dom1"] > m["dom0"]
    assert m["dom0"] < 1.0 < m["dom2"]
    # expected total preserved: sum n_d * m_d == N
    counts = {r["source"]: r["count"]
              for r in d.groupBy("source").count().collect()}
    assert abs(sum(counts[k] * m[k] for k in m) - 2000) < 1e-6
    # realized shares move toward the alpha-flattened target
    out = resample_by_weight(d, "doc_id", "source", m)
    rc = {r["source"]: r["count"]
          for r in out.groupBy("source").count().collect()}
    tot = sum(rc.values())
    p = {k: v / 2000 for k, v in counts.items()}
    z = sum(v ** 0.5 for v in p.values())
    for k in p:
        target = p[k] ** 0.5 / z
        assert abs(rc[k] / tot - target) < 0.05
    # alpha=1 is the natural mix: every multiplier is exactly 1
    m1 = temperature_multipliers(d, "source", alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in m1.values())
