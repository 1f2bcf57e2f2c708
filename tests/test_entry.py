"""Driver-contract regression: every oracle-backed query must value-match
DuckDB on the sf0.001 tables (the driver runs the same comparison at
sf0.01)."""

import math
import os

import duckdb
import pytest

import pyspark.sql.functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = E.queries()[name]
    df = fn(spark, SF)
    cols = sorted(df.columns)
    srows = sorted(tuple(_normalize(r[c]) for c in cols) for r in df.collect())
    res = con.sql(E.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    assert sorted(ocols) == cols
    orows = sorted(
        tuple(_normalize(row[ocols.index(c)]) for c in cols)
        for row in res.fetchall()
    )
    assert srows == orows


def test_rows_only_queries_run(spark):
    # NOTE: the three rows-only entries (kbc_triples, kbc_sentences,
    # kbc_extract_invariant) recompute and assert their committed golden
    # digests inside the entry body, so this loop IS the local digest
    # drift check at the fixed corpus seed.
    for name, fn in E.queries().items():
        if name in E.oracle_sql():
            continue
        df = fn(spark, SF)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_golden_digest_catches_drift(spark):
    """_check_golden must fail loudly on a row-count-preserving value
    change — the exact regression class the digests exist to catch."""
    assert set(E._GOLDEN_DIGESTS) == {
        "kbc_triples", "kbc_sentences", "kbc_extract_invariant"}
    inv = E.queries()["kbc_extract_invariant"](spark, SF)
    drifted = inv.withColumn("url", F.concat("url", F.lit("x")))
    with pytest.raises(AssertionError, match="digest drifted"):
        E._check_golden("kbc_extract_invariant", drifted, ["url", "ok"])


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.schema.simpleString() == \
        "struct<subj:string,pred:string,obj:string,prob:double>"
    assert df.count() > 0
