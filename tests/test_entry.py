"""Driver-contract regression: every oracle-backed query must value-match
DuckDB on the sf0.001 tables (the driver runs the same comparison at
sf0.01)."""

import math
import os
import re

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


def _hint_materialized(sql: str) -> str:
    """Execute oracles with explicit CTE materialization.

    DuckDB 1.0 inlines every non-recursive CTE at each reference site;
    oracles whose CTE chain references earlier CTEs several times per
    level (the unrolled BPE rounds reference b{i} three times inside
    rep{i+1}) therefore expand exponentially and one sf0.001 oracle
    runs for HOURS. ``AS MATERIALIZED`` is a pure execution hint — the
    query's semantics and result set are unchanged — and turns that
    back into the linear chain the SQL describes (measured 0.1s vs
    >300s). Recursive CTEs cannot take the hint and are left alone."""
    if re.search(r"\bRECURSIVE\b", sql, re.IGNORECASE):
        return sql
    # Rewrite only top-level CTE definitions: scan quote-aware (single-
    # quoted and $tag$-quoted literals carry unbalanced parens), track
    # paren depth, and stop at the first depth-0 SELECT — everything
    # after it is the main query, where ``name AS (`` is a named-window
    # clause, not a CTE.
    out, i, depth, n = [], 0, 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
            continue
        if ch == "$":
            m = re.match(r"\$\w*\$", sql[i:])
            if m:
                tag = m.group(0)
                j = sql.find(tag, i + len(tag))
                j = n if j < 0 else j + len(tag)
                out.append(sql[i:j])
                i = j
                continue
        if depth == 0:
            m = re.match(r"\bSELECT\b", sql[i:], re.IGNORECASE)
            if m and (i == 0 or not (sql[i - 1].isalnum()
                                     or sql[i - 1] == "_")):
                out.append(sql[i:])
                break
            m = re.match(r"AS(\s*)\(", sql[i:])
            if m and (i == 0 or not (sql[i - 1].isalnum()
                                     or sql[i - 1] == "_")):
                out.append("AS MATERIALIZED (")
                depth += 1
                i += m.end()
                continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        out.append(ch)
        i += 1
    return "".join(out)


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
    res = con.sql(_hint_materialized(E.oracle_sql()[name]))
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
