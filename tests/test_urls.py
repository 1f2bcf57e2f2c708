"""URL-level curation: canonicalization, registered domains, caps."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.urls import (
    canonicalize_url,
    domain_cap,
    registered_domain,
    url_host,
)


def _canon(spark, url):
    return spark.range(1).select(
        canonicalize_url(F.lit(url)).alias("c")).collect()[0]["c"]


def test_canonicalize_collapses_equal_content(spark):
    messy = "HTTP://User@WWW.Site.COM:80/a/b?utm_source=x&b=2&a=1#frag"
    clean = "http://www.site.com/a/b?b=2&a=1"
    assert _canon(spark, messy) == _canon(spark, clean) \
        == "http://www.site.com/a/b?a=1&b=2"


def test_canonicalize_rules(spark):
    # non-default port survives; default is stripped per scheme
    assert _canon(spark, "https://s.com:8443/x") == "https://s.com:8443/x"
    assert _canon(spark, "https://s.com:443/x") == "https://s.com/x"
    assert _canon(spark, "http://s.com:443/x") == "http://s.com:443/x"
    # empty path -> '/'; all-tracking query -> dropped entirely
    assert _canon(spark, "https://s.com?gclid=1&fbclid=2") \
        == "https://s.com/"


def test_registered_domain(spark):
    cases = {
        "sub.site.co.uk": "site.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "10.0.0.7": "10.0.0.7",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r["host"]: r["d"] for r in df.select(
        "host", registered_domain(F.col("host")).alias("d")).collect()}
    assert got == cases


def test_domain_cap_deterministic_and_capped(spark):
    docs = spark.createDataFrame(
        [(i, f"https://www.site{i % 3}-shop.com/p{i}") for i in range(30)],
        "doc_id long, url string")
    kept = domain_cap(docs, max_per_domain=4)
    rows = kept.collect()
    per = {}
    for r in rows:
        per.setdefault(r["domain"], []).append(r["doc_id"])
    assert set(per) == {f"site{k}-shop.com" for k in range(3)}
    assert all(len(v) == 4 for v in per.values())
    # deterministic: a second run selects the same survivors
    again = {(r["doc_id"], r["domain_rank"])
             for r in domain_cap(docs, max_per_domain=4).collect()}
    assert again == {(r["doc_id"], r["domain_rank"]) for r in rows}


def test_token_budget_prefix_semantics(spark):
    from tecs_hardware_kbc_spark.operators.sampling import (
        hash_u, token_budget)

    docs = spark.createDataFrame([(i, 7 + i % 5) for i in range(200)],
                                 "doc_id long, tokens int")
    kept = token_budget(docs, "doc_id", "tokens", budget=600, buckets=8)
    rows = kept.orderBy("cum_tokens").collect()
    assert rows[-1]["cum_tokens"] == sum(r["tokens"] for r in rows) <= 600

    # the survivors are EXACTLY the hash-order prefix: every kept u is
    # smaller than every dropped u (bucket = floor(u*B) is monotone in
    # u, so bucketing never reorders)
    u = {r["doc_id"]: r["u"] for r in docs.select(
        "doc_id", hash_u(F.col("doc_id"), "budget").alias("u")).collect()}
    kept_ids = {r["doc_id"] for r in rows}
    dropped = set(u) - kept_ids
    assert max(u[i] for i in kept_ids) < min(u[i] for i in dropped)
    # the first dropped doc would have crossed the budget
    first_out = min(dropped, key=lambda i: u[i])
    toks = {i: 7 + i % 5 for i in range(200)}
    assert rows[-1]["cum_tokens"] + toks[first_out] > 600


def test_token_budget_invariant_to_bucket_count(spark):
    from tecs_hardware_kbc_spark.operators.sampling import token_budget

    docs = spark.createDataFrame([(i, 10 + i % 13) for i in range(150)],
                                 "doc_id long, tokens int")
    a = {(r["doc_id"], r["cum_tokens"]) for r in
         token_budget(docs, "doc_id", "tokens", 900, buckets=4).collect()}
    b = {(r["doc_id"], r["cum_tokens"]) for r in
         token_budget(docs, "doc_id", "tokens", 900, buckets=64).collect()}
    assert a == b and len(a) > 0
