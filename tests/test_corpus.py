"""Corpus generator properties: determinism, distributed==driver parity,
hot-domain skew, planted structure."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.corpus import (
    DOMAINS,
    distributed_corpus,
    generate_corpus,
)


def test_deterministic(spark):
    a = generate_corpus(25, seed=42)
    b = generate_corpus(25, seed=42)
    assert [p.url for p in a.pages] == [p.url for p in b.pages]
    assert a.gold == b.gold
    assert [p.html for p in a.pages] == [p.html for p in b.pages]


def test_distributed_matches_driver(spark):
    drv = generate_corpus(25, seed=42)
    pages, gold, gaz = distributed_corpus(spark, 25, seed=42)
    drv_urls = sorted((p.url, p.warc_ts.replace(tzinfo=None).isoformat())
                      for p in drv.pages)
    dist_urls = sorted((r["url"], r["warc_ts"].isoformat())
                       for r in pages.collect())
    assert drv_urls == dist_urls
    assert sorted(drv.gold) == sorted(tuple(r) for r in gold.collect())
    drv_texts = {p.url: p.text for p in drv.pages}
    for r in pages.select("url", "text").collect():
        assert drv_texts[r["url"]] == r["text"]


def test_hot_domain_skew(spark):
    c = generate_corpus(300, seed=42)
    hot = sum(1 for p in c.pages if DOMAINS[0] in p.url)
    assert hot / len(c.pages) > 0.15  # planted ~25% hot-domain share


def test_unique_primary_parts(spark):
    c = generate_corpus(500, seed=42)
    primary_docs = [p.url.rsplit("/", 1)[-1] for p in c.pages
                    if "-m.html" not in p.url]
    # re-crawls repeat the url on purpose; distinct urls must be unique docs
    assert len(set(primary_docs)) == len(set(primary_docs))
    gold_parts = {(g[0], g[2]) for g in c.gold}
    assert len(gold_parts) > 400  # plenty of planted entities


def test_recall_ceiling_planted(spark):
    c = generate_corpus(300, seed=42, noise=True)
    unrecoverable = [g for g in c.gold if g[2].startswith("Z")]
    assert unrecoverable, "noise should plant unrecoverable gold"
    clean = generate_corpus(300, seed=42, noise=False)
    assert not [g for g in clean.gold if g[2].startswith("Z")]
