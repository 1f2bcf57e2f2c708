"""The deterministic documents generator behind the curation scaling
probe (docgen.synthetic_documents): planted rates, byte-identity of
exact dups, partitioning-independence, and each planted offender class
actually exercising its intended funnel stage."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.docgen import synthetic_documents

N = 4000


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_documents(spark, N).cache()


def test_schema_matches_documents_table(corpus):
    assert [f.name for f in corpus.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", "url"]
    assert corpus.count() == N


def test_exact_dups_are_byte_identical(spark, corpus):
    """Every planted exact-dup row must equal SOME other row byte-for-
    byte (its base — unless the base was itself a dup, the documented
    second-order loss), and the overall exact-dup mass must be near the
    6% plant minus that loss."""
    by_text = corpus.groupBy("text").count()
    dup_mass = by_text.filter("count > 1") \
        .agg(F.sum(F.col("count") - 1)).collect()[0][0]
    assert 0.035 * N <= dup_mass <= 0.07 * N


def test_generation_is_partitioning_independent(spark, corpus):
    one = synthetic_documents(spark, N).repartition(1) \
        .orderBy("doc_id").select("doc_id", "text")
    many = corpus.repartition(17).orderBy("doc_id") \
        .select("doc_id", "text")
    assert one.exceptAll(many).count() == 0
    assert many.exceptAll(one).count() == 0


def test_planted_offenders_hit_their_stages(spark, corpus):
    """German docs die at the language gate; junk docs SURVIVE it (they
    keep the English backbone) and die at the Gopher symbol-ratio gate;
    hot domain 0 holds ~5% of urls so domain_cap has work."""
    from tecs_hardware_kbc_spark.operators.textstats import (
        gopher_quality, language_id)

    lang = language_id(corpus)
    n_de = lang.filter("lang_pred = 'de'").count()
    assert 0.06 * N <= n_de <= 0.18 * N
    # the lang column records the plant; predictions must agree closely
    agree = lang.join(corpus.select("doc_id", "lang"), "doc_id") \
        .filter("lang_pred = lang").count()
    assert agree >= 0.95 * N

    en = corpus.filter("lang = 'en'")
    g = gopher_quality(en).join(
        corpus.select("doc_id", "text"), "doc_id")
    junk = g.filter(F.col("text").startswith("####"))
    n_junk = junk.count()
    assert n_junk >= 0.04 * N  # ~8% plant, en-only view
    # EVERY planted junk doc dies at the symbol-ratio rule, and the
    # clean majority survives the full conjunction
    assert junk.filter("gopher_keep").count() == 0
    assert g.filter("gopher_keep").count() >= 0.8 * N

    hot = corpus.filter(F.col("url").startswith("https://www.d0-")).count()
    assert 0.03 * N <= hot <= 0.08 * N


def test_near_dups_found_by_minhash(spark, corpus):
    """A sample of planted near-dup rows must pair with their base via
    the default (array-path) minhash LSH at the funnel's threshold."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        minhash_near_duplicates)

    small = synthetic_documents(spark, 600)
    pairs = minhash_near_duplicates(small, threshold=0.5)
    n_pairs = pairs.count()
    # ~5% near + ~6% exact plants on 600 docs, second-order losses
    assert n_pairs >= 0.06 * 600
