"""Dedup operator semantics: exact groups, minhash/LSH recall on true
near-duplicates, simhash stability, jaccard exactness."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_duplicates,
    word_shingles,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to hide from the angry farmer")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                  # exact dup of 0
        (2, BASE.replace("angry", "sleepy")),       # near dup of 0
        (3, "completely different text about spark query engines and "
            "distributed joins over very large datasets in the cloud"),
        (4, "  " + BASE.upper() + "  "),            # exact after normalize
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    out = {r["doc_id"]: r["canonical_id"]
           for r in exact_duplicates(docs).collect()}
    assert out[0] == out[1] == out[4] == 0
    assert out[3] == 3


def test_minhash_recall_and_precision(spark, docs):
    pairs = {(r["a"], r["b"])
             for r in minhash_near_duplicates(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs          # exact dup found
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert not any(3 in p for p in pairs)      # unrelated doc never pairs


def test_minhash_signature_shape(spark, docs):
    sigs = minhash_signatures(word_shingles(docs), num_hashes=16).collect()
    assert all(len(r["sig"]) == 16 for r in sigs)
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert by_id[0] == by_id[1]  # identical docs -> identical signatures


def test_lsh_pairs_subset_of_possible(spark, docs):
    sigs = minhash_signatures(word_shingles(docs), num_hashes=16)
    pairs = lsh_candidate_pairs(sigs, bands=4, num_hashes=16).collect()
    assert all(r["a"] < r["b"] for r in pairs)


def test_simhash(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[0] == out[1]
    assert out[0] != out[3]
    dups = {r["doc_id"]: r["canonical_id"]
            for r in simhash_duplicates(docs).collect()}
    assert dups[1] == 0


def test_ngram_jaccard_exact(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_embedding_near_duplicates(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),    # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]): r["cosine"]
             for r in embedding_near_duplicates(emb, threshold=0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 2) not in pairs and (0, 3) not in pairs


def test_corpus_mirrors_found_by_minhash(spark, tiny_tables):
    """The synthetic corpus plants mirrored pages — minhash must find them."""
    from tecs_hardware_kbc_spark.operators.linking import doc_of_url

    docs = tiny_tables["pages"].select(
        doc_of_url().alias("doc_id"), "text").dropDuplicates(["doc_id"])
    pairs = minhash_near_duplicates(
        docs, id_col="doc_id", text_col="text", threshold=0.9).collect()
    mirror_pairs = [r for r in pairs
                    if r["a"].rstrip("-M") == r["b"].rstrip("-M")
                    or r["a"] == r["b"].replace("-M", "")]
    n_mirrors = tiny_tables["pages"].filter(
        F.col("url").contains("-m.html")).count()
    if n_mirrors:
        assert mirror_pairs, "planted mirrors not recovered by minhash"
