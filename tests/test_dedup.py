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


def test_simhash64_hamming_near_dups(spark):
    """64-bit simhash + block-banded hamming: finds true near-dups the
    16-bit equal-hash dedup misses, without the 16-bit false merges."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        simhash64, simhash_near_duplicates)

    long_a = " ".join(f"token{i} word{i * 7 % 97}" for i in range(120))
    rows = [
        (0, long_a),
        (1, long_a + " extra"),          # true near-dup (tiny perturbation)
        (2, " ".join(f"other{i} noun{i * 5 % 89}" for i in range(120))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert (0, 1) in pairs           # near-dup found
    assert (0, 2) not in pairs       # unrelated docs not merged
    assert (1, 2) not in pairs

    s = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
         for r in simhash64(docs).collect()}
    # 64-bit fingerprints of unrelated docs differ in far more than 3 bits
    ham = bin((s[0][0] ^ s[2][0])).count("1") + \
        bin((s[0][1] ^ s[2][1])).count("1")
    assert ham > 3
    # the near-dup pair is NOT an exact 64-bit match (the 16-bit
    # equal-hash dedup could only find it by luck) but is within 3 bits
    assert pairs[(0, 1)] <= 3


def test_simhash_hamming_exactness_vs_bruteforce(spark):
    """Block banding with max_hamming=3 is exact: every brute-force pair
    within distance 3 is found (pigeonhole over 4x16-bit blocks)."""
    from itertools import combinations

    from tecs_hardware_kbc_spark.operators.dedup import (
        simhash64, simhash_near_duplicates)

    base = " ".join(f"w{i} q{i * 3 % 53}" for i in range(80))
    rows = [(i, base + " " + " ".join(f"pad{j}" for j in range(i)))
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
            for r in simhash64(docs).collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(sims), 2)
        if bin(sims[a][0] ^ sims[b][0]).count("1")
        + bin(sims[a][1] ^ sims[b][1]).count("1") <= 3
    }
    banded = {(r["a"], r["b"])
              for r in simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert banded == brute


def test_embedding_near_dup_recall_vs_exact(spark):
    """Recall gate (the scale-path contract): on clustered vectors —
    planted near-dup pairs, the regime the operator exists for — the
    hyperplane-LSH bucketed path recovers >= 0.9 of the exact
    cosine_pairs >= 0.95 pairs at default planes."""
    import numpy as np

    from tecs_hardware_kbc_spark.operators.similarity import cosine_pairs

    rng = np.random.RandomState(3)
    rows = []
    vid = 0
    for c in range(40):
        base = rng.randn(16)
        base /= np.linalg.norm(base)
        for _ in range(3):  # 3 near-copies per cluster
            v = base + rng.randn(16) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    exact = {(r["a"], r["b"])
             for r in cosine_pairs(emb, 0.95).collect()}
    assert len(exact) >= 40  # sanity: clusters actually produce pairs
    lsh = {(r["a"], r["b"])
           for r in embedding_near_duplicates(emb, threshold=0.95).collect()}
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, recall
    # bucketed pairs are a subset of exact (same cosine filter)
    assert lsh <= exact


def test_near_duplicate_components(spark):
    """Pair tables collapse into canonical groups: transitive pairs
    (a-b, b-c) land in one component keyed by the min id."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        near_duplicate_components)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "a long, b long")
    comp = {r["doc_id"]: r["canonical_id"]
            for r in near_duplicate_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[7] == comp[9] == 7


def test_decontaminate_flags_overlapping_docs(spark):
    from tecs_hardware_kbc_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (1, "one two three four five six seven eight nine ten"),
         (2, "unrelated words entirely different from anything else here")],
        "doc_id int, text string")
    # benchmark contains doc 0's 3-gram "gamma delta epsilon" and nothing
    # from docs 1/2
    bench = spark.createDataFrame(
        [(100, "prefix gamma delta epsilon suffix")],
        "doc_id int, text string")
    out = decontaminate(docs, bench, n=3).collect()
    flagged = {r["doc_id"]: r for r in out}
    assert set(flagged) == {0}
    assert flagged[0]["n_hits"] >= 1
    assert "gamma delta epsilon" in {r["first_hit"] for r in out} or \
        flagged[0]["n_hits"] > 1

    # normalization: case/whitespace differences still match
    bench2 = spark.createDataFrame(
        [(101, "  GAMMA   Delta EPSILON  ")], "doc_id int, text string")
    out2 = decontaminate(docs, bench2, n=3).collect()
    assert {r["doc_id"] for r in out2} == {0}

    # the benchmark side is broadcast (map-side plan, no corpus shuffle)
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_paragraph_dedup_first_occurrence_wins(spark):
    from tecs_hardware_kbc_spark.operators.dedup import paragraph_dedup

    d = spark.createDataFrame(
        [
            # doc 0 owns the banner (and repeats it internally once)
            (0, "Shared Banner\n\nunique zero\n\nshared   banner"),
            (1, "shared banner\n\nunique one"),
            (2, "only unique two"),
            (3, "shared banner"),          # nothing left after dedup
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in paragraph_dedup(d).collect()}

    # first occurrence = smallest (doc_id, idx); normalization folds
    # case + whitespace, so doc 0's internal repeat also dies
    assert r[0]["text_dedup"] == "Shared Banner\n\nunique zero"
    assert r[0]["n_paras_kept"] == 2
    assert r[1]["text_dedup"] == "unique one"
    assert r[1]["n_paras_kept"] == 1
    assert r[2]["text_dedup"] == "only unique two"
    # a doc that was ALL boilerplate keeps its row, empty
    assert r[3]["text_dedup"] == "" and r[3]["n_paras_kept"] == 0


def test_semantic_dedup_groups_within_cells_only(spark):
    from tecs_hardware_kbc_spark.operators.dedup import semantic_dedup

    # two well-separated centroids on the x/y axes
    centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [
        (0, [1.0, 0.0, 0.0]),       # cell 0
        (1, [0.99, 0.01, 0.0]),     # cell 0, near-dup of 0
        (2, [0.9, 0.1, 0.3]),       # cell 0, near-dup of 0/1 (cos>0.9)
        (3, [0.0, 1.0, 0.0]),       # cell 1
        (4, [0.01, 0.99, 0.0]),     # cell 1, near-dup of 3
        (5, [-0.2, 0.9, -0.3]),     # cell 1, distinct (cos<thr vs 3/4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, centroids, threshold=0.95).collect()}

    assert {out[i]["cell"] for i in (0, 1, 2)} == {0}
    assert {out[i]["cell"] for i in (3, 4, 5)} == {1}
    # component-min keepers
    assert out[0]["canonical_id"] == 0
    assert out[1]["canonical_id"] == 0
    assert out[3]["canonical_id"] == 3 and out[4]["canonical_id"] == 3
    # the distinct vector keeps itself
    assert out[5]["canonical_id"] == 5
    # near-dups NEVER merge across cells even at cos ~ 0.7 (the
    # SemDeDup trade: the candidate join is strictly cell-bounded)
    assert out[2]["canonical_id"] != out[3]["canonical_id"]


def test_minhash_arr_signatures_bit_identical(spark, docs):
    """The shuffle-free per-row signature path (minhash_signatures_arr)
    must produce BIT-IDENTICAL signatures to the vocab-join path — min
    is duplicate-insensitive, so hashing per occurrence == hashing per
    distinct shingle. This pins the 'via' switch to a pure physical-plan
    choice."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        minhash_signatures_arr,
    )

    vocab = {r["doc_id"]: r["sig"] for r in
             minhash_signatures(word_shingles(docs), num_hashes=16)
             .collect()}
    arr = {r["doc_id"]: r["sig"] for r in
           minhash_signatures_arr(docs, num_hashes=16).collect()}
    assert arr == vocab

    # and the end-to-end pair sets agree between the two physical paths
    p_arr = {(r["a"], r["b"]) for r in
             minhash_near_duplicates(docs, threshold=0.5).collect()}
    p_voc = {(r["a"], r["b"]) for r in
             minhash_near_duplicates(docs, threshold=0.5,
                                     via="vocab").collect()}
    assert p_arr == p_voc


def test_lsh_hot_bucket_fallback_exact(spark, docs):
    """bucket_cap routes over-cap buckets through the streaming
    self-join; the pair set must be IDENTICAL to in-row expansion
    (cap=2 forces nearly every bucket through the fallback)."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        minhash_signatures_arr,
    )

    sigs = minhash_signatures_arr(docs, num_hashes=16)
    full = {(r["a"], r["b"])
            for r in lsh_candidate_pairs(sigs).collect()}
    hot = {(r["a"], r["b"])
           for r in lsh_candidate_pairs(sigs, bucket_cap=2).collect()}
    assert full == hot and full


def test_exact_keepers_equivalent(spark, docs):
    from tecs_hardware_kbc_spark.operators.dedup import exact_keepers

    via_mapping = {r["doc_id"] for r in exact_duplicates(docs)
                   .filter("doc_id = canonical_id").collect()}
    direct = {r["doc_id"] for r in exact_keepers(docs).collect()}
    assert direct == via_mapping


def test_incremental_dedup_flags_index_and_batch(spark):
    """Continuous-crawl shape: new docs that dup the indexed corpus are
    flagged 'index'; new docs that dup an earlier-id batchmate are
    flagged 'batch'; unique new docs are absent. A doc that dups BOTH
    reports the index partner (history wins)."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        incremental_near_duplicates, minhash_index)

    old = spark.createDataFrame(
        [(0, BASE), (2, "totally unrelated reference corpus sentence "
                        "about compilers optimizing loop nests")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(11, BASE.replace("angry", "sleepy")),     # near-dups index 0
         (13, "fresh unique content nothing resembles this string of "
              "words about marine biology and tidal pools"),
         (15, BASE.replace("angry", "sleepy")),     # dups 0 AND 11
         (17, "a second theme paragraph discussing volcanic islands "
              "and their coral reef ecosystems in the warm pacific"),
         (19, "a second theme paragraph discussing volcanic islands "
              "and their coral reef ecosystems in the cold pacific")],
        # 19 near-dups 17 only (both new): batch pair, keeper = 17
        "doc_id long, text string")
    index = minhash_index(old)
    out = {r["doc_id"]: r for r in incremental_near_duplicates(
        new, index, threshold=0.5).collect()}

    assert out[11]["source"] == "index" and out[11]["dup_of"] == 0
    assert out[15]["source"] == "index" and out[15]["dup_of"] == 0
    assert 13 not in out                      # unique within batch+index
    assert out[19]["source"] == "batch" and out[19]["dup_of"] == 17
    assert 17 not in out or out[17]["source"] == "batch"


def test_incremental_dedup_closes_the_loop(spark):
    """Appending the survivors' index rows makes the next batch's copy
    of a survivor flag against it — the carry-state contract."""
    from tecs_hardware_kbc_spark.operators.dedup import (
        incremental_near_duplicates, minhash_index)

    old = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    batch1 = spark.createDataFrame(
        [(11, "entirely new survivor content that will join the index "
              "and catch its own future near duplicates arriving later")],
        "doc_id long, text string")
    index = minhash_index(old)
    assert incremental_near_duplicates(batch1, index).count() == 0

    index2 = index.unionByName(minhash_index(batch1))
    batch2 = spark.createDataFrame(
        [(21, "entirely new survivor content that will join the index "
              "and catch its own future near duplicates arriving soon")],
        "doc_id long, text string")
    out = incremental_near_duplicates(batch2, index2,
                                      threshold=0.5).collect()
    assert len(out) == 1
    assert out[0]["dup_of"] == 11 and out[0]["source"] == "index"


def test_span_dedup_cuts_pasted_ranges_only(spark):
    """Exact substring dedup (Lee et al. 2022 ExactSubstr): a duplicated
    passage keeps its corpus-first occurrence and is cut everywhere
    else — including second copies inside the SAME doc — while unique
    text around the paste survives; exact whole-doc dups empty out."""
    from tecs_hardware_kbc_spark.operators.dedup import span_dedup

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "unique head zero " + passage + " unique tail zero"),
        (1, "different opening words one " + passage + " and an end one"),
        (2, passage + " middle junk words here " + passage),
        (3, "short doc"),
        (4, "totally unrelated text about catalyst optimizer shuffles "
            "and broadcast joins measured here today"),
        (5, "unique head zero " + passage + " unique tail zero"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(docs, span_words=8).collect()}

    assert out[0]["text_dedup"] == rows[0][1]          # first occurrence
    assert out[0]["n_words_removed"] == 0
    assert out[1]["text_dedup"] == "different opening words one and an end one"
    assert out[1]["n_words_removed"] == 10
    assert out[2]["text_dedup"] == "middle junk words here"
    assert out[2]["n_words_removed"] == 20              # both copies cut
    assert out[3]["n_words_removed"] == 0               # < span_words
    assert out[4]["n_words_removed"] == 0               # unique
    assert out[5]["text_dedup"] == "" and out[5]["n_words_removed"] == 16


def test_span_dedup_overlapping_windows_merge(spark):
    """An 9-word repeat under span_words=8 flags two overlapping windows
    in the copy; their coverage unions to exactly the 9 repeated words
    (the paper's merge-overlapping-ranges step, via position coverage)."""
    from tecs_hardware_kbc_spark.operators.dedup import span_dedup

    rep = "one two three four five six seven eight nine"        # 9 words
    docs = spark.createDataFrame(
        [(0, rep + " unique closing trio"), (1, "fresh lead in " + rep)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(docs, span_words=8).collect()}
    assert out[0]["n_words_removed"] == 0
    assert out[1]["text_dedup"] == "fresh lead in"
    assert out[1]["n_words_removed"] == 9
