"""TransE integer embeddings: one epoch pinned against an independent
numpy reference, determinism under re-execution, and hand-checked
filtered link-prediction ranks."""

import hashlib

import pytest

from tecs_hardware_kbc_spark.operators.kg_embed import (
    DEFAULT_LR, DEFAULT_MARGIN, EMB_RANGE, entity_index, init_embeddings,
    link_prediction_ranks, train_transe)

TRIPLES = [
    ("E0", "made_by", "M0"),
    ("E1", "made_by", "M0"),
    ("E2", "made_by", "M1"),
    ("M0", "located_in", "C0"),
    ("M1", "located_in", "C1"),
    ("E0", "product_country", "C0"),
    ("E2", "product_country", "C1"),
]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _init_ref(nodes, dim):
    return {(n, d): _h32(f"{n}:{d}:emb") % (2 * EMB_RANGE + 1) - EMB_RANGE
            for n in nodes for d in range(dim)}


def _epoch_ref(emb, triples, ents, epoch, dim,
               lr=DEFAULT_LR, margin=DEFAULT_MARGIN):
    """Independent full-batch TransE epoch (plain dicts, no Spark)."""
    delta = {}
    for (h, r, t) in triples:
        nid = _h32(f"{h}:{r}:{t}:{epoch}:neg") % len(ents)
        neg = ents[nid]
        dp = [emb[(h, d)] + emb[(r, d)] - emb[(t, d)] for d in range(dim)]
        dn = [emb[(h, d)] + emb[(r, d)] - emb[(neg, d)]
              for d in range(dim)]
        if sum(abs(x) for x in dp) + margin > sum(abs(x) for x in dn):
            for d in range(dim):
                sp = (dp[d] > 0) - (dp[d] < 0)
                sn = (dn[d] > 0) - (dn[d] < 0)
                delta[(h, d)] = delta.get((h, d), 0) + lr * (sn - sp)
                delta[(r, d)] = delta.get((r, d), 0) + lr * (sn - sp)
                delta[(t, d)] = delta.get((t, d), 0) + lr * sp
                delta[(neg, d)] = delta.get((neg, d), 0) - lr * sn
    return {k: v + delta.get(k, 0) for k, v in emb.items()}


@pytest.fixture(scope="module")
def triples_df(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"]).cache()


def test_entity_index_dense_and_sorted(spark, triples_df):
    idx = {r["node"]: r["id"]
           for r in entity_index(triples_df).collect()}
    names = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    assert idx == {n: i for i, n in enumerate(names)}


def test_init_matches_md5_formula(spark, triples_df):
    got = {(r["node"], r["dim"]): r["val"]
           for r in init_embeddings(triples_df, dim=2).collect()}
    nodes = ({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES}
             | {t[1] for t in TRIPLES})
    assert got == _init_ref(nodes, 2)


def test_two_epochs_match_numpy_reference(spark, triples_df):
    dim = 3
    got = {(r["node"], r["dim"]): r["val"]
           for r in train_transe(triples_df, dim=dim, epochs=2).collect()}
    nodes = ({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES}
             | {t[1] for t in TRIPLES})
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    ref = _init_ref(nodes, dim)
    ref = _epoch_ref(ref, TRIPLES, ents, 1, dim)
    ref = _epoch_ref(ref, TRIPLES, ents, 2, dim)
    assert got == ref


def test_training_is_deterministic(spark, triples_df):
    a = sorted(map(tuple, train_transe(triples_df, epochs=1).collect()))
    b = sorted(map(tuple, train_transe(triples_df, epochs=1).collect()))
    assert a == b


def test_training_reduces_true_triple_distance(spark, triples_df):
    """The margin loss must not make true triples WORSE in aggregate:
    total L1 distance of the training triples under the trained
    parameters <= under the init."""
    def total_dist(emb_rows, dim):
        emb = {(r["node"], r["dim"]): r["val"] for r in emb_rows}
        return sum(
            abs(emb[(h, d)] + emb[(r, d)] - emb[(t, d)])
            for (h, r, t) in TRIPLES for d in range(dim))
    d0 = total_dist(init_embeddings(triples_df, dim=4).collect(), 4)
    d2 = total_dist(train_transe(triples_df, dim=4, epochs=2).collect(), 4)
    assert d2 < d0


def test_link_prediction_rank_semantics(spark, triples_df):
    """Hand-checkable filtered protocol: candidates asserted for the
    same (subj, pred) are excluded, rank = 1 + strictly-better (ties
    by name)."""
    emb = train_transe(triples_df, dim=4, epochs=2)
    test = triples_df.filter("pred = 'product_country'")
    ranks = {(r["subj"], r["obj"]): r["rank"]
             for r in link_prediction_ranks(
                 test, emb, triples_df, dim=4).collect()}
    n_ents = len({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    assert set(ranks) == {("E0", "C0"), ("E2", "C1")}
    for v in ranks.values():
        assert 1 <= v <= n_ents

    # recompute one rank by brute force from the trained table
    e = {(r["node"], r["dim"]): r["val"] for r in emb.collect()}
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})

    def score(h, r, c):
        return sum(abs(e[(h, d)] + e[(r, d)] - e[(c, d)])
                   for d in range(4))

    ts = score("E0", "product_country", "C0")
    beats = sum(
        1 for c in ents if c != "C0" and (
            score("E0", "product_country", c) < ts
            or (score("E0", "product_country", c) == ts and c < "C0")))
    assert ranks[("E0", "C0")] == beats + 1


def test_inv_rank_and_hit3_columns(spark, triples_df):
    emb = train_transe(triples_df, dim=4, epochs=1)
    test = triples_df.filter("pred = 'made_by'")
    for r in link_prediction_ranks(test, emb, triples_df, dim=4).collect():
        assert r["hit3"] == (1 if r["rank"] <= 3 else 0)
        assert r["inv_rank_x1e6"] == 1_000_000 // r["rank"]
