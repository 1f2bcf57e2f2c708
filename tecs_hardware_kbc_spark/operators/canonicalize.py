"""Connected-components canonicalization over alias edges (north_rule).

Part surface forms ("BC546A/B", "BC546 thru BC548", prefix-implied
dictionary parts) form an alias graph; the canonical entity id of a part is
the minimum member of its connected component. The reference achieves the
same effect procedurally (expansion at mention time + prefix widening at
scoring time, ``transistor_spaces.py:179-193`` /
``transistor_utils.py:408-412``); a graph canonicalization is the web-scale
generalization: aliases discovered on *different* pages still unify.

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC'14). Each phase is pure hash-keyed
groupBy/join (never a collect of a neighborhood, so a 10^7-node
component costs a shuffle partition, not an executor's heap), and the
edge set provably contracts to component-min stars in O(log^2 n) rounds
WORST CASE — independent of graph diameter. That bound is the point:
the previous min-label-propagation version converged in O(diameter)
rounds, and a near-dup chain (boilerplate drifting one edit per page —
a real web-corpus shape) has diameter ~ component size, so at any fixed
iteration cap it silently returned split components. Star contraction
cannot: long chains halve every round, and non-convergence (only
possible via the safety cap) raises instead of returning wrong labels.
``localCheckpoint`` truncates lineage each round so plans don't grow
(SURVEY §4); hot nodes are handled by the AQE skew-join config from
session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _edge_sig(e: DataFrame) -> tuple:
    """Order-free signature of an edge SET (count + xxhash64 xor-fold)
    — cheap convergence test without a full set-difference join. XOR,
    not SUM: it cannot overflow under ANSI mode, and the edge set is
    deduplicated so xor's multiset-blindness cannot hide a change that
    the count doesn't already reveal."""
    h = F.xxhash64("u", "v")
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.bit_xor(h).alias("x"),
                F.sum(h.cast("decimal(38,0)")).alias("s")).first()
    return (row["n"], row["x"], row["s"])


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every LARGER neighbor v to
    m = min(N(u) + {u}).  Emitted edges stay (child > parent)-oriented
    because v > u >= m.

    The per-u minimum rides a window over the SAME u-keyed shuffle the
    phase needs anyway, instead of a groupBy + join back: one Exchange
    per phase instead of two (plus the join), which matters because
    star-contraction rounds on converging graphs are stage-latency
    bound, not byte bound (r6: CC over the 33k-edge web_kg identity
    graph dropped ~2x).

    The output is NOT deduplicated: different u can emit the same
    (v, m) pair, but ``_small_star`` computes a per-u MIN — which is
    duplicate-insensitive — and ends in its own dropDuplicates, so
    paying an Exchange here to collapse collisions bought nothing
    (r6: one round = 3 exchanges, down from 5). Output volume is
    bounded by |e| (one row per oriented edge) either way."""
    from pyspark.sql.window import Window

    sym = e.unionByName(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.col("u"), F.min("v").over(w))
    return (sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")))


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u over its SMALLER neighbors Γ(u): connect every
    member of Γ(u) + {u} to m = min Γ(u).  Compresses the short side of
    every path onto the local minimum.  Same one-Exchange window shape
    as ``_large_star``; the (u, m) self-edge is emitted by the rows
    that hold the minimum neighbor, replacing the groupBy + unionByName
    of the join formulation.

    Duplicate-tolerant (r6): the input arrives straight from
    ``_large_star`` without a dedup — the per-u MIN is unchanged by
    duplicate rows, duplicate (v, m) emissions (including multiple
    v == m rows each emitting (u, m)) collapse in the single
    dropDuplicates here, which doubles as the round's edge-set dedup
    that ``connected_components``' signature test requires."""
    from pyspark.sql.window import Window

    d = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")))
    w = Window.partitionBy("u")
    dm = d.withColumn("m", F.min("v").over(w))
    # each row emits (v, m); a row with v == m additionally emits
    # (u, m) — struct(NULL) pairs are filtered out by the flatten
    pairs = F.array(
        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
        F.when(F.col("v") == F.col("m"),
               F.struct(F.col("u").alias("a"), F.col("m").alias("b"))))
    return (dm.select(F.explode(pairs).alias("p"))
            .filter(F.col("p").isNotNull())
            .select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates())


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """(node, component) for the undirected graph given by ``edges``.

    ``component`` is the lexicographic min node id of the component.
    Star contraction guarantees convergence within O(log^2 n) rounds;
    ``max_iter`` is a safety cap (50 covers any graph that fits on
    hardware) and raises — never returns partial labels — if hit.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .dropDuplicates()
        .localCheckpoint()
    )
    sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        new_sig = _edge_sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "star-contraction rounds — edge ids may not be totally "
            "ordered (mixed-type keys?)")
    # converged edge set = stars (child -> component min); roots and
    # nodes whose component is a single edge's min appear only as v
    return (
        nodes.join(e.select(F.col("u").alias("node"),
                            F.col("v").alias("component")),
                   "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def part_alias_edges(part_mentions: DataFrame) -> DataFrame:
    """Alias edges from the mention layer: every implicit expansion of one
    anchor span is an alias of that anchor's sibling expansions (e.g.
    BC546A <-> BC546B from "BC546A/B"). Grouping key = the physical anchor
    (url, sentence, char range)."""
    anchors = part_mentions.groupBy(
        "url", "position", "char_start", "char_end"
    ).agg(F.collect_set("span").alias("spans"))
    hub = F.array_min("spans")
    return (
        anchors.select(hub.alias("src"), F.explode("spans").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def doc_alias_edges(pages: DataFrame) -> DataFrame:
    """Doc-identity alias edges: two doc keys whose extracted ``text`` is
    byte-identical are the same document (mirror on another domain). Edge =
    (min doc of the fingerprint group, member doc). The fingerprint groupBy
    is the exact-dedup hash-groupBy; near-dup edges (minhash) can be unioned
    in from operators.dedup for fuzzier mirrors."""
    from tecs_hardware_kbc_spark.operators.linking import doc_of_url

    docs = pages.select(doc_of_url().alias("doc"),
                        F.md5(F.col("text")).alias("fp")).dropDuplicates()
    groups = (
        docs.groupBy("fp").agg(F.collect_set("doc").alias("docs"))
        .filter(F.size("docs") > 1)
    )
    return (
        groups.select(F.array_min("docs").alias("src"),
                      F.explode("docs").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def canonicalize_entities(entities: DataFrame, components: DataFrame,
                          on: str = "doc") -> DataFrame:
    """Rewrite entity ``doc`` (or ``part``) ids to their component
    representative; keeps the max prob when aliases collapse. When
    canonicalizing docs, unary entities (part == doc) have both rewritten."""
    # components only contains nodes that HAVE aliases — usually small, but
    # unbounded at web scale, so let AQE pick broadcast vs shuffle.
    comp = components.select(F.col("node").alias(on),
                             F.col("component").alias("_canon"))
    out = (
        entities.join(comp, on, "left")
        .withColumn("_canon", F.coalesce("_canon", F.col(on)))
    )
    if on == "doc":
        out = out.withColumn(
            "part",
            F.when(F.col("part") == F.col("doc"), F.col("_canon"))
            .otherwise(F.col("part")),
        ).withColumn("doc", F.col("_canon"))
    else:
        out = out.withColumn("part", F.col("_canon"))
    return (
        out.groupBy("doc", "part", "attribute", "value")
        .agg(F.max("prob").alias("prob"))
    )


def normalize_name(col) -> "F.Column":
    """Surface-form normalization for entity names: lowercase and strip
    every non-alphanumeric character — 'BC-546', 'bc 546' and 'BC546'
    all collapse to 'bc546' before any fuzzy matching runs."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def fuzzy_alias_edges(names: DataFrame, name_col: str = "name",
                      max_dist: int = 1, block_chars: int = 4,
                      max_block: int = 500) -> DataFrame:
    """(u, v) alias edges between DISTINCT normalized names within
    Levenshtein distance ``max_dist`` — the fuzzy edge source for
    entity resolution, feeding ``connected_components``.

    All-pairs edit distance is quadratic in the vocabulary, so pairs
    are generated per BLOCK (first ``block_chars`` normalized chars,
    the standard prefix-blocking key): only names sharing the prefix
    are compared, which also means a pair whose edit sits inside the
    prefix is out of reach — blocking trades that recall for a bounded
    join, the same deal every ER system makes. Blocks larger than
    ``max_block`` are dropped before the self-join (hot prefixes like
    'part' carry no discriminating signal and would re-create the
    quadratic blowup — the dedup.py hot-shingle guard). A cheap length
    pre-filter runs before the Levenshtein so most candidate pairs
    never reach the O(len^2) comparison."""
    norm = (names.select(normalize_name(F.col(name_col)).alias("n"))
            .filter(F.length("n") > 0).distinct()
            .withColumn("_b", F.substring("n", 1, block_chars)))
    ok = (norm.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
          .filter(F.col("_sz") <= max_block).select("_b"))
    blocked = norm.join(ok, "_b")
    a = blocked.select("_b", F.col("n").alias("u"))
    b = blocked.select("_b", F.col("n").alias("v"))
    return (a.join(b, "_b")
            .filter((F.col("u") < F.col("v"))
                    & (F.abs(F.length("u") - F.length("v"))
                       <= max_dist)
                    & (F.levenshtein("u", "v") <= max_dist))
            .select("u", "v"))


def resolve_entity_names(names: DataFrame, name_col: str = "name",
                         max_dist: int = 1, block_chars: int = 4,
                         max_block: int = 500) -> DataFrame:
    """(name, norm, canonical): full fuzzy entity resolution — raw
    surface forms normalize, normalized variants within ``max_dist``
    edits (same block) link into alias components via star-contraction
    connected components, and every name maps to its component's
    lexicographic-min normalized form. Names with no fuzzy neighbor
    canonicalize to their own normalized form. This is the
    gazetteer-free half of entity linking: it unifies spellings the
    dictionary never listed."""
    base = (names.select(F.col(name_col).alias("name"))
            .distinct()
            .withColumn("norm", normalize_name(F.col("name"))))
    edges = fuzzy_alias_edges(base.select(F.col("norm").alias("name")),
                              max_dist=max_dist,
                              block_chars=block_chars,
                              max_block=max_block)
    comp = connected_components(edges, src="u", dst="v").select(
        F.col("node").alias("norm"), F.col("component").alias("_c"))
    return (base.join(comp, "norm", "left")
            .select("name", "norm",
                    F.coalesce("_c", F.col("norm")).alias("canonical")))


def rewrite_sameas(triples: DataFrame, sameas_pred: str = "same_as",
                   broadcast_map: bool = True) -> DataFrame:
    """owl:sameAs smushing: take the KB's own identity assertions
    (``pred == sameas_pred``), close them into components (undirected
    — sameAs is symmetric/transitive), pick the lexicographic-min IRI
    of each component as canonical, and rewrite every remaining
    triple's subject AND object through the map. Merged entities can
    make distinct assertions collide, so the rewrite ends in a
    distinct — the semantics a reasoner gives owl:sameAs, materialized
    once instead of re-derived per query.

    Shape: the component map is O(#aliased entities) — orders of
    magnitude below the KB — so with ``broadcast_map`` both rewrite
    joins broadcast and the KB itself NEVER shuffles for the rename;
    only the final distinct shuffles, keyed by the full triple. Star
    contraction bounds the closure at O(log² n) rounds regardless of
    alias-chain length."""
    edges = (triples.filter(F.col("pred") == sameas_pred)
             .select(F.col("subj").alias("src"),
                     F.col("obj").alias("dst")))
    comp = connected_components(edges)
    m = comp.select(F.col("node"), F.col("component").alias("_canon"))
    if broadcast_map:
        m = F.broadcast(m)
    rest = triples.filter(F.col("pred") != sameas_pred)
    out = (rest
           .join(m.withColumnRenamed("node", "subj")
                  .withColumnRenamed("_canon", "_cs"), "subj", "left")
           .join(m.withColumnRenamed("node", "obj")
                  .withColumnRenamed("_canon", "_co"), "obj", "left")
           .select(F.coalesce("_cs", "subj").alias("subj"),
                   "pred",
                   F.coalesce("_co", "obj").alias("obj")))
    return out.distinct()
