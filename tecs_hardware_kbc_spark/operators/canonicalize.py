"""Connected-components canonicalization over alias edges (north_rule).

Part surface forms ("BC546A/B", "BC546 thru BC548", prefix-implied
dictionary parts) form an alias graph; the canonical entity id of a part is
the minimum member of its connected component. The reference achieves the
same effect procedurally (expansion at mention time + prefix widening at
scoring time, ``transistor_spaces.py:179-193`` /
``transistor_utils.py:408-412``); a graph canonicalization is the web-scale
generalization: aliases discovered on *different* pages still unify.

Algorithm: iterative min-label propagation — each round every node takes
the min component id among itself and its neighbors:

    comp <- min(comp, min over neighbors(comp))

converging in O(diameter) rounds. Each round is one shuffle on the edge
key; ``localCheckpoint`` truncates lineage so plans don't grow (SURVEY §4);
convergence is detected by counting changed labels. Alias components are
tiny and diameter-bounded, so rounds stay single-digit even at 10^12 docs;
hot nodes are handled by the AQE skew-join config from session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """(node, component) for the undirected graph given by ``edges``.

    ``component`` is the lexicographic min node id of the component.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"),
                                  F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


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
