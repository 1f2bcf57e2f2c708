"""Knowledge fusion — the step between "per-page extractions" and "the
knowledge base".

The KBC pipeline emits one (subj, pred, obj, prob) row per extraction;
at web scale the same fact is extracted from thousands of pages, often
with conflicts (a distributor page lists an old max voltage, the
manufacturer page the new one). Fusion is the Knowledge Vault recipe
(Dong et al., KDD 2014): combine per-source confidences per candidate
fact, then resolve conflicts per (subj, pred) for functional predicates.
The reference resolves conflicts implicitly — its gold join keeps one
row per (doc, part, attr, val) and the threshold sweep picks winners
globally (``hack/opamps/analysis.py``); here the combination is an
explicit, replayable operator.

Determinism is the design constraint (same discipline as
``pagerank_fixed_point``'s integer mass grid and the IVF oracle-order
fold): probabilities are snapped to a 1e-6 grid, collected per fact,
**sorted**, and folded left-to-right with plain double multiplication —
the identical operation sequence in any engine, so the ``kg_fuse``
driver entry hash-matches a DuckDB ``list_reduce`` replay bit-for-bit.
No transcendentals (a log-domain sum would drag libm differences in).

Scale shape: one map-side-combinable groupBy per stage, windows
partitioned by (subj, pred) — fact-key cardinality, never corpus
cardinality. ``related_subjects`` guards its self-join with a
document-frequency cap, the hot-shingle trick from ``dedup.py``: an
object value shared by 50k subjects is uninformative AND quadratic, so
it is dropped, loudly, by predicate of the data rather than sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window

PROB_DECIMALS = 6


def fuse_triples(triples: DataFrame, src_col: str | None = None,
                 prob_col: str = "prob") -> DataFrame:
    """(subj, pred, obj, prob, n_src): independent-source noisy-or per
    candidate fact — ``prob = 1 - prod(1 - p_i)`` over its extractions,
    so two weak sightings beat one, and any single certain source wins.
    ``n_src`` counts distinct sources when ``src_col`` is given, else
    raw extraction rows. Probs snap to the 1e-6 grid and fold in sorted
    order (see module docstring)."""
    p = F.round(F.col(prob_col).cast("double"), PROB_DECIMALS)
    n = (F.countDistinct(src_col) if src_col else F.count(F.lit(1)))
    g = triples.groupBy("subj", "pred", "obj").agg(
        F.array_sort(F.collect_list(p)).alias("_ps"),
        n.alias("n_src"))
    keep = F.aggregate("_ps", F.lit(1.0), lambda a, q: a * (1.0 - q))
    return g.select(
        "subj", "pred", "obj",
        F.round(1.0 - keep, PROB_DECIMALS).alias("prob"), "n_src")


def resolve_functional(fused: DataFrame,
                       functional_preds: list[str]) -> DataFrame:
    """Conflict resolution for functional predicates (a part has ONE
    max collector-emitter voltage): per (subj, pred) keep the
    highest-probability object — ties break on higher support then
    lexicographic obj, so the winner is deterministic — and report how
    many candidates it beat as ``n_alt``. Non-functional predicates
    pass through with ``n_alt = 1``. One window, partitioned by the
    fact key."""
    w = Window.partitionBy("subj", "pred")
    ranked = fused.withColumn(
        "_rk", F.row_number().over(
            w.orderBy(F.desc("prob"), F.desc("n_src"), F.asc("obj")))
    ).withColumn("_n", F.count(F.lit(1)).over(w))
    is_fn = F.col("pred").isin(functional_preds)
    return (ranked
            .filter(~is_fn | (F.col("_rk") == 1))
            .select("subj", "pred", "obj", "prob", "n_src",
                    F.when(is_fn, F.col("_n")).otherwise(F.lit(1))
                    .alias("n_alt")))


def kb_history(observations: DataFrame, ts_col: str = "warc_ts"
               ) -> DataFrame:
    """Temporal KB (SCD2): per (subj, pred), order the observed objects
    by crawl time, collapse runs of the same value, and emit one
    validity interval per run — (subj, pred, obj, valid_from, valid_to,
    n_obs), ``valid_to`` NULL for the current value. A value that
    flips a→b→a yields two distinct 'a' intervals, the correct
    slowly-changing-dimension reading of a re-crawl stream.

    Plan: one window ordered by (ts, obj) builds segment ids as a
    running count of change points (lag ≠ current), one groupBy folds
    each segment, one lead-window closes the intervals. Everything
    partitions by the fact key, so a trillion-page crawl history
    shuffles each fact's observations once and nothing else."""
    ts = F.col(ts_col)
    w = Window.partitionBy("subj", "pred").orderBy(ts, "obj")
    seg = F.sum(
        F.when(F.lag("obj").over(w).isNull()
               | (F.lag("obj").over(w) != F.col("obj")), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    runs = (observations
            .withColumn("_seg", seg)
            .groupBy("subj", "pred", "_seg", "obj")
            .agg(F.min(ts).alias("valid_from"),
                 F.count(F.lit(1)).alias("n_obs")))
    w2 = Window.partitionBy("subj", "pred").orderBy("valid_from")
    return (runs
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .select("subj", "pred", "obj", "valid_from", "valid_to",
                    "n_obs"))


def kb_asof(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot of the temporal KB: the (subj, pred, obj)
    facts valid at instant ``ts`` under the ``kb_history`` SCD2
    intervals — ``valid_from <= ts < valid_to`` with an open-ended
    current interval (``valid_to`` NULL). ``ts`` may be a literal
    string/timestamp or a Column (e.g. a per-query parameter).

    This is the KB analog of the snapshot-table time travel in
    plans/snapshots.py: re-crawl streams keep appending observations,
    ``kb_history`` folds them into intervals once, and any historical
    question ("what did the KB believe on date D?") is a pure filter —
    no recomputation, pushed to the interval table's scan, prunable by
    a valid_from partition at scale."""
    ts_c = ts if isinstance(ts, Column) else F.lit(ts).cast("timestamp")
    return (history
            .filter((F.col("valid_from") <= ts_c)
                    & (F.col("valid_to").isNull()
                       | (F.col("valid_to") > ts_c)))
            .select("subj", "pred", "obj", "valid_from", "n_obs"))


def validate_kg(triples: DataFrame, schema: DataFrame) -> DataFrame:
    """Constraint checking against a predicate schema — the KB-quality
    gate a fused graph ships through. ``schema`` is a tiny table
    (pred, dtype 'numeric'|'string', lo, hi, functional) and
    BROADCASTS; violations come back long-form as (subj, pred, obj,
    violation):

    * ``unknown_pred``        — predicate not in the schema
    * ``not_numeric``         — numeric-typed obj that fails try_cast
    * ``out_of_range``        — numeric obj outside [lo, hi]
    * ``functional_conflict`` — >1 distinct obj for a functional pred

    The multiplicity check is one window over (subj, pred); everything
    else is a per-row expression after the broadcast join."""
    w = Window.partitionBy("subj", "pred")
    j = (triples.join(F.broadcast(schema), "pred", "left")
         # window result lands as a plain column first: Spark can't
         # resolve a window expression nested inside explode()
         .withColumn("_n_obj", F.size(F.collect_set("obj").over(w))))
    num = F.col("obj").try_cast("double")
    n_obj = F.col("_n_obj")
    checks = [
        ("unknown_pred", F.col("dtype").isNull()),
        ("not_numeric",
         (F.col("dtype") == "numeric") & num.isNull()),
        ("out_of_range",
         (F.col("dtype") == "numeric") & num.isNotNull()
         & ((num < F.col("lo")) | (num > F.col("hi")))),
        ("functional_conflict",
         F.col("functional") & (n_obj > 1)),
    ]
    viol = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None))
                  for name, cond in checks]),
        lambda x: x.isNotNull())
    return (j.withColumn("violation", F.explode(viol))
            .select("subj", "pred", "obj", "violation"))


def related_subjects(triples: DataFrame, max_df: int = 1000
                     ) -> DataFrame:
    """Graph materialization query: subject pairs related through
    shared (pred, obj) facts — (subj_a, subj_b, strength) where
    strength counts the shared facts, subj_a < subj_b. The KB-side
    analogue of the link graph's co-citation signal; e.g. every part
    pair with the same polarity AND the same max voltage.

    Self-joins on fact values go quadratic on hot values, so objects
    shared by more than ``max_df`` subjects are dropped before the
    join (they carry ~no information — the inverse-document-frequency
    argument, same guard as ``dedup.py``'s hot-shingle cap). The join
    key is (pred, obj); after the cap no group exceeds max_df, so the
    worst task is bounded regardless of corpus size."""
    facts = triples.select("subj", "pred", "obj").distinct()
    df_ok = (facts.groupBy("pred", "obj")
             .agg(F.count(F.lit(1)).alias("_df"))
             .filter(F.col("_df") <= max_df)
             .select("pred", "obj"))
    small = facts.join(df_ok, ["pred", "obj"])
    a, b = small.alias("a"), small.alias("b")
    return (a.join(b, ["pred", "obj"])
            .filter(F.col("a.subj") < F.col("b.subj"))
            .groupBy(F.col("a.subj").alias("subj_a"),
                     F.col("b.subj").alias("subj_b"))
            .agg(F.count(F.lit(1)).alias("strength")))
