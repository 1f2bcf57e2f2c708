"""Candidate -> entity conversion + entity linking (SURVEY A7/P8/J5).

* ``doc_of_url`` — document identity = uppercased url stem (the Spark analog
  of ``document.name.upper()``, ``transistor_utils.py:431``).
* ``to_entities`` — dedup'd (doc, part, attribute, value, prob) tuples
  (``candidates_to_entities``, ``transistor_utils.py:436-453``), keeping the
  max marginal per entity.
* ``widen_aliases`` — parts-by-doc implied-part expansion: a matched base
  part (len >= 4) implies every doc-known part it prefixes
  (``get_implied_parts``, ``transistor_utils.py:408-412``). Relational form:
  a broadcast-able prefix theta-join against the per-doc part table — never
  a shuffled theta join (the dictionary side is small).
* ``resolve_unit`` + opamp entity conversion — the "grow the row spread
  until exactly one unit is found" loop (``opamp_utils.py:115-213``, W2)
  re-expressed as set algebra over pre-aggregated spread tables, plus ±
  doubling (``opamp_utils.py:197-207``) and kHz/µA display rescale
  (``opamps.py:39-49``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

from tecs_hardware_kbc_spark.operators.context import lower_arr


def doc_of_url(col=None) -> Column:
    col = col if col is not None else F.col("url")
    stem = F.element_at(F.split(col, "/"), -1)
    return F.upper(F.regexp_replace(stem, r"\.html$", ""))


def to_entities(scored: DataFrame, attribute: str,
                dedup: bool = True) -> DataFrame:
    """(doc, part, attribute, value, prob): dedup with max-prob per entity.

    ``dedup=False`` skips the groupBy when a downstream step (alias
    widening, canonicalization, the sweep's entity-level max) ends in
    the same (ENTITY_KEY, max(prob)) aggregation anyway — max over a
    superset with duplicates is the same max, and stacking three
    identical-key groupBys paid three Exchanges per relation for one
    semantic dedup (guide §2.4)."""
    out = scored.select(
        doc_of_url().alias("doc"),
        F.upper("p_span").alias("part"),
        F.lit(attribute).alias("attribute"),
        F.col("a_span").alias("value"),
        F.col("prob"),
    )
    if not dedup:
        return out
    return (out.groupBy("doc", "part", "attribute", "value")
            .agg(F.max("prob").alias("prob")))


def widen_aliases(entities: DataFrame, parts_by_doc: DataFrame,
                  dedup: bool = True) -> DataFrame:
    """Add implied entities: for each (doc, part) with len(part) >= 4, every
    doc-known part that starts with it. ``parts_by_doc`` is (doc, part) —
    small (one row per doc-part pair from the gold/gazetteer link), so the
    prefix theta-join is broadcast. ``dedup=False`` as in
    ``to_entities`` (callers that canonicalize afterwards re-aggregate
    on the same key)."""
    implied = (
        entities.filter(F.length("part") >= 4)
        .join(
            F.broadcast(parts_by_doc.select("doc",
                                            F.col("part").alias("known_part"))),
            "doc",
        )
        .filter(F.col("known_part").startswith(F.col("part")))
        .select("doc", F.col("known_part").alias("part"), "attribute",
                "value", "prob")
    )
    out = entities.unionByName(implied)
    if not dedup:
        return out
    return (out.groupBy("doc", "part", "attribute", "value")
            .agg(F.max("prob").alias("prob")))


def resolve_unit(df: DataFrame, unit_tokens: list[str], row_ngrams: DataFrame,
                 row_spread2: DataFrame, row_spread5: DataFrame,
                 neighbor_cells: DataFrame | None = None) -> DataFrame:
    """Attach a ``unit`` column: the unique unit token in the value's row,
    widening the spread (0 -> ±2 -> ±5) until exactly one is found — the
    set-algebra form of the reference's growing-spread loop
    (opamp_utils.py:150-157, LIMIT=8).

    When ``neighbor_cells`` (context.build_neighbor_cell_ngrams) is given,
    the RIGHT-neighbor cells within dist=5 are probed FIRST — the
    reference's right_ngrams-then-row hierarchy (opamp_utils.py:123-141:
    "using right_ngrams alone hurts recall", hence both)."""
    units = F.array(*[F.lit(u) for u in unit_tokens])

    def uniq(grams_col):
        found = F.array_intersect(lower_arr(grams_col), units)
        return F.when(F.size(found) == 1, F.element_at(found, 1))

    out = df
    names = []
    if neighbor_cells is not None:
        rc = neighbor_cells.filter(F.col("direction") == "RIGHT").select(
            "url", F.col("table_id").alias("a_table_id"),
            F.col("row").alias("a_row"), F.col("col").alias("a_col"),
            F.col("grams").alias("_urg"),
        )
        out = (
            out.join(rc, ["url", "a_table_id", "a_row", "a_col"], "left")
            .withColumn("_ur", uniq(F.coalesce(F.col("_urg"), F.array())))
            .drop("_urg")
        )
        names.append("_ur")
    for tbl, name in ((row_ngrams, "_u0"), (row_spread2, "_u2"),
                      (row_spread5, "_u5")):
        rn = tbl.select(
            "url", F.col("table_id").alias("a_table_id"),
            F.col("row").alias("a_row"), F.col("grams").alias(f"{name}g"),
        )
        out = (
            out.join(rn, ["url", "a_table_id", "a_row"], "left")
            .withColumn(name, uniq(F.coalesce(F.col(f"{name}g"), F.array())))
            .drop(f"{name}g")
        )
        names.append(name)
    return out.withColumn("unit", F.coalesce(*names)).drop(*names)


def _fmt(mag: Column) -> Column:
    """Render a magnitude the way the reference CSVs do: integral values
    without a trailing .0 (opamps.py:47-49)."""
    return F.when(
        mag == F.floor(mag), mag.cast("bigint").cast("string")
    ).otherwise(mag.cast("string"))


def opamp_entities(scored: DataFrame, attribute: str, row_ngrams: DataFrame,
                   row_spread2: DataFrame, row_spread5: DataFrame,
                   neighbor_cells: DataFrame | None = None,
                   dedup: bool = True) -> DataFrame:
    """Unary opamp candidates -> (doc, doc, attribute, value, prob) with
    unit-resolved display magnitudes: gain in kHz, current in µA with ±
    doubling (one entity for the literal, one for the doubled swing)."""
    if attribute == "typ_gbp":
        units = ["mhz", "khz"]
    else:
        units = ["ma", "μa", "ua", "µa", "a"]
    df = resolve_unit(scored, units, row_ngrams, row_spread2, row_spread5,
                      neighbor_cells=neighbor_cells)
    df = df.filter(F.col("unit").isNotNull())

    pm = F.col("a_span").startswith("±")
    base = F.regexp_replace("a_span", "±", "").cast("double")
    if attribute == "typ_gbp":
        mag = F.when(F.col("unit") == "mhz", base * 1000.0).otherwise(base)
        values = F.array(_fmt(mag))
    else:
        # display unit is µA (opamps.py:39-49): mA -> x1e3, A -> x1e6
        mag = (F.when(F.col("unit") == "ma", base * 1e3)
               .when(F.col("unit") == "a", base * 1e6)
               .otherwise(base))
        values = F.when(pm, F.array(_fmt(mag), _fmt(mag * 2))) \
                  .otherwise(F.array(_fmt(mag)))

    out = (
        df.select(
            doc_of_url().alias("doc"),
            F.lit(attribute).alias("attribute"),
            F.explode(values).alias("value"),
            "prob",
        )
        .select("doc", F.col("doc").alias("part"), "attribute", "value",
                "prob")
    )
    if not dedup:
        return out
    return (out.groupBy("doc", "part", "attribute", "value")
            .agg(F.max("prob").alias("prob")))


def entities_to_triples(entities: DataFrame) -> DataFrame:
    """(subj, pred, obj, prob) — subject is ``doc#part`` for binary
    relations and the doc itself for unary ones."""
    subj = F.when(
        F.col("doc") == F.col("part"), F.col("doc")
    ).otherwise(F.concat_ws("#", "doc", "part"))
    return entities.select(
        subj.alias("subj"),
        F.col("attribute").alias("pred"),
        F.col("value").alias("obj"),
        "prob",
    ).dropDuplicates(["subj", "pred", "obj"])


def asof_pair(left: DataFrame, right: DataFrame, keys: list[str],
              order_col: str, left_cols: list[str],
              right_cols: list[str]) -> DataFrame:
    """As-of pairing: each ``left`` row joined with the LATEST ``right``
    row at-or-before its ``order_col`` within the same ``keys`` group —
    the reading-order gain/supply-current matching of the reference's
    opamp analysis (``scripts/plot_opo.py:38-60`` walks both per-doc
    lists in order; the as-of form generalizes it to arbitrary
    interleavings).

    Plan: window-over-tagged-union — union both sides (tag 0 = right,
    1 = left; at equal positions the right row sorts first, so an
    exactly-aligned right row IS visible to the left row), one window
    carrying the latest right ROW forward, keep the left rows that
    found a partner. The right columns travel as ONE struct under a
    single ``last(ignorenulls)`` so every carried value comes from the
    same right row (carrying columns independently could stitch a
    partner out of two right rows when one holds NULLs), and the
    struct itself is the window's final sort key so equal-position
    right rows resolve deterministically. ONE shuffle on ``keys`` and
    no range-join row explosion — at 100 TB this is the only as-of
    shape that holds up (a theta join by position range is quadratic
    per doc)."""
    from pyspark.sql.window import Window

    r_struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols])
    lt = left.select(
        *keys, order_col, *left_cols,
        F.lit(None).cast(r_struct_t).alias("_r"),
        F.lit(1).alias("_tag"))
    rt = right.select(
        *keys, order_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        F.struct(*right_cols).alias("_r"),
        F.lit(0).alias("_tag"))
    # struct ordering (field-wise) is the deterministic tiebreak for
    # right rows that tie on order_col; left rows all carry a NULL
    # struct, so their relative order cannot change the carried value
    w = (Window.partitionBy(*keys).orderBy(order_col, "_tag", "_r")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = lt.unionByName(rt).select(
        *keys, order_col, *left_cols, "_tag",
        F.last("_r", ignorenulls=True).over(w).alias("_r"))
    return (filled.filter((F.col("_tag") == 1) & F.col("_r").isNotNull())
            .select(*keys, order_col, *left_cols,
                    *[F.col("_r")[c].alias(c) for c in right_cols]))
