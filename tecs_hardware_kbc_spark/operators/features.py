"""Feature layer + discriminative model (SURVEY A5, §3 steps 5/8).

The reference featurizes candidates into a sparse 0/1 matrix whose key
space is frozen on the training split (``Featurizer.apply(split=0,
train=True)``, ``transistors.py:350-376``) and trains a multi-task logistic
regression over it (Emmental, ``transistors.py:471-567``). Spark-native
re-expression:

* ``featurize``       — sparse-by-name features: one ``array<string>`` of
  feature keys per candidate, derived from the same context arrays the LFs
  read (row/col/aligned ngrams, page, tag, alignment) — one JVM select, no
  Python;
* ``feature_vocabulary`` — the frozen key space: distinct keys of the
  training split with dense indices;
* ``encode_features`` — keys -> sorted index arrays via an explode + join
  against the (broadcast) vocabulary;
* ``fit_logreg`` — driver-side logistic regression on the collected
  training matrix (the reference's train matrices fit on one node too;
  ~1.5M x sparse). numpy, deterministic seed;
* ``predict_logreg`` — distributed inference: broadcast weight map, score =
  sigmoid(bias + sum of weights over the candidate's feature indices) as a
  JVM aggregate over the index array.

The default pipeline scores with LF vote aggregation (it clears the P/R
gate); this layer provides the reference's model-parity path and is
exercised end-to-end by tests/test_features.py.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.context import lower_arr


def _tagged(prefix: str, arr: Column, cap: int = 40) -> Column:
    """Tag + cap a gram array as feature keys: ['row:storage', ...]."""
    return F.transform(
        F.slice(F.array_distinct(lower_arr(arr)), 1, cap),
        lambda g: F.concat(F.lit(prefix), g),
    )


def featurize(cands_ctx: DataFrame) -> DataFrame:
    """Candidate frame (post ``with_context``) -> + ``features`` column.

    Key families mirror fonduer's core textual/structural/tabular feature
    library (ngrams in the attr row/col, alignment flags, page, html tag,
    span shape) — the ones its LFs and classifier actually consume.
    """
    has_part = "p_span" in cands_ctx.columns
    parts: list[Column] = []
    if "_a_row" in cands_ctx.columns:
        parts.append(_tagged("row:", F.col("_a_row")))
    if "_a_col" in cands_ctx.columns:
        parts.append(_tagged("col:", F.col("_a_col")))
    if "_a_sent" in cands_ctx.columns:
        parts.append(_tagged("sent:", F.col("_a_sent")))
    structural = F.array(
        F.concat(F.lit("page:"), F.col("a_page").cast("string")),
        F.concat(F.lit("tag:"), F.coalesce(F.col("a_tag"), F.lit(""))),
        F.concat(F.lit("tabular:"), F.col("a_is_tabular").cast("string")),
        F.concat(F.lit("span_shape:"),
                 F.regexp_replace(
                     F.regexp_replace(F.col("a_span"), r"[0-9]", "9"),
                     r"[A-Za-z]", "a")),
    )
    parts.append(structural)
    if has_part:
        parts.append(F.array(
            F.concat(F.lit("same_table:"),
                     (F.col("p_table_id").isNotNull()
                      & (F.col("p_table_id") == F.col("a_table_id")))
                     .cast("string")),
            F.concat(F.lit("same_row:"),
                     (F.col("p_row") == F.col("a_row")).cast("string")),
            F.concat(F.lit("same_col:"),
                     (F.col("p_col") == F.col("a_col")).cast("string")),
        ))
    features = F.array_distinct(F.concat(*parts)) if len(parts) > 1 \
        else F.array_distinct(parts[0])
    return cands_ctx.withColumn("features", features)


def feature_vocabulary(featurized_train: DataFrame) -> DataFrame:
    """Frozen key space from the TRAINING split only (transistors.py:353):
    (key string, idx int), indices dense and deterministic (sorted keys).

    Scale-safe rank assignment: a global ``Window.orderBy`` would pull every
    key through one partition, so instead range-partition by key (globally
    ordered partitions), rank within each partition, and add the cumulative
    partition offsets (a tiny driver-side list, one per partition).
    """
    from pyspark.sql.window import Window

    keys = (featurized_train.select(F.explode("features").alias("key"))
            .distinct().repartitionByRange("key"))
    # Materialize ONCE before collecting counts: repartitionByRange draws
    # its boundaries from sampling and AQE may re-plan partition counts, so
    # re-executing this plan for the offset map and again for the final
    # select could assign rows to different _pids — duplicate/gapped
    # indices. localCheckpoint pins the partitioning both passes read.
    parts = keys.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    counts = {r["_pid"]: r["n"] for r in
              parts.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, total = {}, 0
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy("key")
    return (parts.withColumn("idx", F.row_number().over(w) - 1 + off)
            .select("key", "idx"))


def encode_features(featurized: DataFrame, vocab: DataFrame,
                    id_cols: list[str]) -> DataFrame:
    """features(array<string>) -> sorted index array (unknown keys from
    non-train splits drop out, as in the reference's frozen key space).

    A candidate with zero in-vocab keys keeps an empty index array (scored
    at bias-only by predict_logreg) rather than vanishing from the output.
    """
    exploded = featurized.select(*id_cols, F.explode("features").alias("key"))
    joined = exploded.join(F.broadcast(vocab), "key")
    encoded = (
        joined.groupBy(*id_cols)
        .agg(F.array_sort(F.collect_list("idx")).alias("feature_idx"))
    )
    all_ids = featurized.select(*id_cols).dropDuplicates()
    return all_ids.join(encoded, id_cols, "left").withColumn(
        "feature_idx",
        F.coalesce("feature_idx", F.array().cast("array<int>")))


def fit_logreg(encoded_train: DataFrame, label_col: str, vocab_size: int,
               epochs: int = 40, lr: float = 0.5, l2: float = 1e-4,
               seed: int = 1234) -> dict:
    """Driver-side logistic regression (full-batch gradient descent) over
    the collected sparse training matrix. Deterministic."""
    rows = encoded_train.select("feature_idx", label_col).collect()
    n = len(rows)
    if n == 0:
        return {"weights": {}, "bias": 0.0}
    y = np.array([float(r[label_col]) for r in rows])
    idxs = [r["feature_idx"] for r in rows]
    w = np.zeros(vocab_size)
    b = 0.0
    for _ in range(epochs):
        z = np.array([w[ix].sum() + b for ix in idxs])
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        grad_w = np.zeros(vocab_size)
        for e, ix in zip(err, idxs):
            grad_w[ix] += e
        grad_w = grad_w / n + l2 * w
        w -= lr * grad_w
        b -= lr * float(err.mean())
    return {"weights": {int(i): float(v) for i, v in enumerate(w) if v != 0.0},
            "bias": float(b)}


def fit_logreg_distributed(encoded_train: DataFrame, label_col: str,
                           vocab_size: int, max_iter: int = 50,
                           reg: float = 1e-4) -> dict:
    """Cluster-scale training path: spark.ml LogisticRegression (LBFGS)
    over sparse vectors built from the index arrays — no driver-side
    matrix. Same return shape as ``fit_logreg``, so ``predict_logreg``
    serves inference for either trainer. Use this when the training split
    no longer fits one node (the driver-side trainer is reference-parity:
    their matrices also fit on one node)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT

    if vocab_size == 0:
        return {"weights": {}, "bias": 0.0}

    # index array -> SparseVector (the matrices are 0/1 sparse; a dense
    # array would be O(vocab) per row). VectorUDT has no Arrow codec, so
    # this one conversion is a plain UDF — training-split only.
    @F.udf(returnType=VectorUDT())
    def to_sparse(idx):
        ones = sorted(set(idx or []))
        return SparseVector(vocab_size, ones, [1.0] * len(ones))

    train = encoded_train.select(
        to_sparse("feature_idx").alias("features"),
        F.col(label_col).cast("double").alias("label"))
    lr = LogisticRegression(maxIter=max_iter, regParam=reg,
                            standardization=False)
    m = lr.fit(train)
    w = m.coefficients.toArray()
    return {"weights": {int(i): float(v) for i, v in enumerate(w)
                        if v != 0.0},
            "bias": float(m.intercept)}


def fit_logreg_multitask(encoded_by_task: dict[str, DataFrame],
                         label_col: str, vocab_size: int,
                         epochs: int = 60, lr: float = 0.5,
                         l2: float = 1e-4) -> dict:
    """Multi-task logistic regression over the SHARED feature space — the
    stand-in for the reference's Emmental shared-trunk model with one head
    per relation and a round-robin task scheduler
    (``transistors.py:476-553``, ``EmmentalModel([model for every task])``).

    Architecture: a shared trunk weight vector ``w_shared`` updated by the
    gradient of EVERY task, plus a per-task residual ``w_t`` and bias —
    score_t(x) = sigmoid((w_shared + w_t) . x + b_t). L2 shrinks the
    residuals toward the trunk, so tasks with few candidates borrow
    statistical strength from the others (the point of multi-tasking).
    Tasks are visited round-robin within each epoch, like the reference's
    round-robin batch scheduler. Driver-side numpy on the collected sparse
    matrices (the reference's train matrices also fit on one node);
    inference stays distributed via ``predict_logreg``.

    COST CONTRACT: this collects every task's (feature_idx, label) rows to
    the driver — O(sum_t candidates_t * avg_keys) ints + O(#tasks *
    vocab_size) float64 weights. Candidates are per-doc extraction spans,
    so even a 10^12-page corpus yields ~10^6-10^8 training candidates
    (the reference's full corpus: ~10^4); at ~30 keys/candidate that is
    single-digit GB at the top end. If the candidate set outgrows the
    driver, switch to ``fit_logreg_distributed`` (spark.ml LBFGS) per
    task — same encoded input, no collect.

    Returns ``{"heads": {task: {"weights", "bias"}}}`` where each head's
    weights are the merged (trunk + residual) map, directly consumable by
    ``predict_logreg``.
    """
    data = {}
    for task, df in encoded_by_task.items():
        rows = df.select("feature_idx", label_col).collect()
        y = np.array([float(r[label_col]) for r in rows])
        idxs = [r["feature_idx"] for r in rows]
        data[task] = (idxs, y)

    w_shared = np.zeros(vocab_size)
    w_task = {t: np.zeros(vocab_size) for t in data}
    b_task = {t: 0.0 for t in data}
    order = sorted(data)
    for _ in range(epochs):
        for task in order:  # round-robin scheduler
            idxs, y = data[task]
            n = len(y)
            if n == 0:
                continue
            w = w_shared + w_task[task]
            z = np.array([w[ix].sum() + b_task[task] for ix in idxs])
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            grad = np.zeros(vocab_size)
            for e, ix in zip(err, idxs):
                grad[ix] += e
            grad /= n
            w_shared -= lr * (grad + l2 * w_shared)
            w_task[task] -= lr * (grad + l2 * w_task[task])
            b_task[task] -= lr * float(err.mean())

    heads = {}
    for task in order:
        merged = w_shared + w_task[task]
        heads[task] = {
            "weights": {int(i): float(v) for i, v in enumerate(merged)
                        if v != 0.0},
            "bias": float(b_task[task]),
        }
    return {"heads": heads}


def predict_logreg(encoded: DataFrame, model: dict,
                   out_col: str = "prob_lr") -> DataFrame:
    """Distributed inference: broadcast the weight map, score via a JVM
    aggregate over the index array (no Python)."""
    weights = model["weights"]
    if weights:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv])
    else:
        wmap = F.create_map(F.lit(-1), F.lit(0.0))
    z = F.aggregate(
        "feature_idx", F.lit(float(model["bias"])),
        lambda acc, i: acc + F.coalesce(
            F.element_at(wmap, i.cast("int")), F.lit(0.0)),
    )
    return encoded.withColumn(out_col, F.lit(1.0) / (1.0 + F.exp(-z)))
