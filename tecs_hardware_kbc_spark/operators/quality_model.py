"""Model-based quality filtering (the fasttext-style classifier gate of
CCNet / DCLM: score every document with a linear model over hashed
bag-of-words features, keep the high scorers).

The reference pipeline has no document-quality model; this is part of
the beyond-the-reference LLM-data axis. The design splits the two
halves the way a 100 TB deployment must:

* TRAINING (``train_quality_model``) — labeled docs -> hashed features
  -> the engine's deterministic logistic trainer
  (``features.fit_logreg``; swap ``fit_logreg_distributed`` when the
  labeled set outgrows the driver). Runs rarely, on a labeled sample.
* INFERENCE (``score_quality``) — the hot path, a PURE column
  expression: md5-hash each token into ``dim`` buckets and fold the
  bucket weights (a literal array baked into the plan) through one
  ``aggregate`` — no UDF, no shuffle, no model server; at corpus scale
  scoring rides the same scan as every other per-document signal, and
  the md5 feature hash is the engine's cross-engine-stable primitive so
  a SQL oracle replays the entire forward pass bit-for-bit.

``quality_weights.py`` carries a frozen model (trained once on the
planted-marker corpus below, dev-fit/test-report discipline) the way
``ivf_centroids.py`` freezes k-means cells — versioned artifacts, not
runtime state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators.dedup import md5_u32, norm_text

HASH_DIM = 1024
HASH_SEED = "qf"


def token_buckets(text, dim: int = HASH_DIM) -> Column:
    """Every token's hashed feature bucket, WITH repetition (repeated
    tokens weight their bucket multiple times — count features, the
    fasttext convention)."""
    words = F.split(norm_text(text), " ")
    return F.transform(
        words, lambda w: F.pmod(md5_u32(w, seed=HASH_SEED), F.lit(dim))
        .cast("int"))


def hashed_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    dim: int = HASH_DIM) -> DataFrame:
    """(doc_id, feature_idx): the hashed-bag-of-words index array the
    engine's logistic trainers consume (same contract as
    ``features.encode_features``)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_buckets(F.col(text_col), dim).alias("feature_idx"))


def train_quality_model(labeled: DataFrame, label_col: str = "label",
                        id_col: str = "doc_id", text_col: str = "text",
                        dim: int = HASH_DIM, **fit_kwargs) -> dict:
    """Fit the quality model on labeled documents (label 1 = keep).
    Returns the ``{"weights": {idx: w}, "bias": b}`` dict shared with
    the KBC classifiers."""
    from tecs_hardware_kbc_spark.operators.features import fit_logreg
    enc = hashed_features(labeled, id_col, text_col, dim).join(
        labeled.select(F.col(id_col).alias("doc_id"), label_col), "doc_id")
    return fit_logreg(enc, label_col, vocab_size=dim, **fit_kwargs)


def weights_array(model: dict, dim: int = HASH_DIM) -> list[float]:
    """The model's dense weight vector (for plan literals / freezing)."""
    w = [0.0] * dim
    for i, v in model["weights"].items():
        w[int(i)] = float(v)
    return w


def qm_score_col(text, model: dict, dim: int = HASH_DIM) -> Column:
    """The sigmoid score expression of the model forward pass, rounded
    to 6dp — shared by ``score_quality`` and the fused curation
    funnel."""
    warr = F.array(*[F.lit(float(v)) for v in weights_array(model, dim)])
    z = F.aggregate(
        token_buckets(text, dim),
        F.lit(float(model.get("bias", 0.0))),
        lambda acc, i: acc + F.element_at(warr, i + 1))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def score_quality(docs: DataFrame, model: dict,
                  id_col: str = "doc_id", text_col: str = "text",
                  dim: int = HASH_DIM) -> DataFrame:
    """(doc_id, qm_logit, qm_score): the model forward pass as one
    narrow projection — z = bias + sum over tokens of
    weights[hash(token)], score = sigmoid(z), both rounded to 6dp (the
    oracle-stable convention)."""
    warr = F.array(*[F.lit(float(v)) for v in weights_array(model, dim)])
    z = F.aggregate(
        token_buckets(F.col(text_col), dim),
        F.lit(float(model.get("bias", 0.0))),
        lambda acc, i: acc + F.element_at(warr, i + 1))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(z, 6).alias("qm_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        .alias("qm_score"))
