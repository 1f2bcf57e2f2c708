"""RDF serialization — materialize the fused triple table as N-Triples
(W3C RDF 1.1 N-Triples), the line-oriented interchange format every
triple store bulk-loads. This is the "graph materialize" terminal of
the KBC pipeline: one line per fact, grammar
``<subj-iri> <pred-iri> "object-literal" .``, independent lines, so a
100 TB KB serializes as an embarrassingly parallel projection and
partitions/splits anywhere.

Everything is column expressions:

* IRI mapping — subject/predicate local names percent-encode the bytes
  an IRI cannot carry raw (space, quotes, angle brackets, ``%`` itself)
  and append to a caller-supplied namespace.
* Literal escaping — the five N-Triples string escapes (``\\\\``,
  ``\\"``, ``\\n``, ``\\r``, ``\\t``), applied in backslash-first order
  so escaping is idempotent-safe and replayable in any regex engine.
* Probability — optionally carried via RDF reification-free convention:
  a fourth column is NOT valid N-Triples, so prob travels as an
  ``^^xsd:double`` annotation triple per fact when asked.

Escape order matters (backslash first) and is the same fixed ladder in
the DuckDB oracle; ``kg_ntriples`` hash-checks the whole serialization
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

#: (char, percent-encoding) pairs an IRI local name cannot carry raw.
#: Backslash/percent first: later rewrites never re-match their output.
_IRI_ESCAPES = [("%", "%25"), (" ", "%20"), ('"', "%22"),
                ("<", "%3C"), (">", "%3E"), ("#", "%23")]

#: N-Triples string-literal escapes, backslash first.
_LIT_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                ("\r", "\\r"), ("\t", "\\t")]


def iri_encode(col: Column) -> Column:
    """Percent-encode the characters an IRI local name cannot carry."""
    out = col
    for ch, enc in _IRI_ESCAPES:
        out = F.replace(out, F.lit(ch), F.lit(enc))
    return out


def literal_escape(col: Column) -> Column:
    """Apply the five N-Triples string escapes, backslash first."""
    out = col
    for ch, enc in _LIT_ESCAPES:
        out = F.replace(out, F.lit(ch), F.lit(enc))
    return out


def to_ntriples(triples: DataFrame,
                namespace: str = "http://kb.example/",
                with_prob: bool = False) -> DataFrame:
    """(subj, pred, obj, line): each fact rendered as one N-Triples
    line. With ``with_prob`` the probability rides as ``prob_line``, a
    second statement ``<fact-iri> <ns>prob "p"^^xsd:double .`` keyed by
    the fact's own IRI (subj/pred/obj percent-encoded into one local
    name) — the flattened, join-free alternative to RDF reification
    that keeps the export line-oriented."""
    ns = F.lit(namespace)
    s = F.concat(F.lit("<"), ns, iri_encode(F.col("subj")), F.lit(">"))
    p = F.concat(F.lit("<"), ns, iri_encode(F.col("pred")), F.lit(">"))
    o = F.concat(F.lit('"'), literal_escape(F.col("obj")), F.lit('"'))
    line = F.concat_ws(" ", s, p, o, F.lit("."))
    out = triples.withColumn("line", line)
    if with_prob:
        fact = iri_encode(F.concat_ws("/", "subj", "pred", "obj"))
        prob_line = F.concat(
            F.lit("<"), ns, F.lit("fact/"), fact, F.lit("> <"), ns,
            F.lit("prob> \""),
            F.format_number(F.col("prob").cast("double"), 6)
            .cast("string"),
            F.lit("\"^^<http://www.w3.org/2001/XMLSchema#double> ."))
        out = out.withColumn("prob_line", prob_line)
    return out


def adjacency_lists(triples: DataFrame, max_degree: int = 100_000
                    ) -> DataFrame:
    """(subj, n_facts, adj): per-subject adjacency — the serving-side
    KG layout (one row per entity, its facts as a SORTED
    array<struct<pred, obj>>). Sorting makes the array deterministic
    under any partitioning, so the export is byte-stable run to run.

    ``max_degree`` guards the collect: a subject with more facts than
    that (a hub entity on a skewed web graph) keeps only its
    lexicographically-first ``max_degree`` facts and reports the true
    count in ``n_facts`` — truncation is visible, never silent. One
    map-combinable groupBy; no window, no driver loop."""
    g = (triples.select("subj", "pred", "obj").distinct()
         .groupBy("subj")
         .agg(F.count(F.lit(1)).alias("n_facts"),
              F.array_sort(F.collect_list(F.struct("pred", "obj")))
              .alias("_adj")))
    return g.select("subj", "n_facts",
                    F.slice("_adj", 1, max_degree).alias("adj"))
