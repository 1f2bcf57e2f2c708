"""tecs_hardware_kbc_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-imagination of the Fonduer-style hardware-KBC dataflow of
lukehsiao/tecs-hardware-kbc (ACM TECS 19(6), 2020) as a pure DataFrame job
over Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      -> sentences (structural parse, byte-identical text extraction)
      -> context ngram tables (row/col/aligned)
      -> mentions (ngram spaces + matchers + expanders)
      -> candidates (per-doc pairing join + throttlers)
      -> lf_votes (labeling-function matrix) -> marginals (vote aggregation)
      -> entities (alias widening + dedup) -> scored triples (threshold sweep)
      -> triples parquet partitioned by predicate

Everything is declared with the DataFrame API so Catalyst/AQE own the
physical plan; Python appears only inside Arrow-batched pandas UDFs
(parsing, part-range expansion) — never per-row.
"""

__version__ = "0.1.0"

from tecs_hardware_kbc_spark.session import get_spark  # noqa: F401
