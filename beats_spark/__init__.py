"""beats_spark — a PySpark-native event/log pipeline engine.

A from-scratch rebuild of the capabilities of Beats' libbeat event
pipeline (reference: mauri870/beats) on idiomatic Spark: DataFrame/SQL
plans compiled once (Catalyst optimizes), Arrow pandas UDFs for the
regex-battery parse stage, broadcast hash joins for enrichment lookups,
a first-match-wins router expressed as one ``coalesce(when(...))``
column, and partitioned per-sink writes with lineage checkpoints.

Layout
------
- ``functions``  — condition language, event format strings, dissect
  tokenizer→regex compiler, syslog grammar (the "expression" layer).
- ``operators``  — the processor registry (Beats config names →
  DataFrame transforms) plus large-scale data ops (dedup, similarity,
  text analysis, multimodal plumbing).
- ``sources``    — table readers (parquet now, Iceberg behind a flag)
  and the deterministic transcript synthesizer.
- ``plans``      — pipeline builder, router, fan-out sinks, metrics,
  lineage/checkpoint protocol.
- ``streaming``  — Structured Streaming variant of the pipeline.
"""

__version__ = "0.1.0"

from beats_spark.session import get_spark  # noqa: F401
