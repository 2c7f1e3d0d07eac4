"""ml4logs_spark — a from-scratch PySpark-native transcript log pipeline.

Re-expresses the semantics of LogAnalysisTeam/ml4logs (parse -> enrich ->
route -> aggregate over multi-turn conversation transcripts) as a Catalyst-
planned DataFrame program. NOT a port: the reference's sequential
file-materializing steps (see /root/reference/src/ml4logs/__main__.py:46-51)
become lazy DataFrame lineage with durable boundaries only at routed sinks.

Layout
------
- ``session``    : tuned SparkSession factory
- ``datagen``    : deterministic transcripts-table derivation / synthesis
- ``functions``  : shared Catalyst column expressions (masking, hashing, text stats)
- ``operators``  : parse / enrich / route / aggregate / features / windows /
                   dedup / similarity / text-QA / multimodal stages
- ``sources``    : table-format seam (parquet now, Iceberg when jar present)
                   + manifest-based resumability
- ``plans``      : end-to-end pipeline composition
- ``oracle``     : DuckDB-dialect SQL mirrors used by the correctness gate
- ``streaming``  : Structured Streaming variant of parse->enrich->aggregate
"""

__version__ = "0.1.0"
