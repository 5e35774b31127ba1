"""kafka_overwatch_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of JohnPreston/kafka-overwatch.

The reference (/root/reference, MPL-2.0) is a Kafka usage-analytics service:
it snapshots cluster metadata (topic/partition watermarks, consumer-group
committed offsets, schema-registry subjects) and runs a fixed battery of
pandas queries over them. This package rebuilds the *analytics* Spark-first:

- ``snapshot``     — the normalized snapshot-table model (SURVEY.md §1.4)
- ``operators``    — every reference query re-expressed as DataFrame ops
                     (SURVEY.md §2 inventory)
- ``pipelines``    — beyond-reference, training-data-pipeline operators
                     (dedup, similarity search, text analysis, multimodal)
- ``streaming``    — Structured Streaming parity for the scan-loop semantics
- ``sinks``        — report/export/restore-script emitters

Everything here is plain public PySpark; scale notes for a 1000-executor /
100 TB deployment live in docstrings next to each operator.
"""

__version__ = "0.1.0"
