"""kafka_streams_and_ktable_example_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
`dlebrero/kafka-streams-and-ktable-example` (a Kafka Streams KTable
materialized-view example, see /root/reference) as an idiomatic Spark
engine, plus the general relational operator surface and large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) described in SURVEY.md.

Layout:
- ``session``    — SparkSession factory tuned for the local harness and for scale.
- ``sources``    — table loaders and changelog synthesis (the reference's
                   compacted-topic data contract re-expressed over parquet).
- ``operators``  — KTable semantics (latest-per-key, grouped set reduce),
                   dedup, similarity, text analysis, multimodal plumbing.
- ``plans``      — the query catalog: every SURVEY.md §2 query as a
                   (spark_fn, oracle_sql) pair consumed by __spark_entry__.
- ``streaming``  — Structured Streaming incremental drivers of the same
                   semantics (foreachBatch snapshot maintenance).
"""

__version__ = "0.1.0"
