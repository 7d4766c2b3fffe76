"""PySpark-native analytics engine with the query and data-processing
capabilities of ``redbus-labs/arango-clickhouse-replica``.

The reference (see ``/root/reference``, SURVEY.md) is a CDC replication
pipeline: ArangoDB WAL -> Kafka -> declarative schema mapping -> ClickHouse
``ReplacingMergeTree`` tables. This package re-expresses its capabilities
Spark-first:

- ``schema``    — the declarative mapping DSL compiled to Column expressions
                  (reference: replication/consumer/transformer.py:63-108).
- ``operators`` — CDC apply kernel + latest-state dedup views
                  (reference: replication/consumer/loader.py:64-79,
                  tables/test.yaml:13 ReplacingMergeTree semantics), plus
                  LLM-data-pipeline extensions (dedup, similarity, text,
                  multimodal).
- ``sources``   — batch/stream table loaders and synthetic CDC envelopes.
- ``queries``   — the relational query surface exposed over latest-state
                  tables (SURVEY.md §2.7) with DuckDB oracle SQL for each.
- ``streaming`` — Structured Streaming wrappers (foreachBatch CDC apply,
                  event-time windowed analytics).

Everything is a pure ``DataFrame -> DataFrame`` function so identical code
runs under ``spark.read`` (batch/backfill/tests) and
``readStream.foreachBatch`` (CDC streaming).
"""

__version__ = "0.1.0"
