"""webhookdb_spark — a PySpark-native analytics/replication engine.

A from-scratch rebuild of the capabilities of webhookdb/webhookdb
(reference: /root/reference, Ruby/Sequel/Postgres) on idiomatic PySpark:

- Declarative column-extraction DSL compiled to Spark Column expressions
  (reference: lib/webhookdb/replicator/column.rb).
- Conditional keyed MERGE upsert over hash-partitioned managed tables
  (reference: lib/webhookdb/replicator/base.rb:762-785).
- Structured-Streaming-shaped ingestion (foreachBatch) and driver-side
  paginated backfill (reference: lib/webhookdb/backfiller.rb).
- Spark SQL as the user query surface with read-only validation and row
  caps (reference: lib/webhookdb/organization.rb:146-164).
- Incremental sync-target export (reference: lib/webhookdb/sync_target.rb).
- Large-scale training-data pipeline operators: dedup (exact/MinHash-LSH/
  SimHash/Jaccard/embedding), similarity search, text analysis, and
  multimodal column plumbing.
"""

__version__ = "0.1.0"
