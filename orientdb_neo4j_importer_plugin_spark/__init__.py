"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the data-movement semantics of
``orientechnologies/orientdb-neo4j-importer-plugin`` (the reference, a one-shot
Neo4j -> OrientDB graph copy) as a continuous change-data-capture pipeline:

* binlog/WAL-style change feed (insert/update/delete events over multi-turn
  conversation transcripts) read in batch or via Structured Streaming,
* dedup + last-writer-wins resolution by monotone LSN
  (reference analogue: unique hash index on ``neo4jNodeID`` + monotone
  cursor order, ``ONeo4jImporterVerticesAndEdgesMigrator.java:252-254,363-370``),
* idempotent MERGE upserts into a snapshot-versioned, bucket-partitioned
  lake table with automatic schema evolution
  (reference analogue: lazy class/property creation,
  ``ONeo4jImporterUtils.java:124-285``),
* exactly-once commits via a batch-id ledger + per-partition lineage
  (reference analogue: batched transactional commits every
  ``VERTICES_BATCH_SIZE`` records, ``...VerticesAndEdgesMigrator.java:58,268-272``).

Everything is Spark-first: DataFrame/SQL declarative plans, algebraic
aggregations instead of windows where possible, broadcast/AQE-aware joins,
no per-row Python anywhere on the hot path.
"""

__version__ = "0.1.0"
