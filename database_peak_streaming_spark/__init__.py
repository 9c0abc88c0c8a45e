"""database_peak_streaming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system ``eric-hedengren/database-peak-streaming`` (a streaming
fiber-Bragg-grating peak pipeline: TCP binary ingest -> ~100 ms micro-batch
window means -> two-tier SQLite storage with downsampling + retention,
plus a batch-analytics surface).  See ``SURVEY.md`` for the full blueprint.

Design principles (100 TB scale-out first):

* Everything is a DataFrame / Spark SQL logical plan — Catalyst owns
  optimization (pushdown, pruning, join planning, AQE).  No RDDs.
* Streaming is Structured Streaming (event-time windows + watermarks),
  not hand-rolled asyncio queues.
* Python stays out of the hot path: built-in column expressions first,
  Arrow-vectorized pandas UDFs only where semantics demand them.
* Storage layout is date-partitioned Parquet so retention (the
  reference's TTL ``DELETE``) becomes a metadata-only partition drop.
"""

from database_peak_streaming_spark.session import get_spark
from database_peak_streaming_spark.sources.batch import TABLES, load_table, register_tables

__all__ = ["get_spark", "load_table", "register_tables", "TABLES"]

__version__ = "0.1.0"
