"""target_s3_parquet_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capability surface of the reference
``codeG12/target-s3-parquet`` (a Singer-spec stdin→S3-Parquet target,
see ``/root/reference``), re-expressed Spark-first:

- Singer message ingestion (batch + Structured Streaming) with
  JSON-Schema-derived ``StructType``s, record validation, recursive
  ``parent__child`` flattening, and partitioned Parquet sinks
  (compression actually applied — the reference dropped it,
  reference ``target_s3_parquet/__init__.py:190-204,273``).
- A full relational operator library (scan/filter/join/agg/window/
  set-op/scalar families) exercised over TPC-H-ish test tables.
- Streaming operators: windows, watermarks, stateful dedup.
- LLM-data-pipeline extensions: exact + MinHash/SimHash near-dedup,
  embedding similarity search, text analysis, multimodal columns.

Everything is declarative DataFrame/SQL so Catalyst + AQE handle
pushdown, pruning, join strategy and skew at the 100 TB design point.
"""

__version__ = "0.1.0"

from target_s3_parquet_spark.session import get_spark  # noqa: F401
