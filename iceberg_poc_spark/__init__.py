"""iceberg_poc_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``vsrini-ns/iceberg-poc`` (an Apache Iceberg ingestion/table-management POC,
see SURVEY.md), re-expressed Spark-first:

- table layer (create / atomic append / hidden partitioning / snapshots)
  over parquet, with an env-gated Iceberg catalog backend
  (``iceberg_poc_spark.tables``),
- the full relational query surface (scans, filters, joins, aggregates,
  windows, sorts, set ops, scalar functions) as declarative DataFrame
  plans optimized by Catalyst (``iceberg_poc_spark.operators``),
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding), similarity search, text analysis,
  multimodal column plumbing (``iceberg_poc_spark.operators``),
- Structured Streaming pipelines with watermarks + windowed aggregation
  (``iceberg_poc_spark.streaming``).

Every query operator is registered in ``iceberg_poc_spark.registry`` with a
DuckDB oracle SQL twin for differential correctness testing.
"""

__version__ = "0.1.0"
