"""Bucketed tables: co-located fact⋈fact joins without a shuffle.

The scale story (SURVEY.md §2B joins): two large tables bucketed AND
sort-ordered on the same key with the same bucket count join with ZERO
Exchange — each task sort-merges bucket i of both sides. At 100 TB this
turns the nightly fact⋈fact join from a full network shuffle of both
tables into a local merge, paid for once at write time.

Spark's bucketing needs a catalog table (``bucketBy`` only works with
``saveAsTable``); the in-memory/derby default catalog works locally, a
Hive/Glue metastore in production. Iceberg's equivalent is the
``bucket(n, col)`` partition transform + storage-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    database: str | None = None,
    location: str | None = None,
) -> str:
    """Persist ``df`` bucketed + sorted by ``key`` into ``buckets`` files
    per partition. Returns the qualified table name. Same key + same
    bucket count on both join sides is what removes the shuffle."""
    spark = df.sparkSession
    name = table
    if database:
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
        name = f"{database}.{table}"
    # align write tasks with buckets: repartition(buckets, key) uses the
    # same murmur3 hash as bucketBy, so each task holds exactly one
    # bucket's rows and writes ONE file — without this, every map task
    # writes a file per bucket it touches (tasks x buckets small files,
    # the classic bucketed-write explosion)
    df = df.repartition(buckets, key)
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).format("parquet")
    if location:
        w = w.option("path", f"{location}/{table}")
    w.saveAsTable(name)
    return name


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs Catalyst plans a SortMergeJoin with no Exchange
    on either side (assert via plans.explain_str)."""
    return spark.table(left).join(spark.table(right), on, how)
