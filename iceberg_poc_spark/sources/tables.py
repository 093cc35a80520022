"""Parquet source layer for the driver testdata corpus (TESTDATA.md).

Mirrors the reference's scan surface: parquet scan with schema inference
(reference ``Main.java:30-37`` reads the footer by hand; Spark does this
natively) and filtered scans whose predicates Catalyst pushes into the
parquet reader (reference ``aig/TimeBasedPartitioningExamples.java:180-191``
hand-plans pruning; here ``df.filter`` + ``.explain`` shows PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Schema inference is automatic (footer read);
    predicate/projection pushdown is Catalyst's job — callers just compose
    filters/selects on the returned DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; corpus tables: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long
        # nanos (spark.sql.legacy.parquet.nanosAsLong); truncate to micros
        # exactly like DuckDB/engines with microsecond timestamps do.
        # integer division: double division would lose microsecond
        # precision at 2024-era epoch-nanos magnitudes (~1.7e18 > 2^53).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view so queries can use
    ``spark.sql`` with the same table names the DuckDB oracle sees."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
