"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`iceberg_poc_spark.registry` — every operator from
SURVEY.md §2 registers there with a Spark callable and (where
SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_poc_spark import registry as _registry
from iceberg_poc_spark.session import tune_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape: filtered scan + multi-key hash agg)
    on /root/testdata/sf0.001."""
    tune_existing(spark)
    return _registry.load_all()["q_agg_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 inventory)."""
    wrapped = {}
    for name, fn in _registry.queries().items():
        def make(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_existing(spark)
                return f(spark, sf_dir)
            return run
        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for EVERY registered query (as of round 8 the
    rows-only bucket is empty: approximate-sketch queries emit
    closed-form surfaces — exact counts + error-bound booleans — so
    they hash-gate too)."""
    return _registry.oracles()
