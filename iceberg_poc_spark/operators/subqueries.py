"""Subquery shapes: uncorrelated scalar and correlated EXISTS.

Absent from the reference (SURVEY.md §2C — it has no SQL surface at all);
part of the complete analytics surface. Expressed through ``spark.sql``
over registered views — Catalyst rewrites the scalar subquery to a
broadcast join and decorrelates EXISTS into a left-semi join, so both run
as ordinary distributed joins (no per-row re-execution, which is what a
naive interpreter would do and what would die at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_custkey = (SELECT MIN(c_custkey) FROM customer)
    """,
    doc="Uncorrelated scalar subquery (integer-exact threshold — no float "
    "boundary nondeterminism). Catalyst plans the inner MIN once and "
    "broadcasts the scalar.",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE o_custkey = (SELECT MIN(c_custkey) FROM customer)
        """
    )


@register(
    "q_subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
    doc="Correlated EXISTS — decorrelated by Catalyst into a left-semi "
    "join on the correlation key (one shuffle, not per-row probes).",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )
