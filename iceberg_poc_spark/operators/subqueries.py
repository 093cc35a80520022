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


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_acctbal > 9000
"""


@register(
    "q_join_lateral",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated table subquery with per-row ORDER BY ... "
    "LIMIT (top-2 orders for each high-balance customer) — the SQL-2016 "
    "form of per-group top-k. Catalyst decorrelates it to a ranked join "
    "rather than re-running the inner query per row; DuckDB runs the "
    "IDENTICAL statement as the oracle.",
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer")
    _view(spark, sf_dir, "orders")
    return spark.sql(_LATERAL_SQL)
