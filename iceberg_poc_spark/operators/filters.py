"""Filters / predicates: range, compound boolean, null-semantics, IN.

Reference parity: predicate construction via ``Expressions.*``
(``aig/TimeBasedPartitioningExamples.java:156-182``) — here plain Column
expressions that Catalyst folds and pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@register(
    "q_filter_range",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
    """,
    doc="BETWEEN range predicate (reference semantics at "
    "TimeBasedPartitioningExamples.java:159-164).",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice").between(100000, 200000)).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount > 0.05) OR l_quantity < 5
    """,
    doc="Compound AND/OR predicate tree (reference builds AND trees with "
    "Expressions.and, TimeBasedPartitioningExamples.java:182).",
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)) | (
        F.col("l_quantity") < 5
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount"
    )


@register(
    "q_filter_null",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_open
    FROM orders
    WHERE NULLIF(o_orderstatus, 'F') IS NOT NULL
    GROUP BY o_orderpriority
    """,
    doc="NULL semantics: NULLIF + IS NOT NULL three-valued logic.",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.nullif(F.col("o_orderstatus"), F.lit("F")).isNotNull())
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_open"))
    )


@register(
    "q_filter_in",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    doc="IN-list predicate.",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_mktsegment"
    )
