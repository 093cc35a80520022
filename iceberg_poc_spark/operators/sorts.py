"""Sorts / limits / top-k. Absent from the reference (SURVEY.md §2C).

Scale note: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
each task keeps a k-row heap and only k rows per task reach the driver
stage; no global sort materializes. Top-k-per-group uses a window rank,
one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Global top-k (TakeOrderedAndProject; unique-key tiebreak makes "
    "the row set deterministic).",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey
               ) AS rn
        FROM part
    )
    WHERE rn <= 2
    """,
    doc="Top-k per group via window rank (k rows survive per group).",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice")
    )
