"""Nested array-of-struct round-trip — the reference's deepest data-model
feature as an oracle-checked query.

Reference parity: the recursive nested copier handles
``list<struct<..., list<string>>>`` columns field-by-field
(``HiddenPartitionLoaderDemNested.java:230-282``); the AIG events schema
carries exactly this shape (``policy: array<struct<..., profile:
array<string>>>`` — ``AIGEventsSchemaValidator.java:97-131``, mirrored in
``tables/aig_events.py``). The table layer exercises those columns in
ingest tests; this query proves the ENGINE side: construct the nested
shape, then explode both nesting levels back out and re-aggregate, with a
DuckDB UNNEST twin checking every value.

Scale note: one hash shuffle on l_orderkey builds the nested column
(map-side partial collect_list), explode is pipeline-local (no shuffle),
and the final tag aggregate is map-side combinable. sum(qty) is exact —
quantities are integral doubles — so the cross-engine hash cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@register(
    "q_fn_nested",
    oracle="""
    WITH nested AS (
        SELECT l_orderkey,
               list_sort(list(struct_pack(
                   ln := l_linenumber,
                   qty := l_quantity,
                   tags := [l_returnflag, l_linestatus]))) AS lines
        FROM lineitem GROUP BY l_orderkey
    ),
    lines AS (
        SELECT l_orderkey, UNNEST(lines) AS line FROM nested
    ),
    tags AS (
        SELECT l_orderkey, line.qty AS qty, UNNEST(line.tags) AS tag
        FROM lines
    )
    SELECT tag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           SUM(qty) AS sum_qty
    FROM tags GROUP BY tag
    """,
    doc="Nested list<struct<...,list<string>>> round-trip: pack lineitem "
    "into a per-order sorted array of line structs (each carrying an "
    "inner tag list — the AIG policy.profile shape), explode both "
    "nesting levels back out, and re-aggregate per tag. Verifies "
    "construction, storage typing, and both explode levels value-for-"
    "value against DuckDB UNNEST.",
)
def q_fn_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.array("l_returnflag", "l_linestatus").alias("tags"),
                )
            )
        ).alias("lines")
    )
    lines = nested.select("l_orderkey", F.explode("lines").alias("line"))
    tags = lines.select(
        "l_orderkey",
        F.col("line.qty").alias("qty"),
        F.explode("line.tags").alias("tag"),
    )
    # explicit two-phase distinct: pre-aggregate to (tag, order) grain,
    # then count pairs — same numbers as count_distinct, but the partial
    # agg combines map-side BEFORE the shuffle, so the exchange carries
    # one row per (tag, order) instead of one per exploded tag row
    pairs = tags.groupBy("tag", "l_orderkey").agg(
        F.count("*").alias("c"), F.sum("qty").alias("s")
    )
    return pairs.groupBy("tag").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_orders"),
        F.sum("s").alias("sum_qty"),
    )
