"""Window functions: rank, lag/lead, running sums, range frames.

Absent from the reference (SURVEY.md §2C); engine surface via
``Window.partitionBy().orderBy()``.

Scale note: one shuffle on the partition key per window spec; ordering
columns include a unique tiebreaker everywhere so results are
deterministic (float ties would otherwise make the oracle diff flap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.functions.sqlround import dround
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@register(
    "q_win_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    doc="row_number top-N per group.",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id,
           ROUND(value - LAG(value) OVER w, 2) AS delta_value,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead over a per-user event timeline.",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
    doc="Running total with an explicit ROWS frame.",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_win_frame_range",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY epoch(ts)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ), 2) AS sum_1h
    FROM events
    """,
    doc="RANGE frame: trailing 1-hour sum per user, ordered by epoch "
    "seconds (numeric RANGE frames are the portable formulation).",
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


@register(
    "q_win_ntile_share",
    oracle=f"""
    SELECT c_custkey, quartile,
           {dround('c_acctbal / NULLIF(SUM(c_acctbal) OVER (), 0)', 6)} AS bal_share
    FROM (
        SELECT c_custkey, c_acctbal,
               NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
        FROM customer
    )
    """,
    doc="ntile bucketing + share-of-total, planned WITHOUT a single-"
    "partition window: a global NTILE(4) would funnel every row through "
    "one task for the global sort. Instead: (1) range-repartition on the "
    "sort key so partition i holds strictly earlier keys than partition "
    "i+1, (2) row_number within each range partition (the window "
    "partitions by spark_partition_id — a balanced, shuffle-local sort), "
    "(3) global rank = local rank + broadcast per-partition row-count "
    "offsets (offsets come from a tiny #partitions-row aggregate, "
    "cumulated via a broadcast non-equi self-join, not a window), "
    "(4) the exact NTILE bucket from the SQL-standard formula — the "
    "first n%k buckets get ceil(n/k) rows, the rest floor(n/k) — using "
    "broadcast scalars n and sum(c_acctbal). Every shuffle is "
    "range/hash-partitioned; nothing single-partition. Range partition "
    "boundaries only affect balance, never the result: global rank is "
    "offset+local rank for ANY order-preserving split.",
)
def q_win_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    totals = c.agg(
        F.count("*").alias("n_rows"), F.sum("c_acctbal").alias("total_bal")
    )
    ranged = c.repartitionByRange(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    ).withColumn("pid", F.spark_partition_id())
    cnt = ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    # cumulative offset per range partition: tiny (#partitions rows)
    # broadcast non-equi self-join — deliberately NOT a window, so the
    # inventory-wide no-SinglePartition-Window gate holds vacuously
    off = (
        cnt.alias("a")
        .join(F.broadcast(cnt.alias("b")), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("off"))
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ranked = (
        ranged.withColumn("lr", F.row_number().over(w_local))
        .join(F.broadcast(off), "pid")
        .crossJoin(F.broadcast(totals))
        .withColumn("rnk", F.col("lr") + F.col("off"))
    )
    # SQL NTILE(k): first rem = n%k buckets hold big = floor(n/k)+1 rows,
    # the remaining k-rem hold floor(n/k). (Doubles are exact here: all
    # operands < 2^53.)
    small = F.floor(F.col("n_rows") / 4)
    rem = F.col("n_rows") % 4
    big = small + 1
    head = rem * big
    r = F.col("rnk")
    quartile = F.when(r <= head, F.floor((r - 1) / big) + 1).otherwise(
        rem + F.floor((r - head - 1) / small) + 1
    )
    return ranked.select(
        "c_custkey",
        quartile.cast("int").alias("quartile"),
        F.round(
            F.col("c_acctbal") / F.nullif(F.col("total_bal"), F.lit(0.0)), 6
        ).alias("bal_share"),
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="first_value/last_value with an explicit full-partition frame for "
    "last (the default frame stops at CURRENT ROW — the classic "
    "last_value trap). Tie-broken ordering keeps it deterministic.",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@register(
    "q_win_dist",
    oracle="""
    SELECT c_custkey,
           ROUND(percent_rank() OVER w, 4) AS pr,
           ROUND(cume_dist() OVER w, 4) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution window functions (percent_rank / cume_dist) with "
    "tie-broken ordering for determinism.",
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    )
