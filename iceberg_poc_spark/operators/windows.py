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


def ntile_bucket(rank_col: F.Column, n: int, k: int) -> F.Column:
    """SQL-standard NTILE(k) bucket from a 1-based global rank: the first
    n%k buckets hold floor(n/k)+1 rows, the rest floor(n/k). ``n`` and
    ``k`` are Python ints (known at plan time), so the bucket is pure
    integer arithmetic on the rank — no window needed. Property-tested
    against Spark's own ntile in tests/test_ntile_property.py."""
    small, rem = divmod(n, k)
    big, head = small + 1, rem * (small + 1)
    r = rank_col
    return F.when(r <= head, ((r - 1) / big).cast("int") + 1).otherwise(
        rem + ((r - head - 1) / max(small, 1)).cast("int") + 1
    )


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
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 2) AS sum_1h
    FROM events
    """,
    doc="RANGE frame: trailing 1-hour sum per user, ordered by exact "
    "epoch MICROSECONDS (numeric RANGE frames are the portable "
    "formulation). Microseconds, not seconds: RANGE peers are rows with "
    "EQUAL ordering values, so second-truncated ordering silently pulls "
    "same-second followers into the trailing window — Spark (truncated "
    "long) and DuckDB (fractional epoch) disagreed on exactly that at "
    "sf0.1, where two same-user events first shared a second.",
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
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
    "partition window (a global NTILE(4) would funnel every row through "
    "one task for the global sort). Two-pass manual range partitioning "
    "whose assignment is a PURE FUNCTION of the data: (1) one scan "
    "collects approximate quantile bounds of the sort column plus "
    "count/sum scalars (bounded driver row, the sanctioned class of "
    "bounded collects), (2) every later job assigns pid = bucket of "
    "c_acctbal among those LITERAL bounds — unlike repartitionByRange, "
    "whose boundary sampling is seeded by the runtime rdd.id and so can "
    "differ between the counting job and the result job (a real "
    "cross-job rank-collision bug this query once had at sf0.1/32 "
    "partitions; small SFs masked it because the reservoir sample "
    "covers whole partitions exactly), (3) a second tiny collect turns "
    "per-pid counts into literal rank offsets, (4) the result pass is "
    "one scan + ONE hash exchange + a pid-PARTITIONED window for local "
    "rank; global rank = offset + local rank, quartile from the "
    "closed-form NTILE formula (ntile_bucket, property-tested), share "
    "from the literal total. Approximate bounds only skew partition "
    "balance, never the result: assignment is order-preserving for any "
    "bound set (equal balances land in one pid; custkey breaks ties "
    "within it).",
)
def q_win_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    qs = [i / n_parts for i in range(1, n_parts)]
    head_row = c.agg(
        F.percentile_approx("c_acctbal", qs, 10_000).alias("bs"),
        F.count("*").alias("n"),
        F.sum("c_acctbal").alias("total"),
    ).first()
    bounds = sorted(set(head_row.bs or []))  # ascending, deduped
    n = head_row.n
    total = head_row.total or 0.0  # 2-dp inputs: partial-sum-order safe
    b_arr = F.array(*[F.lit(float(b)) for b in bounds])
    asc_idx = F.aggregate(
        b_arr,
        F.lit(0),
        lambda acc, b: acc + F.when(b < F.col("c_acctbal"), 1).otherwise(0),
    )
    # pid 0 = highest balances (DESC global order over ascending buckets)
    pid = (F.lit(len(bounds)) - asc_idx).cast("bigint")
    withpid = c.withColumn("pid", pid)
    cnts = sorted(
        (r.pid, r.cnt)
        for r in withpid.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    )
    offs, acc = {}, 0
    for p, cnt in cnts:
        offs[p] = acc
        acc += cnt
    off_map = F.map_from_arrays(
        F.array(*[F.lit(p).cast("bigint") for p in offs]),
        F.array(*[F.lit(o).cast("bigint") for o in offs.values()]),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    r = F.element_at(off_map, F.col("pid")) + F.row_number().over(w_local)
    quartile = ntile_bucket(r, n, 4)
    share = (
        F.round(F.col("c_acctbal") / total, 6)
        if total != 0
        else F.lit(None).cast("double")
    )
    return withpid.select(
        "c_custkey",
        quartile.cast("int").alias("quartile"),
        share.alias("bal_share"),
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


@register(
    "q_win_gap_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (
                     PARTITION BY user_id ORDER BY d
                   ) AS INT) AS grp
        FROM days
    ), streaks AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks
    GROUP BY 1
    """,
    doc="Gaps-and-islands: per-user CONSECUTIVE-day activity streaks via "
    "the classic date-minus-row_number trick — consecutive days share "
    "the same (day - rank) anchor, so islands fall out of a plain "
    "groupBy with no self-join and no iteration. Reports streak count, "
    "longest streak, and total active days per user (the "
    "retention/engagement primitive next to q_retention_cohort's grid). "
    "Scale shape: one user_id shuffle for the window, then map-side "
    "combinable aggregates on the SAME partitioning — the distinct, the "
    "window, and both groupBys all reuse one hash partitioning; per-user "
    "state is that user's distinct days, never the global calendar.",
)
def q_win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest"),
        F.sum("len").alias("active_days"),
    )
