"""As-of join — nearest-prior-event join, a composite operator Spark lacks
natively (SURVEY.md §2B marks it ✦; no reference analogue).

Implementation: the union + last(ignorenulls) carry-forward trick.
Both sides are unioned with a source tag, sorted per key by
(ts, source-tag) so right-side rows at an equal timestamp sort first
(inclusive ``right.ts <= left.ts`` semantics), and each right payload
column is carried forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding frame. Left rows then read the most recent right
payload.

Scale: ONE shuffle of (left ∪ right) on the join keys, then a linear
window pass — no range-join blowup, no per-key collect. This is the plan
shape a dedicated as-of physical operator would produce, so it holds at
100 TB (contrast: a naive ``left.ts >= right.ts`` range join is O(n·m)
per key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table

_SRC = "__asof_src"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``keys`` group (inclusive).
    ``direction="forward"`` flips the search: the SMALLEST
    ``right_ts >= left_ts`` (pandas merge_asof direction semantics) —
    same single-shuffle union+window plan, with the carry running
    backward over an unbounded-following frame.

    Carried right columns (``right_ts`` plus ``right_cols``) appear on the
    output as ``{prefix}{col}``. Left rows with no prior right row get
    NULLs. If several right rows share the greatest timestamp, the one last
    in the (deterministic only up to that timestamp) union order wins —
    pass a unique ``right_cols`` ordering column if that matters.

    ``tolerance`` (an SQL interval string, e.g. ``"30 minutes"``) bounds
    the lookback: a prior right row older than ``left_ts - tolerance``
    is treated as no match (NULLs) — pandas ``merge_asof(tolerance=...)``
    semantics.
    """
    carried = [right_ts, *right_cols]
    out_names = {c: f"{prefix}{c}" for c in carried}
    clash = set(out_names.values()) & set(left.columns)
    if clash:
        raise ValueError(f"asof output columns clash with left side: {sorted(clash)}")

    l_tagged = left.withColumn(_SRC, F.lit(1)).withColumn(_TS, F.col(left_ts))
    r_tagged = (
        right.select(*keys, *carried)
        .withColumnsRenamed(out_names)
        .withColumn(_SRC, F.lit(0))
        .withColumn(_TS, F.col(out_names[right_ts]))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort BEFORE left at equal ts -> inclusive <=
        w = (
            Window.partitionBy(*keys)
            .orderBy(_TS, _SRC)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "forward":
        # right rows sort AFTER left at equal ts -> inclusive >=
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_TS), F.col(_SRC).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    for c in out_names.values():
        unioned = unioned.withColumn(c, carry(c))
    out = unioned.filter(F.col(_SRC) == 1).drop(_SRC, _TS)
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        fresh = (
            F.col(out_names[right_ts]) >= (F.col(left_ts) - bound)
            if direction == "backward"
            else F.col(out_names[right_ts]) <= (F.col(left_ts) + bound)
        )
        ts_out = out_names[right_ts]
        # NULL the payload columns first, the carried timestamp last (the
        # freshness predicate reads it)
        for c in out_names.values():
            if c != ts_out:
                out = out.withColumn(c, F.when(fresh, F.col(c)))
        out = out.withColumn(ts_out, F.when(fresh, F.col(ts_out)))
    return out


@register(
    "q_join_asof",
    oracle="""
    SELECT e.event_id,
           c.event_id AS prior_click_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="As-of join: each error event matched to the same user's most "
    "recent prior (or simultaneous) click. DuckDB verifies with its "
    "native ASOF JOIN; the engine path is the union+window composite.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    joined = asof_join(
        errors, clicks, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["click_id"],
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.select(
        "event_id",
        F.col("asof_click_id").alias("prior_click_id"),
        (us("ts") - us("asof_ts")).cast("bigint").alias("gap_us"),
    )


@register(
    "q_join_asof_fwd",
    oracle="""
    SELECT e.event_id,
           c.event_id AS next_click_id,
           epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts <= c.ts
    """,
    doc="Forward as-of join: each error matched to the same user's "
    "NEAREST FOLLOWING click (did the user recover and continue?) — the "
    "mirror of q_join_asof's nearest-prior lookup, same single-shuffle "
    "union+window plan with the carry running over an unbounded-"
    "following frame. DuckDB verifies with its native forward ASOF "
    "(e.ts <= c.ts).",
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    joined = asof_join(
        errors, clicks, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["click_id"], direction="forward",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.select(
        "event_id",
        F.col("asof_click_id").alias("next_click_id"),
        (us("asof_ts") - us("ts")).cast("bigint").alias("gap_us"),
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         b AS (
           SELECT e.event_id, c.event_id AS cid, c.ts AS cts
           FROM e ASOF LEFT JOIN c
             ON e.user_id = c.user_id AND e.ts >= c.ts
         ),
         f AS (
           SELECT e.event_id, c.event_id AS cid, c.ts AS cts
           FROM e ASOF LEFT JOIN c
             ON e.user_id = c.user_id AND e.ts < c.ts
         )
    SELECT e.event_id,
           CASE WHEN b.cid IS NOT NULL AND (f.cid IS NULL OR
                     epoch_us(e.ts) - epoch_us(b.cts)
                       <= epoch_us(f.cts) - epoch_us(e.ts))
                THEN b.cid ELSE f.cid END AS nearest_click_id,
           CASE WHEN b.cid IS NOT NULL AND (f.cid IS NULL OR
                     epoch_us(e.ts) - epoch_us(b.cts)
                       <= epoch_us(f.cts) - epoch_us(e.ts))
                THEN epoch_us(e.ts) - epoch_us(b.cts)
                ELSE epoch_us(f.cts) - epoch_us(e.ts) END AS gap_us
    FROM e
    JOIN b ON e.event_id = b.event_id
    JOIN f ON e.event_id = f.event_id
    """,
    doc="Nearest as-of join (pandas merge_asof direction='nearest'): each "
    "error matched to the same user's closest click in EITHER direction, "
    "ties to the prior one. Both carries run in ONE union+window pass — "
    "the backward last(ignorenulls) and forward first(ignorenulls) "
    "frames share the same partitioning AND sort order, so the plan has "
    "a single shuffle and a single sort (equal-ts clicks sort before "
    "the error row: included backward/inclusive, excluded forward/"
    "strict). The oracle composes DuckDB's two native ASOF directions "
    "and picks per row. Same 100 TB shape as q_join_asof: no range-join "
    "blowup, linear pass per key.",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
        .withColumn("cts", F.col("ts"))
    )
    l_t = errors.withColumn(_SRC, F.lit(1))
    r_t = clicks.withColumn(_SRC, F.lit(0))
    u = l_t.unionByName(r_t, allowMissingColumns=True)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", _SRC)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", _SRC)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        u.withColumn("b_click", F.last("click_id", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last("cts", ignorenulls=True).over(wb))
        .withColumn("f_click", F.first("click_id", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.first("cts", ignorenulls=True).over(wf))
    )
    out = u.filter(F.col(_SRC) == 1)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    gap_b = us("ts") - us("b_ts")
    gap_f = us("f_ts") - us("ts")
    back_wins = F.col("b_click").isNotNull() & (
        F.col("f_click").isNull() | (gap_b <= gap_f)
    )
    return out.select(
        "event_id",
        F.when(back_wins, F.col("b_click"))
        .otherwise(F.col("f_click"))
        .alias("nearest_click_id"),
        F.when(back_wins, gap_b).otherwise(gap_f).cast("bigint").alias("gap_us"),
    )
