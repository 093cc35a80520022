"""asof_join unit semantics: inclusive nearest-prior, NULL before first
right row, and tolerance-bounded lookback."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iceberg_poc_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_semantics_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(61)), (2, _ts(30))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(10), 200.0), (2, _ts(40), 300.0)],
        "k int, rts timestamp, px double",
    )
    out = asof_join(left, right, ["k"], "lts", "rts", ["px"]).orderBy("k", "lts")
    rows = out.collect()
    # t=0: no prior -> NULL; t=10: inclusive equality -> 200; t=61: carry 200
    assert [r.asof_px for r in rows] == [None, 200.0, 200.0, None]
    # k=2 at t=30 has no prior right (right is t=40) -> NULL

    tol = asof_join(
        left, right, ["k"], "lts", "rts", ["px"], tolerance="30 minutes"
    ).orderBy("k", "lts")
    # t=61 is 51 min after the t=10 match -> expired under 30-min tolerance
    assert [r.asof_px for r in tol.collect()] == [None, 200.0, None, None]
    assert tol.collect()[2].asof_rts is None


def test_asof_forward_semantics_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(61)), (2, _ts(50))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(10), 200.0), (2, _ts(40), 300.0)],
        "k int, rts timestamp, px double",
    )
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["px"], direction="forward"
    ).orderBy("k", "lts")
    rows = out.collect()
    # t=0 -> next right at t=5 (100); t=10 -> inclusive equality (200);
    # t=61 -> nothing follows -> NULL; k=2 t=50 -> right t=40 is prior -> NULL
    assert [r.asof_px for r in rows] == [100.0, 200.0, None, None]

    tol = asof_join(
        left,
        right,
        ["k"],
        "lts",
        "rts",
        ["px"],
        tolerance="3 minutes",
        direction="forward",
    ).orderBy("k", "lts")
    # t=0's next match at t=5 is 5 min ahead -> expired under 3-min lookahead
    trows = tol.collect()
    assert [r.asof_px for r in trows] == [None, 200.0, None, None]
    assert trows[0].asof_rts is None
