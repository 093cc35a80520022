"""Property-based check of the table layer's core invariant: a
manifest-pruned scan returns EXACTLY the rows of an unpruned scan +
row-level filter, for any transform spec, operator, and literal.

False negatives here (a pruned-away file that held matching rows) are the
one bug class that silently corrupts results at 100 TB — partition
granularity may keep extra files (residual filter removes the rows), but
must never drop one.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_poc_spark.tables import (
    ParquetTableManager,
    bucket,
    days,
    identity,
    months,
    truncate,
)

SPECS = {
    "p_identity_k": [identity("k")],
    "p_days_ts": [days("ts")],
    "p_months_ts": [months("ts")],
    "p_trunc_v": [truncate("v", 100)],
    "p_multi": [identity("k"), days("ts")],
    "p_bucket_k": [bucket("k", 4)],
}

HOURS_SPAN = 24 * 90  # 90 days of hourly-ish data
BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module", params=sorted(SPECS))
def table(request, spark):
    name = request.param
    mgr = ParquetTableManager(spark, tempfile.mkdtemp(prefix="prop_wh_"))
    df = spark.range(300).select(
        (F.col("id") % 10).cast("int").alias("k"),
        (
            F.lit(BASE) + F.make_interval(hours=(F.col("id") * 7) % HOURS_SPAN)
        ).alias("ts"),
        ((F.col("id") * 13) % 1000).cast("long").alias("v"),
    )
    mgr.create_table(name, df.schema, SPECS[name])
    mgr.append(name, df)  # multiple files per partition (32 shuffle parts)
    return mgr, name, df


def _literal(draw, col):
    if col == "k":
        return draw(st.integers(min_value=-1, max_value=11))
    if col == "v":
        return draw(st.integers(min_value=-50, max_value=1050))
    return BASE + dt.timedelta(hours=draw(st.integers(0, HOURS_SPAN + 48)))


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruned_scan_equals_full_filter(table, data):
    mgr, name, df = table
    col = data.draw(st.sampled_from(["k", "ts", "v"]))
    op = data.draw(st.sampled_from(["==", ">=", "<=", ">", "<"]))
    lit_v = _literal(data.draw, col)

    got, planned, total = mgr.scan(name, [(col, op, lit_v)])
    assert planned <= total

    c, v = F.col(col), F.lit(lit_v)
    pred = {"==": c == v, ">=": c >= v, "<=": c <= v, ">": c > v, "<": c < v}[op]
    want = df.filter(pred)

    key = lambda r: tuple(map(str, r))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
