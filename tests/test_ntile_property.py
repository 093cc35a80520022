"""The closed-form NTILE bucket arithmetic (operators/windows.py:
ntile_bucket) must agree with Spark's own ntile() for every rank — the
formula is what lets q_win_ntile_share skip the single-partition global
sort, so it must be exactly the SQL-standard distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_poc_spark.operators.windows import ntile_bucket


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 7])
@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8, 9, 15, 16, 17, 100])
def test_ntile_bucket_matches_spark_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("r"))
    got = df.select(
        "r", ntile_bucket(F.col("r"), n, k).cast("int").alias("b")
    )
    want = df.select(
        "r", F.ntile(k).over(Window.orderBy("r")).alias("b")
    )
    g = {row.r: row.b for row in got.collect()}
    w = {row.r: row.b for row in want.collect()}
    assert g == w, f"n={n} k={k}: {g} != {w}"
