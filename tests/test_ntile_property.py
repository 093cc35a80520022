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


def test_ntile_share_stable_across_runs_at_sf01(spark):
    """Regression for the cross-job range-boundary bug: repartitionByRange
    samples boundaries seeded by the runtime rdd.id, so a counts job and a
    result job could disagree (rank collisions at sf0.1 with 32 shuffle
    partitions — small SFs mask it because the reservoir sample covers
    whole partitions exactly). The literal-bounds formulation must give
    oracle-identical quartiles on repeated runs at the repro scale."""
    import duckdb

    from iceberg_poc_spark.registry import load_all

    q = load_all()["q_win_ntile_share"]
    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")
    want = {
        (r[0], r[1], round(r[2], 6)) for r in con.execute(q.oracle).fetchall()
    }
    for _ in range(2):
        got = {
            (r.c_custkey, r.quartile, round(r.bal_share, 6))
            for r in q.fn(spark, sf).collect()
        }
        assert got == want
