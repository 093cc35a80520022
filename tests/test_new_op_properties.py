"""Semantic properties of the round-4 operators that the oracle
comparison can't express: probability calibration, sampling determinism,
and attribution-window boundary behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_poc_spark.registry import load_all
from tests.conftest import SF_DIR

Q = load_all()


def test_bigram_probabilities_sum_to_one(spark):
    """Before the count floor, P(w2|w1) over all w2 sums to 1 per w1 —
    the floor must not decalibrate the reported probabilities: each
    survivor's p times its w1 total reconstructs its count."""
    df = Q["q_text_bigram"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "bigram floor left nothing at test SF"
    # p was computed against the FULL denominator: n/p (within rounding
    # slack of the 4-dp p) must be constant per w1 and >= the survivor sum
    by_w1: dict = {}
    for r in rows:
        by_w1.setdefault(r["w1"], []).append(r)
    for w1, grp in by_w1.items():
        denoms = [r["n"] / r["p"] for r in grp]
        lo, hi = min(denoms), max(denoms)
        assert hi - lo <= 0.02 * hi, f"{w1}: inconsistent denominators"
        assert sum(r["n"] for r in grp) <= hi * 1.001, w1
        assert sum(r["p"] for r in grp) <= 1.001, w1


def test_reservoir_sample_is_partition_invariant(spark):
    """The sample is a pure function of the data: identical membership
    regardless of input partitioning."""
    from iceberg_poc_spark.operators.sampling import RESERVOIR_K

    base = Q["q_sample_reservoir"].fn(spark, SF_DIR)
    got = {(r["source"], r["doc_id"], r["pos"]) for r in base.collect()}
    # re-run over a deliberately re-partitioned view of the same table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("___res_docs")
    u = F.substring(
        F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")).cast("binary")),
        1,
        8,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(u, "doc_id")
    again = (
        docs.select("source", "doc_id", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= RESERVOIR_K)
    )
    assert {(r["source"], r["doc_id"], r["pos"]) for r in again.collect()} == got
    # every group is exactly min(K, group size)
    sizes = {r["source"]: r["cnt"] for r in base.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    totals = {
        r["source"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for src, n in sizes.items():
        assert n == min(RESERVOIR_K, totals[src]), src


def test_interval_join_window_boundaries(spark):
    """Synthetic boundary check: a purchase exactly at click+1h is
    attributed (closed upper bound), at click ts itself is not (open
    lower bound), and beyond 1h is not."""
    from iceberg_poc_spark.operators.joins import q_join_interval
    import iceberg_poc_spark.operators.joins as J

    rows = [
        (1, "2024-01-01 10:00:00", 100, "click", 0.0),
        (2, "2024-01-01 10:00:00", 100, "purchase", 5.0),   # same instant: NO
        (3, "2024-01-01 11:00:00", 100, "purchase", 7.0),   # exactly +1h: YES
        (4, "2024-01-01 11:00:01", 100, "purchase", 9.0),   # beyond: NO
        (5, "2024-01-01 10:30:00", 200, "purchase", 1.0),   # other user: NO
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v) for i, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    orig = J.load_table
    try:
        J.load_table = lambda _s, _d, _t: df
        out = q_join_interval(spark, "ignored").collect()
    finally:
        J.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert (r["user_id"], r["click_id"], r["n_purchases"]) == (100, 1, 1)
    assert r["attributed_value"] == 7.0
