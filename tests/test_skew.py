"""Skew resilience: AQE's runtime skew-join split on a synthetically hot
key — the reactive complement to the proactive salting escape hatch.

When to use which (operators/joins.py salted_join vs this):
- AQE skew split (default ON in session.py) handles skew REACTIVELY: at
  runtime it splits any shuffle partition larger than
  skewedPartitionThresholdInBytes AND skewedPartitionFactor x median into
  advisory-sized slices, replicating the matching build-side partition.
  Zero code changes; works for whatever key happens to be hot today.
- Explicit salting (q_join_salted) is for keys so hot that a single
  post-split slice would STILL exceed executor memory, or when a
  deterministic plan shape is required (SLA-bound pipelines) — it pays
  its build-side replication on every run whether or not skew occurs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_poc_spark.plans import explain_str

# tiny thresholds so local[8]-sized data trips the same runtime logic a
# 100 TB hot key would trip at the default 256 MB threshold
_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
}


def test_aqe_skew_join_split_triggers(spark):
    saved = {}
    for k, v in _SKEW_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # one pathologically hot key (~280k rows) among 50 normal keys
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 280_000, F.lit(0))
            .otherwise(F.col("id") % 50)
            .cast("long")
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )
        [row] = joined.collect()
        assert row.n == 300_000  # every row found its match post-split
        plan = explain_str(joined)
        assert "isFinalPlan=true" in plan
        # the AQE-rewritten SMJ is marked skew=true and the hot side's
        # shuffle read carries skewed splits
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
