"""SparkSession factory with scale-oriented defaults.

Defaults follow the reference's physical-layout constants (BASELINE.md:
zstd parquet, 128 MB target files — reference
``aig/AIGEventsTableCreator.java:184-191``) and enable AQE so plans
re-optimize at runtime (partition coalescing, skew-join splitting) — the
behaviors that matter at 100 TB / 1000-executor scale, while still running
on ``local[N]`` here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference parity: write.target-file-size-bytes = 128 MB
# (aig/AIGEventsTableCreator.java:188); also a good input-split size.
TARGET_FILE_SIZE = 128 * 1024 * 1024

DEFAULT_CONF: dict[str, str] = {
    # --- runtime re-optimization (critical at scale; harmless locally) ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local[32] + sf<=0.1: 32 gives one wave; AQE coalesces further.
    # On a real cluster this should be ~2-3x total cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # --- deterministic semantics for the DuckDB oracle ---
    "spark.sql.session.timeZone": "UTC",
    # testdata parquet timestamps are isAdjustedToUTC=false -> read as
    # TIMESTAMP_NTZ, matching DuckDB's naive TIMESTAMP semantics exactly.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # events.ts is TIMESTAMP(NANOS) which Spark cannot read natively; read
    # as long and convert in the source layer (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # --- python<->jvm data path ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- physical layout (reference parity, BASELINE.md) ---
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.files.maxPartitionBytes": str(TARGET_FILE_SIZE),
    # broadcast threshold: default 10MB is fine; make it explicit so the
    # intent (dims broadcast, facts shuffle) is visible.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    # local mode runs driver and all 32 executor threads in ONE JVM; the
    # 1g driver default that suits a real cluster's driver-only process
    # OOMs here once inputs outgrow toy SFs (first seen on the 10x sf1
    # sweep). Only honored at session creation — a cluster deploy sets
    # its own executor/driver sizing.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "iceberg-poc-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``extra_conf`` wins over the defaults (e.g. Iceberg catalog config from
    :mod:`iceberg_poc_spark.tables` when the runtime jar is available).
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


from contextlib import contextmanager


@contextmanager
def scoped_conf(spark: SparkSession, conf: dict[str, str]):
    """Set session confs for one block, restoring the prior values on
    any exit path.

    NOTE (ADVICE r12): SparkSession conf is session-GLOBAL. Scoping it
    this way is sound only because the harness drives one query at a
    time on the session (bench.py / the oracle driver are single-
    threaded); a concurrent query on the same session would observe the
    override. The restore also only covers work that EXECUTES inside
    the block — callers must consume (or eagerly materialize) anything
    that depends on the override before the block exits."""
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the correctness driver passes us its own session)."""
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        try:
            spark.conf.set(k, DEFAULT_CONF[k])
        except Exception:
            pass  # non-runtime-settable under some configs; defaults still fine
    return spark
