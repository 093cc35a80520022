#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write (full execution, no
driver collect bottleneck) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

from iceberg_poc_spark.registry import load_all
from iceberg_poc_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="iceberg-poc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = load_all()
    # Warm the JVM/codegen once with the flagship, and the Python UDF
    # worker pool with a trivial Arrow batch, so per-query numbers measure
    # the plan, not session/interpreter startup.
    materialize(queries["q_agg_q1"].fn(spark, sf_dir))

    def _ident(batches):
        yield from batches

    materialize(
        spark.range(32)
        .repartition(32)
        .mapInPandas(_ident, schema="id long")
    )

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            materialize(queries[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not hide the others
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
