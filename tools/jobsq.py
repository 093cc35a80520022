#!/usr/bin/env python
"""Jobs-per-warm-run counter: run named queries (noop sink) inside a
fresh job group and report how many Spark JOBS one warm run schedules —
the deterministic, stall-immune proxy for per-stage scheduling overhead
(OPTIMIZATION_r12 methodology). Run from the repo root:

    python tools/jobsq.py q_foo q_bar [--sf DIR]

Prints one line per query: name, jobs in one warm run, warm seconds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    if not names:
        print("usage: jobsq.py q_name... [--sf DIR]", file=sys.stderr)
        sys.exit(2)

    from iceberg_poc_spark.registry import load_all
    from iceberg_poc_spark.session import get_spark

    spark = get_spark(app_name="jobsq")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    materialize(queries["q_agg_q1"].fn(spark, sf_dir))

    def _ident(batches):
        yield from batches

    materialize(
        spark.range(32).repartition(32).mapInPandas(_ident, schema="id long")
    )

    for name in names:
        fn = queries[name].fn
        materialize(fn(spark, sf_dir))  # warm once (one-time setup out)
        sc = spark.sparkContext
        sc.setJobGroup(f"jobsq-{name}", name)
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(f"jobsq-{name}")
        sc.setJobGroup("jobsq-idle", "idle")
        print(f"{name:40s} jobs={len(jobs):4d} warm={dt:7.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
