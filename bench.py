#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write (full execution, no
driver collect bottleneck) — the honest way to time a distributed plan.

Methodology: before timing, each query runs once at the smallest SF
(sf0.001) so whole-stage-codegen compilation for that plan shape is
amortized out of the measurement — the steady-state number is what a
long-running job sees (compile seconds vanish against hours at 100 TB);
a cold measurement would mostly rank queries by generated-code size.
Set SPARK_GRAFT_BENCH_COLD=1 to skip warmups and measure first-run cost.

Sub-2s queries report the MEDIAN of 3 timed runs: at that absolute cost
single-shot scheduler/GC noise is the same order as the signal and has
produced spurious >1.5x round-over-round "regressions" on flat plans
(r5: q_fn_xml, q_udtf_lateral — both map-side, no plan change). Slow
queries stay single-shot (their signal dwarfs the noise and re-running
table-layer state machines would triple bench wall time). The reported
total is the sum of per-query reported values, so it composes the same
way across rounds. SPARK_GRAFT_BENCH_REPEATS overrides the repeat count
(1 = old single-shot behavior).
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

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    do_warm = (
        not os.environ.get("SPARK_GRAFT_BENCH_COLD") and os.path.isdir(warm_dir)
    )

    timings: dict[str, float] = {}
    for name in sorted(queries):
        if do_warm and warm_dir != sf_dir:
            try:
                materialize(queries[name].fn(spark, warm_dir))
            except Exception as e:  # warm-SF-only failures must not mask
                print(f"BENCH WARMUP ERROR {name}: {e}", file=sys.stderr)
        try:
            repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
            runs = []
            for _ in range(max(1, repeats)):
                t0 = time.perf_counter()
                materialize(queries[name].fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
                if runs[0] >= 2.0:
                    break  # slow query: signal >> noise, single-shot
            runs.sort()
            timings[name] = round(runs[len(runs) // 2], 3)
        except Exception as e:  # a failing query must not hide the others
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # The driver captures only the LAST 2000 chars of stdout; a dict of
    # all ~109 queries is ~2.4k and gets its head truncated, leaving the
    # recorded line unparseable (BENCH_r01/r02 both hit this). So: the
    # full per-query map goes to BENCH_FULL.json (committed, mechanical
    # round-over-round deltas), and the stdout line carries the slowest
    # queries — every error (-1.0) first, then descending time — trimmed
    # to fit the capture window with slack for stray preceding output.
    # Only the canonical sf0.1 run owns BENCH_FULL.json — other SFs write
    # a suffixed file so an ad-hoc small-SF run can't clobber the
    # committed round-over-round baseline (it did once: sf1-sweep ratios
    # silently compared against sf0.01 times).
    default_full = (
        "BENCH_FULL.json" if sf == "0.1" else f"BENCH_FULL_sf{sf}.json"
    )
    with open(os.environ.get("SPARK_GRAFT_BENCH_FULL", default_full), "w") as f:
        json.dump(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    by_cost = sorted(timings, key=lambda n: (timings[n] >= 0, -timings[n]))
    head = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": sf_val,
        "n_queries": len(timings),
        "full": "BENCH_FULL.json",
    }
    for name in by_cost:
        head["queries"][name] = timings[name]
        if len(json.dumps(head, separators=(",", ":"))) > 1700:
            del head["queries"][name]
            break
    print(json.dumps(head, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
