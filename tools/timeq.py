#!/usr/bin/env python
"""Per-query measurement loop for optimization work: time one or more
registered queries (cold + warm runs, noop sink — bench.py methodology)
and optionally dump .explain("formatted") to a file. Run from the repo
root:

    python tools/timeq.py q_foo q_bar [--sf DIR] [--repeats N]
        [--explain-dir plans/r12] [--suffix before]

Prints one line per query: name, cold s, warm runs, warm median.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    argv = sys.argv[1:]

    def opt(name: str, default: str | None = None) -> str | None:
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    repeats = int(opt("--repeats", "3"))
    explain_dir = opt("--explain-dir")
    suffix = opt("--suffix", "now")
    names = argv
    if not names:
        print("usage: timeq.py q_name... [--sf DIR] [--repeats N]"
              " [--explain-dir DIR] [--suffix S]", file=sys.stderr)
        sys.exit(2)

    from iceberg_poc_spark.registry import load_all
    from iceberg_poc_spark.session import get_spark

    spark = get_spark(app_name="timeq")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same session warmers as bench.py
    materialize(queries["q_agg_q1"].fn(spark, sf_dir))

    def _ident(batches):
        yield from batches

    materialize(spark.range(32).repartition(32).mapInPandas(_ident, schema="id long"))

    for name in names:
        fn = queries[name].fn
        spark.sparkContext.setJobDescription(name)
        runs = []
        for _ in range(1 + repeats):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        warm = sorted(runs[1:])
        med = warm[len(warm) // 2]
        print(
            f"{name:40s} cold={runs[0]:7.3f} warm={med:7.3f} "
            f"runs={[round(r, 3) for r in runs[1:]]}",
            flush=True,
        )
        if explain_dir:
            from iceberg_poc_spark.plans.inspect import explain_str

            os.makedirs(explain_dir, exist_ok=True)
            plan = explain_str(fn(spark, sf_dir))
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
