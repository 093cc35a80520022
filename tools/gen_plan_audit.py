#!/usr/bin/env python
"""Regenerate PLANS.md — a mechanical plan-quality audit of every
registered query: scans, exchanges, join strategies, windows, Python
stages, pushdown. Run from the repo root:

    python tools/gen_plan_audit.py > PLANS.md

The same counters back the global regression gate in
tests/test_plans.py::test_global_plan_hygiene.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from iceberg_poc_spark.plans import explain_str, single_partition_windows  # noqa: E402
from iceberg_poc_spark.registry import load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def audit(plan: str, spwin: int = 0) -> dict:
    n = lambda pat: len(re.findall(pat, plan))  # noqa: E731
    return {
        "scans": n(r"\(\d+\) Scan parquet"),
        "exchanges": n(r"\(\d+\) Exchange"),
        "bhj": n(r"\(\d+\) BroadcastHashJoin"),
        "bnlj": n(r"\(\d+\) BroadcastNestedLoopJoin"),
        "smj": n(r"\(\d+\) SortMergeJoin"),
        "shj": n(r"\(\d+\) ShuffledHashJoin"),
        "cartesian": n(r"\(\d+\) CartesianProduct"),
        "windows": n(r"\(\d+\) Window"),
        "single_part": ("SinglePartition" in plan),
        "spwin": spwin,
        "python": n(r"\(\d+\) (ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython|PythonMapInArrow)"),
        "row_udf": n(r"\(\d+\) BatchEvalPython"),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]+\]", plan)),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_poc_spark.session import tune_existing

    tune_existing(spark)

    qs = load_all()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name].fn(spark, SF_DIR)
            a = audit(explain_str(df), len(single_partition_windows(df)))
        except Exception as e:  # pragma: no cover - audit must not die
            rows.append((name, f"ERROR: {e}"))
            continue
        rows.append((name, a))

    print("# Plan audit")
    print()
    print(
        f"{len(rows)} registered queries, physical-plan shape at sf0.001 "
        "(plan shapes are SF-independent; AQE may coalesce at runtime). "
        "Columns: parquet scans / exchanges / joins by strategy "
        "(broadcast-hash, broadcast-NL, sort-merge, shuffled-hash, "
        "cartesian) / window nodes (sp = any SinglePartition exchange; spwin = windows FED by one — banned inventory-wide by test_global_plan_hygiene, must all be 0) / "
        "Arrow-Python stages (row-at-a-time Python would be `rowUDF`, "
        "banned). Regenerate: `python tools/gen_plan_audit.py > PLANS.md`."
    )
    print()
    print("| query | scans | exch | bhj | bnlj | smj | shj | cart | win | sp | spwin | py |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    for name, a in rows:
        if isinstance(a, str):
            print(f"| `{name}` | {a} |||||||||||")
            continue
        print(
            f"| `{name}` | {a['scans']} | {a['exchanges']} | {a['bhj']} "
            f"| {a['bnlj']} | {a['smj']} | {a['shj']} | {a['cartesian']} "
            f"| {a['windows']} | {'y' if a['single_part'] else ''} "
            f"| {a['spwin'] or ''} | {a['python']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
