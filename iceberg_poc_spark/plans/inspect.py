"""Physical-plan inspection helpers.

The optimizer work the reference does by hand (manifest pruning, projection
pushdown — SURVEY.md §4) is Catalyst's job here; these helpers make that
verifiable: tests assert that filters actually reach the parquet reader
(PushedFilters), scans read only projected columns (ReadSchema), small
dims broadcast, and no accidental cartesian products sneak in. This is the
feedback loop for 100 TB plan quality at local scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters clauses of every scan in the plan."""
    plan = explain_str(df)
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scans actually read (column pruning)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_shuffles(df: DataFrame) -> int:
    return explain_str(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def single_partition_windows(df: DataFrame) -> list[str]:
    """Window nodes whose feeding Exchange is SinglePartition — the
    global-sort bottleneck shape (every row through one task). Returns the
    offending tree lines; empty means every window is partitioned.

    Scalar aggregates legitimately plan a SinglePartition exchange (a
    handful of partial-agg rows); only *Window* consumers are flagged.
    """
    plan = explain_str(df)
    sp_ids = set(
        re.findall(r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", plan)
    )
    lines = plan.splitlines()
    offenders: list[str] = []
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow \(\d+\)", ln):
            continue
        # physical chain is Window <- Sort <- Exchange: check the next
        # two tree lines for the exchange feeding this window
        for nxt in lines[i + 1 : i + 3]:
            m = re.search(r"\bExchange \((\d+)\)", nxt)
            if m and m.group(1) in sp_ids:
                offenders.append(ln.strip())
    return offenders


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains a CartesianProduct:\n" + plan)
