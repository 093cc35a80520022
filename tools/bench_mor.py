#!/usr/bin/env python
"""MoR read-tax curve: quantify read amplification vs outstanding
equality-delete epochs on a FIXED table, so "when to compact/rewrite
deletes" is a measured threshold instead of folklore.

Protocol: one base table (events at $SPARK_GRAFT_SF_DIR, default sf0.01),
then stacked upsert_equality epochs (small per-user CDC batches, each ONE
commit = one equality-delete file attached to the stats-overlapping older
files). At epoch counts {0, 1, 10, 50, 100} the same full-read aggregate
is timed (median of 3). After 100 epochs, two remediations are timed and
the read re-measured:

- compact_deletes  (metadata-only: union each stack into one delete file
  per data file; zero data files moved)
- rewrite_deletes  (full materialization: dirty files rewritten clean)

Writes BENCH_MOR.json:
  {"read_sec": {"0": s, "1": s, ...,
                "100_compacted": s, "100_rewritten": s},
   "fix_sec": {"compact_deletes": s, "rewrite_deletes": s},
   "delete_files_attached_max": {"100": n, "100_compacted": n}, ...}

Run from the repo root:  python tools/bench_mor.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from iceberg_poc_spark.session import get_spark  # noqa: E402
from iceberg_poc_spark.sources import load_table  # noqa: E402
from iceberg_poc_spark.tables import ParquetTableManager  # noqa: E402

CHECKPOINTS = [0, 1, 10, 50, 100]
EPOCHS = max(CHECKPOINTS)


def _timed_read(mgr: ParquetTableManager, reps: int = 3) -> float:
    """Median-of-N of the canonical read aggregate (count + sum + max):
    forces the full post-delete row stream without collecting rows."""
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        mgr.read("mor_bench").agg(
            F.count("*"), F.sum("value"), F.max("ts")
        ).collect()
        times.append(time.monotonic() - t0)
    return sorted(times)[len(times) // 2]


def _max_stack(mgr: ParquetTableManager) -> int:
    m = mgr._load_manifest("mor_bench")
    return max(len(e.get("eq_deletes", [])) for e in m["files"])


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_MOR.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark()
    wh = tempfile.mkdtemp(prefix="morbench_")
    mgr = ParquetTableManager(spark, wh)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    )
    mgr.create_table("mor_bench", ev.schema, [])
    mgr.append("mor_bench", ev)

    # CDC epoch source: rotate through user buckets so every epoch's
    # delete keys overlap the base files (the worst, realistic case:
    # stats-based attachment cannot prune the hot files)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    users = [r[0] for r in ev.select("user_id").distinct().collect()]
    users.sort()
    per_epoch = max(1, len(users) // 20)

    read_sec: dict[str, float] = {}
    stacks: dict[str, int] = {}
    done = 0
    for target in CHECKPOINTS:
        for i in range(done, target):
            lo = (i * per_epoch) % len(users)
            batch_users = users[lo:lo + per_epoch] or users[:per_epoch]
            batch = (
                ev.filter(F.col("user_id").isin(batch_users))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
                .withColumn("value", F.col("value") + F.lit(float(i + 1)))
            )
            mgr.upsert_equality("mor_bench", batch, ["user_id"])
        done = target
        read_sec[str(target)] = round(_timed_read(mgr), 4)
        stacks[str(target)] = _max_stack(mgr)
        print(
            f"epochs={target} read={read_sec[str(target)]}s "
            f"max_stack={stacks[str(target)]}",
            flush=True,
        )

    fix_sec: dict[str, float] = {}
    t0 = time.monotonic()
    mgr.compact_deletes("mor_bench")
    fix_sec["compact_deletes"] = round(time.monotonic() - t0, 4)
    read_sec["100_compacted"] = round(_timed_read(mgr), 4)
    stacks["100_compacted"] = _max_stack(mgr)
    print(
        f"compacted in {fix_sec['compact_deletes']}s "
        f"read={read_sec['100_compacted']}s "
        f"max_stack={stacks['100_compacted']}",
        flush=True,
    )
    t0 = time.monotonic()
    mgr.rewrite_deletes("mor_bench")
    fix_sec["rewrite_deletes"] = round(time.monotonic() - t0, 4)
    read_sec["100_rewritten"] = round(_timed_read(mgr), 4)
    print(
        f"rewritten in {fix_sec['rewrite_deletes']}s "
        f"read={read_sec['100_rewritten']}s",
        flush=True,
    )

    # ---- positional-delete curve (the third delete class): N epochs
    # of coordinate deletes over a fresh copy of the base, read tax at
    # the same checkpoints, then the GLOBAL fold (compact_deletes ->
    # one coordinate anti-join) and the full rewrite
    mgr.create_table("mor_pos", ev.schema, [])
    mgr.append("mor_pos", ev.repartition(8))
    n_rows = ev.count()
    pos_read: dict[str, float] = {}
    pos_fix: dict[str, float] = {}

    def _timed_pos_read(reps: int = 3) -> float:
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            mgr.read("mor_pos").agg(
                F.count("*"), F.sum("value"), F.max("ts")
            ).collect()
            times.append(time.monotonic() - t0)
        return sorted(times)[len(times) // 2]

    done = 0
    for target in CHECKPOINTS:
        for i in range(done, target):
            # each epoch retires a thin, distinct row slice by COORDINATE
            coords = (
                mgr.read_with_positions("mor_pos")
                .filter(
                    (F.col("value").cast("long") % (2 * EPOCHS)) == i
                )
                .select("_file_name", "_pos")
            )
            mgr.delete_positions("mor_pos", coords)
        done = target
        pos_read[str(target)] = round(_timed_pos_read(), 4)
        print(
            f"pos epochs={target} read={pos_read[str(target)]}s",
            flush=True,
        )
    t0 = time.monotonic()
    mgr.compact_deletes("mor_pos")
    pos_fix["compact_deletes"] = round(time.monotonic() - t0, 4)
    pos_read["100_compacted"] = round(_timed_pos_read(), 4)
    m = mgr._load_manifest("mor_pos")
    assert len(m.get("global_pos_deletes", [])) == 1
    print(
        f"pos compacted in {pos_fix['compact_deletes']}s "
        f"read={pos_read['100_compacted']}s",
        flush=True,
    )
    t0 = time.monotonic()
    mgr.rewrite_deletes("mor_pos")
    pos_fix["rewrite_deletes"] = round(time.monotonic() - t0, 4)
    pos_read["100_rewritten"] = round(_timed_pos_read(), 4)
    print(
        f"pos rewritten in {pos_fix['rewrite_deletes']}s "
        f"read={pos_read['100_rewritten']}s",
        flush=True,
    )

    result = {
        "sf_dir": sf_dir,
        "epochs": CHECKPOINTS,
        "read_sec": read_sec,
        "fix_sec": fix_sec,
        "delete_files_attached_max": stacks,
        "pos_read_sec": pos_read,
        "pos_fix_sec": pos_fix,
        "pos_rows": n_rows,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    shutil.rmtree(wh, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
