#!/usr/bin/env python
"""Commit-metadata scaling bench (BENCH_META.json): measures the cost of
a MICRO-APPEND commit against tables whose inventories span three orders
of magnitude, plus the bytes the commit writes to _meta. The segmented
manifest design (manifest-list indirection, r9) makes both flat in table
size — this bench is the evidence the r8 verdict asked for ("a BENCH
entry showing commit cost flat vs file count").

Inventory setup fabricates manifest entries directly (the bench measures
METADATA commit cost; the data files behind the synthetic entries are
never opened), then times `_load_manifest + append-commit` end to end,
exactly the path every streaming micro-append pays.

Run from the repo root:  python tools/bench_meta.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _meta_bytes(mgr, name: str) -> int:
    total = 0
    for root, _d, ff in os.walk(mgr._meta_dir(name)):
        for f in ff:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_META.json"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from iceberg_poc_spark.tables.manager import ParquetTableManager

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bench-meta")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for n_files in (1_000, 10_000, 100_000):
        wh = tempfile.mkdtemp(prefix="bench_meta_")
        mgr = ParquetTableManager(spark, wh)
        df = spark.range(1).select(F.col("id").alias("k"))
        mgr.create_table("t", df.schema, [])
        seed = mgr.append("t", df)
        # fabricate an N-file inventory in ONE bulk commit (its own cost
        # is the O(table) initial segmentation every design pays once)
        m = mgr._load_manifest("t", seed)
        proto = m["files"][0]
        synthetic = [
            {
                **proto,
                "path": f"data/synth-{i:07d}.parquet",
                "stats": {"mn_k": i, "mx_k": i},
            }
            for i in range(n_files - 1)
        ]
        m["files"] = m["files"] + synthetic
        m["operation"] = "append"
        m["parent"] = m["version"]
        t0 = time.perf_counter()
        mgr._commit("t", m)
        bulk_sec = time.perf_counter() - t0

        # steady-state micro-appends: the number that must be FLAT in N
        # (segment cache is PROCESS-wide now — drop it to measure cold)
        ParquetTableManager._SEG_CACHES.clear()
        fresh = ParquetTableManager(spark, wh)  # cold segment cache
        bytes_before = _meta_bytes(fresh, "t")
        reps = 20
        t0 = time.perf_counter()
        for r in range(reps):
            fresh.append(
                "t",
                spark.range(r, r + 1).select(F.col("id").alias("k")),
            )
        micro_sec = (time.perf_counter() - t0) / reps
        bytes_per_commit = (_meta_bytes(fresh, "t") - bytes_before) / reps
        raw = fresh._manifest_raw("t", fresh._current_version("t"))
        # partition-scoped SCAN PLANNING cost (the read-side twin):
        # identity-partitioned synthetic inventory, point predicate —
        # segment summaries confine the per-entry pruning loop to the
        # matching segments, so this stays flat in table size too
        from iceberg_poc_spark.tables import identity

        wp = tempfile.mkdtemp(prefix="bench_meta_p_")
        mp = ParquetTableManager(spark, wp)
        pdf = spark.createDataFrame([(0, 0)], "k long, cell long")
        mp.create_table("tp", pdf.schema, [identity("cell")])
        seedp = mp.append("tp", pdf)
        man = mp._load_manifest("tp", seedp)
        protop = man["files"][0]
        n_cells = max(1, n_files // 1000)  # ~1000 files per partition
        # the probed partition's entries all point at the REAL seed file
        # (scan's DataFrame construction resolves paths eagerly); other
        # partitions keep synthetic paths — they are never planned
        # entries CLUSTERED by partition value (sorted by cell), the
        # layout real partition-co-located appends produce — each
        # segment then covers a narrow cell range and the [min,max]
        # summaries can prune whole spans; interleaved cells would make
        # every segment cover every cell and silently measure the
        # unpruned per-entry walk instead
        man["files"] = man["files"] + sorted(
            (
                {
                    **protop,
                    "path": protop["path"]
                    if i % n_cells == 0
                    else f"data/cell={i % n_cells}/synth-{i:07d}.parquet",
                    "partition": {"cell": str(i % n_cells)},
                    "stats": {"mn_k": i, "mx_k": i},
                }
                for i in range(n_files - 1)
            ),
            key=lambda e: int(e["partition"]["cell"]),
        )
        man["operation"] = "append"
        man["parent"] = man["version"]
        mp._commit("tp", man)
        ParquetTableManager._SEG_CACHES.clear()
        planner = ParquetTableManager(spark, wp)  # cold cache
        planner.scan("tp", where=[("cell", "==", 0)])  # warm the parse
        t0 = time.perf_counter()
        for _ in range(10):
            _df, planned, _tot = planner.scan("tp", where=[("cell", "==", 0)])
        scan_sec = (time.perf_counter() - t0) / 10

        # BROAD-scan planning, COLD (the r9 verdict lead item): an
        # unfiltered scan's plan must come from the columnar segments'
        # path columns at Arrow speed — never a per-entry JSON/dict
        # materialization in driver Python. Measured against a fresh
        # manager so no segment cache hides the I/O.
        ParquetTableManager._SEG_CACHES.clear()
        broad = ParquetTableManager(spark, wp)
        t0 = time.perf_counter()
        bplan = broad._plan_scan_fast("tp", None)
        broad_cold_sec = time.perf_counter() - t0
        assert bplan is not None and bplan[2] is not None, (
            "broad fast plan must engage on the clean synthetic table"
        )
        n_planned_broad = len(bplan[2][0])
        # the cost it replaces: cold full-entry materialization
        ParquetTableManager._SEG_CACHES.clear()
        mat = ParquetTableManager(spark, wp)
        t0 = time.perf_counter()
        mat._load_manifest("tp")
        materialize_cold_sec = time.perf_counter() - t0

        # DELETE attach planning (the write-side twin of the scan
        # probe, r10 verdict item): a partition-scoped MoR equality
        # delete and a predicate delete against the same inventory.
        # Segment-span pre-pruning confines the affected-split to the
        # matching segments, the ext-flag summary makes the basename
        # guard O(segments), and the commit rewrites only the touched
        # span — so attach cost must stay flat while the inventory
        # spans 100x. (Each timing includes the constant-cost 1-row
        # delete-file write job for the equality leg.)
        att = ParquetTableManager(spark, wp)
        kdf = spark.createDataFrame([(0,)], "cell long")
        t0 = time.perf_counter()
        att.delete("tp", equality=["cell"], keys=kdf, mode="mor")
        eqdel_attach_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        att.delete("tp", where=[("cell", "==", "0")], mode="mor")
        preddel_attach_sec = time.perf_counter() - t0

        # MAINTAINED partition statistics (r12): the summary-map fold
        # must stay metadata-cheap while the inventory spans 100x —
        # this is the read a catalog UI / CBO hits per metadata change.
        ParquetTableManager._SEG_CACHES.clear()
        pstat = ParquetTableManager(spark, wp)
        pstat.partition_stats("tp").collect()  # warm parse + session
        t0 = time.perf_counter()
        for _ in range(5):
            rows_ps = pstat.partition_stats("tp").collect()
        partition_stats_sec = (time.perf_counter() - t0) / 5

        # NDV stats serve vs fold (r12): fabricate per-file sketches by
        # replicating one REAL hll_sketch_agg blob across the synthetic
        # inventory, then time (a) the per-file fold — O(files) — and
        # (b) the maintained table-level blob — O(columns), must be
        # FLAT in file count.
        from iceberg_poc_spark.tables.manager import NDV_COLS_PROP

        wn = tempfile.mkdtemp(prefix="bench_meta_n_")
        mn = ParquetTableManager(spark, wn)
        ndf = spark.range(100).select(F.col("id").alias("k"))
        mn.create_table(
            "tn", ndf.schema, [], properties={NDV_COLS_PROP: "k"}
        )
        mn.append("tn", ndf)
        mseed = mn._load_manifest("tn")
        sk_b64 = mseed["files"][0]["ndv_sk"]["k"]
        proto_n = dict(mseed["files"][0])
        mseed["files"] = mseed["files"] + [
            {
                **proto_n,
                "path": f"data/nsynth-{i:07d}.parquet",
                "ndv_sk": {"k": sk_b64},
            }
            for i in range(n_files - 1)
        ]
        mseed["operation"] = "append"
        mseed["parent"] = mseed["version"]
        v_fold = mn._commit("tn", dict(mseed))  # blob popped: fold path
        mseed["parent"] = v_fold
        mseed["ndv_tbl"] = {"n": n_files, "cols": {"k": sk_b64}}
        v_blob = mn._commit("tn", mseed, keep_ndv=True)
        mn.ndv_estimates("tn", v_fold).collect()  # warm
        t0 = time.perf_counter()
        mn.ndv_estimates("tn", v_fold).collect()
        ndv_fold_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            mn.ndv_estimates("tn", v_blob).collect()
        ndv_serve_sec = (time.perf_counter() - t0) / 5

        results[str(n_files)] = {
            "bulk_commit_sec": round(bulk_sec, 3),
            "micro_append_sec": round(micro_sec, 4),
            "meta_bytes_per_commit": int(bytes_per_commit),
            "segments": len(raw.get("segments", [])),
            "inline_files_json_bytes": 0 if "files" not in raw else -1,
            "scan_point_plan_sec": round(scan_sec, 4),
            "scan_point_planned_files": planned,
            "broad_plan_cold_sec": round(broad_cold_sec, 4),
            "broad_plan_files": n_planned_broad,
            "materialize_cold_sec": round(materialize_cold_sec, 4),
            "eqdel_attach_sec": round(eqdel_attach_sec, 4),
            "preddel_attach_sec": round(preddel_attach_sec, 4),
            "partition_stats_sec": round(partition_stats_sec, 4),
            "partition_stats_rows": len(rows_ps),
            "ndv_fold_sec": round(ndv_fold_sec, 4),
            "ndv_serve_sec": round(ndv_serve_sec, 4),
        }
        print(f"n_files={n_files}: {results[str(n_files)]}", flush=True)
    lo = results["1000"]["micro_append_sec"]
    hi = results["100000"]["micro_append_sec"]
    blo = results["1000"]["broad_plan_cold_sec"]
    bhi = results["100000"]["broad_plan_cold_sec"]
    summary = {
        "metric": "micro_append_commit_flatness_100x_files",
        "value": round(hi / lo, 2) if lo else None,
        "unit": "x (1.0 = perfectly flat)",
        "broad_plan_cold_100x_ratio": round(bhi / blo, 2) if blo else None,
        "broad_plan_cold_sec_at_100k_files": bhi,
        "eqdel_attach_100x_ratio": round(
            results["100000"]["eqdel_attach_sec"]
            / results["1000"]["eqdel_attach_sec"],
            2,
        )
        if results["1000"]["eqdel_attach_sec"]
        else None,
        # tiny denominators make the preddel ratio noisy (tens of ms at
        # 1k files); the absolute 100k cost is the honest scale signal
        "preddel_attach_sec_at_100k_files": results["100000"][
            "preddel_attach_sec"
        ],
        "eqdel_attach_sec_at_100k_files": results["100000"][
            "eqdel_attach_sec"
        ],
        "partition_stats_100x_ratio": round(
            results["100000"]["partition_stats_sec"]
            / results["1000"]["partition_stats_sec"],
            2,
        )
        if results["1000"]["partition_stats_sec"]
        else None,
        "ndv_serve_100x_ratio": round(
            results["100000"]["ndv_serve_sec"]
            / results["1000"]["ndv_serve_sec"],
            2,
        )
        if results["1000"]["ndv_serve_sec"]
        else None,
        "ndv_fold_sec_at_100k_files": results["100000"]["ndv_fold_sec"],
        "preddel_attach_100x_ratio": round(
            results["100000"]["preddel_attach_sec"]
            / results["1000"]["preddel_attach_sec"],
            2,
        )
        if results["1000"]["preddel_attach_sec"]
        else None,
        "by_table_size": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
