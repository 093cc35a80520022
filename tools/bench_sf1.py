#!/usr/bin/env python
"""Synthetic-sf1 headline sweep: materialize a RE-KEYED 10x copy of the
sf0.1 corpus (not a plain union — fact-table primary keys are offset per
replica so join fan-out, group cardinalities, and duplicate multiplicity
all scale the way real growth scales them), then time the most expensive
headline queries on it and record BENCH_sf1.json.

Re-keying scheme (replica r in 0..9, replica 0 = identity so anchored
constants like QUERY_VEC_ID=0 stay valid):
- orders.o_orderkey / lineitem.l_orderkey: +r*1e9 (consistent, so the
  order-lineitem join multiplicity is preserved per replica)
- events.event_id: +r*1e9 (user_id kept: 10x events per user)
- documents.doc_id: +r*1e8, text KEPT (10x duplicate multiplicity — the
  crawl-duplication stress dedup exists for)
- embeddings.vec_id: +r*1e8
- dimensions (region nation customer supplier part) stay 1x: facts grow
  faster than dims, so per-customer/per-part fan-in grows 10x.

Run from the repo root:  python tools/bench_sf1.py [out_json]
Corpus dir override: SPARK_GRAFT_SF1_DIR (default: a fresh temp dir).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from iceberg_poc_spark.registry import load_all  # noqa: E402
from iceberg_poc_spark.session import get_spark  # noqa: E402
from iceberg_poc_spark.sources import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
# replication factor: 10 = synthetic sf1 (the per-round default); set
# SPARK_GRAFT_SCALE_X=100 for a synthetic-sf10 probe (~60M lineitem rows,
# TPC-H sf10 scale) of a focused query set
X = int(os.environ.get("SPARK_GRAFT_SCALE_X", "10"))
FACT_KEYS = {
    "orders": [("o_orderkey", 1_000_000_000)],
    "lineitem": [("l_orderkey", 1_000_000_000)],
    "events": [("event_id", 1_000_000_000)],
    "documents": [("doc_id", 100_000_000)],
    "embeddings": [("vec_id", 100_000_000)],
}
DIMS = ("region", "nation", "customer", "supplier", "part")

# fallback headline set (r4/r5 sf0.1 top queries); when a committed
# BENCH_FULL.json exists the sweep instead takes the CURRENT 12 most
# expensive queries from it, so newly-added heavy operators (live
# streaming, table maintenance) get scale-trended automatically
HEADLINE = [
    "q_dedup_clusters",
    "q_dedup_hops",
    "q_fn_nested",
    "q_join_salted",
    "q_stream_live_tumbling",
    "q_tpch_q2",
    "q_join_bucketed",
    "q_tpch_q21",
    "q_compaction",
    "q_decontaminate",
]
N_HEADLINE = 12


# at the 100x probe the quadratic-OUTPUT ops are excluded by design: a
# text duplicated 100x legitimately yields C(100,2) near-dup pairs per
# distinct text (~25M result rows) — correct, but it measures result
# materialization, not engine scaling; the linear-output ops below cover
# every plan family (scan-agg, join, window, dedup-groupBy, dedup-window,
# vector scan, streaming drain)
X100_SET = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q9",
    "q_tpch_q21",
    "q_dedup_exact",
    "q_dedup_keep_first",
    "q_dedup_keep_first_salted",
    "q_win_running_sum",
    "q_topk_per_group",
    "q_sim_topk",
    "q_sim_ann_incremental",
    "q_sim_ann_delete",
    "q_sim_ann_reanchor",
    "q_sim_ann_pq",
    "q_sim_ann_ivfpq",
    "q_stream_live_tumbling",
]


# always scale-trended regardless of current cost ranking: the ANN probe
# paths (10x recall behavior asserted in tests/test_ann_recall.py) and
# the incremental-ingest dedup pair, whose zero-corpus-rescan property
# is exactly what 10x growth must not erode
ALWAYS = [
    "q_sim_ann_multiprobe",
    "q_sim_ann_mass_budget",
    "q_sim_ann_incremental",
    "q_sim_ann_delete",
    "q_sim_ann_reanchor",
    "q_dedup_incremental",
    "q_dedup_near_incremental",
    "q_dedup_clusters_incremental",
    "q_stream_upsert_table",
    "q_stream_wap_publish",
    "q_cdc_branch_diff",
    "q_sim_ann_pq",
    "q_sim_ann_ivfpq",
    "q_sim_ann_pq_incremental",
    "q_vocab_incremental",
    "q_agg_hist_quantile",
    "q_add_files",
    "q_add_files_hive",
    "q_stream_ann_ingest",
    "q_text_bpe_merge",
    "q_text_bpe_train",
    "q_text_bpe_encode",
    "q_dedup_substring",
    "q_dedup_substring_apply",
    "q_merge_sync",
    "q_meta_partitions",
    "q_meta_snapshots",
    "q_sim_knn_join_grid",
    "q_delete_mor_eq",
    "q_text_perplexity",
    "q_meta_profile_ndv",
    "q_meta_partition_stats",
    "q_analyze_ndv",
    "q_ts_continuous_agg",
]


def headline_set() -> list[str]:
    env = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    if env:
        return env.split(",")
    if X >= 100:
        return X100_SET
    if os.path.exists("BENCH_FULL.json"):
        q = json.load(open("BENCH_FULL.json"))["queries"]
        top = sorted((n for n in q if q[n] >= 0), key=lambda n: -q[n])[
            :N_HEADLINE
        ]
        return top + [n for n in ALWAYS if n not in top]
    return HEADLINE + ALWAYS


def build_corpus(spark, dst: str) -> None:
    for t in DIMS:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
    # replicate map-side via a broadcast replica-id cross join (a UNION
    # chain X deep doesn't survive X=100), offsetting each replica's keys
    reps = F.broadcast(
        spark.range(X).select(F.col("id").alias("__replica"))
    )
    for t, keys in FACT_KEYS.items():
        df = load_table(spark, SRC, t).crossJoin(reps)
        for col, off in keys:
            df = df.withColumn(col, F.col(col) + F.col("__replica") * off)
        # realistic file layout: the broadcast-replicate join inherits the
        # source's (often single) partition, and a one-file fact table
        # would serialize every downstream scan — a corpus artifact, not
        # an engine property (exposed: q_fn_nested read 10x data on ONE
        # task). Real tables at this size are many files.
        df.drop("__replica").repartition(32).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )


def main() -> None:
    default_out = "BENCH_sf1.json" if X == 10 else f"BENCH_x{X}.json"
    out_json = sys.argv[1] if len(sys.argv) > 1 else default_out
    spark = get_spark(app_name="iceberg-poc-spark-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    dst = os.environ.get("SPARK_GRAFT_SF1_DIR")
    cleanup = False
    if not dst:
        dst = tempfile.mkdtemp(prefix="sf1_corpus_")
        cleanup = True
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        t0 = time.perf_counter()
        build_corpus(spark, dst)
        print(f"corpus built in {time.perf_counter() - t0:.1f}s at {dst}",
              file=sys.stderr)

    queries = load_all()
    ref = {}
    if os.path.exists("BENCH_FULL.json"):
        ref = json.load(open("BENCH_FULL.json"))["queries"]

    timings: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in headline_set():
        try:
            # warm the plan shape at sf0.1 (same methodology as bench.py)
            queries[name].fn(spark, SRC).write.format("noop").mode(
                "overwrite"
            ).save()
            # cold run pays the one-time setup at 10x (table/index
            # construction), the timed value is the WARM steady state —
            # the same v2 accounting as the sf0.1 record the ratio
            # divides by; mixing a setup-laden probe over a warm
            # baseline read as a fake 18x "cliff" on q_delete_mor_eq
            queries[name].fn(spark, dst).write.format("noop").mode(
                "overwrite"
            ).save()
            t0 = time.perf_counter()
            queries[name].fn(spark, dst).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
            if ref.get(name, 0) > 0:
                ratios[name] = round(timings[name] / ref[name], 2)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"BENCH_SF1 ERROR {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    doc = {
        "metric": f"headline_query_seconds_x{X}_synthetic",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "x_vs_sf01": ratios,
        "sf": f"{X / 10:g}-synthetic-rekeyed-{X}x",
        "note": f"{X}x re-keyed sf0.1; ratio vs the committed sf0.1 full "
        f"bench — linear-ish (<={X}x) per query means no scaling cliff",
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc, separators=(",", ":")))
    if cleanup:
        shutil.rmtree(dst, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
