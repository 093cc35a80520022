"""Cross-PROCESS optimistic-concurrency gate (≙ Iceberg's concurrent
committer contract): N OS processes commit to ONE table through the CAS
head-pointer protocol with no coordination beyond the filesystem. The
in-process crash-injection suites (test_table_manager) prove atomicity;
this file proves the commit loop against REAL process interleaving —
no lost commit, one linear snapshot ancestry containing every commit,
and observable cross-process rebases."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from iceberg_poc_spark.tables.manager import ParquetTableManager

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, random, sys, time
sys.path.insert(0, {repo!r})
import pyarrow as pa
import pyarrow.parquet as pq
from iceberg_poc_spark.tables.manager import ParquetTableManager

wh, wid, start_flag, n_commits = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
)
mgr = ParquetTableManager(None, wh)
random.seed(wid)
while not os.path.exists(start_flag):  # barrier: maximize interleaving
    time.sleep(0.005)
versions = []
for i in range(n_commits):
    p = os.path.join(wh, f"ext_{{wid}}_{{i}}.parquet")
    pq.write_table(
        pa.table({{"k": [wid * 1000 + i], "v": [float(i)]}}), p
    )
    versions.append(mgr.add_files("t", [p]))
    time.sleep(random.random() * 0.01)
print(",".join(map(str, versions)))
"""


@pytest.mark.parametrize("n_workers,n_commits", [(3, 8)])
def test_cross_process_committers_lose_nothing(
    spark, tmp_path, n_workers, n_commits
):
    wh = str(tmp_path / "warehouse")
    mgr = ParquetTableManager(spark, wh)
    df = spark.createDataFrame([], "k long, v double")
    mgr.create_table("t", df.schema, [])
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    start_flag = str(tmp_path / "go")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), wh, str(w), start_flag,
             str(n_commits)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_workers)
    ]
    open(start_flag, "w").close()
    owner: dict[int, int] = {}  # version -> worker
    for w, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        for v in map(int, out.strip().split(",")):
            assert v not in owner, f"version {v} claimed twice"
            owner[v] = w
    assert len(owner) == n_workers * n_commits

    # ONE linear ancestry containing EVERY commit (no lost update, no
    # fork): walk parent links from head down to the create snapshot
    head = mgr._current_version("t")
    chain = []
    v = head
    while v is not None:
        m = mgr._manifest_raw("t", v)
        chain.append(v)
        v = m.get("parent")
    committed = [v for v in chain if v in owner]
    assert sorted(committed) == sorted(owner), (
        "ancestry lost commits: "
        f"{sorted(set(owner) - set(committed))}"
    )
    # every registered file is live exactly once
    m = mgr._load_manifest("t")
    paths = [e["path"] for e in m["files"]]
    assert len(paths) == len(set(paths)) == n_workers * n_commits
    assert mgr.read("t").count() == n_workers * n_commits

    # rebases actually happened: some commit's ancestry-predecessor
    # belongs to a DIFFERENT worker (with the start barrier, fully
    # serialized workers are a scheduling fluke — treat as failure so
    # a silently-serializing commit path can't fake a pass)
    order = list(reversed(chain))  # oldest -> newest
    transitions = sum(
        1
        for a, b in zip(order, order[1:])
        if a in owner and b in owner and owner[a] != owner[b]
    )
    assert transitions >= 1, "no cross-process interleaving observed"


UPSERT_WORKER = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from iceberg_poc_spark.tables.manager import ParquetTableManager

wh, wid, start_flag, n_epochs = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
)
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
mgr = ParquetTableManager(spark, wh)
while not os.path.exists(start_flag):
    time.sleep(0.005)
versions = []
for epoch in range(n_epochs):
    batch = spark.range(wid * 100, wid * 100 + 20).select(
        F.col("id").alias("k"),
        (F.lit(wid * 1_000_000 + epoch)).alias("v"),
    )
    versions.append(mgr.upsert_equality("t", batch, keys=["k"]))
print(",".join(map(str, versions)))
"""


def test_cross_process_upsert_epochs_converge(spark, tmp_path):
    """Two OS processes (each its own JVM) drive MoR upsert epochs into
    one table concurrently: every worker repeatedly rewrites ITS OWN 20
    keys. The CAS+rebase protocol must keep one linear ancestry holding
    all 2x3 epochs, and the final read must show each key carrying its
    worker's LAST epoch value — a rebase that dropped an equality-delete
    binding or re-ordered epochs within a worker would surface stale or
    duplicate rows."""
    wh = str(tmp_path / "warehouse")
    mgr = ParquetTableManager(spark, wh)
    df = spark.createDataFrame([], "k long, v long")
    mgr.create_table("t", df.schema, [])
    script = tmp_path / "upsert_worker.py"
    script.write_text(UPSERT_WORKER.format(repo=REPO))
    start_flag = str(tmp_path / "go")
    n_epochs = 3
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), wh, str(w), start_flag,
             str(n_epochs)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(2)
    ]
    open(start_flag, "w").close()
    owner: dict[int, int] = {}
    for w, p in enumerate(procs):
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, err[-2000:]
        vs = list(map(int, out.strip().splitlines()[-1].split(",")))
        assert vs == sorted(vs), f"worker {w} epochs out of order: {vs}"
        for v in vs:
            owner[v] = w
    assert len(owner) == 2 * n_epochs
    chain = []
    v = mgr._current_version("t")
    while v is not None:
        chain.append(v)
        v = mgr._manifest_raw("t", v).get("parent")
    assert sorted(x for x in chain if x in owner) == sorted(owner)
    rows = {r.k: r.v for r in mgr.read("t").collect()}
    want = {w * 100 + i: w * 1_000_000 + (n_epochs - 1)
            for w in range(2) for i in range(20)}
    assert rows == want
