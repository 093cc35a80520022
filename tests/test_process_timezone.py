"""Process-timezone gate (r12): the driver/judge run sweeps with BOTH a
non-UTC session timezone AND a non-UTC PROCESS timezone
(TZ=America/New_York). Python<->JVM datetime conversion uses the
PROCESS zone while SQL string literals parse through the SESSION zone,
so any operator that round-trips timestamps through the driver (a
collect() re-used as a literal or serialized into a bound) silently
shifts by the zone offset under TZ only — invisible to every UTC-process
test. This file pins a representative time-touching query set against
DuckDB inside a TZ=America/New_York SUBPROCESS, so the bug class the
r12 continuous aggregate shipped with can never land again."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q_ts_continuous_agg",   # the r12 regression: collected hour buckets
    "q_stream_tumbling_batch",  # F.window bucketing
    "q_ts_gapfill",          # per-user hour spine + LOCF
    "q_fn_date",             # scalar date/time surface
    "q_time_travel",         # table-layer snapshot resolution
]

CHECK = """
import os, sys
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
import duckdb
q, o = E.queries(), E.oracle_sql()
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(
        "CREATE VIEW " + t + " AS SELECT * FROM read_parquet('"
        + sf + "/" + t + ".parquet')"
    )
failed = []
for name in {queries!r}:
    sdf = q[name](spark, sf)
    s = sorted(tuple(map(str, r)) for r in sdf.collect())
    atab = con.execute(o[name]).arrow()
    d = sorted(tuple(str(row[c]) for c in sdf.columns)
               for row in atab.to_pylist())
    if s != d:
        ss, dd = set(s), set(d)
        failed.append((name, sorted(ss - dd)[:2], sorted(dd - ss)[:2]))
print("FAILED:" + repr(failed) if failed else "ALL_OK")
"""


def test_time_queries_survive_nonutc_process_timezone(tmp_path):
    script = tmp_path / "tzcheck.py"
    script.write_text(CHECK.format(repo=REPO, queries=QUERIES))
    env = dict(os.environ, TZ="America/New_York")
    res = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ALL_OK" in res.stdout, res.stdout[-2000:]
