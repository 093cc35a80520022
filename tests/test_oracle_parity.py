"""Differential correctness: every registered query vs its DuckDB oracle.

Replicates the driver's t2 gate locally (row count + column names + values,
order-insensitive) so CORRECTNESS_r{N}.json holds no surprises. Values are
compared exactly after canonicalization — floats must already be stabilized
in-query (rounding), which is the same bar the driver's value-hash sets.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from iceberg_poc_spark.registry import load_all
from iceberg_poc_spark.sources import TABLES, table_path
from tests.conftest import SF_DIR

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canon(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; normalize -0.0 and format compactly
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duck_con(SF_DIR)
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    s_cols, s_norm = normalize(srows, scols)
    d_cols, d_norm = normalize(drows, dcols)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema) > 0


def test_approx_count_distinct_error_bound(spark):
    """q_agg_approx is rows-only vs the oracle (HLL sketches are
    engine-specific) — bound its accuracy instead: HLL++ at default
    precision must land within 5% relative error of the exact distinct
    count per group."""
    got = {
        r.event_type: r.approx_users
        for r in QUERIES["q_agg_approx"].fn(spark, SF_DIR).collect()
    }
    from iceberg_poc_spark.sources import load_table
    from pyspark.sql import functions as F

    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, approx in got.items():
        assert abs(approx - exact[k]) / exact[k] <= 0.05, (k, approx, exact[k])
