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


def canon_type(v):
    """Canonical type category for cross-engine type parity.

    The driver's value-hash is TYPE-sensitive: DuckDB HUGEINT/DECIMAL
    surface as ``decimal.Decimal`` (Arrow decimal128) while Spark bigint
    is plain ``int`` (Arrow int64), and that alone hash-mismatches even
    when every value is equal (VERDICT r1: q_agg_bool, q_tpch_q12,
    q_pipeline_corpus_prep, q_decontaminate). Decimal is therefore its
    own category, NOT folded into int/float.
    """
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "list"
    if isinstance(v, (bytes, bytearray)):
        return "binary"
    return type(v).__name__


def column_types(rows, cols):
    """Per-column set of non-null canonical type categories, keyed by
    column name (duplicate-named columns are merged — same as sorting)."""
    out = {c: set() for c in cols}
    for r in rows:
        for i, c in enumerate(cols):
            t = canon_type(r[i])
            if t is not None:
                out[c].add(t)
    return out


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
    # fetch via Arrow, not fetchall(): fetchall() flattens HUGEINT to
    # plain int, but the driver hashes Arrow-level values where HUGEINT
    # is decimal128(38,0) — Arrow is the only path that sees the driver's
    # type-sensitive view
    atab = con.execute(q.oracle).arrow()
    dcols = list(atab.schema.names)
    drows = [tuple(row[c] for c in dcols) for row in atab.to_pylist()]

    s_cols, s_norm = normalize(srows, scols)
    d_cols, d_norm = normalize(drows, dcols)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    s_types = column_types(srows, scols)
    d_types = column_types(drows, dcols)
    type_mismatch = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if s_types[c] and d_types[c] and s_types[c] != d_types[c]
    }
    assert not type_mismatch, (
        f"{name}: driver-hash-breaking type mismatch (spark vs oracle): "
        f"{type_mismatch} — CAST the oracle column (e.g. AS BIGINT)"
    )
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_every_registered_query_carries_an_oracle():
    """As of round 8 the rows-only bucket is EMPTY: the two approximate
    queries emit closed-form surfaces (exact counts + error-bound
    booleans) instead of raw estimates, so every registered query is
    value-hash-gated against DuckDB. A new rows-only query is a
    deliberate decision — make it fail here first."""
    assert ROWS_ONLY == [], (
        f"queries registered without an oracle: {ROWS_ONLY}"
    )


def test_approx_count_distinct_error_bound(spark):
    """q_agg_approx now emits a closed-form surface (exact counts + a
    15% within_bound boolean the oracle states as TRUE); this test keeps
    the TIGHTER 1-sigma check on the raw estimator: HLL++ at rsd=0.05
    must land within 5% relative error of the exact distinct count per
    group — plus the query surface booleans must all hold."""
    from iceberg_poc_spark.sources import load_table
    from pyspark.sql import functions as F

    out = {
        r.event_type: r
        for r in QUERIES["q_agg_approx"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, r in out.items():
        assert r.exact_users == exact[k], k
        assert r.within_bound is True, k
    got = {
        r.event_type: r.approx
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.05).alias("approx"))
        .collect()
    }
    for k, approx in got.items():
        assert abs(approx - exact[k]) / exact[k] <= 0.05, (k, approx, exact[k])


def test_embed_quantize_error_bound(spark):
    """int8 quantization invariant: with scale = max|x|/127 and round-half
    -up codes, every dequantization error is <= scale/2 and every code
    fits in [-127, 127]."""
    from pyspark.sql import functions as F

    df = QUERIES["q_embed_quantize"].fn(spark, SF_DIR)
    bad = df.filter(
        (F.col("max_abs_err") > F.col("scale") / 2 * 127 / 126)  # slack: 1 rounding step
        | F.col("scale").isNull()
    ).count()
    assert bad == 0
