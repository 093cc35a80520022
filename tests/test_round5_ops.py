"""Property tests for the round-5 closing additions: higher-order lambda
surface, Arrow-native grouped map, file-provenance metadata columns, and
the stream-stream left-outer join.

Each test states an algebraic invariant the oracle hash can't (the hash
says "equal to DuckDB", these say "equal to the math"), mirroring the
strategy of tests/test_new_op_properties.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_poc_spark.operators.scalar_fns import q_fn_lambda
from iceberg_poc_spark.operators.sources_q import q_meta_file_provenance
from iceberg_poc_spark.operators.udfs import q_udf_grouped_arrow
from iceberg_poc_spark.sources import load_table
from tests.conftest import SF_DIR, SF_DIR_MID


def test_lambda_fold_matches_python(spark):
    """The JVM-side fold (longest token, (length, lexicographic) order)
    must agree with a row-at-a-time Python fold — the same ground truth
    that exposed DuckDB 1.0's vectorized list_reduce bug."""
    rows = {r["doc_id"]: r for r in q_fn_lambda(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        words = d["text"].split(" ")
        best = ""
        for w in words:
            if len(w) > len(best) or (len(w) == len(best) and w < best):
                best = w
        r = rows[d["doc_id"]]
        assert r["longest"] == best
        assert r["total_chars"] == sum(len(w) for w in words)
        assert r["n_long"] == sum(1 for w in words if len(w) > 4)
        assert r["has_spark"] == ("spark" in words)
        assert r["all_nonempty"] == all(len(w) > 0 for w in words)


def test_grouped_arrow_ranks_are_permutations(spark):
    """Within every segment the Arrow-computed ranks must be exactly
    1..n, and rank order must agree with (acctbal, custkey) order."""
    out = q_udf_grouped_arrow(spark, SF_DIR).collect()
    by_seg: dict[str, list] = {}
    for r in out:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    src = {
        (r["c_custkey"]): (r["c_acctbal"], r["c_custkey"])
        for r in load_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    }
    for seg, rows in by_seg.items():
        ranks = sorted(r["bal_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), seg
        ordered = sorted(rows, key=lambda r: r["bal_rank"])
        keys = [src[r["c_custkey"]] for r in ordered]
        assert keys == sorted(keys), seg


def test_file_provenance_one_file_per_partition(spark):
    """The hash-repartitioned Hive write must produce exactly one file
    per priority and contiguous row_index 0..n-1 inside it."""
    out = {r["o_orderpriority"]: r for r in q_meta_file_provenance(spark, SF_DIR).collect()}
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(out) == set(counts)
    for pri, r in out.items():
        assert r["n_files"] == 1
        assert r["first_idx"] == 0
        assert r["last_idx"] == counts[pri] - 1
        assert r["n_rows"] == counts[pri]


def test_stream_outer_join_contains_inner_and_all_purchases(spark):
    """Outer result = inner result + null-padded unmatched purchases:
    (a) every (user, buy_time, view_time) of the batch inner join below
    the cutoff appears, (b) every purchase below the cutoff appears at
    least once, (c) null view_time rows are exactly the purchases with
    no qualifying view."""
    from iceberg_poc_spark.operators.sessionize import q_stream_live_outer

    out = q_stream_live_outer(spark, SF_DIR_MID).collect()
    ev = load_table(spark, SF_DIR_MID, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"), "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    inner = (
        buys.join(
            views,
            (buys.user_id == views.v_user)
            & (F.col("buy_ts") >= F.col("view_ts"))
            & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
            "inner",
        )
        .select(
            "user_id",
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
            F.date_format("buy_ts", "yyyy-MM-dd HH:mm:ss").alias("buy_time"),
        )
        .collect()
    )
    cutoff = (
        ev.agg(
            F.date_format(
                F.max("ts") - F.expr("INTERVAL 12 HOURS"), "yyyy-MM-dd HH:mm:ss"
            ).alias("c")
        ).first()["c"]
    )
    got = {(r["user_id"], r["view_time"], r["buy_time"]) for r in out}
    want_inner = {
        (r["user_id"], r["view_time"], r["buy_time"])
        for r in inner
        if r["buy_time"] <= cutoff
    }
    assert want_inner <= got
    matched_buys = {(u, b) for (u, v, b) in want_inner}
    all_buys = {
        (r["user_id"], r["buy_time"])
        for r in buys.select(
            "user_id", F.date_format("buy_ts", "yyyy-MM-dd HH:mm:ss").alias("buy_time")
        ).collect()
        if r["buy_time"] <= cutoff
    }
    null_rows = {(u, b) for (u, v, b) in got if v is None}
    assert null_rows == all_buys - matched_buys
    assert {(u, b) for (u, v, b) in got} == all_buys


def test_hll_merge_estimates_within_bound(spark):
    """Per-group and merged HLL estimates must sit within HLL++ error of
    the exact distinct counts, and the merged row must estimate the
    DISTINCT UNION (overlap collapses), not the sum of group counts."""
    from iceberg_poc_spark.operators.aggregates import q_agg_hll_merge

    out = {r["scope"]: r for r in q_agg_hll_merge(spark, SF_DIR_MID).collect()}
    orders = load_table(spark, SF_DIR_MID, "orders")
    exact = {
        r["o_orderpriority"]: r["d"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    assert set(out) == set(exact)
    # the query surface is closed-form: exact counts + bound booleans
    for scope, r in out.items():
        assert r["exact_custs"] == exact[scope], scope
        assert r["within_bound"] is True, scope
    # tighter 1-sigma check on the RAW estimates (the query emits only
    # the 10% boolean; the estimates themselves must sit within 5%)
    sk = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    ests = {
        r["o_orderpriority"]: r["e"]
        for r in sk.select(
            "o_orderpriority", F.hll_sketch_estimate("sk").alias("e")
        ).collect()
    }
    ests["ALL"] = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    for scope, est in ests.items():
        rel = abs(est - exact[scope]) / exact[scope]
        assert rel < 0.05, (scope, est, exact[scope])
    # overlap collapses: the merged estimate is far below the group sum
    group_sum = sum(v for k, v in exact.items() if k != "ALL")
    assert ests["ALL"] < 0.6 * group_sum
