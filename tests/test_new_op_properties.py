"""Semantic properties of the round-4 operators that the oracle
comparison can't express: probability calibration, sampling determinism,
and attribution-window boundary behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_poc_spark.registry import load_all
from tests.conftest import SF_DIR

Q = load_all()


def test_bigram_probabilities_sum_to_one(spark):
    """Before the count floor, P(w2|w1) over all w2 sums to 1 per w1 —
    the floor must not decalibrate the reported probabilities: each
    survivor's p times its w1 total reconstructs its count."""
    df = Q["q_text_bigram"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "bigram floor left nothing at test SF"
    # p was computed against the FULL denominator: n/p (within rounding
    # slack of the 4-dp p) must be constant per w1 and >= the survivor sum
    by_w1: dict = {}
    for r in rows:
        by_w1.setdefault(r["w1"], []).append(r)
    for w1, grp in by_w1.items():
        denoms = [r["n"] / r["p"] for r in grp]
        lo, hi = min(denoms), max(denoms)
        assert hi - lo <= 0.02 * hi, f"{w1}: inconsistent denominators"
        assert sum(r["n"] for r in grp) <= hi * 1.001, w1
        assert sum(r["p"] for r in grp) <= 1.001, w1


def test_reservoir_sample_is_partition_invariant(spark):
    """The sample is a pure function of the data: identical membership
    regardless of input partitioning."""
    from iceberg_poc_spark.operators.sampling import RESERVOIR_K

    base = Q["q_sample_reservoir"].fn(spark, SF_DIR)
    got = {(r["source"], r["doc_id"], r["pos"]) for r in base.collect()}
    # re-run over a deliberately re-partitioned view of the same table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("___res_docs")
    u = F.substring(
        F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")).cast("binary")),
        1,
        8,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(u, "doc_id")
    again = (
        docs.select("source", "doc_id", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= RESERVOIR_K)
    )
    assert {(r["source"], r["doc_id"], r["pos"]) for r in again.collect()} == got
    # every group is exactly min(K, group size)
    sizes = {r["source"]: r["cnt"] for r in base.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    totals = {
        r["source"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for src, n in sizes.items():
        assert n == min(RESERVOIR_K, totals[src]), src


def test_interval_join_window_boundaries(spark):
    """Synthetic boundary check: a purchase exactly at click+1h is
    attributed (closed upper bound), at click ts itself is not (open
    lower bound), and beyond 1h is not."""
    from iceberg_poc_spark.operators.joins import q_join_interval
    import iceberg_poc_spark.operators.joins as J

    rows = [
        (1, "2024-01-01 10:00:00", 100, "click", 0.0),
        (2, "2024-01-01 10:00:00", 100, "purchase", 5.0),   # same instant: NO
        (3, "2024-01-01 11:00:00", 100, "purchase", 7.0),   # exactly +1h: YES
        (4, "2024-01-01 11:00:01", 100, "purchase", 9.0),   # beyond: NO
        (5, "2024-01-01 10:30:00", 200, "purchase", 1.0),   # other user: NO
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v) for i, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    orig = J.load_table
    try:
        J.load_table = lambda _s, _d, _t: df
        out = q_join_interval(spark, "ignored").collect()
    finally:
        J.load_table = orig
    assert len(out) == 1
    r = out[0]
    assert (r["user_id"], r["click_id"], r["n_purchases"]) == (100, 1, 1)
    assert r["attributed_value"] == 7.0


def test_asof_nearest_is_min_of_both_directions(spark):
    """q_join_asof_nearest's gap is exactly min(backward gap, forward
    gap) per error event, with ties resolved to the backward match —
    checked against the two single-direction queries it composes."""
    back = {r["event_id"]: r["gap_us"] for r in Q["q_join_asof"].fn(spark, SF_DIR).collect()}
    fwd = {r["event_id"]: r["gap_us"] for r in Q["q_join_asof_fwd"].fn(spark, SF_DIR).collect()}
    near = Q["q_join_asof_nearest"].fn(spark, SF_DIR).collect()
    assert near
    for r in near:
        b, f = back.get(r["event_id"]), fwd.get(r["event_id"])
        # forward single-direction is INCLUSIVE (>=); nearest's forward leg
        # is strict, but an equal-ts match is then the backward leg with
        # gap 0, so the min is unaffected.
        candidates = [g for g in (b, f) if g is not None]
        if not candidates:
            assert r["gap_us"] is None
        else:
            assert r["gap_us"] == min(candidates), r


def test_temperature_rates_flatten_the_mixture(spark):
    """alpha=0.5 flattening: the most massive source gets exactly the
    base rate, rates increase as source mass decreases (monotone), and
    realized keep fractions track the declared rate."""
    from iceberg_poc_spark.operators.sampling import TEMP_RATE_BASE

    rows = Q["q_sample_temperature"].fn(spark, SF_DIR).collect()
    rates = [r["keep_rate"] for r in rows]
    assert min(rates) == TEMP_RATE_BASE  # the largest source, uncapped
    assert all(TEMP_RATE_BASE <= kr <= 1.0 for kr in rates)
    # monotone: recompute per-source char mass from the raw table and
    # assert keep_rate is nonincreasing in mass (strictly, below the cap)
    mass = {
        r["source"]: r["m"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("m"))
        .collect()
    }
    by_mass = sorted(rows, key=lambda r: mass[r["source"]], reverse=True)
    for a, b in zip(by_mass, by_mass[1:]):
        assert a["keep_rate"] <= b["keep_rate"], (a, b)
        if b["keep_rate"] < 1.0 and mass[a["source"]] > mass[b["source"]]:
            assert a["keep_rate"] < b["keep_rate"], (a, b)
    for r in rows:
        got = r["n_kept"] / r["n_docs"]
        # binomial 4-sigma tolerance
        import math
        tol = 4 * math.sqrt(r["keep_rate"] * (1 - r["keep_rate"]) / r["n_docs"]) + 1e-9
        assert abs(got - r["keep_rate"]) <= max(tol, 0.08), r


def test_weighted_sampling_monotone_in_length(spark):
    """Longer documents are kept at a higher realized rate: bucket docs
    by n_chars quartile and check kept-fraction is nondecreasing."""
    from iceberg_poc_spark.operators.sampling import W_SCALE, _u32_hex

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    u = _u32_hex(F.col("doc_id"), "wsamp")
    thresh = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(
                        F.least(F.lit(1.0), F.col("n_chars") / F.lit(W_SCALE))
                        * F.lit(4294967296.0)
                    ),
                    F.lit(4294967295.0),
                ).cast("bigint")
            )
        ),
        8,
        "0",
    )
    from pyspark.sql import Window

    got = (
        d.select(
            F.ntile(4).over(Window.orderBy("n_chars")).alias("q"),
            (u < thresh).cast("int").alias("kept"),
        )
        .groupBy("q")
        .agg(F.avg("kept").alias("rate"))
        .orderBy("q")
        .collect()
    )
    rates = [r["rate"] for r in got]
    assert all(b >= a - 0.05 for a, b in zip(rates, rates[1:])), rates


def test_hist_quantile_bound_holds_on_random_data():
    """The theorem under q_agg_hist_quantile: for ANY value multiset,
    the histogram's median bucket (smallest bucket whose cumulative
    count reaches floor((n+1)/2)) CONTAINS the lower median — so the
    bucket estimate is within one bucket width of it, always. (The
    query's within_bound column compares against the INTERPOLATED
    median, which for even n can sit inside an arbitrarily wide data
    gap between the two middle elements — hypothesis found
    vals=[0.0, 1.0] — so that flag is a data-dependent quality signal
    COMPUTED identically by both engines, not an invariant; this test
    pins the part that is one.) Hypothesis fuzzes distributions incl.
    heavy duplication and extreme skew."""
    import math

    import hypothesis.strategies as st
    from hypothesis import given, settings

    from iceberg_poc_spark.operators.aggregates import HISTQ_BUCKETS

    @settings(max_examples=300, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=400,
        )
    )
    def run(vals):
        mn, mx = min(vals), max(vals)
        w = (mx - mn) / HISTQ_BUCKETS
        if w == 0:  # all-equal column: bucket 0 holds everything
            return
        hist = [0] * HISTQ_BUCKETS
        for v in vals:
            hist[min(int(math.floor((v - mn) / w)), HISTQ_BUCKETS - 1)] += 1
        need = (len(vals) + 1) // 2
        cum = 0
        for b, c in enumerate(hist):
            cum += c
            if cum >= need:
                break
        s = sorted(vals)
        lower = s[(len(s) - 1) // 2]
        # float slack: bucket edges are computed, not exact
        eps = 1e-9 * max(abs(mn), abs(mx), 1.0)
        assert mn + b * w - eps <= lower <= mn + (b + 1) * w + eps, (
            b,
            lower,
            mn,
            w,
        )

    run()
