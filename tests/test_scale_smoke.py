"""10x scale-up smoke: run core plan shapes on a 6M-row self-unioned
corpus and check EXACT mathematical invariants of data duplication —
aggregate linearity, dedup-group invariance, join-multiplicity. These
catch the failure class small SFs can't: partition-count cliffs, skew
from replicated keys, agg/join state growth. (The duplicated corpus is a
derived stress input for these tests only; registered queries always read
the driver's parquet directly.)"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_poc_spark.sources import load_table

SF_BIG = "/root/testdata/sf0.1"
X = 10


def _times(df, n):
    out = df
    for _ in range(n - 1):
        out = out.unionByName(df)
    return out


def test_agg_linearity_at_10x(spark):
    """Counts scale exactly x10; integral-quantity sums scale exactly x10
    (order-independent: integer-valued doubles sum exactly)."""
    li = load_table(spark, SF_BIG, "lineitem")
    base = {
        (r[0], r[1]): (r[2], r[3])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sq"))
        .collect()
    }
    big = {
        (r[0], r[1]): (r[2], r[3])
        for r in _times(li, X)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sq"))
        .collect()
    }
    assert set(big) == set(base)
    for k, (n, sq) in base.items():
        assert big[k][0] == X * n
        assert big[k][1] == X * sq  # integral doubles: exact


def test_dedup_groups_invariant_at_10x(spark):
    """Duplicating every document x10 must not change WHICH documents
    survive keep-first dedup — only copy counts change. The replicated
    md5(text) shuffle keys are also the worst-case skew input for the
    window path."""
    docs = load_table(spark, SF_BIG, "documents")
    keeper = F.min("doc_id").over(
        Window.partitionBy(F.md5(F.col("text").cast("binary")))
    )
    kept_base = {
        r[0]
        for r in docs.withColumn("k", keeper)
        .filter(F.col("doc_id") == F.col("k"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    kept_big = {
        r[0]
        for r in _times(docs, X)
        .withColumn("k", keeper)
        .filter(F.col("doc_id") == F.col("k"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert kept_big == kept_base


def test_join_multiplicity_at_10x(spark):
    """lineitem x10 joined to orders (single copy) yields exactly x10 the
    matches per priority — the replicated-probe-side join shape."""
    li = load_table(spark, SF_BIG, "lineitem").select("l_orderkey")
    o = load_table(spark, SF_BIG, "orders").select("o_orderkey", "o_orderpriority")
    base = {
        r[0]: r[1]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    big = {
        r[0]: r[1]
        for r in _times(li, X)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert set(big) == set(base)
    for k, n in base.items():
        assert big[k] == X * n


def test_keep_first_pathological_hot_key(spark):
    """Worst-case dedup skew: ONE distinct text duplicated 600k times —
    every row shares a single md5 shuffle key. The salted two-phase min
    (operators/dedup.keep_first(salt_buckets=N)) must (a) produce the
    same single keeper, (b) bound any phase-1 task's share of the hot key
    to ~1/N of its rows (asserted on actual post-shuffle partition
    sizes), and (c) agree row-for-row with the single-window plan on a
    NORMAL mixed corpus."""
    from iceberg_poc_spark.operators.dedup import keep_first

    n_rows, n_salts = 600_000, 32
    hot = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page " * 20).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("crawl").alias("source"),
        F.lit(520).alias("n_chars"),
    )

    kept = keep_first(hot, salt_buckets=n_salts).collect()
    assert [(r.doc_id, r.lang) for r in kept] == [(0, "en")]

    # boundedness of the phase-1 window input: the hot key must split
    # into n_salts equal groups in KEY space...
    h = F.md5(F.col("text").cast("binary"))
    salt = F.pmod(F.col("doc_id"), F.lit(n_salts))
    group_sizes = [
        r["count"] for r in hot.groupBy(h, salt).count().collect()
    ]
    assert len(group_sizes) == n_salts
    assert max(group_sizes) == n_rows // n_salts
    # ...and in TASK space: real rows-per-partition after the (md5, salt)
    # shuffle, with enough partitions that hash-bin collisions between
    # salt groups stay small (the unsalted window puts all n_rows in ONE
    # task regardless of partition count)
    sizes = (
        hot.repartition(8 * n_salts, h, salt)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    max_part = max(r["count"] for r in sizes)
    assert max_part <= 4 * n_rows / n_salts, f"hot key not split: {max_part}"

    # phase-2 input is candidates only: exactly n_salts rows for the hot
    # key, independent of duplication depth
    cands = (
        hot.withColumn("lmin", F.min("doc_id").over(Window.partitionBy(h, salt)))
        .filter(F.col("doc_id") == F.col("lmin"))
        .count()
    )
    assert cands == n_salts

    # same survivors as the single-window registered plan on a normal mix
    docs = load_table(spark, SF_BIG, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    plain = {r.doc_id for r in keep_first(docs).collect()}
    salted = {r.doc_id for r in keep_first(docs, salt_buckets=8).collect()}
    assert salted == plain
