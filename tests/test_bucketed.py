"""Bucketed co-located join: same key + same bucket count on both sides
must plan a SortMergeJoin with ZERO Exchange — the write-once/join-free
pattern for repeated fact⋈fact joins at scale."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from iceberg_poc_spark.plans import explain_str
from iceberg_poc_spark.sources import load_table
from iceberg_poc_spark.sources.bucketed import bucketed_join, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture
def bucketed_tables(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    db = "bktdb"
    t1 = write_bucketed(li, "li_b", "l_orderkey", 8, db, str(tmp_path / "wh"))
    t2 = write_bucketed(o, "o_b", "l_orderkey", 8, db, str(tmp_path / "wh"))
    yield t1, t2
    spark.sql(f"DROP TABLE IF EXISTS {t1}")
    spark.sql(f"DROP TABLE IF EXISTS {t2}")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # keep the broadcast path out of the way: we want the SMJ proof
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, t1, t2, "l_orderkey")
        plan = explain_str(df)
        assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        # correctness: same result as the plain join
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert df.count() == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
