"""Bulk-ingest + AWS-config suites.

Ingest ≙ the reference's loader family (SURVEY.md §3.2): load-or-create
from inferred schema, prefix column drops, derived columns, single atomic
commit for a whole multi-file load. AWS config ≙ the reference's
config-sniffing tests (``aig/ConfigurationTest.java``) — dict contents
only, no AWS."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iceberg_poc_spark.sources.aws import TenantKMSRouter, glue_catalog_conf, s3_conf
from iceberg_poc_spark.sources.ingest import bulk_load, infer_schema, prepare
from iceberg_poc_spark.tables import ParquetTableManager, days, identity


def _write_src(spark, path, n=200, parts=4):
    start = dt.datetime(2024, 1, 1)
    df = spark.range(n).select(
        F.col("id").alias("event_ts"),  # reference drops this prefix
        (F.col("id") % 7).alias("ty"),
        (F.lit(start) + F.make_interval(hours=F.col("id") % 96)).alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )
    df.repartition(parts).write.parquet(path)
    return df


def test_bulk_load_single_atomic_snapshot(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src, parts=4)
    mgr = ParquetTableManager(spark, str(tmp_path / "wh"))
    v = bulk_load(mgr, "t", src, partition_by=[identity("ty"), days("ts")])
    # many source files, ONE append snapshot after the create
    assert [s.operation for s in mgr.snapshots("t").collect()] == [
        "create",
        "append",
    ]
    assert v == mgr.snapshots("t").agg(F.max("snapshot_id")).collect()[0][0]
    assert mgr.read("t").count() == 200


def test_prepare_drops_prefix_and_derives(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src)
    raw = spark.read.parquet(src)
    out = prepare(
        raw,
        drop_prefixes=("event_",),
        derive={"year": F.year("ts")},
    )
    assert "event_ts" not in out.columns
    assert "year" in out.columns
    assert out.select("year").distinct().collect()[0][0] == 2024


def test_infer_schema_matches_read(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src)
    assert infer_schema(spark, src) == spark.read.parquet(src).schema


def test_bulk_load_into_existing_table_appends(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src)
    mgr = ParquetTableManager(spark, str(tmp_path / "wh"))
    bulk_load(mgr, "t", src)
    bulk_load(mgr, "t", src)
    assert mgr.read("t").count() == 400
    assert len(mgr.snapshots("t").collect()) == 3  # create + 2 appends


def test_glue_catalog_conf_keys():
    c = glue_catalog_conf("lake", "s3://b/wh", "eu-west-1")
    assert c["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.lake.catalog-impl"].endswith("GlueCatalog")
    assert c["spark.sql.catalog.lake.warehouse"] == "s3://b/wh"
    assert c["spark.sql.catalog.lake.client.region"] == "eu-west-1"


def test_s3_conf_maps_both_schemes():
    c = s3_conf()
    assert c["spark.hadoop.fs.s3.impl"] == c["spark.hadoop.fs.s3a.impl"]
    assert "S3AFileSystem" in c["spark.hadoop.fs.s3.impl"]


def test_tenant_kms_routing():
    r = TenantKMSRouter({"t1": "alias/t1-key"}, default_alias="alias/dflt")
    assert r.fileio_properties("t1") == {
        "s3.sse.type": "kms",
        "s3.sse.key": "alias/t1-key",
    }
    # unknown tenant falls back instead of aborting the pipeline
    assert r.key_for("t999") == "alias/dflt"
    assert r.write_options("t1")["fs.s3a.encryption.algorithm"] == "SSE-KMS"


def test_write_per_tenant_routes_keys_and_layout(spark, tmp_path):
    """Executable KMS routing (≙ HiddenPartitionLoaderWithKMS): every
    tenant's slice is written by its own writer under its own key, lands
    in its own tenants=<t>/ prefix, and the union roundtrips."""
    from iceberg_poc_spark.sources.aws import write_per_tenant

    df = spark.range(300).select(
        (F.col("id") % 3 + 1001).cast("int").alias("tenant_id"),
        F.col("id").alias("v"),
    )
    router = TenantKMSRouter(
        {"1001": "alias/t1001", "1002": "alias/t1002"},
        default_alias="alias/dflt",
    )
    manifest = write_per_tenant(df, router, str(tmp_path / "events"))
    assert set(manifest) == {"1001", "1002", "1003"}
    # per-tenant key selection on the write path; unmapped tenant -> default
    assert manifest["1001"]["options"]["fs.s3a.encryption.key"] == "alias/t1001"
    assert manifest["1002"]["options"]["fs.s3a.encryption.key"] == "alias/t1002"
    assert manifest["1003"]["options"]["fs.s3a.encryption.key"] == "alias/dflt"
    for t, m in manifest.items():
        back = spark.read.parquet(m["path"])
        assert back.count() == 100
        assert "tenant_id" not in back.columns  # hive key carries the value
    # the hive-layout union reconstructs the original slice counts
    allb = spark.read.option("basePath", str(tmp_path / "events")).parquet(
        str(tmp_path / "events/tenants=*")
    )
    assert allb.count() == 300


def test_salted_join_equals_plain_join(spark):
    """Salting is semantics-free: heavily skewed key distribution, salted
    result == plain join result."""
    from iceberg_poc_spark.operators.joins import salted_join

    big = spark.range(20_000).select(
        # 90% of rows share key 0 — the hot-key shape that motivates salting
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    got = salted_join(big, small, on=["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    want = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
