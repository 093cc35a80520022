"""AIG events schema suite ≙ the reference's six self-validating checks
(AIGEventsSchemaValidator.java:149-305): creation/required-fields, DDL
mapping, record creation, complex structures, serialization round-trip,
DDL generation — plus an end-to-end write through the table layer with the
reference's partition strategy."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from iceberg_poc_spark.tables import ParquetTableManager, days, identity
from iceberg_poc_spark.tables.aig_events import (
    REQUIRED_FIELDS,
    events_schema,
    generate_ddl,
    generate_events,
    with_event_time,
)


def _count_field_ids(dt) -> int:
    """Count schema positions the way Iceberg assigns field IDs: every
    struct field plus every list element gets an ID (the reference's
    declaration spans IDs 1-73, AIGEventsSchemaValidator.java:60-147)."""
    if isinstance(dt, StructType):
        return sum(1 + _count_field_ids(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return 1 + _count_field_ids(dt.elementType)
    return 0


def test_schema_creation_and_required_fields():
    s = events_schema()
    # 47 top-level columns; 73 Iceberg field IDs once nested struct members
    # and list elements are numbered, matching the reference's ID range.
    assert len(s.fields) == 47
    assert _count_field_ids(s) == 73
    for f in s.fields:
        assert f.nullable == (f.name not in REQUIRED_FIELDS), f.name


def test_complex_structures():
    s = events_schema()
    policy = s["policy"].dataType
    assert isinstance(policy, ArrayType)
    el = policy.elementType
    assert [f.name for f in el.fields] == ["type", "name", "action", "profile", "object_id"]
    assert isinstance(el["profile"].dataType, ArrayType)
    for files_col in ("cs_files", "rs_files"):
        el = s[files_col].dataType.elementType
        assert [f.name for f in el.fields] == [
            "object_id", "purpose", "type", "mime_type",
            "filename", "bytes", "create_at", "update_at",
        ]


def test_schema_serialization_roundtrip():
    s = events_schema()
    assert StructType.fromJson(s.jsonValue()) == s


def test_ddl_generation():
    ddl = generate_ddl()
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (tenant_id, days(" in ddl
    assert "tenant_id INT NOT NULL" in ddl
    assert "'write.parquet.compression-codec' = 'zstd'" in ddl
    assert "policy ARRAY<STRUCT<" in ddl


def _names_and_types(s: StructType):
    """(name, type-ignoring-nullability) pairs — Spark nullability is
    advisory and literal-derived columns legitimately come out non-null."""
    out = []
    for f in s.fields:
        dt = StructType.fromJson(s.jsonValue())[f.name].dataType  # fresh copy
        out.append((f.name, dt.simpleString()))
    return out


def test_generator_record_creation(spark):
    df = generate_events(spark, 100)
    assert _names_and_types(df.schema) == _names_and_types(events_schema())
    assert df.count() == 100
    assert df.select("tenant_id").distinct().count() == 10
    # nested fill rates ≈ reference's partial fills
    assert 0 < df.filter(F.col("policy").isNotNull()).count() < 100
    assert 0 < df.filter(F.col("cs_files").isNotNull()).count() < 100
    # required fields never null
    for f in REQUIRED_FIELDS:
        assert df.filter(F.col(f).isNull()).count() == 0


def test_end_to_end_partitioned_write(spark, tmp_path):
    """≙ AIGEventsTableCreator.main: create with tenant/day hidden
    partitioning, one atomic commit for the generated batch, layout check."""
    mgr = ParquetTableManager(spark, str(tmp_path / "wh"))
    df = with_event_time(generate_events(spark, 200))
    mgr.create_table(
        "events_aig", df.schema, [identity("tenant_id"), days("event_time")]
    )
    mgr.append("events_aig", df)
    snaps = mgr.snapshots("events_aig").collect()
    assert [s.operation for s in snaps] == ["create", "append"]
    paths = [r.path for r in mgr.files("events_aig").collect()]
    assert all("tenant_id=" in p and "event_time_days=" in p for p in paths)
    back = mgr.read("events_aig")
    assert back.count() == 200
    got = back.filter(F.col("policy").isNotNull()).select(
        F.explode("policy").alias("p")
    ).select("p.profile").first()
    assert got[0] == ["default", "strict"] or got[0] == ["default", "lax"]