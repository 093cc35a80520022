"""The AIG events table: schema, DDL, and synthetic data generator.

Reference parity:
- 73-field schema ≙ ``aig/AIGEventsSchemaValidator.java:60-147``
  (``createEventsSchema``): request/response dimensions, usage counters,
  nested ``policy``/``cs_files``/``rs_files`` arrays-of-structs (with a
  nested ``profile`` list inside ``policy``), ``ratelimit`` string list,
  and the short-named partition helper columns tenant/year/month/day/hour
  (fields 69-73). Iceberg field IDs have no PySpark-surface equivalent —
  the connector manages them (SURVEY.md §1.3).
- required vs optional ≙ fields 3-6 required (tenant_id, home_pop,
  service_id, timestamp) — expressed as ``nullable=False``.
- DDL generation ≙ ``AIGEventsSchemaValidator.generateDDL`` (`:277-292`)
  and the printed sample DDL ``AIGEventsTableCreatorTest.java:76-81``:
  ``PARTITIONED BY (tenant_id, days(timestamp), service_id)``.
- synthetic generator ≙ ``aig/AIGEventsTableCreator.java:209-352``
  (100 records, 10 tenants, cyclic dimension values, nested structures at
  partial fill rates) — re-expressed as ``spark.range`` + column
  expressions: declarative, executor-parallel, no driver-side row loop.

The epoch-millis ``timestamp`` long is kept verbatim (reference field 6);
``with_event_time`` derives a proper TIMESTAMP and the hidden-partition
helpers, replacing the reference's hand-rolled UTC bucketing
(``AIGEventsTableCreator.java:226-234``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_FILE_STRUCT = StructType(
    [
        StructField("object_id", IntegerType(), True),
        StructField("purpose", StringType(), True),
        StructField("type", StringType(), True),
        StructField("mime_type", StringType(), True),
        StructField("filename", StringType(), True),
        StructField("bytes", LongType(), True),
        StructField("create_at", LongType(), True),
        StructField("update_at", LongType(), True),
    ]
)

POLICY_STRUCT = StructType(
    [
        StructField("type", StringType(), True),
        StructField("name", StringType(), True),
        StructField("action", StringType(), True),
        StructField("profile", ArrayType(StringType(), True), True),
        StructField("object_id", IntegerType(), True),
    ]
)


def _opt_str(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _opt_int(name: str) -> StructField:
    return StructField(name, IntegerType(), True)


def events_schema() -> StructType:
    """The 73-field AIG events schema (field numbering follows the
    reference's declaration order)."""
    return StructType(
        [
            _opt_int("transaction_id"),  # 1
            _opt_str("response_id"),  # 2
            StructField("tenant_id", IntegerType(), False),  # 3 required
            StructField("home_pop", StringType(), False),  # 4 required
            StructField("service_id", StringType(), False),  # 5 required
            StructField("timestamp", LongType(), False),  # 6 required, epoch ms
            _opt_str("version"),  # 7
            _opt_str("type"),  # 8
            _opt_str("token_group"),  # 9
            _opt_str("gateway_id"),  # 10
            _opt_str("ai_provider_id"),  # 11
            _opt_str("ai_schema"),  # 12
            _opt_str("cs_model"),  # 13
            _opt_str("rs_model"),  # 14
            _opt_int("sc_status"),  # 15
            _opt_str("cs_method"),  # 16
            _opt_str("cs_protocol"),  # 17
            _opt_str("cs_url"),  # 18
            _opt_str("cs_scheme"),  # 19
            _opt_str("cs_domain"),  # 20
            _opt_str("cs_path"),  # 21
            _opt_str("cs_query"),  # 22
            _opt_str("sr_url"),  # 23
            _opt_str("sr_scheme"),  # 24
            _opt_str("sr_domain"),  # 25
            _opt_str("sr_path"),  # 26
            _opt_str("sr_query"),  # 27
            _opt_int("rs_status"),  # 28
            _opt_int("rs_response_time"),  # 29
            _opt_int("usage_total"),  # 30
            _opt_int("usage_input"),  # 31
            _opt_int("usage_output"),  # 32
            StructField("policy", ArrayType(POLICY_STRUCT, True), True),  # 33-40
            _opt_str("action"),  # 41
            _opt_str("action_reason"),  # 42
            _opt_str("custom_attr"),  # 43
            StructField("cs_files", ArrayType(_FILE_STRUCT, True), True),  # 44-53
            StructField("rs_files", ArrayType(_FILE_STRUCT, True), True),  # 54-63
            StructField("ratelimit", ArrayType(StringType(), True), True),  # 64-65
            _opt_str("activity"),  # 66
            _opt_str("conversation_id"),  # 67
            _opt_int("incident_id"),  # 68
            _opt_int("tenant"),  # 69 partition helper
            _opt_int("year"),  # 70
            _opt_int("month"),  # 71
            _opt_int("day"),  # 72
            _opt_int("hour"),  # 73
        ]
    )


REQUIRED_FIELDS = ("tenant_id", "home_pop", "service_id", "timestamp")

_SPARK_TO_DDL = {
    "integer": "INT",
    "long": "BIGINT",
    "string": "STRING",
}


def _ddl_type(dt) -> str:
    if isinstance(dt, ArrayType):
        return f"ARRAY<{_ddl_type(dt.elementType)}>"
    if isinstance(dt, StructType):
        inner = ", ".join(f"{f.name}: {_ddl_type(f.dataType)}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    return _SPARK_TO_DDL[dt.typeName()]


def generate_ddl(
    table: str = "events_aig",
    catalog: str = "lake",
    database: str = "aig",
) -> str:
    """CREATE TABLE DDL ≙ the reference's generated/sample DDL
    (AIGEventsSchemaValidator.java:277-292, AIGEventsTableCreatorTest
    .java:76-81): Iceberg hidden partitioning on
    (tenant_id, days(timestamp), service_id) + the reference's physical
    properties (:184-191)."""
    cols = ",\n  ".join(
        f"{f.name} {_ddl_type(f.dataType)}"
        + ("" if f.nullable else " NOT NULL")
        for f in events_schema().fields
    )
    return (
        f"CREATE TABLE {catalog}.{database}.{table} (\n  {cols}\n)\n"
        "USING iceberg\n"
        "PARTITIONED BY (tenant_id, days(CAST(timestamp_micros(timestamp * 1000) AS TIMESTAMP)), service_id)\n"
        "TBLPROPERTIES (\n"
        "  'write.format.default' = 'parquet',\n"
        "  'write.parquet.compression-codec' = 'zstd',\n"
        "  'write.target-file-size-bytes' = '134217728',\n"
        "  'write.parquet.page-size-bytes' = '1048576',\n"
        "  'write.parquet.dict-size-bytes' = '2097152'\n"
        ")"
    )


# ------------------------------------------------------------- generator

TENANTS = list(range(1001, 1011))  # 10 tenants ≙ reference's tenant cycle
HOME_POPS = ["us-east", "us-west", "eu-central", "ap-south"]
SERVICES = ["chat", "completion", "embedding"]
PROVIDERS = ["openai", "anthropic", "bedrock"]
BASE_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z


def generate_events(
    spark: SparkSession, n: int = 100, seed_base: int = 0
) -> DataFrame:
    """Synthetic AIG events ≙ AIGEventsTableCreator.createTestData
    (``:209-281``): cyclic dimension values, ~50% policy fill, ~30% file
    attachments, ~20% ratelimit — but generated executor-side from
    ``spark.range`` (scales to any n; the reference loops on the driver)."""
    i = F.col("id")
    pick = lambda arr, k: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in arr]), (k % len(arr) + 1).cast("int")
    )
    ts_ms = F.lit(BASE_TS_MS) + (i * 60_000) % (30 * 86_400_000)  # 30-day spread
    policy = F.when(
        (i + seed_base) % 2 == 0,
        F.array(
            F.struct(
                F.lit("guard").alias("type"),
                F.concat(F.lit("policy-"), (i % 5).cast("string")).alias("name"),
                pick(["allow", "deny", "redact"], i).alias("action"),
                F.array(F.lit("default"), pick(["strict", "lax"], i)).alias("profile"),
                (i % 100).cast("int").alias("object_id"),
            )
        ),
    )
    files = F.when(
        (i + seed_base) % 10 < 3,
        F.array(
            F.struct(
                (i % 1000).cast("int").alias("object_id"),
                F.lit("input").alias("purpose"),
                F.lit("document").alias("type"),
                pick(["application/pdf", "text/plain", "image/png"], i).alias(
                    "mime_type"
                ),
                F.concat(F.lit("file-"), i.cast("string"), F.lit(".bin")).alias(
                    "filename"
                ),
                (i * 1024 % 10_000_000).cast("bigint").alias("bytes"),
                ts_ms.cast("bigint").alias("create_at"),
                ts_ms.cast("bigint").alias("update_at"),
            )
        ),
    )
    df = spark.range(n).select(
        (i % 100000).cast("int").alias("transaction_id"),
        F.concat(F.lit("resp-"), i.cast("string")).alias("response_id"),
        pick(TENANTS, i).cast("int").alias("tenant_id"),
        pick(HOME_POPS, i).alias("home_pop"),
        pick(SERVICES, i).alias("service_id"),
        ts_ms.cast("bigint").alias("timestamp"),
        F.lit("1.0").alias("version"),
        pick(["request", "response"], i).alias("type"),
        F.concat(F.lit("tg-"), (i % 4).cast("string")).alias("token_group"),
        F.concat(F.lit("gw-"), (i % 3).cast("string")).alias("gateway_id"),
        pick(PROVIDERS, i).alias("ai_provider_id"),
        F.lit("openai/v1").alias("ai_schema"),
        pick(["gpt-4", "claude-3", "titan"], i).alias("cs_model"),
        pick(["gpt-4", "claude-3", "titan"], i + 1).alias("rs_model"),
        F.lit(200).alias("sc_status"),
        F.lit("POST").alias("cs_method"),
        F.lit("HTTP/1.1").alias("cs_protocol"),
        F.lit("https://api.example.com/v1/chat").alias("cs_url"),
        F.lit("https").alias("cs_scheme"),
        F.lit("api.example.com").alias("cs_domain"),
        F.lit("/v1/chat").alias("cs_path"),
        F.lit(None).cast("string").alias("cs_query"),
        F.lit("https://upstream.example.com/v1/chat").alias("sr_url"),
        F.lit("https").alias("sr_scheme"),
        F.lit("upstream.example.com").alias("sr_domain"),
        F.lit("/v1/chat").alias("sr_path"),
        F.lit(None).cast("string").alias("sr_query"),
        pick([200, 200, 200, 429, 500], i).cast("int").alias("rs_status"),
        ((i * 37) % 5000).cast("int").alias("rs_response_time"),
        ((i * 13) % 4000).cast("int").alias("usage_total"),
        ((i * 7) % 3000).cast("int").alias("usage_input"),
        ((i * 11) % 1000).cast("int").alias("usage_output"),
        policy.alias("policy"),
        pick(["allow", "deny"], i).alias("action"),
        F.lit(None).cast("string").alias("action_reason"),
        F.lit(None).cast("string").alias("custom_attr"),
        files.alias("cs_files"),
        F.lit(None).cast(ArrayType(_FILE_STRUCT)).alias("rs_files"),
        F.when((i + seed_base) % 5 == 0, F.array(F.lit("100rps"))).alias("ratelimit"),
        pick(["chat", "moderation"], i).alias("activity"),
        F.concat(F.lit("conv-"), (i % 50).cast("string")).alias("conversation_id"),
        F.lit(None).cast("int").alias("incident_id"),
        pick(TENANTS, i).cast("int").alias("tenant"),
        F.year(F.timestamp_micros(ts_ms * 1000)).cast("int").alias("year"),
        F.month(F.timestamp_micros(ts_ms * 1000)).cast("int").alias("month"),
        F.dayofmonth(F.timestamp_micros(ts_ms * 1000)).cast("int").alias("day"),
        F.hour(F.timestamp_micros(ts_ms * 1000)).cast("int").alias("hour"),
    )
    return df


def with_event_time(df: DataFrame) -> DataFrame:
    """Derive a real TIMESTAMP from the epoch-millis long (the convention
    decision SURVEY.md §7.4 calls out) — use this as the hidden-partition
    source instead of the reference's helper int columns."""
    return df.withColumn("event_time", F.timestamp_micros(F.col("timestamp") * 1000))
