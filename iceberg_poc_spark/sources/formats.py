"""CSV/JSON/ORC/text sources & sinks — absent from the reference
(SURVEY.md §2B), part of the complete source surface.

Readers are schema-explicit by default: at 100 TB, schema inference on
text formats means a full extra pass over the data, and silently-wrong
types (everything-is-string CSV) downstream. ``infer=True`` exists for
exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CSV_OPTIONS = {"header": "true", "escape": '"', "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss"}

# Spark's JSON sink default fraction is millis (.SSS) — silently lossy for
# microsecond timestamps. Pin 6-digit fractions on BOTH timestamp kinds so
# the round-trip is exact (q_source_json's last_ts_us check enforces it).
JSON_OPTIONS = {
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS[XXX]",
}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    r = spark.read.options(**CSV_OPTIONS)
    if schema is not None:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", "true")
    else:
        raise ValueError("pass schema= (or infer=True, exploration only)")
    return r.csv(path)


def write_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    df.write.options(**CSV_OPTIONS).option("compression", compression).mode(
        "overwrite"
    ).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    r = spark.read.options(**JSON_OPTIONS)
    if schema is not None:
        r = r.schema(schema)
    elif not infer:
        raise ValueError("pass schema= (or infer=True, exploration only)")
    return r.json(path)


def write_json(df: DataFrame, path: str, compression: str = "gzip") -> None:
    df.write.options(**JSON_OPTIONS).option("compression", compression).mode(
        "overwrite"
    ).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is self-describing (embedded schema + column stats), so no
    schema argument: like parquet, predicate pushdown and column pruning
    apply natively."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.option("compression", compression).mode("overwrite").orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-per-row (or file-per-row with ``whole=True``) raw text —
    the ingest format of LLM corpus pipelines (one document per line /
    file before structuring)."""
    return spark.read.option("wholetext", str(whole).lower()).text(path)


def write_text(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """``df`` must be a single string column (Spark text-sink contract)."""
    df.write.option("compression", compression).mode("overwrite").text(path)


XML_OPTIONS = {"rowTag": "row"}


def read_xml(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Spark 4 built-in XML source (the spark-xml package folded into
    core). Schema-explicit like every reader here: XML inference is an
    extra full pass and types everything it can't prove as string."""
    return (
        spark.read.options(**XML_OPTIONS).format("xml").schema(schema).load(path)
    )


def write_xml(df: DataFrame, path: str, compression: str = "gzip") -> None:
    df.write.options(**XML_OPTIONS).option("compression", compression).mode(
        "overwrite"
    ).format("xml").save(path)
