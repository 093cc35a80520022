"""CSV/JSON round-trips preserve schema and values (schema-explicit reads)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_poc_spark.sources import load_table
from iceberg_poc_spark.sources.formats import (
    read_csv,
    read_json,
    write_csv,
    write_json,
)
from tests.conftest import SF_DIR


@pytest.fixture
def orders(spark):
    # timestamps as strings: CSV/JSON text formats + NTZ round-trips are
    # exercised on the lexical form (the engine convention for oracles too)
    return (
        load_table(spark, SF_DIR, "orders")
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .limit(500)
    )


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path, orders):
    p = str(tmp_path / "o_csv")
    write_csv(orders, p)
    back = read_csv(spark, p, schema=orders.schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)


def test_json_roundtrip(spark, tmp_path, orders):
    p = str(tmp_path / "o_json")
    write_json(orders, p)
    back = read_json(spark, p, schema=orders.schema)
    assert _rows(back) == _rows(orders)


def test_schemaless_read_requires_opt_in(spark, tmp_path, orders):
    p = str(tmp_path / "o_csv2")
    write_csv(orders, p)
    with pytest.raises(ValueError):
        read_csv(spark, p)
    inferred = read_csv(spark, p, infer=True)
    assert inferred.count() == 500


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from iceberg_poc_spark.sources.formats import read_orc, write_orc

    li = load_table(spark, SF_DIR, "lineitem").limit(1000)
    p = str(tmp_path / "li_orc")
    write_orc(li, p)
    back = read_orc(spark, p)
    assert back.schema == li.schema
    assert back.count() == 1000
    # predicate reaches the ORC reader (same gate as parquet scans)
    plan = back.filter(F.col("l_quantity") > 25)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_text_roundtrip_line_per_doc(spark, tmp_path):
    from iceberg_poc_spark.sources.formats import read_text, write_text

    docs = load_table(spark, SF_DIR, "documents").select("text").limit(200)
    p = str(tmp_path / "docs_txt")
    write_text(docs, p)
    back = read_text(spark, p)
    assert back.columns == ["value"]
    assert _rows(back.select(F.col("value").alias("text"))) == _rows(docs)


def test_xml_roundtrip_escaping(spark, tmp_path):
    from iceberg_poc_spark.sources.formats import read_xml, write_xml

    part = load_table(spark, SF_DIR, "part").limit(300)
    # inject the XML-hostile characters the sink must entity-escape
    hostile = part.withColumn(
        "p_name", F.concat(F.col("p_name"), F.lit(" <&> \"x\" 'y'"))
    )
    p = str(tmp_path / "part_xml")
    write_xml(hostile, p)
    back = read_xml(spark, p, schema=hostile.schema)
    assert back.schema == hostile.schema
    assert _rows(back) == _rows(hostile)
