from iceberg_poc_spark.tables.manager import (
    ParquetTableManager,
    bucket,
    days,
    hours,
    identity,
    months,
    truncate,
    years,
)

__all__ = [
    "ParquetTableManager",
    "identity",
    "years",
    "months",
    "days",
    "hours",
    "truncate",
    "bucket",
]
