from iceberg_poc_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    scan_parquet,
    table_path,
)

__all__ = ["TABLES", "load_table", "register_views", "scan_parquet", "table_path"]
