from iceberg_poc_spark.plans.inspect import (
    assert_no_cartesian,
    count_shuffles,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    single_partition_windows,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_shuffles",
    "has_broadcast_join",
    "assert_no_cartesian",
    "single_partition_windows",
]
