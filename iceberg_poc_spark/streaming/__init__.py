from iceberg_poc_spark.streaming.pipelines import (
    dedup_stream,
    enrich_stream,
    load_events_stream,
    run_to_table,
    session_stream,
    tumbling_stream,
)

__all__ = [
    "load_events_stream",
    "tumbling_stream",
    "session_stream",
    "dedup_stream",
    "enrich_stream",
    "run_to_table",
]
