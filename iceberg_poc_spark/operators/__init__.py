"""Operator modules. Importing this package registers every query in
:mod:`iceberg_poc_spark.registry`."""

from iceberg_poc_spark.operators import (  # noqa: F401
    aggregates,
    asof,
    composites,
    composites2,
    dedup,
    filters,
    joins,
    multimodal,
    nested,
    sampling,
    scalar_fns,
    scans,
    sessionize,
    setops,
    similarity,
    sorts,
    sources_q,
    subqueries,
    tablelayer,
    text,
    udfs,
    windows,
)
