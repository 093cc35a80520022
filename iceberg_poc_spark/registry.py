"""Query registry — single source of truth for the driver contract.

Every engine operator that is demonstrable as a query registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path), and
- optionally a DuckDB-runnable ANSI SQL oracle string (the correctness twin).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
Column names are aliased identically on both sides (the driver's comparator
sorts columns by name before hashing). Ops whose output is inherently not
SQL-expressible (LSH with engine-specific hashes, streaming) register with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return
    the registry."""
    import iceberg_poc_spark.operators  # noqa: F401  (populates REGISTRY)

    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
