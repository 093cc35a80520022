"""Vector math over ``array<float>`` columns as pure Column expressions.

All JVM-side (``F.zip_with`` / ``F.aggregate`` fold into codegen) — no
Python in the hot path, the key property for scanning billions of
embeddings. Arithmetic is widened to double before summation so results
are stable and match the DuckDB oracle's double math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two array columns, accumulated in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity in double; NULL-safe on zero norms via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def sign_bucket(a, n_bits: int) -> Column:
    """Axis-aligned sign-LSH bucket: the concatenated sign bits of the
    first ``n_bits`` coordinates. A deterministic, SQL-expressible LSH
    family — used to bucket candidate pairs so near-duplicate search joins
    within buckets instead of exploding O(n^2)."""
    bits = [
        F.when(F.element_at(a, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def sign_bucket_sql(col: str, n_bits: int) -> str:
    """DuckDB twin of :func:`sign_bucket` (1-based list indexing)."""
    bits = " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(n_bits)
    )
    return f"({bits})"
