from iceberg_poc_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    sign_bucket,
)

__all__ = ["cosine_similarity", "dot", "l2_norm", "sign_bucket"]
