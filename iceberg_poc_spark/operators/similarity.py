"""Similarity search over the ``embeddings`` table (✦ north-star).

- ``q_sim_topk``: brute-force cosine top-k — the exact baseline. One scan,
  per-partition top-k heaps (TakeOrderedAndProject), no shuffle of the
  full table.
- ``q_sim_ann_ivf``: IVF-style approximate search: vectors are coarse-
  quantized into sign-LSH cells; the query probes only its own cell plus
  all cells at Hamming distance 1 (nprobe = 1 + n_bits). At 100 TB the
  cell id becomes the table's partition key so a probe prunes partitions
  at the source — same plan, real pruning.

JVM-side vector math from functions/vectors.py (zip_with/aggregate fold) —
no Python in the scan path; the pandas-UDF variant of the same cosine is
exercised separately by q_udf_pandas_scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_poc_spark.functions.vectors import (
    cosine_similarity,
    sign_bucket,
    sign_bucket_sql,
)
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table

TOP_K = 10
QUERY_VEC_ID = 0

IVF_BITS = 4
IVF_TOP_K = 5


@register(
    "q_sim_topk",
    oracle=f"""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
    LIMIT {TOP_K}
    """,
    doc="Brute-force cosine top-k against the vec_id=0 query vector "
    "(exact ANN baseline).",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qemb")
    )
    sim = cosine_similarity(F.col("embedding"), F.col("qemb"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qvec))
        .select("vec_id", sim.alias("sim_raw"))
        .orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("sim_raw", 4).alias("cos_sim"))
    )


def _hamming_sql(a: str, b: str, n: int) -> str:
    return " + ".join(
        f"CAST(substr({a}, {i + 1}, 1) <> substr({b}, {i + 1}, 1) AS INT)"
        for i in range(n)
    )


@register(
    "q_sim_ann_ivf",
    oracle=f"""
    WITH cells AS (
        SELECT vec_id, embedding,
               {sign_bucket_sql("embedding", IVF_BITS)} AS cell
        FROM embeddings
    ),
    q AS (SELECT embedding, cell FROM cells WHERE vec_id = {QUERY_VEC_ID})
    SELECT c.vec_id,
           ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM cells c CROSS JOIN q
    WHERE c.vec_id <> {QUERY_VEC_ID}
      AND ({_hamming_sql("c.cell", "q.cell", IVF_BITS)}) <= 1
    ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id
    LIMIT {IVF_TOP_K}
    """,
    doc="IVF/LSH approximate nearest neighbors: probe the query's sign-LSH "
    "cell plus Hamming-1 neighbor cells, exact cosine within probed cells.",
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        sign_bucket(F.col("embedding"), IVF_BITS).alias("cell"),
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qemb"), F.col("cell").alias("qcell")
    )
    hamming = sum(
        F.when(
            F.substring("cell", i + 1, 1) != F.substring("qcell", i + 1, 1), 1
        ).otherwise(0)
        for i in range(IVF_BITS)
    )
    sim = cosine_similarity(F.col("embedding"), F.col("qemb"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .filter(hamming <= 1)
        .select("vec_id", sim.alias("sim_raw"))
        .orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
        .limit(IVF_TOP_K)
        .select("vec_id", F.round("sim_raw", 4).alias("cos_sim"))
    )


KNN_K = 3
KNN_STRIDE = 50  # queries = every 50th vector


@register(
    "q_sim_knn_join",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS qemb
        FROM embeddings WHERE vec_id % {KNN_STRIDE} = 0
    ),
    s AS (
        SELECT q.q_id, e.vec_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qemb AS DOUBLE[])) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id
    ),
    r AS (
        SELECT q_id, vec_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, vec_id
               ) AS rn
        FROM s
    )
    SELECT q_id, vec_id AS neighbor_id, ROUND(sim, 4) AS cos_sim
    FROM r WHERE rn <= {KNN_K}
    """,
    doc="k-NN JOIN: top-3 cosine neighbors for EVERY query vector at once "
    "(queries = every 50th vector) — the batch shape behind hard-negative "
    "mining and embedding-dedup candidate generation, vs q_sim_topk's "
    "single-query probe. The query side broadcasts; the corpus streams "
    "through one scan and ranks per query with a window. At 100 TB the "
    "corpus side stays put (never shuffled before ranking) and the probe "
    "batch rides the broadcast, or flips to the IVF cell-join path when "
    "the batch outgrows broadcast size.",
)
def q_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % KNN_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qemb")
    )
    sim = cosine_similarity(F.col("embedding"), F.col("qemb"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_raw").desc(), F.col("vec_id")
    )
    return (
        emb.join(F.broadcast(q), emb.vec_id != q.q_id)
        .select("q_id", "vec_id", sim.alias("sim_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("sim_raw", 4).alias("cos_sim"),
        )
    )
