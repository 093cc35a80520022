"""UDF surface: Arrow-vectorized pandas UDFs (scalar + grouped-agg).

Absent from the reference (all logic is host Java, SURVEY.md §2C). Policy:
built-in functions first (see functions/vectors.py for the JVM-side cosine
used by the similarity queries); pandas UDFs (Arrow batches) where Python
is genuinely needed; row-at-a-time ``F.udf`` never in a hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_poc_spark.functions.sqlround import dround
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@F.pandas_udf(DoubleType())
def _cosine_to_query(emb: pd.Series, query: pd.Series) -> pd.Series:
    """Arrow-batched cosine similarity between an embedding column and a
    (constant) query vector column, computed in float64."""
    mat = np.stack(emb.to_numpy()).astype(np.float64)
    q = np.stack(query.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", mat, q)
    den = np.linalg.norm(mat, axis=1) * np.linalg.norm(q, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den == 0, np.nan, num / den)
    return pd.Series(out)


@register(
    "q_udf_pandas_scalar",
    oracle="""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]),
               CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    """,
    doc="Scalar pandas UDF (Arrow-vectorized float64 cosine) against the "
    "vec_id=0 query vector; oracle uses DuckDB's native list cosine.",
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qvec))
        .select(
            "vec_id",
            F.round(_cosine_to_query(F.col("embedding"), F.col("qemb")), 4).alias(
                "cos_sim"
            ),
        )
    )


@register(
    "q_udaf_grouped",
    oracle=f"""
    SELECT event_type, {dround('median(value)', 2)} AS median_value
    FROM events
    GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (exact median per group). Note for "
    "100 TB: exact median requires the group's values on one executor; "
    "prefer approx percentile_approx at that scale.",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy(dtype=np.float64)))

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(median_udaf("value"), 2).alias("median_value")
    )


UDTF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("sentence", StringType(), True),
        StructField("n_words", IntegerType(), False),
    ]
)


def _split_sentences(batches):
    """mapInPandas UDTF kernel: one input document row expands to N output
    sentence rows — the table-function shape (LATERAL VIEW / flatMap).
    Arrow batches in and out; pure-Python splitting stands in for any
    row-expanding library call (parser, tokenizer, chunker)."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "sent_idx": [], "sentence": [], "n_words": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for i, s in enumerate(str(text).split(". ")):
                out["doc_id"].append(doc_id)
                out["sent_idx"].append(i)
                out["sentence"].append(s)
                out["n_words"].append(len(s.split()))
        yield pd.DataFrame(out)


@register(
    "q_udtf_sentences",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, '. '), 1) - 1 AS sent_idx,
               unnest(string_split(text, '. ')) AS sentence
        FROM documents
    )
    SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx, sentence,
           CAST(len(string_split(sentence, ' ')) -
                len(list_filter(string_split(sentence, ' '), x -> x = ''))
                AS INT) AS n_words
    FROM s
    WHERE doc_id <= 500
    """,
    doc="UDTF shape: mapInPandas expanding each document into one row per "
    "sentence (Arrow-batched; the pattern for parser/tokenizer/chunker "
    "libraries). The oracle is the UNNEST desugaring.",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 500)
        .repartition(F.col("doc_id"))
        .select("doc_id", "text")
    )
    return docs.mapInPandas(_split_sentences, schema=UDTF_SCHEMA)


@register(
    "q_udf_grouped_map",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           {dround(
        '(c_acctbal - MIN(c_acctbal) OVER w) / '
        'NULLIF(MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w, 0)', 6
    )} AS bal_norm
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
    doc="Grouped-map pandas UDF (applyInPandas / FlatMapGroupsInPandas — "
    "the fourth UDF shape next to scalar, grouped-agg, and UDTF): "
    "per-market-segment min-max normalization of account balances, the "
    "per-group feature-scaling step where the whole group must be in "
    "one pandas frame. Determinism: min/max are summation-order-free "
    "and the normalization is per-element, so the only rounding happens "
    "JVM-side (F.round) to match the oracle's dround; degenerate "
    "zero-range groups emit NULL on both engines. Scale note: one "
    "shuffle on the group key; each group must fit one executor's "
    "memory — exactly the applyInPandas contract.",
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _minmax_norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = float(pdf["c_acctbal"].min())
        rng = float(pdf["c_acctbal"].max()) - lo
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        if rng == 0.0:
            out["bal_norm"] = None
        else:
            out["bal_norm"] = (pdf["c_acctbal"] - lo) / rng
        return out

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    normed = c.groupBy("c_mktsegment").applyInPandas(
        _minmax_norm, "c_custkey bigint, c_mktsegment string, bal_norm double"
    )
    return normed.select(
        "c_custkey", "c_mktsegment", F.round("bal_norm", 6).alias("bal_norm")
    )


from pyspark.sql.functions import udtf  # noqa: E402


@udtf(returnType="word string, pos int", useArrow=True)
class _TokenizeUDTF:
    """Real Python UDTF (Spark 4 @udtf API): one input row -> one output
    row per token, with position. Arrow-evaluated (useArrow=True), so the
    plan node is ArrowEvalPythonUDTF, not row-at-a-time BatchEvalPython —
    the same batched data path the plan-hygiene gate enforces everywhere.
    """

    def eval(self, text: str):
        for i, w in enumerate(text.split(" ")):
            yield w, i


@register(
    "q_udtf_lateral",
    oracle="""
    SELECT doc_id,
           list_extract(words, CAST(i AS INT)) AS word,
           CAST(i - 1 AS INT) AS pos
    FROM (
        SELECT doc_id, string_split(text, ' ') AS words,
               UNNEST(range(1, len(words) + 1)) AS i
        FROM documents
    )
    """,
    doc="Registered Python UDTF invoked through SQL LATERAL — the real "
    "UDTF API (spark.udtf.register + LATERAL correlation), complementing "
    "q_udtf_sentences' mapInPandas formulation of the same shape: each "
    "document row laterally explodes into (word, position) rows produced "
    "by Python. Arrow-batched (ArrowEvalPythonUDTF); the oracle is "
    "DuckDB's UNNEST-with-subscript desugaring. Row expansion is "
    "pipeline-local: no shuffle, parallelism = scan splits.",
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("tokenize_udtf", _TokenizeUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__docs_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.pos
        FROM __docs_udtf d, LATERAL tokenize_udtf(d.text) t
        """
    )


@udtf(returnType="source string, n_docs bigint, total_chars bigint, max_run int",
      useArrow=True)
class _SourceRunsUDTF:
    """Polymorphic table function (Spark 4 UDTF with a TABLE argument):
    consumes one whole partition in its PARTITION BY/ORDER BY order,
    carries sequential state across rows (longest strictly-increasing
    n_chars run — a computation that is inherently order-dependent), and
    emits the summary from terminate(). Arrow-evaluated."""

    def __init__(self):
        self.source = None
        self.n = 0
        self.total = 0
        self.run = 0
        self.best = 0
        self.prev = None

    def eval(self, row):
        self.source = row["source"]
        n_chars = row["n_chars"]
        self.n += 1
        self.total += n_chars
        self.run = self.run + 1 if (
            self.prev is not None and n_chars > self.prev
        ) else 1
        self.best = max(self.best, self.run)
        self.prev = n_chars

    def terminate(self):
        if self.source is not None:
            yield self.source, self.n, self.total, self.best


@register(
    "q_udtf_table_arg",
    oracle="""
    WITH d AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
               CASE WHEN n_chars > lag(n_chars) OVER
                        (PARTITION BY source ORDER BY doc_id)
                    THEN 0 ELSE 1 END AS brk
        FROM documents
    ),
    g AS (
        SELECT source, n_chars,
               SUM(brk) OVER (PARTITION BY source ORDER BY rn) AS grp
        FROM d
    ),
    runs AS (
        SELECT source, grp, COUNT(*) AS run_len FROM g GROUP BY source, grp
    )
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(s.total_chars AS BIGINT) AS total_chars,
           CAST(r.max_run AS INT) AS max_run
    FROM (SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
          FROM documents GROUP BY source) s
    JOIN (SELECT source, MAX(run_len) AS max_run FROM runs GROUP BY source) r
      USING (source)
    """,
    doc="UDTF with a TABLE argument (Spark 4 polymorphic table function, "
    "SELECT * FROM f(TABLE(t) PARTITION BY src ORDER BY id)): the engine "
    "shuffles once on the partition key, streams each partition through "
    "the UDTF in order, and the UDTF carries SEQUENTIAL state across "
    "rows — here the longest strictly-increasing n_chars run per source, "
    "a computation that is order-dependent by nature — emitting one "
    "summary row from terminate(). Arrow-evaluated "
    "(ArrowEvalPythonUDTF). The oracle is the gaps-and-islands SQL "
    "equivalent, two engines computing the run two entirely different "
    "ways. Scale: parallelism = number of sources; each partition "
    "streams (state is O(1)), never materializes in memory.",
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("source_runs_udtf", _SourceRunsUDTF)
    load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).createOrReplaceTempView("__docs_pbr")
    return spark.sql(
        """
        SELECT * FROM source_runs_udtf(
            TABLE(__docs_pbr) PARTITION BY source ORDER BY doc_id
        )
        """
    )


@register(
    "q_udf_grouped_arrow",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey)
                AS BIGINT) AS bal_rank
    FROM customer
    """,
    doc="Arrow-native grouped map (Spark 4 applyInArrow / "
    "FlatMapGroupsInArrow — the fifth UDF shape, skipping the "
    "pandas conversion entirely): per-market-segment balance ranking "
    "computed with pyarrow.compute.sort_indices on the raw Arrow "
    "record batch, permutation inverted to per-row ranks. Ties broken "
    "by custkey so the order is total and both engines agree row-for-"
    "row with the oracle's ROW_NUMBER window. c_acctbal is a 2-dp "
    "double (exact), so the sort key is bit-identical cross-engine. "
    "Scale: one shuffle on the group key, zero pandas/NumPy "
    "materialization — columns stay in Arrow buffers end-to-end, "
    "which at 100 TB is the difference between a copy per batch and "
    "none.",
)
def q_udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def _rank_group(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl,
            sort_keys=[("c_acctbal", "ascending"), ("c_custkey", "ascending")],
        )
        n = tbl.num_rows
        ranks = np.empty(n, dtype=np.int64)
        ranks[order.to_numpy()] = np.arange(1, n + 1)
        return pa.table(
            {
                "c_custkey": tbl["c_custkey"],
                "c_mktsegment": tbl["c_mktsegment"],
                "bal_rank": pa.array(ranks, type=pa.int64()),
            }
        )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return c.groupBy("c_mktsegment").applyInArrow(
        _rank_group, "c_custkey bigint, c_mktsegment string, bal_rank bigint"
    )
