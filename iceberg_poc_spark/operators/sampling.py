"""Dataset-assembly operators for training-data pipelines (✦ north-star,
SURVEY.md §2B): deterministic splits, stratified sampling, and
context-window sequence packing over the ``documents`` corpus.

All three are *content-addressed* (md5-hex thresholds), not RNG-seeded:
the split/sample decision for a document is a pure function of its id, so
it is stable across runs, engines, cluster sizes, and re-partitioning —
the property a 100 TB pipeline needs so that re-running a stage never
shuffles examples between train and test. A fixed-width lowercase-hex
prefix compares lexicographically exactly like the integer it encodes,
so ``substr(md5(x), 1, 8) < 'cccccccc'`` IS ``u32(x) < 0.8 * 2^32`` —
byte-identical in Spark and DuckDB, which keeps every operator
oracle-checkable (no reference analogue; the reference has no sampling
surface, SURVEY.md §2C).

Scale notes: all decisions are per-row map-side expressions (no shuffle
to decide membership); the only shuffles are the final reporting
aggregations. Packing uses a running sum over a deterministic order,
partitioned per-shard (``partitionBy(shard)``) so no single-partition
global window ever appears in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table

# u32 thresholds as fixed-width hex: floor(f * 2^32) in 8 lowercase hex chars
TRAIN_HEX = "cccccccc"  # 0.80 * 2^32
VAL_HEX = "e6666666"  # 0.90 * 2^32
EN_KEEP_HEX = "80000000"  # 0.50 * 2^32
PACK_BUDGET = 512  # tokens per packed context window


def _u32_hex(col, salt: str):
    """First 8 hex chars of md5('<salt>:' || col) — a uniform u32 draw,
    reproducible byte-for-byte in DuckDB."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")).cast("binary")), 1, 8
    )


@register(
    "q_sample_split",
    oracle=f"""
    SELECT CASE
             WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{TRAIN_HEX}' THEN 'train'
             WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < '{VAL_HEX}' THEN 'val'
             ELSE 'test'
           END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test split: membership is a pure "
    "function of md5(doc_id), so it never changes under re-runs, engine "
    "swaps, or repartitioning — unlike randomSplit, which is seed- and "
    "partitioning-dependent. Zero-shuffle assignment; only the report "
    "aggregates.",
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _u32_hex(F.col("doc_id"), "split")
    return (
        d.select(
            F.when(u < TRAIN_HEX, "train")
            .when(u < VAL_HEX, "val")
            .otherwise("test")
            .alias("split"),
            F.size(F.split("text", " ")).alias("t"),
        )
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("tokens"))
        .orderBy("split")
    )


@register(
    "q_sample_split_grouped",
    oracle=f"""
    SELECT CASE
             WHEN substr(md5('gsplit:' || source), 1, 8)
                  < '{TRAIN_HEX}' THEN 'train'
             WHEN substr(md5('gsplit:' || source), 1, 8)
                  < '{VAL_HEX}' THEN 'val'
             ELSE 'test'
           END AS split,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    doc="Leakage-safe GROUPED split: membership hashes the SOURCE, not "
    "the document, so every doc of a source lands in the same split — "
    "near-duplicates and templated documents within a source can never "
    "straddle train/val (the classic eval-leak a doc-level split "
    "allows). Same md5-threshold determinism as q_sample_split; "
    "assignment stays a zero-shuffle map-side expression because the "
    "group key is already on every row — no join against a split "
    "registry. Only the report aggregates.",
)
def q_sample_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _u32_hex(F.col("source"), "gsplit")
    return (
        d.select(
            F.when(u < TRAIN_HEX, "train")
            .when(u < VAL_HEX, "val")
            .otherwise("test")
            .alias("split"),
            "source",
            F.size(F.split("text", " ")).alias("t"),
        )
        .groupBy("split")
        .agg(
            F.count_distinct(F.col("source")).alias("n_sources"),
            F.count("*").alias("n_docs"),
            F.sum("t").alias("tokens"),
        )
        .orderBy("split")
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    < (CASE WHEN lang = 'en' THEN '{EN_KEEP_HEX}' ELSE 'g' END)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
    doc="Stratified (per-language) deterministic sampling — the mixture "
    "rebalance step of corpus assembly: the dominant language (en) is "
    "downsampled to 50%, the rest kept whole. 'g' sorts above every hex "
    "digit, so it encodes rate 1.0. Per-row map-side decision, no shuffle "
    "to sample.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _u32_hex(F.col("doc_id"), "strat")
    thresh = F.when(F.col("lang") == "en", F.lit(EN_KEEP_HEX)).otherwise(F.lit("g"))
    return (
        d.select("lang", (u < thresh).cast("int").alias("keep"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"), F.sum("keep").alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS tokens,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents
    ),
    c AS (
        SELECT shard, doc_id, tokens,
               SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - tokens AS start_offset
        FROM t
    )
    SELECT shard,
           CAST(FLOOR(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc=f"Context-window sequence packing: within each shard (md5-prefix "
    f"of doc_id, 16-way), documents in deterministic doc_id order fill "
    f"{PACK_BUDGET}-token windows; a doc belongs to the window its start "
    f"offset falls in (docs may straddle — the concat-then-chunk packing "
    f"used for LLM pretraining batches). The cumsum window partitions by "
    f"shard, so the plan has NO single-partition global window — each "
    f"shard's running sum is independent and the shard count scales with "
    f"the cluster (use more hex chars at 100 TB).",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tokens"),
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("start_offset", F.sum("tokens").over(w) - F.col("tokens"))
    return (
        c.groupBy(
            "shard",
            (F.col("start_offset") / PACK_BUDGET).cast("bigint").alias("pack_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


MIX_TOPK = 200
HEAVY_SOURCES = ("src0", "src1")
HEAVY_WEIGHT = 4  # power of two: rn/weight stays float-exact cross-engine


@register(
    "q_mix_sources",
    oracle=f"""
    WITH pos AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
               / (CASE WHEN source IN {HEAVY_SOURCES} THEN {HEAVY_WEIGHT}.0
                       ELSE 1.0 END) AS p
        FROM documents
    ),
    head AS (
        SELECT source FROM pos ORDER BY p, doc_id LIMIT {MIX_TOPK}
    )
    SELECT source, COUNT(*) AS n_docs
    FROM head GROUP BY source ORDER BY source
    """,
    doc=f"Weighted source-mixture interleave — the sampling schedule of "
    f"multi-corpus training: doc k of a weight-w source surfaces at "
    f"stream position k/w, so heavier sources appear w times as often in "
    f"any prefix. Reports the source mix of the first {MIX_TOPK} "
    f"positions ({HEAVY_SOURCES} at weight {HEAVY_WEIGHT}). Deterministic "
    f"(no RNG): per-source rank + division, exact under float because the "
    f"weights are powers of two. Scale: the window partitions by source "
    f"(many independent partitions), and a prefix of the mixture never "
    f"needs a global sort — each source contributes its own rank range.",
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    weight = (
        F.when(F.col("source").isin(*HEAVY_SOURCES), F.lit(float(HEAVY_WEIGHT)))
        .otherwise(F.lit(1.0))
    )
    pos = d.select(
        "source", "doc_id", (F.row_number().over(w) / weight).alias("p")
    )
    head = pos.orderBy("p", "doc_id").limit(MIX_TOPK)
    return head.groupBy("source").agg(F.count("*").alias("n_docs")).orderBy("source")


RESERVOIR_K = 8


@register(
    "q_sample_reservoir",
    oracle=f"""
    SELECT source, doc_id, CAST(pos AS INT) AS pos
    FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5('res:' || CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id
               ) AS pos
        FROM documents
    )
    WHERE pos <= {RESERVOIR_K}
    """,
    doc=f"Deterministic fixed-size per-group sample ({RESERVOIR_K} docs "
    f"per source) — the eval-set / spot-check builder: rank every doc "
    f"by a content-addressed hash WITHIN its source and keep the "
    f"{RESERVOIR_K} smallest. Equivalent in distribution to reservoir "
    f"sampling but reproducible under re-runs, engine swaps, and "
    f"repartitioning (the hash IS the randomness — same determinism "
    f"contract as q_sample_split). One shuffle on source; at scale the "
    f"rank-filter is Spark's windowed top-k (partial top-k per task "
    f"via WindowGroupLimit before the shuffle, never a global sort).",
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = _u32_hex(F.col("doc_id"), "res")
    w = Window.partitionBy("source").orderBy(u, "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= RESERVOIR_K)
    )


W_SCALE = 600.0  # chars at which keep-probability saturates to 1.0


@register(
    "q_sample_weighted",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM (
      SELECT source, n_chars,
             (n_chars >= {W_SCALE}
              OR substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
               < lpad(lower(to_hex(CAST(least(
                     floor(least(1.0, n_chars / {W_SCALE}) * 4294967296.0),
                     4294967295.0) AS BIGINT))), 8, '0'))
               AS kept
      FROM documents
    )
    GROUP BY source ORDER BY source
    """,
    doc="Weighted (Poisson) sampling — keep-probability proportional to "
    "document length, the quality/length-weighted corpus downsampling "
    "step of LLM data mixing. Same content-addressed discipline as "
    "q_sample_split: the per-doc uniform draw is md5(doc_id) and the "
    "per-doc threshold is floor(min(1, n_chars/W_SCALE) * 2^32) "
    "formatted as fixed-width hex (with a saturation branch: p==1.0 "
    "keeps unconditionally, since the strict u<thresh compare alone "
    "would drop a doc whose md5 prefix is exactly 'ffffffff' — a 2^-32 "
    "deviation from 'p=1 always kept'), so membership is a pure row-local "
    "function — reproducible across engines (doubles only touch * and "
    "/, which IEEE rounds identically everywhere; no transcendentals), "
    "runs, and repartitionings, and costs ZERO shuffle to decide; only "
    "the per-source report aggregates. Unlike df.sample(), adding or "
    "removing one document never flips any other document's fate.",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = _u32_hex(F.col("doc_id"), "wsamp")
    thresh_u32 = F.least(
        F.floor(F.least(F.lit(1.0), F.col("n_chars") / F.lit(W_SCALE)) * F.lit(4294967296.0)),
        F.lit(4294967295.0),
    ).cast("bigint")
    # saturation: p==1.0 keeps unconditionally (strict < alone would drop
    # an md5 prefix of exactly 'ffffffff' — a 2^-32 deviation from p=1)
    kept = (F.col("n_chars") >= F.lit(W_SCALE)) | (
        u < F.lpad(F.lower(F.hex(thresh_u32)), 8, "0")
    )
    return (
        d.select("source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


TEMP_RATE_BASE = 0.5  # keep rate of the largest source; smaller sources keep more


@register(
    "q_sample_temperature",
    oracle=f"""
    WITH stats AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_chars_src
        FROM documents GROUP BY source
    ),
    m AS (SELECT MAX(n_chars_src) AS nmax FROM stats),
    rates AS (
        SELECT source,
               least(1.0, {TEMP_RATE_BASE} *
                     sqrt(CAST(nmax AS DOUBLE) / CAST(n_chars_src AS DOUBLE)))
                   AS keep_rate
        FROM stats, m
    ),
    k AS (
        SELECT d.source, r.keep_rate,
               (r.keep_rate >= 1.0
                OR substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                 < lpad(lower(to_hex(CAST(least(
                       floor(r.keep_rate * 4294967296.0),
                       4294967295.0) AS BIGINT))), 8, '0')) AS kept
        FROM documents d JOIN rates r USING (source)
    )
    SELECT source,
           keep_rate,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM k GROUP BY source, keep_rate ORDER BY source
    """,
    doc=f"Temperature (alpha=0.5) source sampling — the multilingual/"
    f"multi-corpus flattening rule (sampling rate per doc proportional to "
    f"corpus_mass^(alpha-1)): each source's keep rate is "
    f"{TEMP_RATE_BASE}*sqrt(largest_source_chars / source_chars) capped "
    f"at 1, so the dominant corpus is downsampled hardest and tail "
    f"corpora survive. Rates are DATA-DRIVEN (computed from the same "
    f"scan via a broadcast single-row max, 20-row rate table "
    f"broadcast-joined back), and bit-exactly reproducible in DuckDB "
    f"because every float op involved — division, sqrt, multiply — is "
    f"IEEE exact-rounded with NO multi-term float summation anywhere. "
    f"Membership stays content-addressed md5-vs-hex-threshold like "
    f"q_sample_weighted: zero-shuffle per-row decisions; the only "
    f"shuffles are the tiny stats and report aggregations.",
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("n_chars_src")
    )
    nmax = stats.agg(F.max("n_chars_src").alias("nmax"))
    rates = stats.crossJoin(F.broadcast(nmax)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(TEMP_RATE_BASE)
            * F.sqrt(
                F.col("nmax").cast("double") / F.col("n_chars_src").cast("double")
            ),
        ).alias("keep_rate"),
    )
    u = _u32_hex(F.col("doc_id"), "temp")
    thresh = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(F.col("keep_rate") * F.lit(4294967296.0)),
                    F.lit(4294967295.0),
                ).cast("bigint")
            )
        ),
        8,
        "0",
    )
    # same p==1.0 saturation branch as q_sample_weighted: a capped rate
    # keeps every row, not all-but-'ffffffff'
    kept = (F.col("keep_rate") >= F.lit(1.0)) | (u < thresh)
    return (
        d.join(F.broadcast(rates), "source")
        .select("source", "keep_rate", kept.alias("kept"))
        .groupBy("source", "keep_rate")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select("source", "keep_rate", "n_docs", "n_kept")
        .orderBy("source")
    )


TB_FRACTION = 0.3  # per-source token budget as a fraction of source mass


@register(
    "q_sample_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
               md5('tb:' || CAST(doc_id AS VARCHAR)) AS u
        FROM documents
    ),
    b AS (
        SELECT source, CAST(FLOOR({TB_FRACTION} * SUM(toks)) AS BIGINT) AS budget
        FROM t GROUP BY source
    ),
    c AS (
        SELECT source, toks, u, doc_id,
               SUM(toks) OVER (
                   PARTITION BY source ORDER BY u, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT c.source, b.budget,
           CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN cum <= budget THEN toks ELSE 0 END) AS BIGINT)
               AS tokens_kept
    FROM c JOIN b USING (source)
    GROUP BY c.source, b.budget
    ORDER BY c.source
    """,
    doc=f"Token-budget mixture sampling — the 'fill each source's quota' "
    f"step of LLM data mixing (a mixture recipe is expressed in TOKENS "
    f"per source, not keep probabilities: q_sample_temperature's rates "
    f"hit a budget only in expectation; this hits it exactly): docs are "
    f"taken in content-addressed md5(doc_id) order until the running "
    f"token sum reaches {TB_FRACTION} of the source's mass, so "
    f"membership is reproducible across runs AND stable under corpus "
    f"growth (a doc's position in the hash order never depends on other "
    f"docs' arrival). Exact-integer running sums windowed per source — "
    f"parallel across sources, sequential within (inherent to an exact "
    f"prefix cutoff); the 100 TB path replaces the per-source sort with "
    f"a one-pass quantile sketch over u that estimates the cutoff "
    f"threshold, then a zero-shuffle membership filter like "
    f"q_sample_weighted — exactness of the budget is the trade. Window "
    f"is partitioned by source: no SinglePartition shape (plan-gated).",
)
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_poc_spark.operators.text import words_col

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(words_col()).cast("bigint").alias("toks"),
        _u32_hex(F.col("doc_id"), "tb").alias("u"),
    )
    b = t.groupBy("source").agg(
        F.floor(F.lit(TB_FRACTION) * F.sum("toks")).cast("bigint").alias("budget")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("u", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("toks").over(w))
    return (
        c.join(F.broadcast(b), "source")
        .groupBy("source", "budget")
        .agg(
            F.sum(F.when(F.col("cum") <= F.col("budget"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(
                F.when(F.col("cum") <= F.col("budget"), F.col("toks")).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy("source")
    )
