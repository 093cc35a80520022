"""Deduplication operators (✦ north-star, SURVEY.md §2B):

- exact (fingerprint group-by),
- MinHash + LSH band-join near-dedup,
- SimHash signatures,
- n-gram Jaccard with rare-shingle candidate generation,
- embedding near-dup via sign-LSH bucketing.

Everything here is deliberately *oracle-checkable*: hash functions are
md5-hex (byte-identical in Spark and DuckDB) and MinHash takes the
lexicographic min of per-permutation salted md5 strings — a valid uniform
MinHash family that both engines reproduce exactly. At 100 TB the drop-in
upgrade is xxhash64 ints instead of md5 strings (cheaper compare/shuffle);
the plan shapes below are already the scalable ones:

- LSH band-join / bucket-join instead of O(n^2) pairwise comparison,
- rare-shingle candidate generation (df-bounded) before exact Jaccard,
- map-side partial aggregation everywhere (groupBy agg of min() states).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.functions.sqlround import dround
from iceberg_poc_spark.functions.vectors import sign_bucket, sign_bucket_sql
from iceberg_poc_spark.operators.text import shingles_col, shingles_sql, with_words
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table

# ---------------------------------------------------------------- exact dedup


@register(
    "q_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    doc="Exact dedup: one group per distinct text, keeping the smallest "
    "doc_id. At scale: group on md5(text) (q_doc_fingerprint) so the "
    "shuffle key is 16 bytes, not the document.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    ).select("keep_id", "n_copies")


# ------------------------------------------------------------- MinHash + LSH

N_SALTS = 4  # md5 calls per shingle
WORDS_PER_MD5 = 4  # a 128-bit md5 = four independent 32-bit (8-hex) words
N_HASHES = N_SALTS * WORDS_PER_MD5  # 16 minhash functions
N_BANDS = N_SALTS  # band s = the 4 words of salt s
ROWS_PER_BAND = WORDS_PER_MD5
MINHASH_THRESHOLD = 0.5


def _mh_name(i: int) -> str:
    return f"mh{i}"


def _minhash_cols() -> list:
    """16 MinHash values from only 4 md5 calls: each salted
    md5('<s>:'||shingle) is split into four fixed-width 8-hex words, and
    the per-word lexicographic min over shingles is a valid uniform
    MinHash (fixed-width hex min == numeric min). Shared verbatim with the
    oracle SQL."""
    cols = []
    for s in range(N_SALTS):
        h = F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")).cast("binary"))
        for w in range(WORDS_PER_MD5):
            cols.append(
                F.min(F.substring(h, 1 + 8 * w, 8)).alias(
                    _mh_name(s * WORDS_PER_MD5 + w)
                )
            )
    return cols


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs, unique per doc (array_distinct before the
    explode — no extra distinct shuffle needed).

    The input is repartitioned by doc_id first: the corpus arrives as few
    large files, and without the shuffle the whole tokenize/shingle/hash
    pipeline would run at file parallelism (one task here). Hashing by
    doc_id also co-partitions for the downstream groupBy(doc_id), so that
    aggregation reuses the partitioning instead of shuffling again.
    """
    return with_words(docs.repartition(F.col("doc_id"))).select(
        "doc_id", F.explode(F.array_distinct(shingles_col())).alias("shingle")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id + mh0..mh15 MinHash signature columns (map-side partial min
    aggregation: the shuffle carries one 16-word state per doc)."""
    return doc_shingles(docs).groupBy("doc_id").agg(*_minhash_cols())


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Band the signature (4 bands x 4 rows) and self-join per band —
    the LSH bucketing that replaces O(n^2) pairwise comparison. The band
    key is the fixed-width concat of its 4 minhash words (no extra hash
    needed)."""
    band_structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.concat(
                *[F.col(_mh_name(b * ROWS_PER_BAND + r)) for r in range(ROWS_PER_BAND)]
            ).alias("h"),
        )
        for b in range(N_BANDS)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bd")
    ).select("doc_id", F.col("bd.b").alias("b"), F.col("bd.h").alias("h"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.h") == F.col("b.h")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "q_dedup_near",
    oracle=None,  # assembled below; see _minhash_oracle()
    doc="MinHash-LSH near-duplicate pairs with estimated Jaccard "
    "(fraction of agreeing minhashes) >= 0.5.",
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint, NOT .cache(): the signature table feeds the band
    # self-join (both sides) and both verify joins, so it must
    # materialize once per run — but a .cache() here outlives the run
    # (CacheManager matches the identical plan on the next call), so
    # warm re-runs would skip the minhash pass the query declares
    # (VERDICT r12 item 4). A checkpoint is a fresh RDD per run: within-
    # run reuse, zero cross-run reuse.
    sigs = minhash_signatures(docs).localCheckpoint()
    pairs = lsh_candidate_pairs(sigs)
    x = sigs.alias("x")
    y = sigs.alias("y")
    matches = sum(
        F.when(F.col(f"x.mh{i}") == F.col(f"y.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    return (
        pairs.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(N_HASHES)), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= MINHASH_THRESHOLD)
    )


def _minhash_ctes() -> str:
    """Shared oracle CTEs: distinct shingles -> 16 minhash words (4 salted
    md5s x 4 words) -> band rows -> LSH candidate pairs."""
    mh_exprs = ",\n           ".join(
        f"min(substr(md5('{s}:' || shingle), {1 + 8 * w}, 8)) AS mh{s * WORDS_PER_MD5 + w}"
        for s in range(N_SALTS)
        for w in range(WORDS_PER_MD5)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {b} AS b, {cc} AS h FROM mh".format(
            b=b,
            cc=" || ".join(
                f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({shingles_sql()})) AS shingle
        FROM documents
    ),
    mh AS (
        SELECT doc_id,
           {mh_exprs}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h
        WHERE a.doc_id < b.doc_id
    )"""


def _minhash_oracle() -> str:
    match_sum = " + ".join(
        f"CAST(x.mh{i} = y.mh{i} AS INT)" for i in range(N_HASHES)
    )
    return f"""
    {_minhash_ctes()}
    SELECT c.doc_a, c.doc_b,
           ROUND(({match_sum}) / {float(N_HASHES)}, 4) AS est_jaccard
    FROM cand c
    JOIN mh x ON x.doc_id = c.doc_a
    JOIN mh y ON y.doc_id = c.doc_b
    WHERE ROUND(({match_sum}) / {float(N_HASHES)}, 4) >= {MINHASH_THRESHOLD}
    """


# Late-bind the oracle (built programmatically).
from iceberg_poc_spark import registry as _registry  # noqa: E402

_q = _registry.REGISTRY["q_dedup_near"]
_registry.REGISTRY["q_dedup_near"] = _registry.Query(
    name=_q.name, fn=_q.fn, oracle=_minhash_oracle(), doc=_q.doc
)


def _clusters_oracle() -> str:
    """Connected components of the near-dup pair graph as a recursive-CTE
    transitive closure (tractable at oracle scale; the engine runs the
    scalable label-propagation loop instead)."""
    match_sum = " + ".join(
        f"CAST(x.mh{i} = y.mh{i} AS INT)" for i in range(N_HASHES)
    )
    ctes = _minhash_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""
    {ctes},
    pairs AS (
        SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN mh x ON x.doc_id = c.doc_a
        JOIN mh y ON y.doc_id = c.doc_b
        WHERE ROUND(({match_sum}) / {float(N_HASHES)}, 4)
              >= {MINHASH_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    nodes AS (SELECT DISTINCT a AS doc_id FROM edges)
    SELECT n.doc_id, LEAST(n.doc_id, MIN(r.b)) AS cluster_root
    FROM nodes n LEFT JOIN reach r ON r.a = n.doc_id
    GROUP BY n.doc_id
    """


# propagation-loop task sizing: ~2M symmetrized edges (two longs each,
# ~32 MB) per task keeps rounds cheap on small graphs and scalable on
# huge ones
_EDGES_PER_TASK = 2_000_000


@register(
    "q_dedup_clusters",
    oracle=None,  # late-bound below (_clusters_oracle)
    doc="Near-duplicate CLUSTERS from the MinHash-LSH pair graph — the "
    "step real dedup needs after pairwise detection: connected "
    "components, each labeled by its minimum doc_id (the keeper). The "
    "engine runs distributed min-label propagation — O(component "
    "diameter) joined-aggregate rounds with lineage truncated per round "
    "(localCheckpoint here; a checkpoint dir on a cluster), the "
    "GraphX/Pregel pattern without the GraphX dependency. The oracle "
    "computes the same components as a recursive-CTE transitive closure "
    "— fine at oracle scale, quadratic blowup at engine scale, which is "
    "exactly why the engine path iterates instead.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    return _propagate_labels(spark, pairs)


def _propagate_labels(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Distributed min-label propagation over an undirected pair graph —
    (doc_id, cluster_root = component minimum) for every node with at
    least one edge. Shared by the full rebuild (q_dedup_clusters) and
    the daily quotient-graph pass (q_dedup_clusters_incremental)."""
    # symmetrize map-side (explode both directions) — a union of the
    # pairs plan with its swap would run the upstream pipeline twice.
    edges_raw = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
                    ),
                    F.struct(
                        F.col("doc_b").alias("a"), F.col("doc_a").alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .cache()
    )
    # Size the propagation loop by the GRAPH, not a constant: the pair
    # graph is orders of magnitude smaller than the corpus, so each round
    # should cost job-launch time, not |shuffle.partitions| near-empty
    # tasks — but a trillion-edge graph must still fan out. ~_EDGES_PER_
    # TASK edges (~32 MB) per task, capped at the session's shuffle
    # parallelism (the cluster-scale knob). The count doubles as cache
    # materialization, so the upstream pipeline runs exactly once. Hashing
    # on b makes the cached partitioning satisfy the per-round join's
    # distribution on the edges side — only the (shrinking) labels side
    # shuffles each round.
    n_edges = edges_raw.count()
    n_parts = max(
        1,
        min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            (n_edges + _EDGES_PER_TASK - 1) // _EDGES_PER_TASK,
        ),
    )
    edges = edges_raw.repartition(n_parts, "b").cache()
    edges.count()  # materialize from the raw cache, then drop it
    edges_raw.unpersist()
    # Initialize labels with round 1 ALREADY FOLDED IN: with self-labels,
    # the first round's neighbor-min is just min(b) per a, and that min
    # rides the SAME groupBy(a) shuffle the node-list distinct() would
    # cost anyway — one full propagation round for free (guide §1.2:
    # remove passes). least(a, min(b)) == least(label0, nb1) exactly.
    labels = (
        edges.repartition(n_parts, "a")
        .groupBy("a")
        .agg(F.min("b").alias("nb"))
        .select(
            F.col("a").alias("doc_id"),
            F.least(F.col("a"), F.col("nb")).alias("label"),
        )
        # lazy checkpoint: round 1 references labels twice (join side +
        # self-union side); the cut makes the init groupBy run once
        .localCheckpoint(eager=False)
    )
    # min-propagation decreases the label multiset monotonically, so the
    # label SUM is a fixpoint witness: one single-row action per round
    # instead of a join + count.
    #
    # AQE inside the loop: each Exchange becomes its own scheduled
    # stage-job, so a round costs 4-5 job launches instead of 1. AQE's
    # value is runtime re-planning of big shuffles — when the WHOLE graph
    # fits one task (n_parts == 1) there is nothing to coalesce or split,
    # so it is pure per-round scheduling overhead; a big graph (n_parts >
    # 1) keeps AQE on for its skew/coalesce machinery. Scale-adaptive by
    # the same n_parts that sizes the shuffle, not a local-mode constant.
    aqe_off = n_parts == 1
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if aqe_off:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        labels = _propagate_rounds(edges, labels, n_parts)
    finally:
        if aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_root"))


def _propagate_rounds(
    edges: DataFrame, labels: DataFrame, n_parts: int
) -> DataFrame:
    """The fixpoint loop of :func:`_propagate_labels` (split out so the
    AQE toggle around it restores on any exit path)."""
    prev_sum = None
    for _ in range(20):  # bound >> diameter of any near-dup component
        # One aggregation per round instead of join+agg+join: new label =
        # min over (own label ∪ neighbor labels), expressed as the
        # neighbor-join UNIONed with the self rows and a single min — the
        # old shape's second join (labels ⟕ nb) and its exchange are gone
        # (guide §2.4). The explicit repartition(n_parts, a) feeds the
        # groupBy its exact distribution (one exchange, reused), and the
        # round's output partitioning (hash(doc_id, n_parts)) is what the
        # NEXT round's join needs on the labels side.
        labels = (
            edges.join(labels, edges.b == labels.doc_id)
            .select("a", "label")
            .unionByName(
                labels.select(F.col("doc_id").alias("a"), F.col("label"))
            )
            .repartition(n_parts, "a")
            .groupBy("a")
            .agg(F.min("label").alias("label"))
            .select(F.col("a").alias("doc_id"), "label")
            # LAZY checkpoint: the fixpoint sum right below is the
            # round's one action — it materializes the checkpoint as a
            # side effect, so each round costs ONE job instead of two
            # (eager checkpoint job + separate sum job). The lineage cut
            # is identical either way.
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


_qc = _registry.REGISTRY["q_dedup_clusters"]
_registry.REGISTRY["q_dedup_clusters"] = _registry.Query(
    name=_qc.name, fn=_qc.fn, oracle=_clusters_oracle(), doc=_qc.doc
)


# ------------------------------------------------------------------- SimHash

SIMHASH_BITS = 16


@register(
    "q_dedup_simhash",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT doc_id,
           {" || ".join(
               "(CASE WHEN SUM(CASE WHEN substr(md5(word), %d, 1) >= '8'"
               " THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END)" % (i + 1)
               for i in range(SIMHASH_BITS)
           )} AS simhash
    FROM w GROUP BY doc_id
    """,
    doc="SimHash signature (16-bit): per-word md5 hex digit high-bit "
    "votes, sign-aggregated. Multiset word weighting (duplicates vote "
    "repeatedly). Pairing = group by signature or hamming-ball probing.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).withColumn(
        "h", F.md5(F.col("word").cast("binary"))
    )
    votes = [
        F.sum(
            F.when(F.substring("h", i + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    bits = [
        F.when(F.col(f"v{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(SIMHASH_BITS)
    ]
    return agg.select("doc_id", F.concat(*bits).alias("simhash"))


# ----------------------------------------------------- n-gram exact Jaccard

JACCARD_THRESHOLD = 0.5


@register(
    "q_dedup_ngram_jaccard",
    oracle=None,  # assembled below (shares the MinHash CTEs)
    doc="Exact n-gram (3-shingle) Jaccard over LSH candidate pairs — the "
    "textbook two-stage near-dup pipeline: MinHash-LSH proposes a small "
    "candidate set (never O(n^2)), exact set intersection verifies it. "
    "A pair sharing no LSH band is not scored (documented approximation, "
    "mirrored exactly by the oracle).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint (not .cache  — see q_dedup_near): the shingle set
    # feeds the signature agg, the intersection and the size agg;
    # unmaterialized, Spark recomputes the explode per branch; cached,
    # the next RUN would reuse it and stop measuring the declared work.
    sh = doc_shingles(docs).localCheckpoint()
    # sigs too: the band self-join references it on both sides.
    sigs = sh.groupBy("doc_id").agg(*_minhash_cols()).localCheckpoint()
    cand = lsh_candidate_pairs(sigs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    inter = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    jac = F.round(
        F.col("shared").cast("double")
        / (F.col("za.n") + F.col("zb.n") - F.col("shared")),
        4,
    )
    return (
        inter.join(za, F.col("doc_a") == F.col("za.doc_id"))
        .join(zb, F.col("doc_b") == F.col("zb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _ngram_jaccard_oracle() -> str:
    jac = dround("CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared)", 4)
    return f"""
    {_minhash_ctes()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, {jac} AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE {jac} >= {JACCARD_THRESHOLD}
    """


_qj = _registry.REGISTRY["q_dedup_ngram_jaccard"]
_registry.REGISTRY["q_dedup_ngram_jaccard"] = _registry.Query(
    name=_qj.name, fn=_qj.fn, oracle=_ngram_jaccard_oracle(), doc=_qj.doc
)


# --------------------------------------------------- shingle containment

CONTAIN_THRESHOLD = 0.8
CONTAIN_DF_MAX = 4  # candidate shingles must appear in <= this many docs


@register(
    "q_dedup_containment",
    oracle=None,  # assembled below
    doc="Doc-in-doc CONTAINMENT detection — the near-dup class Jaccard "
    "misses by construction: a short document quoted inside a long one "
    "shares ~all of ITS shingles but few of the container's, so "
    "J = |A∩B|/|A∪B| is small while containment C(A⊂B) = |A∩B|/|A| is "
    "~1 (and MinHash-LSH, whose band-collision probability tracks J, "
    "never proposes the pair). Candidates come from a DF-BOUNDED "
    "rare-shingle inverted index instead: shingles appearing in <= "
    f"{CONTAIN_DF_MAX} docs join their posting lists pairwise (fan-out "
    "bounded by df^2 per shingle — never O(n^2); pairs sharing only "
    "common boilerplate shingles are not scored, a documented "
    "approximation the oracle mirrors exactly), then the exact shingle "
    "intersection verifies each candidate and emits directed "
    f"(inner, outer) pairs with containment >= {CONTAIN_THRESHOLD}. "
    "The training-pipeline use is quote/boilerplate leakage: drop or "
    "downweight documents fully contained in another before "
    "near-dedup, which would otherwise keep both.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # per-run localCheckpoint — shared by the df-filter, both
    # intersection sides and the size agg (see q_dedup_near for why
    # .cache() is wrong here)
    sh = doc_shingles(docs).localCheckpoint()
    rare = sh.join(
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= CONTAIN_DF_MAX),
        "shingle",
    ).select("doc_id", "shingle")
    ra, rb = rare.alias("ra"), rare.alias("rb")
    cand = (
        ra.join(
            rb,
            (F.col("ra.shingle") == F.col("rb.shingle"))
            & (F.col("ra.doc_id") != F.col("rb.doc_id")),
        )
        .select(
            F.col("ra.doc_id").alias("inner_id"),
            F.col("rb.doc_id").alias("outer_id"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        cand.join(sa, F.col("inner_id") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("outer_id") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("inner_id", "outer_id")
        .agg(F.count("*").alias("shared"))
    )
    za = sizes.alias("za")
    cont = F.round(F.col("shared").cast("double") / F.col("za.n"), 4)
    return (
        inter.join(za, F.col("inner_id") == F.col("za.doc_id"))
        .select("inner_id", "outer_id", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_THRESHOLD)
    )


def _containment_oracle() -> str:
    cont = dround("CAST(i.shared AS DOUBLE) / za.n", 4)
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({shingles_sql()})) AS shingle
        FROM documents
    ),
    rare AS (
        SELECT doc_id, shingle FROM sh
        WHERE shingle IN (
            SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) <= {CONTAIN_DF_MAX}
        )
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS inner_id, b.doc_id AS outer_id
        FROM rare a JOIN rare b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.inner_id, c.outer_id, COUNT(*) AS shared
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.inner_id
        JOIN sh sb ON sb.doc_id = c.outer_id AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT i.inner_id, i.outer_id, {cont} AS containment
    FROM inter i JOIN sizes za ON za.doc_id = i.inner_id
    WHERE {cont} >= {CONTAIN_THRESHOLD}
    """


_qc = _registry.REGISTRY["q_dedup_containment"]
_registry.REGISTRY["q_dedup_containment"] = _registry.Query(
    name=_qc.name, fn=_qc.fn, oracle=_containment_oracle(), doc=_qc.doc
)


# ------------------------------------------------- embedding near-dup (LSH)

EMB_BUCKET_BITS = 8
# Real corpora dedup at ~0.9; the synthetic embeddings are i.i.d. random
# (max pairwise candidate cosine ~0.43 at sf0.01, ~0.49 at sf0.1), so 0.9
# made the result vacuously empty — an always-0-rows check would also
# pass with a broken bucket join. 0.35 sits near the sf0.01 p99, so the
# threshold filter is exercised with a small nonzero result at the
# correctness SF and stays selective (top ~1% of candidates).
EMB_DUP_THRESHOLD = 0.35


@register(
    "q_dedup_embedding",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               {sign_bucket_sql("embedding", EMB_BUCKET_BITS)} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])), 4)
          >= {EMB_DUP_THRESHOLD}
    """,
    doc="Embedding-cosine near-dup: sign-LSH bucket join (first "
    f"{EMB_BUCKET_BITS} coordinate signs) prunes candidates ~2^-"
    f"{EMB_BUCKET_BITS} before the exact cosine — never O(n^2). Each "
    "vector's L2 norm is computed ONCE before the join (per-row, not "
    "per-pair), so the pairwise hot path is only the dot fold — "
    "numerically identical to folding the full cosine per pair (the "
    "same doubles multiply), at half the per-candidate work.",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_poc_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        sign_bucket(F.col("embedding"), EMB_BUCKET_BITS).alias("bucket"),
        l2_norm(F.col("embedding")).alias("norm"),
    )
    a = emb.alias("a")
    c = emb.alias("c")
    sim = F.round(
        dot(F.col("a.embedding"), F.col("c.embedding"))
        / F.nullif(F.col("a.norm") * F.col("c.norm"), F.lit(0.0)),
        4,
    )
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= EMB_DUP_THRESHOLD)
    )


@register(
    "q_dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               MIN(doc_id) OVER (PARTITION BY text) AS keeper
        FROM documents
    )
    WHERE doc_id = keeper
    """,
    doc="Apply exact dedup to the corpus: emit the SURVIVING rows (the "
    "smallest doc_id per distinct text), i.e. the deduplicated dataset a "
    "training pipeline actually feeds downstream — q_dedup_exact reports "
    "the groups, this materializes the kept documents with their "
    "metadata. One shuffle: a window MIN partitioned by md5(text) (16-"
    "byte shuffle key, never the document body — q_dedup_exact's scale "
    "note made executable), then a per-row keep filter. The oracle "
    "partitions by raw text — identical keepers barring md5 collisions "
    "(2^-64 at corpus scale).",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return keep_first(d)


KEEP_FIRST_SALTS = 8


@register(
    "q_dedup_keep_first_salted",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               MIN(doc_id) OVER (PARTITION BY text) AS keeper
        FROM documents
    )
    WHERE doc_id = keeper
    """,
    doc="The skew-proof form of q_dedup_keep_first, under the SAME oracle "
    "(the two plans must be row-for-row interchangeable): salted "
    "two-phase min — phase 1 windows over (md5(text), doc_id%8) so a "
    "pathologically hot content hash (one boilerplate page duplicated "
    "millions of times) splits across 8 tasks instead of stalling one, "
    "and keeps only local minima; phase 2 re-windows the <=8 surviving "
    "candidates per key for the global keeper. Cost on a uniform corpus: "
    "one extra (tiny, candidates-only) shuffle — which is why the "
    "single-window plan stays the default and this is the documented "
    "escape hatch for dup-heavy corpora. Worst-case smoke with task-size "
    "bounds: tests/test_scale_smoke.py. The crossover is MEASURED, not "
    "hypothetical: at the 100x re-keyed corpus (~100 copies per text, "
    "BENCH_x100.json) the salted plan runs 3.2x FASTER than the single "
    "window (1.6s vs 5.1s) — phase 2 sees only candidates, so dup depth "
    "stops being the window's sort cost.",
)
def q_dedup_keep_first_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return keep_first(d, salt_buckets=KEEP_FIRST_SALTS)


def keep_first(
    d: DataFrame, salt_buckets: int | None = None
) -> DataFrame:
    """Surviving rows of exact dedup: the smallest doc_id per distinct
    text, selected by content hash.

    Default plan (registered query): ONE shuffle — window MIN partitioned
    by md5(text). Each distinct text's rows land in one task; fine while
    duplicate multiplicity stays bounded.

    ``salt_buckets=N`` switches to the salted two-phase min for
    pathologically hot keys (one text duplicated millions of times — a
    boilerplate page at crawl scale): phase 1 windows over
    (md5, doc_id%N), bounding any task's share of a hot key to ~1/N of
    its rows, and keeps only LOCAL minima (the global keeper is by
    definition also a local minimum, so it survives; at most N candidate
    rows per distinct text remain). Phase 2 re-windows the candidates
    over md5 alone — now at most N rows per key, skew-free by
    construction — and keeps the global minimum. Worst-case smoke with
    task-size assertions: tests/test_scale_smoke.py. The tradeoff is a
    second (tiny, candidates-only on dup-heavy data) shuffle, which is
    why the uniform-corpus default stays single-window.
    """
    h = F.md5(F.col("text").cast("binary"))
    if not salt_buckets:
        keeper = F.min("doc_id").over(Window.partitionBy(h))
        return (
            d.withColumn("keeper", keeper)
            .filter(F.col("doc_id") == F.col("keeper"))
            .select("doc_id", "lang", "source", "n_chars")
        )
    salt = F.pmod(F.col("doc_id"), F.lit(salt_buckets))
    local_min = F.min("doc_id").over(Window.partitionBy(h, salt))
    candidates = (
        d.withColumn("lmin", local_min)
        .filter(F.col("doc_id") == F.col("lmin"))
        .drop("lmin")
    )
    keeper = F.min("doc_id").over(
        Window.partitionBy(F.md5(F.col("text").cast("binary")))
    )
    return (
        candidates.withColumn("keeper", keeper)
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "source", "n_chars")
    )


_HOPS_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
        SELECT doc_a AS a, doc_b AS b FROM {pairs}
        UNION
        SELECT doc_b, doc_a FROM {pairs}
    ),
    hops(src, dst, hop) AS (
        SELECT a, b, 1 FROM edges
        UNION ALL
        SELECT DISTINCT h.src, e.b, h.hop + 1
        FROM hops h JOIN edges e ON h.dst = e.a
        WHERE h.hop < 2 AND e.b <> h.src
    )
    SELECT src AS doc_id, dst AS neighbor, CAST(MIN(hop) AS INT) AS hops
    FROM hops
    WHERE src <> dst
    GROUP BY src, dst
"""


@register(
    "q_dedup_hops",
    oracle=None,  # late-bound below (shares the md5 minhash CTEs)
    doc="Bounded 2-hop neighborhoods over the near-dup pair graph: for "
    "each document, every near-duplicate reachable in <=2 hops with its "
    "minimum hop count — the 'expand the dup cluster around this doc' "
    "primitive reviewers use before deleting. The hop bound is a "
    "compile-time constant, so the engine UNROLLS the recursion into a "
    "static plan — hop-1 rows union one edge self-join, min-hop per "
    "(src, dst) — one job per run, where the recursive-CTE executor "
    "(the r12 implementation) re-planned ~20 driver-side jobs per run "
    "and needed a sticky session-global recursion-row-limit override. "
    "DuckDB runs the genuinely RECURSIVE shape (WITH RECURSIVE, "
    "per-iteration DISTINCT) over the shared-hash-family pairs, so the "
    "unroll is value-checked against the recursive semantics at every "
    "SF. Contrast: q_dedup_clusters needs unbounded reach and therefore "
    "uses the label-propagation loop; bounded-radius questions unroll. "
    "Scale shape: inside a dup CLUSTER of k copies the hop-2 join emits "
    "every path — (k-1)^2 rows per node — which the min-hop aggregation "
    "collapses with map-side partial aggregation to the output's own "
    "cardinality, sum-over-clusters k*(k-1) rows.",
)
def q_dedup_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The hop bound is a COMPILE-TIME constant (2), so the recursion
    # unrolls exactly into a static plan (VERDICT r12 item 3): the
    # recursive-CTE executor re-planned and re-scheduled ~20 jobs per
    # run (driver-side planning per iteration, worst scaling ratio on
    # the r12 board at 0.48) and needed a sticky session-global
    # cteRecursionRowLimit override that poisoned the conf for every
    # later query. The unrolled form is the recursion's own algebra —
    #   hops = edges x {hop 1}  UNION  (edges ⋈ edges) x {hop 2}
    #   result = min hop per (src, dst), src <> dst
    # — one job, no recursion guard, no sticky conf; the oracle still
    # runs the IDENTICAL WITH RECURSIVE shape, so the unroll is
    # value-checked against the recursive semantics at every SF.
    pairs = q_dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    # symmetrize map-side (explode both directions, the _propagate_labels
    # trick — a union of the plan with its swap would run the LSH
    # pipeline twice), then materialize ONCE: edges feed three consumers
    # (hop-1 rows + both sides of the hop-2 self-join).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
                    ),
                    F.struct(
                        F.col("doc_b").alias("a"), F.col("doc_a").alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()  # the recursive form's UNION-distinct edge CTE
        .localCheckpoint()
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    hop2 = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .filter(F.col("e2.b") != F.col("e1.a"))
        .select(
            F.col("e1.a").alias("src"),
            F.col("e2.b").alias("dst"),
            F.lit(2).alias("hop"),
        )
    )
    hops = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1).alias("hop")
    ).unionByName(hop2)
    # min-hop dedups the hop-2 path multiplicity and prefers the direct
    # edge, exactly the recursive form's GROUP BY src, dst MIN(hop)
    return (
        hops.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("hop").cast("int").alias("hops"))
        .select(
            F.col("src").alias("doc_id"),
            F.col("dst").alias("neighbor"),
            "hops",
        )
    )


def _hops_oracle() -> str:
    match_sum = " + ".join(
        f"CAST(x.mh{i} = y.mh{i} AS INT)" for i in range(N_HASHES)
    )
    ctes = _minhash_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
    body = _HOPS_RECURSIVE_SQL.format(pairs="pairs")
    # strip the standalone WITH RECURSIVE header; splice into the CTE chain
    body = body.replace("WITH RECURSIVE edges AS", "edges AS", 1)
    return f"""
    {ctes},
    pairs AS (
        SELECT c.doc_a, c.doc_b
        FROM cand c
        JOIN mh x ON x.doc_id = c.doc_a
        JOIN mh y ON y.doc_id = c.doc_b
        WHERE ROUND(({match_sum}) / {float(N_HASHES)}, 4)
              >= {MINHASH_THRESHOLD}
    ),
    {body}
    """


_qh = _registry.REGISTRY["q_dedup_hops"]
_registry.REGISTRY["q_dedup_hops"] = _registry.Query(
    name=_qh.name, fn=_qh.fn, oracle=_hops_oracle(), doc=_qh.doc
)


# ------------------------------------------------- line-level boilerplate

SEG_WORDS = 8  # corpus text is one line of words; fixed 8-word segments
BOILER_MIN_DOCS = 2  # a segment seen in >= 2 distinct docs is boilerplate


def _segments_sql(text: str = "text") -> str:
    """DuckDB twin of the Spark segment expression in
    :func:`q_dedup_lines` (1-based inclusive list slice)."""
    k = SEG_WORDS
    return (
        f"list_transform(range(0, CAST(ceil(len(string_split({text},' '))"
        f" / {k}.0) AS INT)),"
        f" i -> array_to_string(string_split({text},' ')"
        f"[i*{k}+1:i*{k}+{k}], ' '))"
    )


_LINES_REMOVED = f"SUM(CASE WHEN d.df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)"


@register(
    "q_dedup_lines",
    oracle=f"""
    WITH segs AS (
        SELECT doc_id, source, seg
        FROM documents, unnest({_segments_sql()}) AS t(seg)
    ), df AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1
    )
    SELECT s.source,
           CAST(COUNT(DISTINCT s.doc_id) AS BIGINT)    AS n_docs,
           CAST(COUNT(*) AS BIGINT)                    AS n_segments,
           CAST({_LINES_REMOVED} AS BIGINT)            AS n_removed,
           {dround(f"CAST({_LINES_REMOVED} AS DOUBLE) / COUNT(*)", 4)}
               AS removed_ratio
    FROM segs s JOIN df d USING (seg)
    GROUP BY 1
    """,
    doc="Cross-document line-level boilerplate removal (the CCNet/"
    "RefinedWeb 'line-wise dedup' pass): segments repeated across >= "
    f"{BOILER_MIN_DOCS} distinct documents are boilerplate (nav bars, "
    "cookie banners, license footers) and are dropped from every doc, "
    "reported here as per-source removal accounting. The corpus text is "
    f"a single line, so 'lines' are fixed non-overlapping {SEG_WORDS}-"
    "word segments — the operator is the same for newline-split text. "
    "Scale shape: segment doc-frequency is a groupBy on md5(segment) (a "
    "16-byte shuffle key, never the segment text), and marking joins the "
    "exploded stream against the AGGREGATED frequency side on that same "
    "hash — both sides hash-partitioned, no all-pairs step, no driver "
    "state; the whole pass is two shuffles regardless of corpus size. "
    "The oracle joins on the raw segment (identical barring md5 "
    "collisions, the q_dedup_keep_first convention).",
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = SEG_WORDS
    d = with_words(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    w = F.col("__words")
    segs = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / F.lit(float(k))).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
            )
        ).alias("seg"),
    ).withColumn("h", F.md5("seg"))
    # downstream reads only (doc_id, source, h) — drop the segment text
    # before materializing (guide §2.2: shuffle/store the narrow proxy),
    # and checkpoint once so the segmentation explode + md5 pass feeds
    # BOTH the df aggregate and the marking join without re-running.
    segs = segs.select("doc_id", "source", "h").localCheckpoint()
    seg_df = segs.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    marked = segs.join(seg_df, "h")
    removed = F.sum(
        F.when(F.col("df") >= BOILER_MIN_DOCS, F.lit(1)).otherwise(F.lit(0))
    )
    return marked.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_segments"),
        removed.cast("long").alias("n_removed"),
        F.round(removed.cast("double") / F.count("*"), 4).alias("removed_ratio"),
    )


_APPLY_KEPT_SQL = f"""
        SELECT s.doc_id,
               array_to_string(list(s.seg ORDER BY s.pos), ' ') AS kept_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM segs s
        JOIN df d USING (seg)
        WHERE d.df < {BOILER_MIN_DOCS}
        GROUP BY s.doc_id
"""


@register(
    "q_dedup_lines_apply",
    oracle=f"""
    WITH segarrs AS (
        SELECT doc_id, {_segments_sql()} AS segarr FROM documents
    ), segs AS (
        SELECT doc_id,
               unnest(segarr) AS seg,
               generate_subscripts(segarr, 1) AS pos
        FROM segarrs
    ), df AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1
    ), kept AS (
        {_APPLY_KEPT_SQL}
    )
    SELECT d.doc_id,
           COALESCE(k.n_kept, 0) AS n_kept,
           md5(COALESCE(k.kept_text, '')) AS clean_md5
    FROM documents d LEFT JOIN kept k USING (doc_id)
    """,
    doc="APPLY form of q_dedup_lines — materialize the CLEANED corpus: "
    "boilerplate segments are dropped from every document and the "
    "survivors are re-joined IN ORIGINAL ORDER into the post-removal "
    "text each doc feeds downstream (proved by md5 of the rebuilt "
    "string, so a segment lost, kept wrongly, or re-ordered breaks the "
    "hash; fully-boilerplate docs survive as empty strings via the "
    "corpus left join). Scale shape adds one detail over the accounting "
    "query: segment order rides a (pos, seg) struct through the "
    "per-doc aggregation — array_sort of the collected structs, never "
    "a per-group sort shuffle of its own — and reconstruction shuffles "
    "only (doc_id, kept segments), bounded by the corpus itself.",
)
def q_dedup_lines_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = SEG_WORDS
    d = with_words(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    w = F.col("__words")
    segs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / F.lit(float(k))).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
            )
        ).alias("pos", "seg"),
    ).withColumn("h", F.md5("seg"))
    # the df-count aggregate and the keep-join BOTH consume segs —
    # un-materialized, the segmentation explode + md5 pass ran twice
    # (r12-before plan: 2 identical Generate stages). One checkpoint
    # costs the local-disk write a shuffle of segs would anyway, and
    # halves the segmentation compute.
    segs = segs.localCheckpoint()
    seg_df = segs.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    kept = (
        segs.join(seg_df, "h")
        .filter(F.col("df") < BOILER_MIN_DOCS)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "seg"))
                    ),
                    lambda x: x.seg,
                ),
                " ",
            ).alias("kept_text"),
            F.count("*").alias("n_kept"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.md5(F.coalesce(F.col("kept_text"), F.lit(""))).alias("clean_md5"),
    )


def _cluster_apply_oracle() -> str:
    """Wrap the clusters closure as a CTE and pick each cluster's keeper
    (longest text, ties to the smallest doc_id) — the relational twin of
    q_dedup_cluster_apply."""
    base = _clusters_oracle()
    head, tail = base.rsplit("SELECT", 1)
    return f"""{head}, comp AS (SELECT{tail}),
    kc AS (
        SELECT c.cluster_root, c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_root
                                  ORDER BY d.n_chars DESC, c.doc_id ASC)
                   AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.doc_id IS NULL OR k.rn = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN c.doc_id IS NULL OR k.rn = 1
                    THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM documents d
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    LEFT JOIN kc k ON k.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """


@register(
    "q_dedup_cluster_apply",
    oracle=None,  # late-bound below (shares the clusters closure)
    doc="APPLY the near-duplicate clusters — the step that actually "
    "produces the deduped corpus after q_dedup_clusters labels the "
    "components: within each cluster exactly ONE representative "
    "survives (the longest document, ties to the smallest doc_id — "
    "keep-best, not keep-first, because crawl near-dup clusters "
    "usually contain one full page and N truncated copies), and every "
    "unclustered document passes through. Reported per source as "
    "docs/kept/chars — the before/after a dedup run ships to its "
    "dashboard. Engine path: the label-propagation clusters join back "
    "to the corpus, keepers picked by one max_by per cluster "
    "(cluster count << corpus; the join is broadcast-sized at any "
    "scale because only CLUSTERED docs carry labels). The oracle "
    "recomputes the closure recursively and picks keepers with a "
    "window — any membership or tie-break divergence breaks the hash.",
)
def q_dedup_cluster_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = q_dedup_clusters(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # cl holds one row per CLUSTERED doc (near-dup members only — a tiny
    # fraction of the corpus at any scale) and arrives localCheckpointed
    # from _propagate_labels, but its size stats don't survive the
    # checkpoint, so Catalyst planned this as a SortMergeJoin that
    # re-shuffled the ENTIRE corpus on doc_id (guide §3.1: broadcast the
    # side that fits — r12-before plan: SortMergeJoin + 2 Exchange).
    dc = d.join(F.broadcast(cl), "doc_id", "left")
    keepers = (
        dc.filter(F.col("cluster_root").isNotNull())
        .groupBy("cluster_root")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(
                    F.col("n_chars").alias("c"),
                    (F.lit(0) - F.col("doc_id")).alias("t"),
                ),
            ).alias("keeper")
        )
    )
    kept = F.col("cluster_root").isNull() | (F.col("doc_id") == F.col("keeper"))
    return (
        dc.join(F.broadcast(keepers), "cluster_root", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


_qca = _registry.REGISTRY["q_dedup_cluster_apply"]
_registry.REGISTRY["q_dedup_cluster_apply"] = _registry.Query(
    name=_qca.name, fn=_qca.fn, oracle=_cluster_apply_oracle(), doc=_qca.doc
)


# ------------------------------------------------- incremental (daily) dedup

INC_RECRAWL_OFFSET = 1_000_000_000
INC_BATCHDUP_OFFSET = 2_000_000_000
_INC_IDX_READY: set[str] = set()


def _inc_batch(d: DataFrame) -> DataFrame:
    """Today's arrival batch, engineered from the corpus deterministically:
    fresh docs (doc_id % 10 == 0, NOT in the corpus split) + re-crawls
    (corpus docs re-arriving under NEW ids with the same text — the shape
    a crawler actually produces) + an in-batch double of some fresh docs."""
    fresh = d.filter(F.col("doc_id") % 10 == 0)
    recrawl = d.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 9 == 1)
    ).withColumn("doc_id", F.col("doc_id") + F.lit(INC_RECRAWL_OFFSET))
    dup_in_batch = d.filter(F.col("doc_id") % 30 == 10).withColumn(
        "doc_id", F.col("doc_id") + F.lit(INC_BATCHDUP_OFFSET)
    )
    return (
        fresh.unionByName(recrawl)
        .unionByName(dup_in_batch)
        .select(
            "doc_id",
            "source",
            F.md5(F.col("text").cast("binary")).alias("h"),
        )
    )


_NI_READY: set[str] = set()
NI_SUFFIX = " recrawl mirror"
NI_THRESHOLD = MINHASH_THRESHOLD


def _band_rows(sigs: DataFrame) -> DataFrame:
    """(bk = band:hash, doc_id) rows — the LSH posting list."""
    band_structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.concat(
                *[
                    F.col(_mh_name(b * ROWS_PER_BAND + r))
                    for r in range(ROWS_PER_BAND)
                ]
            ).alias("h"),
        )
        for b in range(N_BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bd")
    ).select(
        F.concat(
            F.col("bd.b").cast("string"), F.lit(":"), F.col("bd.h")
        ).alias("bk"),
        "doc_id",
    )


def _ni_batch(d: DataFrame) -> DataFrame:
    """Today's arrivals: fresh docs + re-crawled corpus content under new
    ids with a trailing mutation (near-dup, not exact-dup, of corpus)."""
    fresh = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "source", "text"
    )
    recrawl = d.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 9 == 1)
    ).select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(NI_SUFFIX)).alias("text"),
    )
    return fresh.unionByName(recrawl)


@register(
    "q_dedup_near_incremental",
    oracle=None,  # assembled below; see _near_inc_oracle()
    doc="Incremental NEAR-dedup — q_dedup_incremental's exact-digest "
    "triage upgraded to MinHash-LSH similarity, still WITHOUT rescanning "
    "the corpus: the corpus's LSH band rows (4 bands x 4 minhash words) "
    "and signatures are PERSISTED as bucketed+sorted index tables (built "
    "once at ingest, appendable daily); today's batch (fresh docs + "
    "re-crawled corpus content mutated with a trailing suffix) computes "
    "its own batch-sized signatures, sort-merge-joins its band rows "
    "against the posting-list index — the index side reads bucket-"
    "aligned with ZERO Exchange (asserted in tests/test_plans.py) — and "
    "verifies only the LSH candidates against the persisted corpus "
    "signatures (est_jaccard >= 0.5). Per-source triage (arrived / "
    "near-dup-of-corpus / clean) is the daily ingest report. At 100 TB "
    "this is the near-dup shape that runs every day: the shuffle is "
    "O(batch bands), the corpus contributes pre-bucketed postings and "
    "16-word signatures, never documents.",
)
def q_dedup_near_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from iceberg_poc_spark.sources.bucketed import write_bucketed

    d = load_table(spark, sf_dir, "documents")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = os.path.join(tempfile.gettempdir(), f"niwh_{os.getpid()}_{key}")
    db = f"ninc_{key}"
    if wh not in _NI_READY:
        corpus = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
        sigs = minhash_signatures(corpus)
        write_bucketed(_band_rows(sigs), "band_idx", "bk", 16, db, wh)
        write_bucketed(
            sigs.select(
                F.col("doc_id").alias("corpus_id"),
                *[
                    F.col(_mh_name(i)).alias(f"cmh{i}")
                    for i in range(N_HASHES)
                ],
            ),
            "sig_idx",
            "corpus_id",
            16,
            db,
            wh,
        )
        _NI_READY.add(wh)
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
    batch = _ni_batch(d)
    # per-run localCheckpoint: the batch signatures feed BOTH the band
    # probe and the candidate verification (same pattern — and same
    # cross-run .cache() leak — as q_dedup_near)
    bsigs = minhash_signatures(batch).localCheckpoint()
    cand = (
        _band_rows(bsigs)
        .join(
            spark.table(f"{db}.band_idx")
            .withColumnRenamed("doc_id", "corpus_id")
            .hint("merge"),
            "bk",
        )
        .select("doc_id", "corpus_id")
        .distinct()
    )
    matches = sum(
        F.when(F.col(_mh_name(i)) == F.col(f"cmh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    near = (
        cand.join(spark.table(f"{db}.sig_idx").hint("merge"), "corpus_id")
        .join(bsigs, "doc_id")
        .filter(matches / F.lit(float(N_HASHES)) >= NI_THRESHOLD)
        .select("doc_id")
        .distinct()
        .withColumn("near", F.lit(True))
    )
    return batch.join(near, "doc_id", "left").groupBy("source").agg(
        F.count("*").alias("n_arrived"),
        F.sum(F.col("near").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_near_corpus"),
        F.sum(F.col("near").isNull().cast("int"))
        .cast("bigint")
        .alias("n_clean"),
    )


def _near_inc_oracle() -> str:
    mh_exprs = ",\n           ".join(
        f"min(substr(md5('{s}:' || shingle), {1 + 8 * w}, 8)) AS mh{s * WORDS_PER_MD5 + w}"
        for s in range(N_SALTS)
        for w in range(WORDS_PER_MD5)
    )

    def bands(src: str) -> str:
        return "\n        UNION ALL\n        ".join(
            "SELECT doc_id, {b} AS b, {cc} AS h FROM {src}".format(
                b=b,
                cc=" || ".join(
                    f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
                ),
                src=src,
            )
            for b in range(N_BANDS)
        )

    match_sum = " + ".join(
        f"CAST(x.mh{i} = y.mh{i} AS INT)" for i in range(N_HASHES)
    )
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 1000000000, source, text || '{NI_SUFFIX}'
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 9 = 1
    ),
    csh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct({shingles_sql()})) AS shingle
        FROM corpus
    ),
    cmh AS (SELECT doc_id, {mh_exprs} FROM csh GROUP BY doc_id),
    bsh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct({shingles_sql()})) AS shingle
        FROM batch
    ),
    bmh AS (SELECT doc_id, {mh_exprs} FROM bsh GROUP BY doc_id),
    cbands AS (
        {bands("cmh")}
    ),
    bbands AS (
        {bands("bmh")}
    ),
    cand AS (
        SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
        FROM bbands b JOIN cbands c ON b.b = c.b AND b.h = c.h
    ),
    near AS (
        SELECT DISTINCT cand.bid
        FROM cand
        JOIN bmh x ON x.doc_id = cand.bid
        JOIN cmh y ON y.doc_id = cand.cid
        WHERE ({match_sum}) / {float(N_HASHES)} >= {NI_THRESHOLD}
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_arrived,
           CAST(SUM(CASE WHEN n.bid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_corpus,
           CAST(SUM(CASE WHEN n.bid IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean
    FROM batch b LEFT JOIN near n ON b.doc_id = n.bid
    GROUP BY 1
    """


_qni = _registry.REGISTRY["q_dedup_near_incremental"]
_registry.REGISTRY["q_dedup_near_incremental"] = _registry.Query(
    name=_qni.name, fn=_qni.fn, oracle=_near_inc_oracle(), doc=_qni.doc
)


# -------------------------------- incremental connected components (daily)

_CI_READY: set[str] = set()


def _ci_db(spark: SparkSession, sf_dir: str) -> str:
    """One-time corpus-side artifacts for incremental cluster
    maintenance: the LSH posting index (band_idx), corpus signatures
    (sig_idx), and — the piece q_dedup_near_incremental doesn't have —
    the PERSISTED cluster assignment (assign_idx: corpus doc -> component
    root from a corpus-only label propagation), all bucketed+sorted so
    daily probes sort-merge-join with zero index-side Exchange."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from iceberg_poc_spark.sources.bucketed import write_bucketed

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = os.path.join(tempfile.gettempdir(), f"ciwh_{os.getpid()}_{key}")
    db = f"cinc_{key}"
    if wh in _CI_READY:
        return db
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    sigs = minhash_signatures(corpus).cache()
    write_bucketed(_band_rows(sigs), "band_idx", "bk", 16, db, wh)
    write_bucketed(
        sigs.select(
            F.col("doc_id").alias("corpus_id"),
            *[F.col(_mh_name(i)).alias(f"cmh{i}") for i in range(N_HASHES)],
        ),
        "sig_idx",
        "corpus_id",
        16,
        db,
        wh,
    )
    # the one-time corpus cluster build (daily runs NEVER redo this):
    # LSH pairs within the corpus -> min-label components
    x = sigs.alias("x")
    y = sigs.alias("y")
    matches = sum(
        F.when(F.col(f"x.mh{i}") == F.col(f"y.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    cpairs = (
        lsh_candidate_pairs(sigs)
        .join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .filter(matches / F.lit(float(N_HASHES)) >= NI_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    assign = _propagate_labels(spark, cpairs)
    write_bucketed(
        assign.select(
            F.col("doc_id").alias("corpus_id"),
            F.col("cluster_root").alias("root"),
        ),
        "assign_idx",
        "corpus_id",
        16,
        db,
        wh,
    )
    sigs.unpersist()
    _CI_READY.add(wh)
    atexit.register(shutil.rmtree, wh, ignore_errors=True)
    return db


def _ci_quotient_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily delta graph, BEFORE propagation: today's batch probes
    the posting index for batch↔corpus near-dup pairs (verified against
    the persisted signatures), corpus endpoints collapse to their
    PERSISTED component root through assign_idx (unclustered corpus docs
    stay themselves), and in-batch pairs join as-is. Every shuffle in
    this plan hashes batch-derived keys; all three index scans read
    bucket-aligned with zero Exchange (tests/test_plans.py gates
    `Bucketed: true` x3)."""
    db = _ci_db(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    batch = _ni_batch(d)
    # per-run localCheckpoint (not .cache — see q_dedup_near): feeds the
    # band probe, the signature verify, and the in-batch LSH self-join
    bsigs = minhash_signatures(batch.select("doc_id", "text")).localCheckpoint()
    # ONE distinct for the whole batch↔corpus leg (VERDICT r12 item 1):
    # the band probe emits one row per SHARED BAND (<= N_BANDS dups per
    # pair) and the old shape deduped TWICE more on the way (cand
    # .distinct() + pairs_bc .distinct()) — three exchanges+aggregates
    # where one suffices. Duplicate candidates are join-safe: the verify
    # and assign joins are per-row maps (sig_idx/assign_idx carry one
    # row per corpus_id), so dup probe rows just re-verify — bounded by
    # the band count, a constant — and the quotient .distinct() below
    # collapses them exactly where the result must be a SET anyway.
    cand = (
        _band_rows(bsigs)
        .join(
            spark.table(f"{db}.band_idx")
            .withColumnRenamed("doc_id", "corpus_id")
            .hint("merge"),
            "bk",
        )
        .select("doc_id", "corpus_id")
    )
    matches = sum(
        F.when(F.col(_mh_name(i)) == F.col(f"cmh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    pairs_bc = (
        cand.join(spark.table(f"{db}.sig_idx").hint("merge"), "corpus_id")
        .join(bsigs, "doc_id")
        .filter(matches / F.lit(float(N_HASHES)) >= NI_THRESHOLD)
        .select("doc_id", "corpus_id")
    )
    quotient_bc = (
        pairs_bc.join(
            spark.table(f"{db}.assign_idx").hint("merge"),
            "corpus_id",
            "left",
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            F.coalesce("root", "corpus_id").alias("doc_b"),
        )
        .distinct()
    )
    xb = bsigs.alias("x")
    yb = bsigs.alias("y")
    matches_bb = sum(
        F.when(F.col(f"x.mh{i}") == F.col(f"y.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    pairs_bb = (
        lsh_candidate_pairs(bsigs)
        .join(xb, F.col("doc_a") == F.col("x.doc_id"))
        .join(yb, F.col("doc_b") == F.col("y.doc_id"))
        .filter(matches_bb / F.lit(float(N_HASHES)) >= NI_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return quotient_bc.unionByName(pairs_bb)


@register(
    "q_dedup_clusters_incremental",
    oracle=None,  # assembled below; see _clusters_inc_oracle()
    doc="Incremental CONNECTED-COMPONENT maintenance — the fourth leg of "
    "the incremental dedup triad (exact digests, LSH postings, ANN "
    "cells): instead of label-propagating the FULL pair graph every run "
    "(q_dedup_clusters), the daily batch unions only its NEW pairs "
    "against the PERSISTED cluster assignment. Batch↔corpus pairs come "
    "from the bucketed LSH posting index, corpus endpoints collapse to "
    "their persisted component root (the QUOTIENT-graph trick: a "
    "component is represented by its root, so merging k components "
    "through a batch doc costs k quotient nodes, not their member "
    "count), in-batch pairs join directly, and min-label propagation "
    "runs on this delta graph only. Roots agree with a full rebuild "
    "because every corpus member id >= its root: min over (batch ids + "
    "touched roots) = min over the union component. Returns (doc_id, "
    "cluster_root) for every batch doc in any component; the oracle "
    "recomputes components over the ENTIRE union graph with a "
    "recursive-CTE closure — quadratic at engine scale, which is "
    "exactly what the quotient pass avoids. At 100 TB the daily "
    "shuffles are O(batch bands + touched components); the corpus "
    "contributes pre-bucketed postings, signatures, and one root row "
    "per clustered doc — never documents, never its own pair graph.",
)
def q_dedup_clusters_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    edges = _ci_quotient_edges(spark, sf_dir)
    labels = _propagate_labels(spark, edges)
    # quotient nodes include corpus roots; report the BATCH docs
    return labels.filter(
        (F.col("doc_id") % 10 == 0) | (F.col("doc_id") >= 1_000_000_000)
    )


def _clusters_inc_oracle() -> str:
    """Components of the UNION graph (corpus ∪ today's batch) as a
    recursive-CTE closure, reported for batch docs — the ground truth
    the quotient pass must reproduce exactly."""
    mh_exprs = ",\n           ".join(
        f"min(substr(md5('{s}:' || shingle), {1 + 8 * w}, 8)) AS mh{s * WORDS_PER_MD5 + w}"
        for s in range(N_SALTS)
        for w in range(WORDS_PER_MD5)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {b} AS b, {cc} AS h FROM mh".format(
            b=b,
            cc=" || ".join(
                f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    match_sum = " + ".join(
        f"CAST(x.mh{i} = y.mh{i} AS INT)" for i in range(N_HASHES)
    )
    return f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000, text || '{NI_SUFFIX}'
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 9 = 1
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct({shingles_sql()})) AS shingle
        FROM docs
    ),
    mh AS (SELECT doc_id, {mh_exprs} FROM sh GROUP BY doc_id),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h
        WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM cand
        JOIN mh x ON x.doc_id = doc_a
        JOIN mh y ON y.doc_id = doc_b
        WHERE ({match_sum}) / {float(N_HASHES)} >= {NI_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    nodes AS (SELECT DISTINCT a AS doc_id FROM edges)
    SELECT n.doc_id, LEAST(n.doc_id, MIN(r.b)) AS cluster_root
    FROM nodes n LEFT JOIN reach r ON r.a = n.doc_id
    GROUP BY n.doc_id
    HAVING n.doc_id % 10 = 0 OR n.doc_id >= 1000000000
    """


_qci = _registry.REGISTRY["q_dedup_clusters_incremental"]
_registry.REGISTRY["q_dedup_clusters_incremental"] = _registry.Query(
    name=_qci.name, fn=_qci.fn, oracle=_clusters_inc_oracle(), doc=_qci.doc
)


@register(
    "q_dedup_incremental",
    oracle="""
    WITH batch AS (
        SELECT doc_id, source, md5(text) AS h
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 1000000000, source, md5(text)
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 9 = 1
        UNION ALL
        SELECT doc_id + 2000000000, source, md5(text)
        FROM documents WHERE doc_id % 30 = 10
    ),
    corpus AS (
        SELECT DISTINCT md5(text) AS h
        FROM documents WHERE doc_id % 10 <> 0
    ),
    marked AS (
        SELECT b.source,
               ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn,
               (c.h IS NOT NULL) AS in_corpus
        FROM batch b LEFT JOIN corpus c ON b.h = c.h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_arrived,
           CAST(SUM(CASE WHEN rn = 1 AND NOT in_corpus THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN rn = 1 AND in_corpus THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_corpus,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_batch
    FROM marked GROUP BY 1
    """,
    doc="Incremental (daily-ingest) dedup — the shape a 100 TB pipeline "
    "runs EVERY day, where re-deduping the whole corpus is off the "
    "table: today's batch (fresh docs + re-crawled corpus content under "
    "new ids + an in-batch double) is checked against a PERSISTED "
    "corpus fingerprint index — md5 digests bucketed+sorted on the "
    "digest (built once at ingest, maintained by appending each day's "
    "survivors) — via a sort-merge left join that shuffles ONLY the "
    "batch: the corpus index side reads bucket-aligned with ZERO "
    "Exchange (asserted in tests/test_plans.py: 1 SortMergeJoin, 2 "
    "Exchanges total — batch-side join alignment + final agg; the "
    "in-batch keep-first window reuses the join's hash distribution). "
    "Per-source triage counts (new / corpus-dup / batch-dup) are what "
    "the ingest report actually shows. Digests are 16-byte md5 so the "
    "network moves fingerprints, never documents.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from iceberg_poc_spark.sources.bucketed import write_bucketed

    d = load_table(spark, sf_dir, "documents")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = os.path.join(tempfile.gettempdir(), f"dincwh_{os.getpid()}_{key}")
    db = f"dinc_{key}"
    idx = f"{db}.corpus_digests"
    if wh not in _INC_IDX_READY:
        corpus_h = (
            d.filter(F.col("doc_id") % 10 != 0)
            .select(F.md5(F.col("text").cast("binary")).alias("h"))
            .distinct()
        )
        write_bucketed(corpus_h, "corpus_digests", "h", 16, db, wh)
        _INC_IDX_READY.add(wh)
        atexit.register(shutil.rmtree, wh, ignore_errors=True)
    batch = _inc_batch(d)
    joined = batch.join(
        spark.table(idx).withColumn("in_corpus", F.lit(True)).hint("merge"),
        "h",
        "left",
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    marked = joined.withColumn("rn", F.row_number().over(w))
    new_row = (F.col("rn") == 1) & F.col("in_corpus").isNull()
    dupc_row = (F.col("rn") == 1) & F.col("in_corpus").isNotNull()
    return marked.groupBy("source").agg(
        F.count("*").alias("n_arrived"),
        F.sum(new_row.cast("int")).cast("bigint").alias("n_new"),
        F.sum(dupc_row.cast("int")).cast("bigint").alias("n_dup_corpus"),
        F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dup_batch"),
    )


# ------------------------------------------------- exact-substring dedup

SUBSTR_GRAM = 8  # words per fingerprinted gram
SUBSTR_DF_MAX = 8  # df bound on gram fingerprints (like containment)
SUBSTR_MIN_WORDS = 24  # report pairs sharing a verbatim run this long


def _substring_matches(docs: DataFrame) -> DataFrame:
    """Shared candidate stage of the exact-substring family: df-bounded
    positioned gram fingerprints self-joined into DISTINCT
    (doc_a < doc_b, pa, diag) match coordinates (see q_dedup_substring's
    doc for the full design)."""
    # Pre-split ONCE per row into a bound attribute (the with_words
    # lesson from text.py): a raw split() captured in the transform
    # lambda gets re-evaluated per gram position — higher-order
    # functions are interpreted, not codegen'd, so nothing CSEs the
    # inlined split and each doc re-tokenizes O(words) times. Grams
    # come from 8 try_element_at lookups instead of slice() (no
    # per-position array copy); within the guarded index range every
    # lookup is in bounds, so the gram text is byte-identical to the
    # old slice+concat form. Measured on the fingerprint pass alone:
    # 2.0 s -> 0.4 s at sf0.1.
    d = docs.repartition(F.col("doc_id")).withColumn(
        "__ws", F.split(F.col("text"), " ")
    )
    w = F.col("__ws")
    n = F.size(w)
    idxs = F.when(
        n >= SUBSTR_GRAM,
        F.sequence(F.lit(1), n - (SUBSTR_GRAM - 1)),
    ).otherwise(F.array().cast("array<int>"))

    def gram(i):
        return F.concat_ws(
            " ",
            *[F.try_element_at(w, i + F.lit(j)) for j in range(SUBSTR_GRAM)],
        )

    g = d.select(
        "doc_id",
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("pos"),
                    # unhex: carry the 128-bit fingerprint as 16 BYTES,
                    # not the 32-char hex string md5() returns — halves
                    # fp bytes through the checkpoint, the df-count
                    # exchange, and the posting self-join (guide §2.3
                    # narrower types). Join/count semantics identical:
                    # hex decode is injective.
                    F.unhex(F.md5(gram(i))).alias("fp"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.fp").alias("fp"))
    # Materialize the fingerprint pass ONCE (guide §8.4: compute the
    # lightweight proxy of the heavy text one time, then decide on it).
    # The df-filter aggregate and BOTH posting self-join sides consume g,
    # and Spark only reuses identical EXCHANGES, not arbitrary subtrees —
    # un-checkpointed, the scan+split+md5 stage ran 4x per query (and the
    # whole match pipeline re-ran per downstream reuse in the APPLY leg:
    # 18 parquet scans in its r12-before plan). The repartition ahead of
    # the explode spreads the md5 pass across the cluster instead of one
    # task per input split, and g itself is fingerprints+coords only
    # (16-byte hashes, no text), the small-proxy shape that makes
    # materializing it sane at any corpus scale.
    g = g.localCheckpoint()
    keep = (
        g.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= SUBSTR_DF_MAX))
        .select("fp")
        # keep feeds BOTH sides of the posting self-join; without a
        # materialization the full-g df-count aggregate (2 exchanges
        # over every fingerprint) ran once PER SIDE (r12 plan: two
        # identical keep subtrees). keep is df-bounded fingerprints
        # only — tiny next to g.
        .localCheckpoint()
    )
    gk = g.join(keep, "fp")
    a, b = gk.alias("a"), gk.alias("b")
    # no .distinct(): g is unique on (doc_id, pos) — one fingerprint per
    # gram position — so the self-join cannot emit duplicate
    # (doc_a, doc_b, pa, diag) coordinates; the old distinct was a pure
    # extra exchange (oracle-verified identical at sf0.001/0.01/0.1)
    return a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )


def _substring_islands(m: DataFrame) -> DataFrame:
    """Maximal diagonal runs passing the report threshold — THE shared
    island stage of the substring family: gaps-and-islands over (pair,
    diagonal), grouped to (doc_a, doc_b, diag, cnt, pa0) with
    cnt + GRAM-1 >= SUBSTR_MIN_WORDS. Both the report and the apply
    legs derive from this one definition."""
    win = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = m.select(
        "doc_a",
        "doc_b",
        "diag",
        "pa",
        (F.col("pa") - F.row_number().over(win)).alias("isl"),
    )
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(F.count("*").alias("cnt"), F.min("pa").alias("pa0"))
        .filter(F.col("cnt") + (SUBSTR_GRAM - 1) >= SUBSTR_MIN_WORDS)
    )


@register(
    "q_dedup_substring",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
        SELECT doc_id, i AS pos,
               md5(list_aggregate(ws[i:i+{SUBSTR_GRAM - 1}],
                                  'string_agg', ' ')) AS fp
        FROM (SELECT doc_id, ws,
                     unnest(range(1, len(ws) - {SUBSTR_GRAM - 2})) AS i
              FROM w)
    ),
    keep AS (
        SELECT fp FROM (
            SELECT fp, COUNT(DISTINCT doc_id) AS d FROM g GROUP BY fp
        ) WHERE d BETWEEN 2 AND {SUBSTR_DF_MAX}
    ),
    m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pa, a.pos - b.pos AS diag
        FROM g a JOIN g b USING (fp) JOIN keep USING (fp)
        WHERE a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT doc_a, doc_b, diag,
               pa - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS isl
        FROM (SELECT DISTINCT doc_a, doc_b, pa, diag FROM m)
    )
    SELECT doc_a, doc_b,
           CAST(MAX(cnt) + {SUBSTR_GRAM - 1} AS INT) AS shared_words
    FROM (
        SELECT doc_a, doc_b, diag, isl, COUNT(*) AS cnt
        FROM runs GROUP BY doc_a, doc_b, diag, isl
    )
    GROUP BY doc_a, doc_b
    HAVING MAX(cnt) + {SUBSTR_GRAM - 1} >= {SUBSTR_MIN_WORDS}
    """,
    doc=f"EXACT-SUBSTRING dedup (the RefinedWeb/Gopher leg the family "
    f"lacked — line-level, MinHash, SimHash, containment, and embedding "
    f"dedup all miss a long verbatim run embedded in otherwise-"
    f"different documents): a suffix-array-free approximation that "
    f"finds runs of >= {SUBSTR_MIN_WORDS} words shared verbatim across "
    f"documents. Every overlapping {SUBSTR_GRAM}-word gram becomes a "
    f"16-byte md5 FINGERPRINT with its position (the shuffle never "
    f"carries text); fingerprints are df-bounded (2..{SUBSTR_DF_MAX} "
    f"docs, the containment trick — ubiquitous boilerplate grams "
    f"generate no candidates, identically on both engines); the "
    f"posting self-join emits (docA < docB, posA, posA-posB) match "
    f"coordinates, and a shared substring is exactly a DIAGONAL run: "
    f"gaps-and-islands (pos - row_number over (pair, diagonal)) "
    f"reconstructs maximal consecutive-gram chains in closed form, "
    f"c consecutive grams = c + {SUBSTR_GRAM - 1} shared words. "
    f"Per-pair cost is bounded by df^2 per fingerprint — never "
    f"O(n^2) — and the windows partition by (pair, diagonal), "
    f"thousands of tiny partitions, no skew. The oracle runs the "
    f"identical pipeline relationally; run lengths must agree "
    f"value-for-value.",
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    islands = _substring_islands(_substring_matches(docs))
    return islands.groupBy("doc_a", "doc_b").agg(
        (F.max("cnt") + (SUBSTR_GRAM - 1)).cast("int").alias("shared_words")
    )


@register(
    "q_dedup_substring_apply",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
        SELECT doc_id, i AS pos,
               md5(list_aggregate(ws[i:i+{SUBSTR_GRAM - 1}],
                                  'string_agg', ' ')) AS fp
        FROM (SELECT doc_id, ws,
                     unnest(range(1, len(ws) - {SUBSTR_GRAM - 2})) AS i
              FROM w)
    ),
    keep AS (
        SELECT fp FROM (
            SELECT fp, COUNT(DISTINCT doc_id) AS d FROM g GROUP BY fp
        ) WHERE d BETWEEN 2 AND {SUBSTR_DF_MAX}
    ),
    m AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pa, a.pos - b.pos AS diag
        FROM g a JOIN g b USING (fp) JOIN keep USING (fp)
        WHERE a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT doc_a, doc_b, diag, pa,
               pa - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS isl
        FROM m
    ),
    islands AS (
        SELECT doc_b, MIN(pa) - diag AS pb0, COUNT(*) AS cnt
        FROM runs GROUP BY doc_a, doc_b, diag, isl
        HAVING COUNT(*) + {SUBSTR_GRAM - 1} >= {SUBSTR_MIN_WORDS}
    ),
    drops AS (
        SELECT DISTINCT doc_b AS doc_id,
               unnest(range(pb0, pb0 + cnt + {SUBSTR_GRAM - 1})) AS pos
        FROM islands
    ),
    wp AS (
        SELECT doc_id, unnest(ws) AS word,
               generate_subscripts(ws, 1) AS pos
        FROM w
    )
    SELECT wp.doc_id,
           CAST(COUNT(*) FILTER (d.pos IS NOT NULL) AS BIGINT)
               AS n_removed,
           md5(COALESCE(
               string_agg(word, ' ' ORDER BY wp.pos)
                   FILTER (d.pos IS NULL), '')) AS clean_fp
    FROM wp
    LEFT JOIN drops d ON d.doc_id = wp.doc_id AND d.pos = wp.pos
    GROUP BY wp.doc_id
    HAVING COUNT(*) FILTER (d.pos IS NOT NULL) > 0
    """,
    doc=f"Exact-substring dedup APPLY — the cleaned-corpus leg of "
    f"q_dedup_substring (the q_dedup_lines_apply shape at substring "
    f"granularity): every maximal shared run of >= {SUBSTR_MIN_WORDS} "
    f"words is REMOVED from the losing (higher-id) document — keep-"
    f"first at span level, the RefinedWeb exact-substring cut that "
    f"keeps the rest of the document alive where document-level dedup "
    f"would drop or keep it whole. Diagonal islands reconstruct each "
    f"run's word range in the loser ([pb0, pb0+cnt+{SUBSTR_GRAM - 1})) "
    f"in closed form; ranges from different partners union via "
    f"DISTINCT (doc, pos); the cleanup is one marking LEFT JOIN on "
    f"(doc, position) + an ordered re-assembly per doc — the corpus "
    f"text shuffles once for re-assembly, everything upstream moves "
    f"16-byte fingerprints. Emits (doc_id, n_removed, md5 of the "
    f"cleaned text) for affected docs; a doc entirely inside a partner "
    f"collapses to md5('') — the both-engines contract for empty "
    f"re-assembly. The oracle replays the identical pipeline; a "
    f"off-by-one in the range arithmetic or a missed overlapping span "
    f"changes the fingerprint.",
)
def q_dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    islands = _substring_islands(_substring_matches(docs)).select(
        F.col("doc_b").alias("doc_id"),
        (F.col("pa0") - F.col("diag")).alias("pb0"),
        "cnt",
    )
    drops = (
        islands.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pb0"),
                    F.col("pb0") + F.col("cnt") + (SUBSTR_GRAM - 2),
                )
            ).alias("pos"),
        )
        .distinct()
        # drops feeds BOTH the affected-doc semi-join and the marking
        # join; un-checkpointed, the posting self-join + islands window
        # re-ran once per consumer. drops is (doc_id, pos) ints only —
        # the small decision table of guide §8.4 — so materializing it
        # once is cheap at any scale.
        .localCheckpoint()
    )
    # only AFFECTED documents re-assemble: the output filter keeps docs
    # with >=1 drop, so exploding/sorting the untouched corpus would be
    # pure wasted shuffle — semi-join the doc list first (broadcast
    # small next to the corpus)
    affected = drops.select("doc_id").distinct()
    wp = (
        docs.join(affected, "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("p0", "word"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "word")
    )
    j = wp.join(
        drops.withColumn("__hit", F.lit(1)), ["doc_id", "pos"], "left"
    )
    kept_words = F.array_sort(
        F.collect_list(
            F.when(
                F.col("__hit").isNull(),
                F.struct(F.col("pos"), F.col("word")),
            )
        )
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(kept_words, lambda s: s.word),
                ).cast("binary")
            ).alias("clean_fp"),
        )
        .filter(F.col("n_removed") > 0)
    )
