"""Scalar function surface: string / date / math / array / JSON.

The reference's only scalar logic is epoch-time bucketing
(``aig/AIGEventsTableCreator.java:226-234``,
``aig/TimeBasedPartitioningExamples.java:129-141``) and string formatting
(``HiddenPartitionLoaderWithKMS.java:203``). The engine exposes the
PySpark built-in surface; everything here runs JVM-side inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_poc_spark.functions.sqlround import dround
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS name_up,
           SUBSTR(c_name, 1, 8)                            AS name_head,
           c_mktsegment || '/' || c_name                   AS seg_name,
           regexp_extract(c_name, '([0-9]+)', 1)           AS name_num
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
    doc="upper/substr/concat/LIKE/regexp_extract.",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("c_name")).alias("seg_name"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_num"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                      AS y,
           CAST(month(o_orderdate) AS INT)                     AS m,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
               AS days_since_epoch_start
    FROM orders
    """,
    doc="year/month/date_trunc/datediff — the declarative version of the "
    "reference's hand-written time bucketing.",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@register(
    "q_fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {dround('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)} AS charge,
           ROUND(ABS(l_extendedprice - 30000), 2)                     AS abs_diff,
           CAST(FLOOR(l_quantity) AS BIGINT)                          AS qty_floor,
           ROUND(POWER(l_discount, 2), 6)                             AS disc_sq
    FROM lineitem
    """,
    doc="round/abs/floor/power arithmetic, all codegen'd.",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_diff"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_words,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           string_split(text, ' ')[1]                      AS first_word
    FROM documents
    """,
    doc="Array functions over tokenized text: size/contains/indexing.",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        words.getItem(0).alias("first_word"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    doc="JSON extraction from the events.props string column.",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_mod")).agg(F.count("*").alias("n"))


@register(
    "q_fn_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END AS status_name
    FROM orders
    """,
    doc="CASE WHEN (searched + simple forms).",
)
def q_fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_name"),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           map(['qty','price','disc'],
               [l_quantity, l_extendedprice, l_discount])['qty'][1] AS qty_v,
           cardinality(map(['qty','price','disc'],
               [l_quantity, l_extendedprice, l_discount])) AS n_keys,
           array_to_string(map_keys(map(['qty','price','disc'],
               [l_quantity, l_extendedprice, l_discount])), ',') AS keys_csv
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    doc="Map construction + map_keys / element access (insertion order "
    "preserved by both engines).",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("disc"), F.col("l_discount"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_v"),
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255          AS low_byte,
           o_orderkey | 4096         AS with_flag,
           xor(o_orderkey, 21845)    AS xored,
           o_orderkey << 2           AS shl,
           o_orderkey >> 3           AS shr
    FROM orders
    WHERE o_orderkey <= 4000
    """,
    doc="Bitwise scalar functions (and/or/xor/shifts) — the hash/flag "
    "manipulation toolkit.",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@register(
    "q_fn_nulls",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg,
           IFNULL(NULLIF(c_acctbal, 0.0), -1.0)                  AS bal,
           CAST(c_acctbal IS NOT NULL AS INT)                    AS has_bal
    FROM customer
    """,
    doc="NULL-handling scalars: coalesce / nullif / ifnull / IS NOT NULL.",
)
def q_fn_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("REDACTED")
        ).alias("seg"),
        F.ifnull(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias("bal"),
        F.col("c_acctbal").isNotNull().cast("int").alias("has_bal"),
    )


@register(
    "q_fn_struct",
    oracle="""
    WITH r AS (
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS p,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey AS top_orderkey, p AS top_totalprice
    FROM r WHERE rn = 1
    """,
    doc="Struct construction, lexicographic struct comparison, and field "
    "access — the argmax idiom: max(struct(price, key)) finds each "
    "customer's highest-value order in ONE aggregation pass (map-side "
    "partials included) where the naive form needs a groupBy + self-join. "
    "The oracle is the equivalent window top-1 with the same tiebreak.",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.round("o_totalprice", 2).alias("p"), F.col("o_orderkey").alias("k")
    )
    return (
        o.groupBy("o_custkey")
        .agg(F.max(s).alias("s"))
        .select(
            "o_custkey",
            F.col("s.k").alias("top_orderkey"),
            F.col("s.p").alias("top_totalprice"),
        )
    )


@register(
    "q_fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_quarter,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate) + 1 AS dow,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS iso_week
    FROM orders
    WHERE o_orderkey % 37 = 0
    """,
    doc="Calendar arithmetic scalars: add_months (end-of-month clamping, "
    "matched by DuckDB's month-interval addition), last_day, dayofweek "
    "(Spark is 1=Sunday, DuckDB 0=Sunday — offset in the oracle), "
    "quarter, ISO week number. All codegen'd JVM expressions.",
)
def q_fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus_quarter"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) AS k,
           event_type,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) < 10
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="VariantType (Spark 4): parse_json once into the binary "
    "semi-structured encoding, then typed path extraction with "
    "variant_get — the scale answer to get_json_object re-parsing the "
    "string on every access (q_fn_json shows that form). The oracle is "
    "DuckDB's json_extract over the same paths.",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("k"), "event_type")
        .filter(F.col("k") < 10)
        .groupBy("k", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("k", "event_type")
    )


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.org/' || lang || '/doc/'
                   || CAST(doc_id AS VARCHAR) || '?ref=' || source
                   || '&id=' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1)        AS url_host,
           regexp_extract(url, 'https?://[^/]+([^?#]*)', 1)  AS url_path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1)        AS url_ref,
           regexp_extract(url, '^([a-z]+)://', 1)            AS url_proto
    FROM u
    """,
    doc="URL parsing — the web-corpus staple (domain grouping, "
    "canonicalization, ref stripping at CommonCrawl scale): build a "
    "deterministic URL per document, then decompose it with Spark's "
    "JVM-side parse_url (HOST/PATH/QUERY-key/PROTOCOL) while the oracle "
    "decomposes the identical string with regexes — two independent "
    "parser implementations agreeing byte-for-byte. Pure map-side "
    "projection: no shuffle, whole-stage codegen end to end.",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("url_ref"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("url_proto"),
    )


@register(
    "q_fn_xml",
    oracle="""
    WITH x AS (
        SELECT '<o id="' || CAST(o_orderkey AS VARCHAR) || '"><prio>'
               || o_orderpriority || '</prio><cust>'
               || CAST(o_custkey AS VARCHAR) || '</cust></o>' AS xml
        FROM orders
    )
    SELECT CAST(regexp_extract(xml, 'id="(\\d+)"', 1) AS BIGINT)          AS okey,
           regexp_extract(xml, '<prio>([^<]*)</prio>', 1)                AS prio,
           CAST(regexp_extract(xml, '<cust>(\\d+)</cust>', 1) AS BIGINT) AS cust
    FROM x
    """,
    doc="XML decode (Spark 4 built-in from_xml — no spark-xml package "
    "needed): each order is serialized to an XML fragment (integers and "
    "strings only, so serialization is byte-identical cross-engine), "
    "then parsed back with an explicit schema covering the attribute "
    "(_id) and both typed children. The oracle decomposes the identical "
    "fragment with regexes: two independent XML readers agreeing "
    "value-for-value. Engine choice note: xpath_string() measured ~14x "
    "slower here (6.97 s vs 0.51 s over 150k rows at sf0.1 — it "
    "re-evaluates an XPath per call), so schema'd from_xml is the only "
    "XML path this engine ships in a hot loop. Pure map-side "
    "projection, one scan, no shuffle.",
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit('<o id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><prio>'),
        F.col("o_orderpriority"),
        F.lit("</prio><cust>"),
        F.col("o_custkey").cast("string"),
        F.lit("</cust></o>"),
    )
    parsed = F.from_xml(xml, "`_id` BIGINT, `cust` BIGINT, `prio` STRING")
    return o.select(
        parsed.getField("_id").alias("okey"),
        parsed.getField("prio").alias("prio"),
        parsed.getField("cust").alias("cust"),
    )


@register(
    "q_fn_try",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {dround("l_extendedprice / NULLIF(l_linenumber - 3, 0)", 4)}
               AS per_unit,
           TRY_CAST(l_returnflag AS INTEGER)  AS flag_num,
           CASE WHEN l_linenumber <= 2
                THEN string_split('a b', ' ')[l_linenumber] END AS tok
    FROM lineitem
    """,
    doc="Error-safe scalar family (Spark 4 runs ANSI mode by default, "
    "where 1/0 and bad casts are runtime ERRORS that kill the job at "
    "row 3 billion): try_divide turns division-by-zero into NULL, "
    "try_cast turns unparseable strings into NULL, try_element_at "
    "indexes past array bounds as NULL. The oracle reproduces each with "
    "DuckDB's NULLIF / TRY_CAST / guarded-index equivalents. The "
    "dirty-data survival kit for 100 TB ingestion — one malformed row "
    "must never abort a corpus-scale job.",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 3), 4
        ).alias("per_unit"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias(
            "flag_num"
        ),
        F.try_element_at(
            F.split(F.lit("a b"), " "), F.col("l_linenumber").cast("int")
        ).alias("tok"),
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key (≙ the per-tenant KMS data key)


@register(
    "q_fn_crypto",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                            AS h_md5,
           sha256(c_name)                         AS h_sha256,
           lower(hex(CAST(c_name AS BLOB)))       AS name_hex,
           to_base64(CAST(c_name AS BLOB))        AS name_b64,
           c_name                                 AS aes_roundtrip
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
    doc="Hash / encoding / encryption surface: md5 + sha2-256 digests "
    "(content addressing — the primitive every dedup and split operator "
    "here builds on), hex + base64 encodings, and an AES-GCM "
    "encrypt/decrypt round-trip with a literal data key — the in-engine "
    "analogue of the reference's per-tenant KMS envelope encryption "
    "(aig/AIGEventsTableCreator.java:369-383, sources/aws.py carries the "
    "real KMS routing). The oracle can't see ciphertext (GCM IVs are "
    "random per call), so it checks what IS deterministic: the decrypted "
    "plaintext must come back byte-identical. All six expressions are "
    "JVM intrinsics in one codegen'd projection — no shuffle, no Python.",
)
def q_fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    key = F.lit(AES_KEY)
    name_bin = F.col("c_name").cast("binary")
    return c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.md5(name_bin).alias("h_md5"),
        F.sha2(name_bin, 256).alias("h_sha256"),
        F.lower(F.hex(name_bin)).alias("name_hex"),
        F.base64(name_bin).alias("name_b64"),
        F.aes_decrypt(F.aes_encrypt(name_bin, key), key)
        .cast("string")
        .alias("aes_roundtrip"),
    )


@register(
    "q_fn_collation",
    oracle="""
    WITH t AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT lower(seg) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM t GROUP BY lower(seg) ORDER BY segment
    """,
    doc="Spark 4 COLLATION support (COLLATE UTF8_LCASE): the segment "
    "column is deliberately case-mangled per row, then grouped under a "
    "case-insensitive collation — the dirty-ingest reality where "
    "'BUILDING' and 'building' are the same category. Collated grouping "
    "happens in the hash-aggregate itself (no normalizing projection in "
    "the engine path); the deterministic group label is max(lower(seg)) "
    "— constant within a collated group. The oracle normalizes with "
    "lower() instead, so the two engines must agree on the grouping "
    "collation semantics exactly.",
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(f"cust_col_{tag}")
    return spark.sql(f"""
        WITH t AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg
            FROM cust_col_{tag}
        )
        SELECT max(lower(seg)) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM t GROUP BY seg COLLATE UTF8_LCASE
        ORDER BY segment
    """)


@register(
    "q_fn_lambda",
    oracle="""
    SELECT doc_id,
           CAST(length(list_filter(string_split(text, ' '),
                                   x -> length(x) > 4)) AS INT)   AS n_long,
           length(list_filter(string_split(text, ' '),
                              x -> x = 'spark')) > 0              AS has_spark,
           length(list_filter(string_split(text, ' '),
                              x -> NOT length(x) > 0)) = 0        AS all_nonempty,
           CAST(list_aggregate(list_transform(string_split(text, ' '),
                                              x -> length(x)),
                               'sum') AS BIGINT)                  AS total_chars,
           list_aggregate(
               list_filter(string_split(text, ' '),
                   x -> length(x) = list_aggregate(
                       list_transform(string_split(text, ' '),
                                      y -> length(y)), 'max')),
               'min')                                             AS longest
    FROM documents
    """,
    doc="Higher-order lambda functions over array columns — the full "
    "Catalyst lambda surface (filter / exists / forall / aggregate-fold "
    "/ reduce) that similarity and multimodal internals lean on, gated "
    "as its own query: long-word count (filter), token membership "
    "(exists), emptiness invariant (forall), character total via an "
    "explicit fold with a BIGINT accumulator (aggregate), and the "
    "longest token by a deterministic (length, lexicographic) fold "
    "seeded with ''. The oracle states the fold's closed form instead "
    "(min over the max-length tokens): DuckDB 1.0's list_reduce "
    "returns wrong values for ~7% of rows under full-table vectorized "
    "execution (verified: correct row-at-a-time with a WHERE, wrong "
    "in bulk — an engine bug, sidestepped, which is exactly the kind "
    "of cross-engine check this gate exists for). All "
    "five are codegen'd JVM lambda expressions on the un-exploded "
    "array — no row expansion, no shuffle, no Python; at 100 TB the "
    "array never leaves the scan task, which is why lambdas beat "
    "explode-aggregate-reimplode for per-document array math.",
)
def q_fn_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda x: F.length(x) > 4)).alias("n_long"),
        F.exists(words, lambda x: x == "spark").alias("has_spark"),
        F.forall(words, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.length(x).cast("bigint"),
        ).alias("total_chars"),
        F.aggregate(
            words,
            F.lit(""),
            lambda a, b: F.when(
                (F.length(b) > F.length(a))
                | ((F.length(b) == F.length(a)) & (b < a)),
                b,
            ).otherwise(a),
        ).alias("longest"),
    )
