"""Composite analytical queries, batch 2 — the remaining TPC-H shapes
expressible over the testdata star schema (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode columns; adaptations documented
per-query). Together with :mod:`composites` this covers all of Q1-Q22
(``q_tpch_q2`` rebuilds the min-cost-supplier shape on lineitem-observed
prices since partsupp doesn't exist in the corpus).

No reference analogue (SURVEY.md §2C: the reference has no query
executor); shapes follow the public TPC-H specification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_poc_spark.functions.sqlround import dround
from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _exact_sum2(col, scale: int = 4):
    """Decimal-exact 2-dp rounded sum of a fixed-point expression.

    Testdata prices/discounts are 2-dp, so products like
    ``l_extendedprice * (1 - l_discount)`` are EXACT multiples of 1e-4 —
    but summed as doubles the total can land within 1e-9 of a ``.xx5``
    rounding tie, where Spark and DuckDB (and even two partition orders of
    the same engine) round differently. Rounding each row back to its
    exact ``scale``-dp value, summing as DECIMAL, then rounding HALF_UP is
    deterministic on both engines. :func:`_exact_sum2_sql` is the oracle
    twin.
    """
    return F.round(
        F.sum(F.round(col, scale).cast(f"decimal(28,{scale})")), 2
    ).cast("double")


def _exact_sum2_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(ROUND({expr}, {scale}) "
        f"AS DECIMAL(28,{scale}))), 2) AS DOUBLE)"
    )


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {_exact_sum2_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): region->nation dim chain "
    "broadcast into the fact, local-supplier constraint "
    "(c_nationkey = s_nationkey) applied post-join, revenue per nation. "
    "Only the orders<->lineitem join shuffles; every dim ships broadcast.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            _exact_sum2(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {_exact_sum2_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping): bilateral trade between two "
    "nations by ship year. The nation-pair disjunction is pre-narrowed "
    "into each dim scan (supplier and customer both filter to the two "
    "nations BEFORE joining) so the fact join touches only candidate rows; "
    "the cross-pair predicate then drops the two same-nation combinations.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ["NATION_3", "NATION_7"]
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _exact_sum2(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {dround(
               "SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) "
               "/ SUM(volume)", 4)} AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND p.p_type = 'ECONOMY'
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): seven-table join — part "
    "filter, consuming region via the customer's nation, supplying nation "
    "labelled via a second nation-join — then one nation's share of yearly "
    "volume. Every dimension broadcasts; the conditional-sum ratio uses "
    "the decimal-stabilized rounding twin (dround) because shares can tie "
    "at the 4th decimal.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "nation")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {_exact_sum2_sql("amount")} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%gear%'
    ) AS profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit): parts matching a name "
    "pattern, profit per supplying nation per year. Testdata has no "
    "partsupp.ps_supplycost, so cost is proxied as 0.5 * p_retailprice — "
    "the plan shape (fact + 4 broadcast dims, computed measure, two-key "
    "agg) is identical to spec Q9.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_exact_sum2(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping-mode priority): one ship-year of "
    "slow-shipped lineitems (>30 days after order; testdata has no "
    "l_shipmode/l_commitdate/l_receiptdate), priority split counted "
    "conditionally per returnflag group. The cross-table ship-lag "
    "predicate can only apply post-join; the year bound still pushes to "
    "the lineitem scan.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) AS c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left outer "
    "join keeps order-less customers at count 0 (the filter lives in the "
    "join condition, not WHERE — pre-filtering the right side before an "
    "outer join is the only Spark-side equivalent), then a second "
    "aggregation histograms the counts.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * l.l_quantity, 2)
                        AS DECIMAL(28,2))) AS val
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_8')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS value
    FROM v
    WHERE val > (SELECT SUM(val) * 0.002 FROM v)
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (important stock identification): per-part shipped "
    "value from two nations' suppliers, kept only above a fraction of the "
    "GLOBAL total — the uncorrelated scalar aggregate subquery. Testdata "
    "has no partsupp, so value = shipped l_extendedprice * l_quantity. "
    "Spark side reuses ONE aggregated DataFrame for both branches (Catalyst "
    "caches nothing here, but the re-agg is over the already-narrowed "
    "two-nation slice) and applies the threshold via a broadcast single-row "
    "cross join — no driver collect.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_quantity"), 2).cast(
                    "decimal(28,2)"
                )
            ).alias("val")
        )
    )
    threshold = v.agg((F.sum("val") * 0.002).alias("_cut"))
    return (
        v.crossJoin(F.broadcast(threshold))
        .filter(F.col("val") > F.col("_cut"))
        .select("l_partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q_tpch_q15",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                        AS DECIMAL(28,4))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier, "
    "equality against the scalar MAX of the same derived aggregate (spec "
    "Q15's view used twice). Revenue sums as exact DECIMAL (4-dp per-row "
    "values), so the max-equality and the displayed rounding are "
    "deterministic on both engines and under any partition order.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).cast("decimal(28,4)")
        ).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("_max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct supplier "
    "count per brand/type/size with negated dim predicates and a NOT IN "
    "exclusion subquery (spec excludes complaint suppliers; testdata "
    "proxy = negative account balance). partsupp is absent, so lineitem "
    "provides the part<->supplier incidence; NOT IN becomes a left-anti "
    "join against the (tiny, broadcast) excluded-supplier set.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "q_tpch_q17",
    oracle=f"""
    SELECT {dround("SUM(l.l_extendedprice) / 7.0", 2)} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'MEDIUM'
      AND l.l_quantity < a.qty_cut
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): lineitems below "
    "20% of their part's average quantity, for one brand/type slice. The "
    "spec's correlated scalar subquery decorrelates to a self-aggregation "
    "of lineitem joined back on partkey — expressed directly as that "
    "derived-table join on both engines (same plan Catalyst produces for "
    "the correlated form).",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    cuts = li.groupBy(F.col("l_partkey").alias("cut_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(cuts, li.l_partkey == F.col("cut_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_tpch_q20",
    oracle="""
    SELECT s.s_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%gear%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 60
    )
    AND s.s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 3
    )
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion): suppliers in one "
    "region who moved a large volume of a pattern-matched part in one "
    "year. The spec's partsupp availability check is adapted to shipped "
    "volume (HAVING over supplier x part), keeping the nested-IN chain: "
    "both membership tests become left-semi joins, the inner one fed by "
    "an aggregate.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 60)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 3
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(
            F.broadcast(movers.withColumnRenamed("l_suppkey", "s_suppkey")),
            "s_suppkey",
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_regionkey = 2
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): late = "
    "shipped >90 days after order date (testdata has no l_receiptdate/"
    "l_commitdate). The oracle keeps the spec's doubly-correlated "
    "EXISTS / NOT EXISTS form; the engine computes the equivalent with a "
    "single scan and a two-level aggregation — per (order, supplier), "
    "then per order: supplier count, late-supplier count, the sole late "
    "supplier and its late-row count — keeping multi-supplier orders "
    "whose blame is unshared. Two formulations, same rows: a stronger "
    "differential check than transcribing the SQL.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # Two-level aggregation instead of double countDistinct: two distinct
    # aggregates in one groupBy would Expand every joined row x3; the
    # (order, supplier) pre-agg collapses to ~one row per pair map-side,
    # then the per-order pass needs no distincts at all. 2x faster at
    # sf0.1 and shrinks, not multiplies, at 100 TB.
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).cast("int"),
    )
    per_pair = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("sup_late"), F.sum("late").alias("late_rows")
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("nsupp"),
            F.sum("sup_late").alias("nlate"),
            F.max(F.when(F.col("sup_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
            F.sum(F.when(F.col("sup_late") == 1, F.col("late_rows"))).alias(
                "late_rows"
            ),
        )
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 2
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q_tpch_q2",
    oracle=f"""
    WITH cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               {dround("AVG(l_extendedprice)", 2)} AS avg_price
        FROM lineitem GROUP BY 1, 2
    ),
    min_cost AS (
        SELECT partkey, MIN(avg_price) AS min_price FROM cost GROUP BY 1
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           c.avg_price
    FROM part p
    JOIN cost c ON p.p_partkey = c.partkey
    JOIN min_cost mc ON c.partkey = mc.partkey AND c.avg_price = mc.min_price
    JOIN supplier s ON c.suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size <= 10
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): the testdata has no "
    "partsupp table, so supply cost is each supplier's average observed "
    "lineitem price per part. The engine replaces spec Q2's decorrelated "
    "per-part MIN subquery + equality join-back with a window MIN over "
    "partkey partitions on the (part, supplier) pre-agg — identical "
    "min-tie semantics, one fewer aggregate and one fewer join. Two "
    "plan decisions carry the cost (r12 profiling: 1.8s -> 0.73s solo "
    "at sf0.1): (1) the p_size filter pushes below the aggregate as a "
    "broadcast SEMI-join on partkey — per-part minima only compare "
    "within a partkey, so dropping whole partkeys early is exact and "
    "cuts ~80% of lineitem before any shuffle (at 100 TB, the only "
    "shuffle is over the filtered fact slice); (2) ONE explicit "
    "partkey repartition feeds BOTH the (partkey, suppkey) aggregate "
    "(clustering on a key subset satisfies the groupBy distribution) "
    "and the window — the pre-agg's pairs are near-unique here, so "
    "two-stage partial aggregation shuffled the same volume twice and "
    "AQE then coalesced the small exchanges to 3 tasks, serializing "
    "the hash build. The oracle keeps the textbook join-back "
    "formulation, so the differential check spans two genuinely "
    "different plans. Dims broadcast, and the final ORDER+LIMIT is a "
    "total order (partkey breaks all ties) so the top-100 is "
    "deterministic.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("l_partkey")
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.round(F.avg("l_extendedprice"), 2).alias("avg_price"))
    )
    w = Window.partitionBy("partkey")
    return (
        cost.withColumn("min_price", F.min("avg_price").over(w))
        .filter(F.col("avg_price") == F.col("min_price"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "avg_price")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )
