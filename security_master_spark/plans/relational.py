"""Core relational surface: scan/filter/project, joins, aggregation,
sets, sort/limit, subqueries (SURVEY.md §2.1-2.4, 2.6, 2.7, 2.9).

Float discipline: every double-valued aggregate is rounded (ROUND n
digits) identically on the Spark side and in the oracle SQL, because
summation order differs across engines and the driver hash-compares
values. Keys/counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register

R = 4  # decimal places for double aggregates (both engines)


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary.
# Exercises scan → pushed filter → hash agg (partial+final) → sort in one
# plan; at scale this is a single shuffle on a 6-value grouping key.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR((SUM(l_quantity)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                                        AS sum_qty,
           FLOOR((SUM(l_extendedprice)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                                   AS sum_base_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                AS sum_disc_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)  AS sum_charge,
           FLOOR((AVG(l_quantity)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                                        AS avg_qty,
           FLOOR((AVG(l_extendedprice)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                                   AS avg_price,
           FLOOR((AVG(l_discount)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), R).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), R).alias("sum_base_price"),
            dround(F.sum(disc_price), R).alias("sum_disc_price"),
            dround(F.sum(disc_price * (1 + F.col("l_tax"))), R).alias("sum_charge"),
            dround(F.avg("l_quantity"), R).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), R).alias("avg_price"),
            dround(F.avg("l_discount"), R).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Star join: orders ⋈ customer ⋈ nation ⋈ region with dim broadcast.
# nation/region are tiny → explicit broadcast() keeps them map-side at any
# scale; only the orders⋈customer join shuffles.
# --------------------------------------------------------------------------
@register(
    "q2_star_join_revenue",
    oracle="""
    SELECT r_name, n_name,
           FLOOR((SUM(o_totalprice)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS total_revenue,
           COUNT(*)                    AS order_count
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q2_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dround(F.sum("o_totalprice"), R).alias("total_revenue"),
            F.count("*").alias("order_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: top unshipped orders by revenue. Sort+limit plans as
# TakeOrderedAndProject (per-partition top-k, then driver merge — no full
# sort at scale). Tiebreak on unique o_orderkey keeps LIMIT deterministic.
# --------------------------------------------------------------------------
@register(
    "q3_top_orders",
    oracle="""
    SELECT l_orderkey,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Filter battery: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL, CASE WHEN.
# All predicates push to the parquet scan (PushedFilters) — verified via
# explain in tests.
# --------------------------------------------------------------------------
@register(
    "q4_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class
    FROM part
    WHERE (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') OR p_name LIKE '%blue%')
      AND p_size BETWEEN 5 AND 45
      AND NOT (p_retailprice IS NULL)
      AND p_type NOT LIKE 'PROMO%'
    """,
)
def q4_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            | F.col("p_name").like("%blue%")
        )
        & F.col("p_size").between(5, 45)
        & F.col("p_retailprice").isNotNull()
        & ~F.col("p_type").like("PROMO%")
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


# --------------------------------------------------------------------------
# Outer joins: customers with/without order activity in a window.
# --------------------------------------------------------------------------
@register(
    "q5_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey)                    AS order_count,
           FLOOR((COALESCE(SUM(o_totalprice), 0)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
         AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    """,
)
def q5_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lo = F.lit("1994-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1995-01-01 00:00:00").cast("timestamp")
    cond = (
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= lo)
        & (F.col("o_orderdate") < hi)
    )
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), R).alias(
                "total_spent"
            ),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins — EXISTS / NOT EXISTS. Planned as LeftSemi/LeftAnti
# hash joins (no row multiplication, no wide shuffle of the probe side
# payload).
# --------------------------------------------------------------------------
@register(
    "q6_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
)
def q6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q7_anti_join",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
    )
    """,
)
def q7_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_anti"
    ).select("p_partkey", "p_name")


# --------------------------------------------------------------------------
# Set operations (Spark union == SQL UNION ALL).
# --------------------------------------------------------------------------
@register(
    "q8_set_ops",
    oracle="""
    WITH big_cust AS (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    ),
    big_supp AS (
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    )
    SELECT nationkey, 'both' AS side FROM (SELECT * FROM big_cust INTERSECT SELECT * FROM big_supp)
    UNION ALL
    SELECT nationkey, 'cust_only' AS side FROM (SELECT * FROM big_cust EXCEPT SELECT * FROM big_supp)
    """,
)
def q8_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    big_cust = (
        customer.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    big_supp = (
        supplier.filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    both = big_cust.intersect(big_supp).withColumn("side", F.lit("both"))
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep dups.
    cust_only = big_cust.subtract(big_supp).withColumn("side", F.lit("cust_only"))
    return both.unionByName(cust_only)


# --------------------------------------------------------------------------
# Scalar + correlated subqueries (Catalyst decorrelates to joins).
# --------------------------------------------------------------------------
@register(
    "q9_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, FLOOR((c_acctbal) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q9_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, FLOOR((c_acctbal) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


@register(
    "q10_groupby_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS order_count,
           FLOOR((AVG(o_totalprice)) * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE) AS avg_price
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def q10_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_count"),
            dround(F.avg("o_totalprice"), R).alias("avg_price"),
        )
        .filter(F.col("order_count") >= 12)
    )


@register(
    "q11_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > 400000
    )
    """,
)
def q11_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via SQL — Catalyst decorrelates it into a left
    semi join (SURVEY.md §4: RewriteCorrelatedScalarSubquery family),
    so the physical plan is the same shuffle as q6_semi_join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        """
    )


@register(
    "q12_in_subquery",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
      AND p_retailprice > 1200
    """,
)
def q12_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelated to semi join) stacked with a plain
    pushed-down predicate."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
          AND p_retailprice > 1200
        """
    )


@register(
    "q13_lateral_topn",
    oracle="""
    SELECT n.n_name, o.o_orderkey, o.o_totalprice
    FROM nation n,
         LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders, customer
            WHERE o_custkey = c_custkey AND c_nationkey = n.n_nationkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
         ) o
    """,
)
def q13_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-2 orders per nation. Both
    engines support SQL LATERAL; Spark plans it as the same
    window-rank pattern as w5_topk_per_group."""
    for t in ("nation", "orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM nation n,
             LATERAL (
                SELECT o_orderkey, o_totalprice
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE c_nationkey = n.n_nationkey
                ORDER BY o_totalprice DESC, o_orderkey
                LIMIT 2
             ) o
    """
    )


@register(
    "q14_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           r.r_regionkey = n.n_regionkey AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def q14_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (5×25) — crossJoin is
    legitimate only when one side is tiny; Spark plans it as
    BroadcastNestedLoopJoin."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


@register(
    "q15_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def q15_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination: total order (price, then unique key)
    makes OFFSET deterministic. At scale prefer keyset pagination
    (WHERE (price, key) < last_seen) — OFFSET must sort-and-skip."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )
