"""Window-function surface (SURVEY.md §2.5) + sort/top-k (§2.6).

Determinism rule: every ORDER BY inside a window that feeds
row_number/ntile/lag/limit carries a unique tiebreaker column, because
the driver hash is exact and ties would otherwise be engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register

R = 4


@register(
    "w1_ranking_functions",
    oracle="""
    SELECT c_custkey, c_nationkey,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           ROW_NUMBER()   OVER w AS rn,
           NTILE(4)       OVER w AS quartile,
           {pr} AS pctrank,
           {cd} AS cumedist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """.format(
        pr=sql_dround("PERCENT_RANK() OVER w", 6),
        cd=sql_dround("CUME_DIST() OVER w", 6),
    ),
)
def w1_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        dround(F.percent_rank().over(w), 6).alias("pctrank"),
        dround(F.cume_dist().over(w), 6).alias("cumedist"),
    )


@register(
    "w2_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_val"),
        F.nth_value("value", 2).over(wf).alias("second_val"),
    )


@register(
    "w3_moving_average",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           {sql_dround("AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 4)} AS ma3,
           {sql_dround("SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)} AS running_total
    FROM orders
    """,
)
def w3_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        dround(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), R).alias("ma3"),
        dround(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            R,
        ).alias("running_total"),
    )


@register(
    "w4_range_frame",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1000
    FROM supplier
    """,
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy("s_acctbal")
        .rangeBetween(-1000, 0)
    )
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.count("*").over(w).alias("peers_within_1000"),
    )


@register(
    "w5_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w6_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def w6_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plans as TakeOrderedAndProject: per-partition top-25, merge on
    # driver — no global sort at any scale.
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )
