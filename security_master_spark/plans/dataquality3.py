"""Round-5 data-quality batch 3 (SURVEY.md §2 DQ adjunct): financial
reconciliation — header totals vs line-item recomputation.

dq9 audits KEYS (referential integrity); dq10 audits VALUES: does the
order header's total equal the TPC-H invariant recomputed from its
lines, Σ extendedprice·(1−discount)·(1+tax)? On this synthetic
fixture the answer is deliberately "no, never" (the generator draws
totals independently — verified: 0 of 14,743 orders match at sf0.01),
which is exactly what a reconciliation report is FOR: the operator's
output is the mismatch distribution a controller actually reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register

_TOL = 0.01  # relative tolerance for "reconciled"


@register(
    "dq10_order_reconciliation",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                   AS computed
        FROM lineitem GROUP BY l_orderkey
    ), j AS (
        SELECT o.o_orderstatus, o.o_totalprice, li.computed,
               ABS(o.o_totalprice - li.computed) AS adiff
        FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN computed IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_no_lines,
           CAST(SUM(CASE WHEN adiff <= {_TOL} * o_totalprice
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
           {sql_dround("AVG(adiff)", 4)} AS mean_abs_diff,
           {sql_dround("MAX(adiff)", 4)} AS max_abs_diff
    FROM j
    GROUP BY o_orderstatus
    """,
)
def dq10_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: per order status, how many
    order totals match the line-item recomputation within 1 %, the
    mismatch magnitude distribution, and headers with no lines at
    all. The classic overnight-batch control report (and the TPC-H
    consistency check the spec itself defines for o_totalprice).

    Shape: one hash agg collapses lineitem to per-order sums (the
    shuffle carries (orderkey, double) — map-side partials do the
    heavy lifting), one key join against headers, one tiny rollup.
    At 100 TB this is the same two-shuffle posture as any fact-fact
    key join; AQE handles residual skew on hot orders."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("computed")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    j = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        "o_totalprice",
        "computed",
        F.abs(F.col("o_totalprice") - F.col("computed")).alias("adiff"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("computed").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_no_lines"),
        # multiply form, not adiff/total: a zero-total header crashed
        # ANSI division on the adversarial fixture; the predicate is
        # the same expression tree in the oracle (d19 associativity
        # rule), and a zero-total zero-diff header counts reconciled
        F.sum(
            F.when(F.col("adiff") <= _TOL * F.col("o_totalprice"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_reconciled"),
        dround(F.avg("adiff"), 4).alias("mean_abs_diff"),
        dround(F.max("adiff"), 4).alias("max_abs_diff"),
    )
