"""Round-5 securities-master batch 6 (SURVEY.md §2.11): fixed-income
analytics — bond present value, Macaulay/modified duration, and
convexity.

The equity-side risk stack (d39 VaR/ES, d24 beta, d15/d51 drawdown)
had no fixed-income sibling; this adds the cash-flow-discounting
family every securities master carries next to its instrument table.

Registered past the driver's ~50-entry correctness cap on purpose
(see plans/registry.py) — driver rows come in round 5; until then the
local oracle mirror (tests/test_correctness.py) proves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register

_FACE = 100.0


@register(
    "d54_bond_analytics",
    oracle=f"""
    WITH bonds AS (
        SELECT s_suppkey,
               2.0 + (s_suppkey % 7) AS coupon_pct,
               2 + (s_suppkey % 9) AS years,
               3.0 + (s_suppkey % 5) AS yield_pct
        FROM supplier
    ), flows AS (
        SELECT b.s_suppkey, b.coupon_pct, b.years, b.yield_pct,
               t.t,
               ({_FACE} * b.coupon_pct / 100
                + CASE WHEN t.t = b.years THEN {_FACE} ELSE 0 END) AS cf,
               POWER(1 + b.yield_pct / 100, -t.t) AS df
        FROM bonds b, LATERAL (
            SELECT UNNEST(generate_series(1, b.years)) AS t
        ) t
    ), agg AS (
        SELECT s_suppkey, MAX(yield_pct) AS yield_pct,
               SUM(cf * df) AS price,
               SUM(t * cf * df) AS tpv,
               SUM(cf * t * (t + 1) * df) AS conv_num
        FROM flows
        GROUP BY s_suppkey
    )
    SELECT s_suppkey,
           {sql_dround("price", 6)} AS price,
           {sql_dround("tpv / price", 6)} AS macaulay_duration,
           {sql_dround(
               "tpv / price / (1 + yield_pct / 100)", 6)}
               AS modified_duration,
           {sql_dround(
               "conv_num / (price * POWER(1 + yield_pct / 100, 2))", 6)}
               AS convexity
    FROM agg
    """,
)
def d54_bond_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bond analytics from first principles: price = Σ CFₜ·(1+y)⁻ᵗ,
    Macaulay duration = Σ t·PVₜ / price, modified duration =
    Macaulay/(1+y), convexity = Σ CFₜ·t·(t+1)·(1+y)⁻ᵗ / (price·(1+y)²)
    — the interest-rate risk ladder (ΔP ≈ −D_mod·Δy + ½·C·Δy²) a
    fixed-income master publishes per instrument. Synthetic annual-pay
    bonds are minted deterministically from supplier keys (coupon,
    tenor, flat yield).

    Shape: the cash-flow schedule is a closed-form explode over
    ``sequence(1, years)`` (tenor-bounded — ≤10 rows per bond, the
    honest relational form of a per-instrument loop), then ONE hash
    aggregate per bond collects the three discounted sums every
    statistic is algebra over. No window, no join, one shuffle of
    per-bond partials. Pricing 10M instruments is embarrassingly
    parallel — exactly this plan."""
    supp = load_table(spark, sf_dir, "supplier")
    s = F.col("s_suppkey")
    bonds = supp.select(
        "s_suppkey",
        (F.lit(2.0) + (s % 7)).alias("coupon_pct"),
        (F.lit(2) + (s % 9)).alias("years"),
        (F.lit(3.0) + (s % 5)).alias("yield_pct"),
    )
    flows = bonds.select(
        "s_suppkey",
        "coupon_pct",
        "years",
        "yield_pct",
        F.explode(F.sequence(F.lit(1), F.col("years"))).alias("t"),
    ).select(
        "s_suppkey",
        "yield_pct",
        "t",
        (
            F.lit(_FACE) * F.col("coupon_pct") / 100
            + F.when(F.col("t") == F.col("years"), F.lit(_FACE)).otherwise(
                0.0
            )
        ).alias("cf"),
        F.pow(1 + F.col("yield_pct") / 100, -F.col("t")).alias("df"),
    )
    agg = flows.groupBy("s_suppkey").agg(
        F.max("yield_pct").alias("yield_pct"),
        F.sum(F.col("cf") * F.col("df")).alias("price"),
        F.sum(F.col("t") * F.col("cf") * F.col("df")).alias("tpv"),
        F.sum(
            F.col("cf") * F.col("t") * (F.col("t") + 1) * F.col("df")
        ).alias("conv_num"),
    )
    one_y = 1 + F.col("yield_pct") / 100
    return agg.select(
        "s_suppkey",
        dround(F.col("price"), 6).alias("price"),
        dround(F.col("tpv") / F.col("price"), 6).alias("macaulay_duration"),
        dround(F.col("tpv") / F.col("price") / one_y, 6).alias(
            "modified_duration"
        ),
        dround(
            F.col("conv_num") / (F.col("price") * F.pow(one_y, 2)), 6
        ).alias("convexity"),
    )
