"""Round-5 aggregation candidates, batch 3 (SURVEY.md §2.4): Apache
DataSketches surfaces built into Spark 4 — the mergeable-sketch
production path for quantiles (KLL) and distinct-set algebra (Theta).

Mergeability is the whole point at 100 TB: per-partition (or
per-day / per-source) sketches are tiny, shippable, and unionable, so
a fleet can maintain rolling quantiles / distinct counts without ever
re-scanning history. Sketch estimates are engine-specific (DuckDB has
no DataSketches), so these register WEAK (rows-only at the driver);
the compensating exactness evidence is (a) exact anchor columns
emitted in the SAME row and (b) tolerance invariants in
tests/test_operators.py pinning estimate-vs-exact error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround
from security_master_spark.plans.registry import register


@register("a20_kll_quantile_merge")  # sketch internals engine-specific → weak
def a20_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantiles via KLL sketches with an EXPLICIT merge
    step: one KLL sketch per order-month (the partial any executor /
    day-job would persist), then `kll_sketch_merge` folds the twelve
    monthly sketches into the global sketch the quantile queries read.
    This is the production telemetry shape — the monthly sketch table
    is O(months · k), the merge is associative/commutative, and
    neither step re-scans the fact table. Exact interpolated
    percentiles (a10's proven pairing) ride along as anchors so the
    weak row is self-evidencing; the tolerance invariant lives in
    tests/test_operators.py::test_kll_estimate_within_tolerance."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
        .groupBy("month")
        .agg(F.kll_sketch_agg_double("price").alias("sk"))
    )
    # kll_sketch_merge_double is a BINARY scalar (merge two sketches),
    # so the fan-in is an explicit fold over the collected partials —
    # 12 monthly sketches on ONE row, not a distributed fold (each
    # sketch is ~KB; the collect_list carries months, not rows).
    merged = monthly.agg(
        F.collect_list("sk").alias("arr"),
        F.count("*").cast("bigint").alias("n_partials"),
    ).select(
        "n_partials",
        F.expr(
            "reduce(slice(arr, 2, greatest(size(arr) - 1, 0)), "
            "element_at(arr, 1), "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk"),
    )
    exact = orders.agg(
        dround(
            F.percentile(F.col("o_totalprice").cast("double"), 0.5), 4
        ).alias("exact_p50"),
        dround(
            F.percentile(F.col("o_totalprice").cast("double"), 0.95), 4
        ).alias("exact_p95"),
    )
    est = merged.select(
        "n_partials",
        dround(
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)), 4
        ).alias("kll_p50"),
        dround(
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)), 4
        ).alias("kll_p95"),
    )
    return est.crossJoin(exact)  # 1 row × 1 row


@register("a21_theta_sketch_sets")  # sketch internals engine-specific → weak
def a21_theta_sketch_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set ALGEBRA via Theta sketches: how many distinct
    users viewed, how many purchased, and — the operation
    approx_count_distinct (a8's HLL) fundamentally cannot do — the
    INTERSECTION (viewers who also purchased) and union, each
    estimated from two per-segment sketches without a joint scan.
    At scale each segment's sketch is maintained incrementally
    (per-day theta_union_agg of daily partials); audience-overlap
    queries then run on sketches alone. Exact counts from one
    two-segment scan ride along as anchors; tolerance pinned in
    tests/test_operators.py::test_theta_set_algebra_within_tolerance."""
    ev = load_table(spark, sf_dir, "events")
    sk = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    v = sk.filter(F.col("event_type") == "view").select(
        F.col("sk").alias("sk_view")
    )
    p = sk.filter(F.col("event_type") == "purchase").select(
        F.col("sk").alias("sk_buy")
    )
    est = v.crossJoin(p).select(  # 1 row × 1 row
        F.round(F.theta_sketch_estimate(F.col("sk_view"))).cast(
            "bigint"
        ).alias("est_viewers"),
        F.round(F.theta_sketch_estimate(F.col("sk_buy"))).cast(
            "bigint"
        ).alias("est_buyers"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_union(F.col("sk_view"), F.col("sk_buy"))
            )
        ).cast("bigint").alias("est_union"),
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("sk_view"), F.col("sk_buy"))
            )
        ).cast("bigint").alias("est_overlap"),
    )
    exact = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).cast("bigint").alias("exact_viewers"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).cast("bigint").alias("exact_buyers"),
    )
    return est.crossJoin(exact)  # 1 row × 1 row
