"""Round-5 relational batch 4 (SURVEY.md §2.3): the null-safe
equi-join (`<=>` / `IS NOT DISTINCT FROM`).

Plain equi-joins silently drop NULL keys on both sides (NULL = NULL
is NULL); the null-safe operator treats NULL as a joinable value — the
semantics you need when a bucketing/categorization column legitimately
produces "uncategorized" and those rows must still pair up. q5's outer
joins keep unmatched rows; this keeps MATCHED-on-NULL rows — a
different, frequently-confused axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.plans.registry import register


def _bucket_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < 0 THEN NULL"
        f" ELSE CAST(FLOOR({col} / 1000) AS BIGINT) END"
    )


@register(
    "q23_null_safe_join",
    oracle=f"""
    WITH c AS (
        SELECT {_bucket_sql("c_acctbal")} AS bucket,
               COUNT(*) AS n_customers
        FROM customer GROUP BY 1
    ), s AS (
        SELECT {_bucket_sql("s_acctbal")} AS bucket,
               COUNT(*) AS n_suppliers
        FROM supplier GROUP BY 1
    )
    SELECT c.bucket, c.n_customers, s.n_suppliers,
           CAST(c.n_customers * s.n_suppliers AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.bucket IS NOT DISTINCT FROM s.bucket
    """,
)
def q23_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: customers and suppliers bucketed by
    account-balance band, where negative balances produce a
    legitimate NULL bucket ("delinquent") that MUST still pair — a
    plain `=` join returns zero rows for that band and silently
    understates it. Spark spells it `eqNullSafe`; the oracle is ANSI
    `IS NOT DISTINCT FROM` — cross-dialect certification of the same
    three-valued-logic escape hatch.

    Scale: both sides collapse to O(buckets) rows BEFORE the join
    (counts multiply instead of materializing the pair fan-out), so
    the null-safe comparison — which Spark hash-partitions exactly
    like a plain key (NULL hashes to a bucket like any value) —
    touches dimension-sized inputs only."""
    bucket = lambda c: F.when(  # noqa: E731
        F.col(c) < 0, F.lit(None).cast("bigint")
    ).otherwise(F.floor(F.col(c) / 1000).cast("bigint"))
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(bucket("c_acctbal").alias("bucket"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(bucket("s_acctbal").alias("bucket"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c["bucket"].eqNullSafe(s["bucket"])).select(
        c["bucket"].alias("bucket"),
        "n_customers",
        "n_suppliers",
        (F.col("n_customers") * F.col("n_suppliers"))
        .cast("bigint")
        .alias("n_pairs"),
    )
