"""Aggregation surface beyond plain groupBy (SURVEY.md §2.4):
rollup/cube/grouping sets, pivot/unpivot, exact & approximate
distincts, ordered array agg, statistical aggregates, percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register

R = 4


@register(
    "a1_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dround("SUM(c_acctbal)", 4)} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dround(F.sum("c_acctbal"), R).alias("total_balance"),
        )
    )


@register(
    "a2_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dround("SUM(l_quantity)", 4)} AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dround(F.sum("l_quantity"), R).alias("total_qty"),
    )


@register(
    "a3_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dround("AVG(o_totalprice)", 4)} AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_dround("AVG(o_totalprice)", 4)} AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "a4_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dround("SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)", 2)} AS status_o,
           {sql_dround("SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)", 2)} AS status_f,
           {sql_dround("SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)", 2)} AS status_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def a4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # groupBy().pivot() with explicit value list → no extra pass to
    # discover pivot values, and a scale-safe fixed output schema.
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    piv = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "c_mktsegment",
        dround(F.col("O"), 2).alias("status_o"),
        dround(F.col("F"), 2).alias("status_f"),
        dround(F.col("P"), 2).alias("status_p"),
    )


@register(
    "a5_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part WHERE p_partkey <= 500
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
    FROM part WHERE p_partkey <= 500
    """,
)
def a5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice"),
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")
    )


@register(
    "a6_stats_aggregates",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dround("CORR(l_quantity, l_extendedprice)", 6)} AS qty_price_corr,
           {sql_dround("COVAR_SAMP(l_quantity, l_extendedprice)", 4)} AS qty_price_covar,
           {sql_dround("STDDEV_SAMP(l_extendedprice)", 4)} AS price_stddev,
           {sql_dround("VAR_SAMP(l_discount)", 8)} AS disc_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        dround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        dround(F.covar_samp("l_quantity", "l_extendedprice"), R).alias(
            "qty_price_covar"
        ),
        dround(F.stddev_samp("l_extendedprice"), R).alias("price_stddev"),
        dround(F.var_samp("l_discount"), 8).alias("disc_var"),
    )


@register(
    "a7_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)  AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a7_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


@register("a8_approx_count_distinct")  # sketch params differ across engines → weak
def a8_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "a9_collect_sorted",
    oracle="""
    SELECT r_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
)
def a9_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_list order is partition-dependent → always sort the array
    # before emitting (FIXTURES.md hazard list). CSV-serialized on both
    # sides: the driver canonicalizer can't hash array-typed cells.
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_regionkey")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@register(
    "a10_percentiles",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dround("MEDIAN(c_acctbal)", 4)} AS median_bal,
           {sql_dround("QUANTILE_CONT(c_acctbal, 0.95)", 4)} AS p95_bal,
           {sql_dround("MIN(c_acctbal)", 4)} AS min_bal,
           {sql_dround("MAX(c_acctbal)", 4)} AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` == DuckDB
    # `quantile_cont`); approx_percentile sketches differ across engines
    # and stay out of oracle-checked queries.
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        dround(F.median("c_acctbal"), R).alias("median_bal"),
        dround(F.percentile("c_acctbal", 0.95), R).alias("p95_bal"),
        dround(F.min("c_acctbal"), R).alias("min_bal"),
        dround(F.max("c_acctbal"), R).alias("max_bal"),
    )


@register("a13_approx_percentile")  # t-digest sketch params differ across engines → weak
def a13_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (SURVEY.md §2.4): the sketch-based scale path —
    at 100 TB the exact interpolated percentile needs a full sort per
    group, while the t-digest sketch is one map-side-combinable pass.
    Exact bounds emitted alongside so the weak check still has anchors."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        dround(F.approx_percentile("c_acctbal", 0.5, 10000), R).alias("approx_median"),
        dround(F.approx_percentile("c_acctbal", 0.95, 10000), R).alias("approx_p95"),
        dround(F.min("c_acctbal"), R).alias("min_bal"),
        dround(F.max("c_acctbal"), R).alias("max_bal"),
    )


@register(
    "a11_column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderstatus) AS n_null,
           COUNT(DISTINCT o_orderstatus) AS n_distinct,
           MIN(o_orderstatus) AS min_s, MAX(o_orderstatus) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def a11_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (the exact, SQL-expressible core of
    df.summary()/describe()): per column — row count, null count,
    distinct count, min/max. One row per profiled column via union of
    single-pass aggregates; at scale Catalyst shares the scan via
    cache or the profile runs as one pass with conditional aggs."""
    orders = load_table(spark, sf_dir, "orders")

    def profile(col: str, stringify: bool) -> DataFrame:
        mn, mx = F.min(col), F.max(col)
        if stringify:
            # float→string via the JVM would give Java's formatting;
            # cast on the *collected doubles* side instead: format in
            # SQL-compatible shortest-roundtrip form
            mn, mx = mn.cast("string"), mx.cast("string")
        return orders.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            mn.alias("min_s"),
            mx.alias("max_s"),
        )

    return (
        profile("o_orderstatus", False)
        .unionByName(profile("o_orderpriority", False))
        .unionByName(profile("o_totalprice", True))
    )


@register("a12_freq_items_crosstab")  # df.stat sketches: single-pass
# approximate profiling (freqItems) + contingency counts — shapes are
# engine-specific, so weak-checked; exact profiling lives in a11
def a12_freq_items_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.stat profiling surface: freqItems (single-pass
    heavy-hitter sketch) joined with a crosstab contingency table of
    orderstatus × orderpriority, flattened to stable columns."""
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.stat.freqItems(["o_orderpriority"], support=0.15)
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    n_cols = F.lit(len(ct.columns) - 1)
    return ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("orderstatus"),
        n_cols.alias("n_priority_buckets"),
    ).crossJoin(
        freq.select(
            F.size("o_orderpriority_freqItems").alias("n_frequent_priorities")
        )
    )

@register(
    "a14_regression_aggs",
    oracle=f"""
    SELECT l_returnflag,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
           {sql_dround("REGR_SLOPE(l_extendedprice, l_quantity)", 6)} AS slope,
           {sql_dround("REGR_INTERCEPT(l_extendedprice, l_quantity)", 4)} AS intercept,
           {sql_dround("REGR_R2(l_extendedprice, l_quantity)", 6)} AS r2,
           {sql_dround("REGR_AVGX(l_extendedprice, l_quantity)", 6)} AS avg_qty,
           {sql_dround("REGR_AVGY(l_extendedprice, l_quantity)", 4)} AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a14_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (price ~ quantity per return
    flag): slope/intercept/R² as single-pass distributed aggregates
    with map-side partials — the built-in moment accumulation, no
    two-pass mean-then-residual plan and no driver math."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return lineitem.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        dround(F.regr_slope(y, x), 6).alias("slope"),
        dround(F.regr_intercept(y, x), R).alias("intercept"),
        dround(F.regr_r2(y, x), 6).alias("r2"),
        dround(F.regr_avgx(y, x), 6).alias("avg_qty"),
        dround(F.regr_avgy(y, x), R).alias("avg_price"),
    )
