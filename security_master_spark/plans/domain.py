"""Securities-master domain operators (SURVEY.md §2.11) over the
events table (the fixtures' only time-continuous series): as-of join,
interval/validity join, forward-fill, corporate-action adjustment,
resample/OHLC, returns + rolling vol, SCD latest, sessionization.

The orders/lineitem 1990s dates are disjoint from events' 2024 range
(FIXTURES.md), so point-in-time joins are events-to-events: 'purchase'
rows play the fact quotes, 'view'/'signup' rows play the reference
series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.operators.asof import asof_join
from security_master_spark.operators.intervals import interval_join
from security_master_spark.operators.sessionize import session_stats
from security_master_spark.operators.timeseries import (
    cumulative_product,
    forward_fill,
    latest_per_key,
    ohlc,
    rolling_stats,
)
from security_master_spark.plans.registry import register


@register(
    "d1_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value, v.view_ts, v.view_value
    FROM (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts AS view_ts, value AS view_value
          FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.view_ts <= p.ts
    QUALIFY row_number() OVER (
        PARTITION BY p.event_id
        ORDER BY v.view_ts DESC, v.view_value DESC
    ) = 1
    """,
)
def d1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: for each purchase, the latest prior (or
    simultaneous) view by the same user — the securities-master 'price
    as of date' pattern. Cites SURVEY.md §2.3 (recipe verified exact vs
    DuckDB; until round 9 the oracle was DuckDB's native ASOF JOIN,
    which is hash-equal on tie-free data but leaves duplicate
    (user, view_ts) rows ENGINE-ARBITRARY — the adversarial fixture
    has them, so both sides now pin the tie with view_value DESC; the
    window spelling is the only way DuckDB can express that)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        tiebreak=[F.col("view_value").desc()],
    )


@register(
    "d2_interval_join",
    oracle="""
    WITH intervals AS (
        SELECT user_id, ts AS valid_from,
               COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts),
                        TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
               value AS session_value
        FROM events WHERE event_type = 'signup'
    )
    SELECT e.event_id, e.user_id, e.ts,
           i.valid_from, i.valid_to, i.session_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') e
    JOIN intervals i
      ON e.user_id = i.user_id
     AND i.valid_from <= e.ts AND e.ts < i.valid_to
    """,
)
def d2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-interval (symbol-mapping) join: signup events define
    per-user validity windows [ts, next_ts); clicks map to the window
    containing them. Equi-key hash join + range residual — never a
    nested loop."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    intervals = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.coalesce(
                F.lead("ts").over(w),
                F.lit("2100-01-01 00:00:00").cast("timestamp"),
            ).alias("valid_to"),
            F.col("value").alias("session_value"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        clicks,
        intervals,
        on=["user_id"],
        ts="ts",
        valid_from="valid_from",
        valid_to="valid_to",
    ).select(
        "event_id", "user_id", "ts", "valid_from", "valid_to", "session_value"
    )


@register(
    "d3_forward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           LAST_VALUE(value_gapped IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_gapped
        FROM events
    )
    """,
)
def d3_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote carry-forward: error events have no valid quote (NULL);
    carry the last observed value per user. last(ignorenulls) over a
    running frame == LAST_VALUE IGNORE NULLS."""
    events = load_table(spark, sf_dir, "events")
    gapped = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("value_gapped"),
    )
    filled = forward_fill(
        gapped, keys=["user_id"], ts="ts", cols=["value_gapped"]
    )
    # forward_fill orders by ts only; event_id tiebreak for exactness:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return gapped.select(
        "event_id",
        "user_id",
        "ts",
        F.last("value_gapped", ignorenulls=True).over(w).alias("value_filled"),
    )


@register(
    "d4_adjustment_factor",
    oracle=f"""
    SELECT user_id, ts, event_id,
           {sql_dround("SUM(LN(1.0 + value / 1000.0)) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)} AS cum_log_factor
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def d4_adjustment_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corporate-action style cumulative adjustment: running product of
    per-event factors (1 + value/1000) per user in time order, carried
    in LOG space — a built-in windowed agg, no UDF. SURVEY.md §2.11.

    Log space is the scale contract, not a convenience: a linear
    running product of thousands of factors overflows double (the
    adversarial skew fixture drives one user's product past 1e8 within
    days, where a single exp/ln libm ulp exceeds the rounding quantum
    and ultimately the product hits inf). The additive log form stays
    in a few-thousand magnitude band at any history length; consumers
    exp() a bounded SLICE (factor between two dates = exp(diff of two
    cum logs)), never the unbounded prefix."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", (1.0 + F.col("value") / 1000.0).alias("factor")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return purchases.select(
        "user_id",
        "ts",
        "event_id",
        dround(F.sum(F.log("factor")).over(w), 4).alias("cum_log_factor"),
    )


@register(
    "d5_daily_ohlc",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS bucket,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('day', ts)
                   ORDER BY ts ASC, event_id ASC) AS rn_open,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, DATE_TRUNC('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT user_id, bucket,
           MAX(CASE WHEN rn_open = 1 THEN value END)  AS open,
           MAX(value)                                 AS high,
           MIN(value)                                 AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*)                                   AS n_obs
    FROM ranked
    GROUP BY user_id, bucket
    """,
)
def d5_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to daily OHLC bars per user: single-pass min_by/max_by
    (no self-joins), the canonical EOD-bar construction. Open/close
    break same-instant ties on event_id (the ohlc operator's struct
    ordering key) — real feeds DO carry same-instant prints, and the
    adversarial tie fixture showed arg-by-timestamp alone is
    engine-arbitrary there."""
    events = load_table(spark, sf_dir, "events")
    return ohlc(
        events, keys=["user_id"], ts="ts", price="value", every="day",
        tiebreak="event_id",
    )


@register(
    "d6_returns_rolling_vol",
    oracle=f"""
    WITH daily AS (
        -- close = last print of the day, event_id breaks same-instant
        -- ties (ARG_MAX(value, ts) alone is engine-arbitrary on them)
        SELECT user_id, d, value AS close FROM (
            SELECT user_id,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, DATE_TRUNC('day', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        WHERE rn = 1
    ), ret AS (
        SELECT user_id, d, close,
               close / LAG(close) OVER (PARTITION BY user_id ORDER BY d) - 1.0 AS ret
        FROM daily
    )
    SELECT user_id, d, {sql_dround("close", 4)} AS close,
           {sql_dround("ret", 6)} AS ret,
           {sql_dround("STDDEV_SAMP(ret) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)", 6)} AS vol5
    FROM ret
    """,
)
def d6_returns_rolling_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily close → simple returns → 5-bar rolling volatility. The
    lag/stddev window stack every quant pipeline runs."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("close")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    ret = daily.withColumn(
        # try_divide: a zero prior close yields NULL, matching DuckDB's
        # x/0 → NULL — ANSI `/` would instead throw, and zero closes
        # do occur from sf0.1 up (column pruning hides this from
        # count()-only checks, so keep the full-collect sim honest).
        "ret", F.try_divide(F.col("close"), F.lag("close").over(w)) - 1.0
    )
    wv = w.rowsBetween(-4, 0)
    return ret.select(
        "user_id",
        "d",
        dround(F.col("close"), 4).alias("close"),
        dround(F.col("ret"), 6).alias("ret"),
        dround(F.stddev_samp("ret").over(wv), 6).alias("vol5"),
    )


@register(
    "d7_scd_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def d7_scd_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD 'current record': newest event per user — the upsert-view
    over an append-only log (reference pattern: latest vendor record
    per symbol)."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        order=[F.desc("ts"), F.desc("event_id")],
    )


@register(
    "d8_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           EPOCH(MAX(ts)) - EPOCH(MIN(ts)) AS span_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def d8_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via the lag/cumsum recipe;
    the native session_window twin is cross-checked in tests
    (SURVEY.md §2.10: both yielded identical session counts)."""
    events = load_table(spark, sf_dir, "events")
    return session_stats(events, keys=["user_id"], ts="ts", gap_seconds=1800)


@register(
    "d9_eod_pipeline",
    oracle=f"""
    WITH prices AS (
        SELECT p.p_partkey AS symbol_id,
               t.day AS day,
               {sql_dround("p.p_retailprice * (1 + t.day / CAST(100 AS DOUBLE))", 6)}
                   AS close
        FROM part p, UNNEST(generate_series(1, 5)) AS t(day)
        WHERE p.p_partkey <= 300
    ), with_ret AS (
        SELECT symbol_id, day, close,
               close / LAG(close) OVER (PARTITION BY symbol_id ORDER BY day) - 1
                   AS ret
        FROM prices
    )
    SELECT symbol_id, day, close,
           {sql_dround("COALESCE(ret, 0)", 8)} AS ret,
           {sql_dround(
               "EXP(SUM(LN(1 + COALESCE(ret, 0))) OVER "
               "(PARTITION BY symbol_id ORDER BY day "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))", 6)}
               AS growth_factor
    FROM with_ret
    """,
)
def d9_eod_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end securities EOD pipeline — the reference's whole job in
    one plan: ingest a (stubbed, deterministic) vendor price feed →
    per-symbol daily returns (lag) → cumulative growth factor via the
    exp·sum·log window product (the corporate-action adjustment
    machinery of d4 applied to returns). Every stage is a window or
    projection over the (symbol, day) partitioning — one shuffle total."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    days = F.explode(F.sequence(F.lit(1), F.lit(5))).alias("day")
    prices = part.select(
        F.col("p_partkey").alias("symbol_id"), F.col("p_retailprice"), days
    ).select(
        "symbol_id",
        F.col("day").cast("long").alias("day"),
        dround(
            F.col("p_retailprice") * (1 + F.col("day") / F.lit(100.0)), 6
        ).alias("close"),
    )
    w = Window.partitionBy("symbol_id").orderBy("day")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ret = prices.withColumn(
        "ret",
        F.coalesce(
            F.try_divide(F.col("close"), F.lag("close").over(w)) - 1, F.lit(0.0)
        ),
    )
    return with_ret.select(
        "symbol_id",
        "day",
        "close",
        dround(F.col("ret"), 8).alias("ret"),
        dround(F.exp(F.sum(F.log(1 + F.col("ret"))).over(cum)), 6).alias(
            "growth_factor"
        ),
    )


@register(
    "d11_skew_safe_rollup",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           MIN(o_totalprice) AS min_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def d11_skew_safe_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join + aggregation, value-identical to the plain
    forms (salt changes placement, never matching): the fact side joins
    through ``salted_join`` (dim replicated per salt value, hot keys
    spread over salt tasks) and the rollup runs through ``skewed_agg``
    (partial on (key, salt), final on key). Aggregates chosen
    order-independent-exact (count, integer sum, min/max) so the salted
    re-association cannot drift a float sum; the oracle is the plain
    SQL join + GROUP BY."""
    from security_master_spark.operators.skew import salted_join, skewed_agg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        orders,
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"],
        salt=8,
    )
    agg = skewed_agg(
        joined,
        keys=["c_mktsegment"],
        aggs={"o_orderkey": "sum", "o_custkey": "count",
              "o_totalprice": "min"},
        salt=8,
    )
    return agg.select(
        "c_mktsegment",
        F.col("count_o_custkey").alias("n_orders"),
        F.col("sum_o_orderkey").alias("key_checksum"),
        F.col("min_o_totalprice").alias("min_price"),
    )


@register(
    "d10_calendar_align",
    oracle=f"""
    WITH cal AS (
        SELECT CAST(d.d AS TIMESTAMP) AS day
        FROM UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-30',
                                    INTERVAL 1 DAY)) AS d(d)
    ), daily AS (
        SELECT DATE_TRUNC('day', ts) AS day,
               COUNT(*) AS n_events,
               {sql_dround("SUM(value)", 4)} AS total_value
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT cal.day,
           COALESCE(daily.n_events, 0) AS n_events,
           COALESCE(daily.total_value,
                    LAST_VALUE(daily.total_value IGNORE NULLS)
                        OVER (ORDER BY cal.day ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)) AS total_value
    FROM cal LEFT JOIN daily ON cal.day = daily.day
    """,
)
def d10_calendar_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trading-calendar alignment: a generated complete calendar dim
    left-joined against observed daily aggregates — missing sessions
    get count 0 and a forward-filled value (the quote-carry rule).
    The calendar is a broadcastable generated dim; at scale the join
    partitions by date like any fact⋈date-dim."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value"), 4).alias("total_value"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined = cal.join(daily, "day", "left")
    return joined.select(
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce(
            "total_value", F.last("total_value", ignorenulls=True).over(w)
        ).alias("total_value"),
    )
