"""Time-window aggregations (SURVEY.md §2.10) in batch mode — the same
``F.window``/``session_window`` expressions run under readStream with a
watermark (see streaming/jobs.py); batch execution makes them
oracle-checkable.

Window-origin note: Spark's tumbling/sliding windows align to the Unix
epoch. The oracles reproduce bucket starts with explicit epoch
arithmetic (FLOOR(epoch/width)*width) rather than DuckDB time_bucket,
so alignment is identical by construction.

Dtype note: DuckDB ``TO_TIMESTAMP`` returns TIMESTAMPTZ, which reaches
the driver's pandas canonicalizer as ``datetime64[us, Etc/UTC]`` and
schema-mismatches Spark's naive ``window.start`` (the round-2 t1/t2
reds). Every generated timestamp is therefore wrapped in
``CAST(... AS TIMESTAMP)`` — same pattern as d10_calendar_align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.functions.rounding import dround, sql_dround
from security_master_spark.plans.registry import register


@register(
    "t1_tumbling_window",
    oracle=f"""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 86400) * 86400) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           {sql_dround("SUM(value)", 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling windows per event type. In streaming: identical
    groupBy(window(...)) under withWatermark."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "t2_sliding_window",
    oracle=f"""
    WITH slid AS (
        SELECT e.*,
               CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 21600) * 21600 - k.k * 21600) AS TIMESTAMP) AS w_start
        FROM events e,
             (SELECT unnest(generate_series(0, 3)) AS k) k
    )
    SELECT w_start, COUNT(*) AS n_events,
           {sql_dround("AVG(value)", 4)} AS avg_value
    FROM slid
    WHERE w_start + INTERVAL 1 DAY > ts
    GROUP BY w_start
    """,
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows sliding every 6h: each event lands in 4 windows.
    Spark expands this internally the same way the oracle does
    (explode over k∈0..3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day", "6 hours"))
        .agg(
            F.count("*").alias("n_events"),
            dround(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("w_start"), "n_events", "avg_value"
        )
    )


@register(
    "t3_session_window_native",
    oracle=f"""
    WITH gapped AS (
        -- integer-µs boundary math (EPOCH would do it in double
        -- seconds, whose ~2.4e-7 s ulp at epoch magnitude can flip an
        -- event within ~1 µs of the exact 30-min boundary) — mirrors
        -- operators/trailing.py's exact-integer-units rule
        SELECT user_id, ts, value,
               MAX(EPOCH_US(ts) + 1800000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max_end
        FROM events
    ), marked AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_max_end IS NULL
                         OR EPOCH_US(ts) >= prev_max_end
                    THEN 1 ELSE 0 END AS new_session
        FROM gapped
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, new_session DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dround("SUM(value)", 4)} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def t3_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-min gap). Weak-checked r2-r7;
    since round 8 it carries a full hash oracle — the t4 lag/cumsum
    sessionization specialized to a fixed gap. The ``new_session
    DESC`` tiebreak on the cumsum pins equal-timestamp events into the
    session their earliest twin opened, matching Spark's time-only
    session assignment; session intervals are half-open (an event at
    exactly prev_end starts a new session: ``>= prev_max_end``)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), dround(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "t4_dynamic_session_window",
    oracle=f"""
    WITH gapped AS (
        -- integer-µs boundary math, exactly as t3's oracle (round-10
        -- fix): EPOCH would compare in double seconds, whose ~2.4e-7 s
        -- ulp at epoch magnitude can flip an event within ~1 µs of a
        -- dynamic-gap boundary — the round-11 close of the last
        -- double-seconds session oracle (operators/trailing.py
        -- exact-integer-units rule).
        SELECT user_id, ts, value,
               MAX(EPOCH_US(ts) + CASE WHEN event_type = 'purchase'
                                       THEN 3600000000
                                       ELSE 1800000000 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max_end
        FROM events
    ), marked AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_max_end IS NULL
                         OR EPOCH_US(ts) >= prev_max_end
                    THEN 1 ELSE 0 END AS new_session
        FROM gapped
    ), sessions AS (
        -- new_session DESC tiebreak (t3's equal-ts rule): a tied
        -- opener must precede its same-ts peers in the cumsum, else
        -- an engine-arbitrary intra-ts order can strand a peer in the
        -- PREVIOUS session even though its opener's interval covers it
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, new_session DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dround("SUM(value)", 4)} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def t4_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (Spark's `session_window` with a
    gap EXPRESSION): a purchase keeps the session alive for an hour,
    anything else for 30 minutes — the per-event-importance
    sessionization real attribution models use, and a surface the
    fixed-gap t3 can't express. Unlike t3 (weak by design), the
    dynamic form IS SQL-expressible through the lag/cumsum
    sessionization recipe — so the native operator gets a FULL
    value-level oracle: same session boundaries, counts, and sums,
    hash-checked. The semantics the oracle pins (and the sf0.01 gate
    caught getting wrong on the first cut): sessions are the UNION of
    per-event intervals [ts, ts + own_gap), so a new session starts
    iff ts ≥ the running MAX window end over all earlier session rows
    — NOT iff the gap to the previous ROW is exceeded. With mixed
    gaps a long-gap event can bridge over a short-gap successor, and
    two rows at sf0.01 did exactly that. Round 11: the oracle's
    boundary math moved from double-second EPOCH to integer-µs
    EPOCH_US (+3_600_000_000 / +1_800_000_000), and its session cumsum
    gained t3's ``new_session DESC`` equal-ts tiebreak — the last
    session oracle carrying either hazard."""
    events = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("1 hour")).otherwise(
        F.lit("30 minutes")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            dround(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
