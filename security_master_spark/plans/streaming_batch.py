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


@register("t3_session_window_native")  # native session_window: weak check;
# cross-validated against the SQL-expressible lag/cumsum twin (d8) in tests
def t3_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
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
