"""Sessionization (SURVEY.md §2.10): group per-key event timelines into
sessions separated by inactivity gaps.

Two implementations that must agree (cross-checked in tests):
- ``sessionize`` — the classic lag/gap/cumsum window composition
  (SQL-expressible, used for oracle-checked queries).
- ``session_window_agg`` — Spark's native ``session_window`` grouping
  (also the streaming form).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the
    gap since the previous event strictly exceeds ``gap_seconds``.
    Pure window composition — one shuffle on the key."""
    w = Window.partitionBy(*keys).orderBy(ts)
    prev = F.lag(ts).over(w)
    gap = F.col(ts).cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Per-session summary (start, end, events, span) via the window
    recipe — the batch analytics view of sessions."""
    s = sessionize(df, keys, ts, gap_seconds)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(ts).cast("double") - F.min(ts).cast("double")).alias("span_sec"),
    )


def session_window_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap: str,
    aggs: list[Column],
) -> DataFrame:
    """Native ``session_window`` grouping; in streaming mode the same
    expression runs under a watermark. Gap semantics note: Spark's
    session window closes after >= gap of inactivity — events exactly
    ``gap`` apart start a NEW session, whereas :func:`sessionize` uses
    a strict ``>`` — the two agree except for exact-gap ties."""
    return df.groupBy(*keys, F.session_window(F.col(ts), gap)).agg(*aggs)
