"""Interval / validity-range join (SURVEY.md §2.3): attach the
dimension row whose validity window contains the fact timestamp —
symbol-change / point-in-time mapping tables.

OSS Spark plans a pure range predicate as a broadcast-nested-loop
join; adding the equi-key keeps it a hash join with a residual range
filter, which is the scalable form. For range-only joins at scale,
``interval_join_bucketed`` discretizes time so the join regains an
equi-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    ts: str,
    valid_from: str,
    valid_to: str,
    how: str = "inner",
    end_exclusive: bool = True,
) -> DataFrame:
    """Join ``fact`` rows to the ``dim`` row valid at ``fact[ts]``:
    ``valid_from <= ts < valid_to`` (or ``<=`` when ``end_exclusive``
    is False). With non-overlapping validity windows per key (the SCD2
    contract) each fact row matches at most one dim row."""
    upper = (
        F.col(ts) < F.col(valid_to)
        if end_exclusive
        else F.col(ts) <= F.col(valid_to)
    )
    in_range = (F.col(valid_from) <= F.col(ts)) & upper
    if how == "inner":
        # Equi-key via `on=` so Catalyst plans a hash join; the range
        # predicate stays a residual filter on the join output.
        return fact.join(dim, on=list(on), how="inner").filter(in_range)
    if how == "left":
        # Range condition must live inside the join for outer semantics.
        cond = in_range
        for k in on:
            cond = cond & (fact[k] == dim[k])
        # Drop the dim-side key columns so both `how` modes return the
        # same shape — with a condition join both sides' keys survive
        # under identical names and any downstream reference would hit
        # AMBIGUOUS_REFERENCE.
        out = fact.join(dim, cond, "left")
        for k in on:
            out = out.drop(dim[k])
        return out
    raise ValueError(f"how must be inner|left, got {how}")


def interval_join_bucketed(
    fact: DataFrame,
    dim: DataFrame,
    ts: str,
    valid_from: str,
    valid_to: str,
    bucket_seconds: int = 30 * 86400,
) -> DataFrame:
    """Range-only interval join at scale: explode each dim interval into
    the time buckets it overlaps, join on the bucket id (equi-key →
    hash join), then apply the exact range residual. Shuffle volume is
    O(facts + dim·buckets_per_interval) instead of a nested loop."""
    if bucket_seconds <= 0:
        raise ValueError(
            f"bucket_seconds must be positive, got {bucket_seconds}"
        )
    sec = F.lit(float(bucket_seconds))

    def bucket_of(col: str) -> Column:
        return F.floor(F.col(col).cast("double") / sec)

    b_fact = fact.withColumn("__b", bucket_of(ts))
    b_dim = dim.withColumn(
        "__b",
        F.explode(F.sequence(bucket_of(valid_from), bucket_of(valid_to))),
    )
    out = b_fact.join(b_dim, on="__b", how="inner").filter(
        (F.col(valid_from) <= F.col(ts)) & (F.col(ts) < F.col(valid_to))
    )
    return out.drop("__b")
