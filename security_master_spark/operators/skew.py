"""Skew mitigation for large joins (SURVEY.md §4 / the 100 TB story).

AQE's skew-join handling (on in session.RUNTIME_CONFS) splits
oversized *sort-merge* partitions automatically; explicit salting is
the deterministic fallback for cases AQE can't fix — e.g. one hot key
whose rows must still meet every matching build row, or aggregations
feeding a skewed shuffle.

``salted_join`` replicates the (small-enough) right side ``salt``
times and scatters the left side across the salt space, so a hot key's
rows spread over ``salt`` tasks instead of one straggler. Join output
is bit-identical to the unsalted join (verified in tests): salt only
changes *placement*, never matching.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: left rows get a deterministic salt
    in [0, salt) (hash of the whole left row — spreads even a single
    hot key), right rows are replicated once per salt value, and the
    join key becomes (keys…, salt). Shuffle skew drops by ~``salt``×
    at the cost of ``salt``× the right side's shuffle volume — use for
    fact⋈dim where the dim is modest but too big to broadcast.
    """
    left_cols = left.columns
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left_cols]), F.lit(salt))
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")


def skewed_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate
    on (keys…, salt) — spreading a hot key over ``salt`` reducers —
    then final aggregate on the keys alone. Supported aggs: sum,
    count, min, max (the re-aggregable ones; avg = sum/count at the
    call site).

    Catalyst's map-side partial aggregation already bounds most skew;
    this explicit form is for extreme single-key skew where even the
    merged partials overwhelm one reducer's input stream.
    """
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        fn = fn.lower()
        p_name = f"__p_{fn}_{col}"
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(p_name))
            final_exprs.append(F.sum(p_name).alias(f"sum_{col}"))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(p_name))
            final_exprs.append(F.sum(p_name).alias(f"count_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p_name))
            final_exprs.append(F.min(p_name).alias(f"min_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p_name))
            final_exprs.append(F.max(p_name).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-re-aggregable function: {fn}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
