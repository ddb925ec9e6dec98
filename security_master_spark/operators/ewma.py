"""Exact recursive EWMA — the sequential sibling of the distributed
truncated-lag form in plans/domain3.py:d16_ewma.

The recurrence y_t = y_{t-1} + α'(x_t − y_{t-1}) cannot be expressed
as a Spark window aggregate (each output depends on the previous
*output*, not a fixed frame of inputs). Two production strategies:

1. **Truncated contributions** (d16_ewma): explode each observation
   into the K future positions it weights; one groupBy sums them.
   Fully parallel *within* a series, O(rows·K) shuffle, bounded
   truncation error (1−α)^K. The default at 100 TB.
2. **Exact sequential scan** (this module): one Arrow batch per
   series via applyInPandas, pandas' `ewm` doing the recurrence.
   Parallel *across* series (the realistic unit — millions of
   instruments), sequential within one. Exact, zero truncation;
   requires one key's history to fit an executor's working set (the
   same contract every ordered-window op in operators/timeseries.py
   already carries).

Crossover: prefer (1) when single series are huge relative to
executors or K·(1−α)^K precision is acceptable; prefer (2) for exact
parity with pandas/reference EWMA semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma_exact(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exact adjust-form EWMA per series:
    y_t = Σ_{i≤t} (1−α)^{t−i} x_i / Σ_{i≤t} (1−α)^{t−i}, computed by
    the numerically-stable recursive update inside one Arrow batch per
    key group (pandas ``Series.ewm``). Output schema = input schema +
    ``out_col`` double."""
    # list() copy — StructType(df.schema.fields) would alias (and .add
    # mutate) the DataFrame's cached schema object.
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    order = list(order_cols)

    def fn(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=True).mean()
        )
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema)
