"""Segmented scans: exact per-row running computations with NO
per-series sequential bottleneck.

Every Spark window with ``partitionBy(key).orderBy(ts)`` executes each
key in ONE task — correct, and fine when series are small relative to
executors, but a single billion-row series serializes. Any running
computation whose per-chunk effect on incoming state composes
associatively can instead run as a segmented scan:

1. range-partition by (keys, order) + sort within partitions, so each
   partition holds contiguous runs of each series;
2. one parallel pass reduces every (partition, key) run to a tiny
   chunk summary;
3. the driver folds summaries in partition order (sequential over
   CHUNK COUNT only) and broadcasts each chunk's incoming state;
4. a second parallel pass re-derives exact per-row outputs.

``ewma_exact_distributed`` (operators/ewma.py) instantiates this for
the affine EWMA recurrence; this module carries the simplest and most
used instance — forward-fill, whose state is just "last non-null seen"
and whose composition is coalesce(chunk_last, carried).

Both passes must observe the same physical order: (keys + order_cols)
must uniquely identify rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SEP = "\x00"


def forward_fill_distributed(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact forward-fill (last non-null carried forward per series)
    as a segmented scan. Chunk summary = the chunk's last non-null
    value (or none); composition = the newest non-null wins. The
    equivalence target is ``timeseries.forward_fill`` (the windowed
    form); at scale this version keeps a monster series parallel
    where the window pins it to one task."""
    key_list, order = list(keys), list(order_cols)
    sort_cols = key_list + order
    # Persisted for the same reason as ewma_exact_distributed: both
    # passes must see byte-identical partition boundaries, and
    # repartitionByRange re-samples split points per job.
    rep = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .persist()
    )

    sum_schema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("key", StringType()),
            # stringified payload; "" marks an all-null chunk
            StructField("last_repr", StringType()),
        ]
    )

    def summarize(batches):
        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts)
        for kv, g in pdf.groupby(key_list, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            vals = g[value_col].dropna()
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "key": [_SEP.join(map(str, kv))],
                    "last_repr": [repr(float(vals.iloc[-1])) if len(vals) else ""],
                }
            )

    summaries = rep.mapInPandas(summarize, sum_schema).collect()

    carries: dict[tuple[int, str], float | None] = {}
    state: dict[str, float | None] = {}
    for r in sorted(summaries, key=lambda r: (r.key, r.pid)):
        carries[(r.pid, r.key)] = state.get(r.key)
        if r.last_repr != "":
            state[r.key] = float(r.last_repr)

    def rescan(batches):
        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts)
        outs = []
        for kv, g in pdf.groupby(key_list, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            carry = carries.get((pid, _SEP.join(map(str, kv))))
            g = g.copy()
            filled = g[value_col].ffill()
            if carry is not None:
                filled = filled.fillna(carry)
            g[value_col] = filled
            outs.append(g)
        if outs:  # all-null-key partitions yield no groups
            yield pd.concat(outs)

    return rep.mapInPandas(rescan, df.schema)
