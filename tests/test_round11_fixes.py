"""Round-11 contract fixes (round-10 ADVICE items) pinned as tests:

1. ``distributed_cumsum`` output/source name collisions: every output
   is computed from the PRE-overwrite inputs in one select, so
   ``{"v": "v", "v2": "v"}`` yields two identical running totals of
   the ORIGINAL ``v`` (the sequential-withColumn form silently fed
   the second entry the first entry's output).
2. Output names colliding with the operator's internal scratch
   columns raise ``ValueError`` instead of corrupting the plan.
3. ``cache_registry``: the load-bearing persist() inside the rolling
   operators is held by Spark's CacheManager until EXPLICIT
   unpersist — the registry hands the persisted frame(s) to the
   caller so long-lived sessions can release them after consumption.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from security_master_spark.operators.rolling import (
    distributed_cumsum,
    distributed_row_number,
    rolling_rows_agg,
)


def _frame(spark):
    rows = [
        ("a", 1, 10), ("a", 2, None), ("a", 3, 5),
        ("b", 1, None), ("b", 2, None), ("b", 3, 7),
        (None, 1, 2), (None, 2, 3),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "o", "v"]).astype(
            {"o": "int64", "v": "Int64"}
        )
    )


def _cum_reference():
    # per-key running SUM of v with Spark NULL semantics (all-NULL
    # prefix -> NULL), over the _frame rows above
    return {
        ("a", 1): 10, ("a", 2): 10, ("a", 3): 15,
        ("b", 1): None, ("b", 2): None, ("b", 3): 7,
        (None, 1): 2, (None, 2): 5,
    }


def test_cumsum_colliding_output_reads_pre_overwrite_input(spark):
    out = distributed_cumsum(
        _frame(spark), ["k"], ["o"], {"v": "v", "v2": "v"}, n_ranges=3
    )
    ref = _cum_reference()
    got = {(r.k, r.o): (r.v, r.v2) for r in out.collect()}
    assert set(got) == set(ref)
    for key, (v, v2) in got.items():
        assert v == ref[key], f"{key}: v={v} != {ref[key]}"
        # v2 must be the cumsum of the ORIGINAL v, i.e. identical —
        # not a cumsum of the already-cumulated column
        assert v2 == ref[key], f"{key}: v2={v2} != {ref[key]}"


def test_cumsum_reserved_scratch_names_raise(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="scratch"):
        distributed_cumsum(df, ["k"], ["o"], {"_pid": "v"})
    with pytest.raises(ValueError, match="scratch"):
        # _os_x is the offset-sum scratch column for output name "x"
        distributed_cumsum(df, ["k"], ["o"], {"x": "v", "_os_x": "v"})


def test_cache_registry_exposes_and_releases_the_persist(spark):
    reg: list = []
    out = distributed_cumsum(
        _frame(spark), ["k"], ["o"], {"cv": "v"}, n_ranges=3,
        cache_registry=reg,
    )
    assert out.count() == 8
    assert len(reg) == 1 and reg[0].is_cached
    reg[0].unpersist(blocking=True)
    assert not reg[0].is_cached


def test_cache_registry_threads_through_rolling_rows_agg(spark):
    reg: list = []
    out = rolling_rows_agg(
        _frame(spark), ["k"], ["o"], 2,
        {"s": lambda w: F.sum("v").over(w)},
        bucket_rows=2, n_ranges=3, cache_registry=reg,
    )
    assert out.count() == 8
    assert len(reg) == 1 and reg[0].is_cached
    reg[0].unpersist(blocking=True)
    assert not reg[0].is_cached


def test_cache_registry_threads_through_distributed_row_number(spark):
    reg: list = []
    out = distributed_row_number(
        _frame(spark), ["k"], ["o"], out_col="rn", n_ranges=3,
        cache_registry=reg,
    )
    ranks = {(r.k, r.o): r.rn for r in out.collect()}
    assert ranks[("a", 1)] == 1 and ranks[("a", 3)] == 3
    assert ranks[(None, 2)] == 2
    assert len(reg) == 1 and reg[0].is_cached
    reg[0].unpersist(blocking=True)
    assert not reg[0].is_cached
