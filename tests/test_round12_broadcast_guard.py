"""Round-12 session-2: the fused broadcastability guard extended from
the asof carry to EVERY force-broadcast site in the distributed-rank
toolkit (the broadcast-site audit, PLANS.md).

``_nullsafe_attach`` is the single chokepoint: the rank's offsets and
per-key totals, the cumsum's offsets, and the percentile's target-rank
extraction are all per-key-group scratch tables — O(distinct key
groups), force-broadcast, bounded by nothing else. Each public
operator now threads ``max_broadcast_rows`` (default
``DEFAULT_MAX_BROADCAST_ROWS``) into an in-plan count-window +
``raise_error`` wrapped around a JOIN KEY, so a pathological key
cardinality aborts the first action instead of building an OOM-class
broadcast — the exact contract tests/test_round12_fixes.py pins for
the carry, applied to the rest of the family:

- the raise fires at the FIRST ACTION with the operator's message;
- it survives consumer column pruning (join keys are always
  evaluated for the broadcast hash-table build);
- the default bound changes NO results (window-form equality);
- ``None`` disables the guard entirely;
- scratch-name collisions (``_na``, counts_col in the scratch set)
  raise ``ValueError`` at call time, not silent shadowing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from security_master_spark.operators.rolling import (
    DEFAULT_MAX_BROADCAST_ROWS,
    distributed_cumsum,
    distributed_percentile,
    distributed_row_number,
    rolling_distinct_count,
    rolling_rows_agg,
)
from security_master_spark.operators.trailing import trailing_interval_sum


@pytest.fixture(scope="module")
def ticks(spark):
    # 3 key groups (one NULL — first-class window group), 20 rows each
    return spark.createDataFrame(
        [(k, i, float(i * 3 % 7)) for k in ["a", "b", None]
         for i in range(20)],
        "k string, t int, v double",
    )


def test_rownum_guard_trips_at_first_action(ticks):
    out = distributed_row_number(
        ticks, ["k"], ["t"], max_broadcast_rows=1
    )
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_rownum_guard_survives_column_pruning(ticks):
    # the round-12 carry review's lesson: a guard on a VALUE column is
    # pruned away when the consumer reads a subset — the join-key
    # placement must keep firing under .select() of non-key columns
    out = distributed_row_number(
        ticks, ["k"], ["t"], max_broadcast_rows=1
    ).select("t")
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_cumsum_guard_trips(ticks):
    out = distributed_cumsum(
        ticks, ["k"], ["t"], {"cv": "v"}, max_broadcast_rows=1
    )
    with pytest.raises(Exception, match="distributed cumsum"):
        out.count()


def test_percentile_guard_trips(ticks):
    out = distributed_percentile(
        ticks, ["k"], "v", [0.25, 0.75], max_broadcast_rows=1
    )
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_rolling_rows_agg_guard_trips(ticks):
    out = rolling_rows_agg(
        ticks, ["k"], ["t"], 3,
        {"s": lambda w: F.sum("v").over(w)},
        max_broadcast_rows=1,
    )
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_rolling_distinct_count_guard_trips(ticks):
    out = rolling_distinct_count(
        ticks, ["k"], ["t"], "v", 4, max_broadcast_rows=1
    )
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_trailing_distributed_guard_trips(spark):
    df = spark.createDataFrame(
        [(i, "k%d" % (i % 3), i * 1_000_000, 2) for i in range(30)],
        "rid long, k string, us long, u long",
    )
    out = trailing_interval_sum(
        df, ["k"], "us", 5_000_000, F.col("u"), "rid",
        distributed_prefix=True, max_broadcast_rows=1,
    )
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()


def test_default_bound_changes_no_results(ticks):
    w = Window.partitionBy("k").orderBy("t")
    exp = (
        ticks.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("k")))
        .select("k", "t", "rn", "n")
    )
    got = distributed_row_number(
        ticks, ["k"], ["t"], out_col="rn", counts_col="n"
    ).select("k", "t", "rn", "n")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_totals_attach_is_guarded_too(ticks):
    # round-13 ADVICE (medium): Spark launches every
    # BroadcastExchange's collect job CONCURRENTLY at prepare time, so
    # "the offsets guard raises first" never actually bounded the
    # totals collect — at pathological key cardinality it could OOM
    # the driver in parallel before the offsets raise propagates. The
    # totals attach now carries its own fused guard; |totals| ≤
    # |offsets| means a trip can't be attributed behaviorally, so
    # assert the guard expression is IN the plan by its message.
    out = distributed_row_number(
        ticks, ["k"], ["t"], counts_col="n", max_broadcast_rows=1
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "totals table" in plan
    assert "offsets table" in plan
    with pytest.raises(Exception, match="max_broadcast_rows=1"):
        out.count()
    # None still disables BOTH guards
    clean = distributed_row_number(
        ticks, ["k"], ["t"], counts_col="n", max_broadcast_rows=None
    )
    assert "totals table" not in (
        clean._jdf.queryExecution().analyzed().toString()
    )


def test_none_disables_guard(ticks):
    # max_broadcast_rows=None must remove the guard from the plan:
    # a key count far above any bound still evaluates fine
    got = distributed_row_number(
        ticks, ["k"], ["t"], max_broadcast_rows=None
    )
    assert got.count() == ticks.count()
    assert "_na" not in got.columns


def test_default_is_the_module_constant():
    # the knob's documented default — 2M scratch rows, mirroring the
    # carry's DEFAULT_MAX_CARRY_ROWS — not an ad-hoc per-site literal
    assert DEFAULT_MAX_BROADCAST_ROWS == 2_000_000


def test_counts_col_scratch_collision_raises(ticks):
    with pytest.raises(ValueError, match="counts_col"):
        distributed_row_number(
            ticks, ["k"], ["t"], counts_col="_na"
        )
    with pytest.raises(ValueError, match="counts_col"):
        distributed_row_number(
            ticks, ["k"], ["t"], counts_col="_r_k"
        )


def test_keyless_global_percentile_still_works(spark):
    # regression (caught by a session self-probe): the first guard
    # spelling indexed on[0] and broke the pre-round-12 keyless path
    # (global percentile → totals attach with NO join keys); the
    # keyless attach wraps every payload column instead
    df = spark.createDataFrame([(float(i),) for i in range(100)],
                               "v double")
    out = distributed_percentile(df, [], "v", [0.5], out_cols=["p50"])
    assert [r.p50 for r in out.collect()] == [49.5]
    # and the guard still fires on the keyless path
    tripped = distributed_percentile(
        df, [], "v", [0.5], out_cols=["p50"], max_broadcast_rows=0
    )
    with pytest.raises(Exception, match="max_broadcast_rows=0"):
        tripped.collect()


def test_percentile_values_unchanged_under_default_guard(ticks):
    got = distributed_percentile(
        ticks, ["k"], "v", [0.0, 0.5, 1.0],
        out_cols=["p0", "p50", "p100"],
    )
    exp = ticks.groupBy("k").agg(
        F.expr("percentile(v, 0.0)").alias("p0"),
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 1.0)").alias("p100"),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
