"""Round-12 contract fixes (round-11 verdict order #2 + ADVICE items)
pinned as tests:

1. ``asof_carry_bucketed``'s broadcastability contract is ENFORCED,
   fused into the plan (the guard-cost study rejected both the eager
   count action and a persist-reclaim variant — PLANS.md): a global
   count window over the carry table wraps the ``_bkt`` JOIN KEY in
   an in-plan ``raise_error``, so a deliberately tiny
   ``bucket_width`` fails loudly at the FIRST ACTION (a Spark
   runtime exception carrying the operator's message) instead of
   building an OOM-class broadcast — and the guard survives column
   pruning because join keys are always evaluated, whatever subset
   of output columns the consumer reads.
2. ``asof_carry_bucketed`` scratch/duplicate-name collisions raise
   ``ValueError`` up front (the distributed_cumsum convention):
   inputs carrying ``_bkt``/``_is_a``/``_in_<v>``/``_x_<v>``/
   ``_r_<key>`` and probe extras sharing a ``value_cols`` name.
3. The bucket id uses exact integer ``div`` — correct for ALL longs,
   where the old double-division spelling loses integer resolution
   past 2^53 (doubles near 2^53 µs have >1 µs spacing).
4. ``distributed_cumsum`` / ``_distributed_rank`` validate INPUT
   columns against the internal scratch set: a ``_pid`` input column
   was silently replaced by ``spark_partition_id()`` and dropped —
   data loss, not an error.
5. ``forward_fill_bucketed`` defaults to the carry's broadcast bound
   (``DEFAULT_MAX_CARRY_ROWS`` imported directly) — ``None`` means
   disable, not "use the default".
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from security_master_spark.operators.asof import asof_carry_bucketed
from security_master_spark.operators.rolling import (
    distributed_cumsum,
    distributed_row_number,
)
from security_master_spark.operators.timeseries import (
    forward_fill,
    forward_fill_bucketed,
)


def _anchors(spark, n=40, key="k"):
    pdf = pd.DataFrame(
        {
            key: ["a" if i % 2 else "b" for i in range(n)],
            "ts": [i * 10 for i in range(n)],
            "v": [float(i) if i % 3 else None for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def _probes(spark, n=40, key="k"):
    pdf = pd.DataFrame(
        {
            key: ["a" if i % 2 else "b" for i in range(n)],
            "ts": [i * 10 + 5 for i in range(n)],
            "pid": list(range(n)),
        }
    )
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------- #
# 1. broadcastability guard                                         #
# ---------------------------------------------------------------- #

def test_carry_tiny_bucket_width_raises_before_broadcast(spark):
    # span 0..395, bucket_width=1 -> ~40 distinct (key, bucket) probe
    # cells; bound of 10 must trip with the count in the message.
    # The guard is FUSED into the plan (round-12 guard-cost study) so
    # the raise surfaces at the first ACTION as a Spark runtime
    # exception carrying the operator's message, not a call-time
    # ValueError.
    with pytest.raises(Exception, match="max_carry_rows=10"):
        asof_carry_bucketed(
            _probes(spark), _anchors(spark), ["k"], "ts", ["v"],
            bucket_width=1, max_carry_rows=10,
        ).collect()


def test_carry_guard_disabled_with_none(spark):
    out = asof_carry_bucketed(
        _probes(spark), _anchors(spark), ["k"], "ts", ["v"],
        bucket_width=1, max_carry_rows=None,
    )
    assert out.count() == 40


def test_carry_bound_at_or_above_cardinality_passes(spark):
    # exactly at the distinct (key, bucket) count: no raise
    out = asof_carry_bucketed(
        _probes(spark), _anchors(spark), ["k"], "ts", ["v"],
        bucket_width=1, max_carry_rows=40,
    )
    assert out.count() == 40


def test_ffill_bucketed_inherits_guard_and_none_disables(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 30,
            "ts": list(range(30)),
            "v": [float(i) if i % 4 else None for i in range(30)],
        }
    )
    df = spark.createDataFrame(pdf)
    # explicit tiny bound trips through the wrapper (in-plan
    # raise -> surfaces at the collect, wrapped by Spark)
    with pytest.raises(Exception, match="max_carry_rows=5"):
        forward_fill_bucketed(
            df, ["k"], "ts", ["v"], bucket_width=1, max_carry_rows=5
        ).collect()
    # None disables (NOT "use default") — must run
    out = forward_fill_bucketed(
        df, ["k"], "ts", ["v"], bucket_width=1, max_carry_rows=None
    )
    assert out.count() == 30


# ---------------------------------------------------------------- #
# 2. name-collision guards                                          #
# ---------------------------------------------------------------- #

def test_carry_nonpositive_bucket_width_raises(spark):
    with pytest.raises(ValueError, match="bucket_width must be positive"):
        asof_carry_bucketed(
            _probes(spark), _anchors(spark), ["k"], "ts", ["v"], 0
        )


@pytest.mark.parametrize("bad", ["_bkt", "_is_a", "_in_v", "_x_v", "_r_k"])
def test_carry_probe_scratch_column_raises(spark, bad):
    p = _probes(spark).withColumn(bad, F.lit(1))
    with pytest.raises(ValueError, match="internal"):
        asof_carry_bucketed(p, _anchors(spark), ["k"], "ts", ["v"], 100)


def test_carry_scratch_named_value_col_raises(spark):
    # a value column named _bkt collides with the bucket id scratch
    a = _anchors(spark).withColumnRenamed("v", "_bkt")
    with pytest.raises(ValueError, match="internal"):
        asof_carry_bucketed(
            _probes(spark), a, ["k"], "ts", ["_bkt"], 100
        )


def test_carry_probe_extra_sharing_value_name_raises(spark):
    # probe already carries a column named like a value col -> the
    # anchor∪probe union would hold duplicate columns
    p = _probes(spark).withColumn("v", F.lit(0.0))
    with pytest.raises(ValueError, match="value_cols"):
        asof_carry_bucketed(p, _anchors(spark), ["k"], "ts", ["v"], 100)


def test_cumsum_input_pid_column_raises(spark):
    df = _anchors(spark).withColumn("_pid", F.lit(7))
    with pytest.raises(ValueError, match="_pid"):
        distributed_cumsum(df, ["k"], ["ts"], {"cv": "v"}, n_ranges=3)


def test_cumsum_input_offset_shadow_raises(spark):
    # an input _os_cv would shadow the offset column the _cum
    # expression reads for output name "cv"
    df = _anchors(spark).withColumn("_os_cv", F.lit(1.0))
    with pytest.raises(ValueError, match="_os_cv"):
        distributed_cumsum(df, ["k"], ["ts"], {"cv": "v"}, n_ranges=3)


def test_rank_input_scratch_column_raises(spark):
    df = _anchors(spark).withColumn("_lrn", F.lit(1))
    with pytest.raises(ValueError, match="_lrn"):
        distributed_row_number(df, ["k"], ["ts"], n_ranges=3)


def test_cumsum_unrelated_underscore_inputs_still_pass(spark):
    # the guard is surgical: _os_OTHER only collides when OTHER is an
    # output name; an unrelated underscore column flows through intact
    df = _anchors(spark).withColumn("_os_other", F.lit(1.0))
    out = distributed_cumsum(df, ["k"], ["ts"], {"cv": "v"}, n_ranges=3)
    assert "_os_other" in out.columns
    assert out.count() == 40


# ---------------------------------------------------------------- #
# 3. exact integer bucketing past 2^53                              #
# ---------------------------------------------------------------- #

def test_carry_exact_at_2p53_timestamps(spark):
    """Bucket ids use integer `div`: at ts magnitudes ≥ 2^53 (where
    doubles have >1 spacing and the old double-division spelling loses
    integer resolution) the bucketed forward fill still equals the
    serial window form exactly."""
    base = 2**53
    n = 60
    pdf = pd.DataFrame(
        {
            "k": ["a" if i % 2 else "b" for i in range(n)],
            # odd offsets around 2^53: consecutive longs that doubles
            # cannot distinguish
            "ts": [base + i for i in range(n)],
            "v": [float(i) if i % 5 else None for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    got = forward_fill_bucketed(df, ["k"], "ts", ["v"], bucket_width=7)
    ref = forward_fill(df, ["k"], "ts", ["v"])
    g = {(r.k, r.ts): r.v for r in got.collect()}
    r = {(r.k, r.ts): r.v for r in ref.collect()}
    assert g == r


# ---------------------------------------------------------------- #
# 6. round-12 review fixes: guard survives pruning; _n reserved;    #
#    trailing exposes the carry bound                               #
# ---------------------------------------------------------------- #

def test_carry_guard_survives_column_pruning(spark):
    """The fused guard wraps the _bkt JOIN key: consuming any subset
    of output columns — including none of the carried values — must
    still trip the bound (the review reproduced a silent bypass when
    the first value column was pruned)."""
    a = _anchors(spark).withColumn("v2", F.col("v") * 2)
    with pytest.raises(Exception, match="max_carry_rows=10"):
        asof_carry_bucketed(
            _probes(spark), a, ["k"], "ts", ["v", "v2"],
            bucket_width=1, max_carry_rows=10,
        ).select("k", "ts", "v2").collect()
    with pytest.raises(Exception, match="max_carry_rows=10"):
        asof_carry_bucketed(
            _probes(spark), a, ["k"], "ts", ["v", "v2"],
            bucket_width=1, max_carry_rows=10,
        ).select("k", "ts", "pid").collect()


def test_carry_key_named_n_raises_loudly(spark):
    """A join key named _n collided with the fused guard's count
    column (UNRESOLVED_COLUMN at analysis, or silent pass with the
    guard off) — now a loud reserved-name ValueError either way."""
    p = _probes(spark).withColumnRenamed("k", "_n")
    a = _anchors(spark).withColumnRenamed("k", "_n")
    for bound in (1000, None):
        with pytest.raises(ValueError, match="_n"):
            asof_carry_bucketed(
                p, a, ["_n"], "ts", ["v"], bucket_width=50,
                max_carry_rows=bound,
            )


def test_carry_empty_value_cols_raises(spark):
    with pytest.raises(ValueError, match="value_cols must be non-empty"):
        asof_carry_bucketed(
            _probes(spark), _anchors(spark), ["k"], "ts", [],
            bucket_width=50,
        )


def test_trailing_distributed_exposes_carry_bound(spark):
    """trailing_interval_sum(distributed_prefix=True) inherits the
    carry's guard; the bound must be reachable from this API — a
    tiny bound trips, None disables, and the disabled run matches
    the default path exactly."""
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )

    pdf = pd.DataFrame(
        {
            "k": ["a" if i % 2 else "b" for i in range(60)],
            "ts": [i * 1_000_000 for i in range(60)],
            "u": [i % 7 for i in range(60)],
            "rid": list(range(60)),
        }
    )
    df = spark.createDataFrame(pdf)
    kw = dict(
        keys=["k"], ts_us="ts", lookback_us=5_000_000,
        units=F.col("u"), row_id="rid", distributed_prefix=True,
        carry_bucket_us=1_000_000,
    )
    with pytest.raises(Exception, match="max_carry_rows=3"):
        trailing_interval_sum(df, max_carry_rows=3, **kw).collect()
    got = trailing_interval_sum(df, max_carry_rows=None, **kw)
    ref = trailing_interval_sum(
        df, keys=["k"], ts_us="ts", lookback_us=5_000_000,
        units=F.col("u"), row_id="rid",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_carry_probe_passthrough_named_n_is_legal(spark):
    """_n only collides on the internal cross table's surfaces (join
    keys / value_cols); a probe passthrough column named _n never
    reaches it and must flow through intact, guard on or off."""
    p = _probes(spark).withColumnRenamed("pid", "_n")
    for bound in (1000, None):
        out = asof_carry_bucketed(
            p, _anchors(spark), ["k"], "ts", ["v"],
            bucket_width=50, max_carry_rows=bound,
        )
        rows = out.collect()
        assert len(rows) == 40
        assert sorted(r["_n"] for r in rows) == list(range(40))
