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


# ---------------------------------------------------------------------------
# round-11: bucket-parallel as-of carry (operators/asof.py)
# ---------------------------------------------------------------------------

def _carry_reference(anchors, probes):
    """anchors: [(k, t, a, b)] unique (k, t); probes: [(rid, k, t)].
    Per column independently: last non-null anchor value at ts <= t."""
    out = {}
    for rid, k, t in probes:
        best_a = best_b = None
        for ak, at, av, bv in sorted(
            anchors, key=lambda r: r[1]
        ):
            if ak == k and at <= t:
                if av is not None:
                    best_a = av
                if bv is not None:
                    best_b = bv
        out[rid] = (best_a, best_b)
    return out


def test_asof_carry_bucketed_matches_reference(spark):
    from security_master_spark.operators.asof import asof_carry_bucketed

    # hostile shapes: equal-ts anchor/probe ties, all-NULL columns,
    # NULL partition key, bucket-boundary timestamps, empty-key side,
    # probes far before any anchor
    anchors = [
        ("k", 0, 10, None), ("k", 7, None, 70), ("k", 10, 11, None),
        ("k", 25, None, None), ("z", 5, 1, 2), (None, 3, 9, 9),
    ]
    probes = [
        (1, "k", -5), (2, "k", 0), (3, "k", 7), (4, "k", 9),
        (5, "k", 10), (6, "k", 24), (7, "k", 26), (8, "k", 1000),
        (9, "z", 4), (10, "z", 5), (11, None, 2), (12, None, 3),
        (13, "missing", 50),
    ]
    ref = _carry_reference(anchors, probes)
    a_df = spark.createDataFrame(anchors, "k string, t long, a long, b long")
    p_df = spark.createDataFrame(probes, "rid long, k string, t long")
    for bw in (1, 3, 10, 1000):
        got = {
            r.rid: (r.a, r.b)
            for r in asof_carry_bucketed(
                p_df, a_df, ["k"], "t", ["a", "b"], bw
            ).collect()
        }
        assert got == ref, f"bucket_width={bw}: {got} != {ref}"
    # column order / passthrough contract: probes' extra cols survive
    out = asof_carry_bucketed(p_df, a_df, ["k"], "t", ["a"], 10)
    assert {"rid", "k", "t", "a"} <= set(out.columns)


def test_asof_carry_bucketed_randomized_vs_reference(spark):
    import random

    from security_master_spark.operators.asof import asof_carry_bucketed

    rng = random.Random(1107)
    for trial in range(4):
        keys = ["a", "b", None]
        seen = set()
        anchors = []
        for _ in range(40):
            k = rng.choice(keys)
            t = rng.randrange(-50, 200)
            if (k, t) in seen:
                continue
            seen.add((k, t))
            anchors.append((
                k, t,
                rng.choice([None, rng.randrange(100)]),
                rng.choice([None, rng.randrange(100)]),
            ))
        probes = [
            (i, rng.choice(keys), rng.randrange(-60, 220))
            for i in range(60)
        ]
        ref = _carry_reference(anchors, probes)
        a_df = spark.createDataFrame(
            anchors, "k string, t long, a long, b long"
        )
        p_df = spark.createDataFrame(probes, "rid long, k string, t long")
        bw = rng.choice([1, 7, 64, 500])
        got = {
            r.rid: (r.a, r.b)
            for r in asof_carry_bucketed(
                p_df, a_df, ["k"], "t", ["a", "b"], bw
            ).collect()
        }
        assert got == ref, f"trial={trial} bucket_width={bw}"


def test_trailing_distributed_prefix_scratch_covers_both_subtrees(
    spark, sf_dir, tmp_path
):
    """Round-10 ADVICE: under distributed_prefix, scratch_path now
    materializes the ANCHOR frame — the subtree shared by the per-row
    re-attach AND the carry — and the result stays value-identical to
    the default path."""
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def run(**kw):
        return trailing_interval_sum(
            events, ["event_type"], "us", 3_600_000_000,
            F.col("cents"), "event_id", **kw,
        ).select("event_id", "n_trailing", "units_trailing")

    default = run()
    reg: list = []
    dist = run(
        distributed_prefix=True,
        scratch_path=str(tmp_path / "anchors"),
        cache_registry=reg,
    )
    assert default.exceptAll(dist).isEmpty()
    assert dist.exceptAll(default).isEmpty()
    # the registry hands back distributed_cumsum's load-bearing persist
    assert len(reg) == 1 and reg[0].is_cached
    reg[0].unpersist(blocking=True)


def test_distributed_row_number_counts_col(spark):
    from security_master_spark.operators.rolling import (
        distributed_row_number,
    )

    out = distributed_row_number(
        _frame(spark), ["k"], ["o"], out_col="rn", counts_col="n",
        n_ranges=3,
    )
    got = {(r.k, r.o): (r.rn, r.n) for r in out.collect()}
    # n == count(*) OVER (PARTITION BY k), incl. the NULL key group
    assert got[("a", 2)] == (2, 3)
    assert got[("b", 3)] == (3, 3)
    assert got[(None, 1)] == (1, 2)
    assert got[(None, 2)] == (2, 2)


def test_d39_distributed_sibling_is_value_equal(spark, sf_dir):
    """plans/domain8.py: the unregistered distributed-rank spelling of
    d39 (the a23/w10-w11 scale-sibling pattern — the registered plan
    stayed the window form on the measured sf0.1 negative) must match
    the registered query exactly."""
    from security_master_spark.plans.domain8 import (
        d39_var_es,
        d39_var_es_distributed,
    )

    a = d39_var_es(spark, sf_dir)
    b = d39_var_es_distributed(spark, sf_dir)
    assert a.columns == b.columns
    assert a.exceptAll(b).isEmpty()
    assert b.exceptAll(a).isEmpty()


# ---------------------------------------------------------------------------
# round-11: exact distributed percentile (operators/rolling.py)
# ---------------------------------------------------------------------------

def test_distributed_percentile_bit_equals_aggregate_small(spark):
    """Hostile shapes: duplicate values (ties straddling range
    boundaries), single-row group, all-NULL-value group (NULL
    percentiles, key still present), NULL key group, p=0/0.5/0.95/1.
    The interpolation mirrors Spark's Percentile formula term-for-term,
    so equality is exact (==), not approximate."""
    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )

    rows = [
        ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 10.0),
        ("b", 5.0),
        ("c", None), ("c", None),
        (None, 3.0), (None, 7.0), (None, None),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    ps = [0.0, 0.5, 0.95, 1.0]
    got = {
        r.k: (r.q0, r.q50, r.q95, r.q100)
        for r in distributed_percentile(
            df, ["k"], "v", ps, out_cols=["q0", "q50", "q95", "q100"],
            n_ranges=3,
        ).collect()
    }
    exp = {
        r.k: tuple(r.qs) if r.qs is not None else (None,) * 4
        for r in df.groupBy("k")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in ps])).alias("qs"))
        .collect()
    }
    assert set(got) == set(exp) == {"a", "b", "c", None}
    for k in exp:
        assert got[k] == exp[k], f"key={k}: {got[k]} != {exp[k]}"


def test_distributed_percentile_bit_equals_aggregate_corpus(spark, sf_dir):
    """Full sf0.001 events corpus per event_type, NULLs minted on
    'error' rows (the w9 pattern), 7 fractions including boundary and
    irrational-position ones — every value must be == the aggregate's."""
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    ps = [0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 1.0]
    cols = [f"q{i}" for i in range(len(ps))]
    got = {
        r.event_type: tuple(r[c] for c in cols)
        for r in distributed_percentile(
            events, ["event_type"], "v", ps, out_cols=cols
        ).collect()
    }
    exp = {
        r.event_type: tuple(r.qs) if r.qs is not None else (None,) * len(ps)
        for r in events.groupBy("event_type")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in ps])).alias("qs"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], f"{k}: {got[k]} != {exp[k]}"


def test_distributed_percentile_validation(spark):
    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="out of"):
        distributed_percentile(df, ["k"], "v", [1.5])
    with pytest.raises(ValueError, match="equal length"):
        distributed_percentile(df, ["k"], "v", [0.5], out_cols=["a", "b"])


def test_asof_carry_bucketed_multi_key(spark):
    """Two-part key incl. NULL components — the null-safe joins must
    treat the composite (k1, k2) with NULLs as first-class groups."""
    from security_master_spark.operators.asof import asof_carry_bucketed

    anchors = [
        ("x", 1, 5, 100), ("x", 2, 9, 200), ("x", None, 5, 300),
        (None, 1, 5, 400), (None, None, 7, 500),
    ]
    probes = [
        (1, "x", 1, 6), (2, "x", 2, 8), (3, "x", 2, 10),
        (4, "x", None, 5), (5, None, 1, 5), (6, None, None, 8),
        (7, None, None, 6), (8, "x", 1, 4),
    ]
    exp = {1: 100, 2: None, 3: 200, 4: 300, 5: 400, 6: 500, 7: None,
           8: None}
    a_df = spark.createDataFrame(
        anchors, "k1 string, k2 int, t long, val long"
    )
    p_df = spark.createDataFrame(probes, "rid long, k1 string, k2 int, t long")
    for bw in (2, 100):
        got = {
            r.rid: r.val
            for r in asof_carry_bucketed(
                p_df, a_df, ["k1", "k2"], "t", ["val"], bw
            ).collect()
        }
        assert got == exp, f"bucket_width={bw}: {got}"


def test_trailing_distributed_prefix_custom_carry_bucket(spark, sf_dir):
    """carry_bucket_us propagates to the bucketed carry and any width
    stays value-identical to the default path (width only moves work
    between the within-bucket and cross-bucket halves)."""
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def run(**kw):
        return trailing_interval_sum(
            events, ["event_type"], "us", 3_600_000_000,
            F.col("cents"), "event_id", **kw,
        ).select("event_id", "n_trailing", "units_trailing")

    default = run()
    for bw in (60_000_000, 30 * 86_400_000_000):  # 1 min; 30 days
        dist = run(distributed_prefix=True, carry_bucket_us=bw)
        assert default.exceptAll(dist).isEmpty(), bw
        assert dist.exceptAll(default).isEmpty(), bw


def test_forward_fill_bucketed_equals_window_form(spark, sf_dir):
    """operators/timeseries.py:forward_fill_bucketed — the JVM-side
    skew-proof ffill — must equal the portable window form on the
    full sf0.001 events corpus (NULLs minted on 'error' rows, two
    fill columns, unique integer ts per key by construction)."""
    from pyspark.sql import Window

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.timeseries import (
        forward_fill,
        forward_fill_bucketed,
    )

    events = load_table(spark, sf_dir, "events")
    # unique integer ts per key: rank by (ts, event_id) — the contract
    # all three ffill spellings share
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    base = events.select(
        "event_id",
        "user_id",
        rn.alias("seq"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("event_type") == "purchase", F.lit(None))
        .otherwise(F.col("value") * 2)
        .alias("w"),
    )
    want = forward_fill(base, ["user_id"], "seq", ["v", "w"]).select(
        "event_id", "v", "w"
    )
    for bw in (7, 1000):
        got = forward_fill_bucketed(
            base, ["user_id"], "seq", ["v", "w"], bw
        ).select("event_id", "v", "w")
        assert want.exceptAll(got).isEmpty(), bw
        assert got.exceptAll(want).isEmpty(), bw


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_round11_operators_plan_shape(spark, sf_dir):
    """Plan-quality guard for the round-11 toolkit members (the
    registry plan-guard only sweeps registered queries): every join
    inside asof_carry_bucketed / distributed_percentile /
    forward_fill_bucketed must be a hash join on the broadcast-small
    side — never a sort-merge over the data side, a nested loop, or a
    cartesian."""
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.asof import asof_carry_bucketed
    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )
    from security_master_spark.operators.timeseries import (
        forward_fill_bucketed,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("value").alias("v"),
    )
    anchors = events.groupBy("event_type", "us").agg(
        F.max("v").alias("av")
    )
    probes = events.select("event_id", "event_type", "us")
    plans = {
        "carry": _plan(
            asof_carry_bucketed(
                probes, anchors, ["event_type"], "us", ["av"],
                86_400_000_000,
            )
        ),
        "percentile": _plan(
            distributed_percentile(
                events, ["event_type"], "v", [0.5, 0.95],
                out_cols=["p50", "p95"],
            )
        ),
        "ffill": _plan(
            forward_fill_bucketed(
                events, ["event_type"], "us", ["v"], 86_400_000_000
            )
        ),
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
