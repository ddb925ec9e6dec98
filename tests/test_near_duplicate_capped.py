"""near_duplicate_pairs (round-12 session 2): dq15's near-time
duplicate screen as a library operator with a DENSITY CAP — the last
weak-at-100× row whose guard was monitoring-only (dq7's rate screen)
gains a bounded sibling, the a23/w10/d39 precedent:

- uncapped operator ≡ the registered dq15 aggregation on the fixture;
- the cap is provably INACTIVE when no (keys, bucket) cell overflows
  (bit-identical pairs) and exact-over-kept-rows when one does
  (C(cap, 2) pairs inside a hostile dense cell);
- the overflow monitor reports exactly the cells the capped screen
  under-counts — empty monitor ⇒ exact screen;
- bucket ids use exact integer div (correct at ±2^62-class µs, where
  the double-division spelling loses integer resolution).

dq15 itself stays registered and uncapped (the round-9 freeze).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from security_master_spark.datasets import load_table
from security_master_spark.operators.intervals import (
    near_duplicate_cell_overflow,
    near_duplicate_pairs,
)
from security_master_spark.plans import registry

SF = "/root/testdata/sf0.001"
_W = 60_000_000  # dq15's fixture window


def _events_us(spark):
    return load_table(spark, SF, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"),
    )


def _agg(pairs):
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_uncapped_matches_registered_dq15(spark):
    got = _agg(near_duplicate_pairs(
        _events_us(spark), ["user_id", "event_type"], "event_id",
        "us", _W,
    ))
    exp = registry.queries()["dq15_near_duplicate_events"](
        spark, SF
    ).select("event_type", "n_pairs", "n_users", "min_gap_us",
             "max_gap_us")
    assert _same(got, exp)


def test_cap_is_inactive_when_no_cell_overflows(spark):
    ev = _events_us(spark)
    max_cell = (
        ev.groupBy(
            "user_id", "event_type",
            F.expr(f"(us - pmod(us, {_W})) div {_W}").alias("b"),
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    uncapped = near_duplicate_pairs(
        ev, ["user_id", "event_type"], "event_id", "us", _W
    )
    capped = near_duplicate_pairs(
        ev, ["user_id", "event_type"], "event_id", "us", _W,
        max_per_cell=int(max_cell),
    )
    assert _same(uncapped, capped)
    assert near_duplicate_cell_overflow(
        ev, ["user_id", "event_type"], "us", _W, int(max_cell)
    ).count() == 0


def test_dense_cell_is_capped_and_reported(spark):
    # one user replays 50 events inside a single window: uncapped
    # C(50,2) = 1225 pairs; cap=8 keeps the FIRST 8 by (ts, id) →
    # exactly C(8,2) = 28 pairs, all among ids 0..7
    rows = [("u", "view", i, i * 1_000) for i in range(50)]
    rows += [("v", "click", 100, 0), ("v", "click", 101, 1_000)]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, event_id long, us long"
    )
    uncapped = near_duplicate_pairs(
        df, ["user_id", "event_type"], "event_id", "us", _W
    )
    assert uncapped.filter(F.col("user_id") == "u").count() == 1225
    capped = near_duplicate_pairs(
        df, ["user_id", "event_type"], "event_id", "us", _W,
        max_per_cell=8,
    )
    hot = capped.filter(F.col("user_id") == "u")
    assert hot.count() == 28
    assert hot.agg(F.max("id_hi")).first()[0] == 7
    # the sparse user is untouched by the cap
    assert capped.filter(F.col("user_id") == "v").count() == 1
    # the monitor names exactly the overflowing cell
    over = near_duplicate_cell_overflow(
        df, ["user_id", "event_type"], "us", _W, 8
    ).collect()
    assert [(r.user_id, r.event_type, r.n_rows) for r in over] == [
        ("u", "view", 50)
    ]


def test_cross_bucket_pairs_survive_the_cap(spark):
    # two events straddling a bucket boundary, gap < window — the
    # probe-side (b, b+1) explosion must still pair them under a cap
    df = spark.createDataFrame(
        [("u", "view", 1, _W - 1), ("u", "view", 2, _W + 1)],
        "user_id string, event_type string, event_id long, us long",
    )
    got = near_duplicate_pairs(
        df, ["user_id", "event_type"], "event_id", "us", _W,
        max_per_cell=4,
    ).collect()
    assert [(r.id_lo, r.id_hi, r.gap_us) for r in got] == [(1, 2, 2)]


def test_bucket_ids_exact_past_double_resolution(spark):
    # at |us| ≈ 2^62 the double-division bucket spelling is off by
    # whole buckets; the integer-div spelling must still pair the
    # adjacent rows and nothing else
    big = (1 << 62) + 12_345
    df = spark.createDataFrame(
        [("u", "view", 1, big), ("u", "view", 2, big + 10),
         ("u", "view", 3, big + 10 * _W)],
        "user_id string, event_type string, event_id long, us long",
    )
    got = near_duplicate_pairs(
        df, ["user_id", "event_type"], "event_id", "us", _W
    ).collect()
    assert [(r.id_lo, r.id_hi, r.gap_us) for r in got] == [(1, 2, 10)]


def test_null_keys_never_pair(spark):
    df = spark.createDataFrame(
        [(None, "view", 1, 0), (None, "view", 2, 10)],
        "user_id string, event_type string, event_id long, us long",
    )
    assert near_duplicate_pairs(
        df, ["user_id", "event_type"], "event_id", "us", _W
    ).count() == 0


def test_scratch_and_parameter_guards(spark):
    df = spark.createDataFrame(
        [("u", 1, 0)], "user_id string, __bkt long, us long"
    )
    with pytest.raises(ValueError, match="__bkt"):
        near_duplicate_pairs(df, ["user_id"], "__bkt", "us", _W)
    ok = spark.createDataFrame(
        [("u", 1, 0)], "user_id string, event_id long, us long"
    )
    with pytest.raises(ValueError, match="window_us"):
        near_duplicate_pairs(ok, ["user_id"], "event_id", "us", 0)
    with pytest.raises(ValueError, match="max_per_cell"):
        near_duplicate_pairs(
            ok, ["user_id"], "event_id", "us", _W, max_per_cell=0
        )


def test_output_name_collision_guards(spark):
    # round-13 ADVICE (low): a KEY named like an output column
    # (id_lo/id_hi/gap_us; bucket/n_rows in the overflow monitor)
    # would yield duplicate/ambiguous output columns — loud failure,
    # matching the scratch-name contract
    from security_master_spark.operators.intervals import (
        near_duplicate_cell_overflow,
    )

    df = spark.createDataFrame(
        [("u", 1, 0)], "id_lo string, event_id long, us long"
    )
    with pytest.raises(ValueError, match="id_lo"):
        near_duplicate_pairs(df, ["id_lo"], "event_id", "us", _W)
    df2 = spark.createDataFrame(
        [("u", 1, 0)], "bucket string, event_id long, us long"
    )
    with pytest.raises(ValueError, match="bucket"):
        near_duplicate_cell_overflow(df2, ["bucket"], "us", _W, 2)
    # non-key columns under those names are fine (they don't reach
    # the output under their own name)
    df3 = spark.createDataFrame(
        [("u", 1, 0), ("u", 2, 5)],
        "user_id string, event_id long, gap_us long",
    )
    out = near_duplicate_pairs(
        df3, ["user_id"], "event_id", "gap_us", _W
    )
    assert out.columns == ["user_id", "id_lo", "id_hi", "gap_us"]
