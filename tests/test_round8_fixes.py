"""Round-8 fix regressions: the configurable scratch root (round-7
verdict order #5 — the 100-TB lake-backed-scratch story must be code,
not a docstring) and the PID-namespaced iterative scratch (round-8
ADVICE: concurrent same-SF runs clobbered g6's per-round loop state).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from security_master_spark.plans.io_scratch import (
    SCRATCH_CONF_KEY,
    _root,
    _scratch,
    _scratch_run,
)


def test_scratch_root_is_one_config_point(spark, tmp_path, monkeypatch):
    # Precedence: session conf > env > /tmp default — all through the
    # SAME resolver every scratch-writing plan imports.
    default = _root()
    assert default == "/tmp/sms_io"

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_ROOT", "/lake/scratch/")
    assert _root() == "/lake/scratch"  # env override, slash-normalized
    assert _scratch("/data/sf0.01", "x") == "/lake/scratch/sf0.01/x"

    spark.conf.set(SCRATCH_CONF_KEY, str(tmp_path / "conf_root"))
    try:
        assert _root() == str(tmp_path / "conf_root")  # conf wins
    finally:
        spark.conf.unset(SCRATCH_CONF_KEY)
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_ROOT")
    assert _root() == default


def test_scratch_conf_redirects_a_real_plan_write(
    spark, sf_dir, tmp_path
):
    # End-to-end: point the conf at a fresh dir and run a
    # scratch-writing registered query — its payload must land under
    # the redirected root (this is exactly how a cluster points the
    # engine at s3://…/scratch).
    from security_master_spark.plans.sources_io10 import (
        io19_zstd_parquet_roundtrip,
    )

    root = tmp_path / "lake"
    spark.conf.set(SCRATCH_CONF_KEY, str(root))
    try:
        assert io19_zstd_parquet_roundtrip(spark, sf_dir).count() > 0
        tag = os.path.basename(os.path.normpath(sf_dir))
        assert (root / tag / "lineitem_zstd").is_dir()
    finally:
        spark.conf.unset(SCRATCH_CONF_KEY)


def test_iterative_scratch_is_run_scoped():
    # Iterative per-round scratch frames (the g6 shape before its
    # round-15 localCheckpoint rewrite; the helper remains the
    # lake-scratch spelling for iterative loops) must not collide
    # across concurrent runs at the same scale factor: the path
    # embeds the PID.
    p = _scratch_run("/data/sf0.01", "kcore_edges_r1")
    assert f"/run{os.getpid()}/" in p
    assert p.endswith("/sf0.01/kcore_edges_r1")
    # and the stable roundtrip layout is unchanged
    assert _scratch("/data/sf0.01", "x") == "/tmp/sms_io/sf0.01/x"


def test_trailing_interval_sum_ties_boundary_and_nulls(spark):
    """operators/trailing.py edge semantics against a hand-computed
    frame: RANGE ties are peers (equal-ts rows report the identical
    frame), the left edge is inclusive (a row exactly lookback old is
    IN the frame; one microsecond older is out), and an all-null
    frame yields NULL — the prefix difference must not manufacture a
    zero."""
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )

    # key k: ts in µs, lookback 10 µs
    rows = [
        (1, "k", 0, 5),      # opens the history
        (2, "k", 10, 7),     # frame [0,10]: rows 1,2  -> n=2, u=12
        (3, "k", 11, None),  # frame [1,11]: rows 2,3  -> n=2, u=7
        (4, "k", 30, None),  # frame [20,30]: row 4    -> n=1, u=NULL
        (5, "k", 30, None),  # tie with 4: same frame  -> n=2, u=NULL
        (6, "z", 5, 3),      # other key: frames never mix
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, us long, u long"
    )
    out = {
        r.event_id: (r.n_trailing, r.units_trailing)
        for r in trailing_interval_sum(
            df, ["k"], "us", 10, F.col("u"), "event_id"
        ).collect()
    }
    assert out == {
        1: (1, 5),
        2: (2, 12),      # inclusive left edge: ts=0 row is in [0,10]
        3: (2, 7),       # ts=0 aged out by 1 µs; null row counts in n
        4: (2, None),    # ties are peers: both ts=30 rows see both
        5: (2, None),    # all-null frame -> NULL, not cum-diff 0
        6: (1, 3),
    }
