"""Property test: merge_upsert against a reference model.

MERGE semantics are simple enough to state as a dict fold — apply the
updates batch to {key: row}: delete-flagged matched keys drop, other
update rows win their key, untouched target rows persist. The operator
must agree with that fold for arbitrary key-unique batches, including
the corners hand-written cases miss (update batch empty, all-deletes,
delete of a non-existent key, disjoint key ranges).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from security_master_spark.operators.merge import merge_upsert

_KEYS = st.integers(min_value=0, max_value=15)
_VALS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _batch(with_delete: bool):
    row = (
        st.tuples(_KEYS, _VALS, st.booleans())
        if with_delete
        else st.tuples(_KEYS, _VALS)
    )
    return st.lists(row, max_size=12, unique_by=lambda r: r[0])


@given(target=_batch(False), updates=_batch(True))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_matches_reference_model(spark, target, updates):
    model = {k: (k, v) for k, v in target}
    for k, v, deleted in updates:
        if deleted:
            model.pop(k, None)
            # unmatched delete: MERGE does nothing — already absent
        else:
            model[k] = (k, v)

    t = spark.createDataFrame(target, "k int, v double")
    u = spark.createDataFrame(updates, "k int, v double, del boolean")
    out = merge_upsert(t, u, keys=["k"], delete_col="del")
    got = {r.k: (r.k, r.v) for r in out.collect()}
    # NB: an unmatched delete-flagged row also vanishes from the output
    # (it never existed in the target) — same end state as the model.
    assert got == model


def test_time_travel_and_compaction(spark, tmp_path):
    """Snapshot store lifecycle: v1 and v2 both stay readable after the
    second upsert (time travel), snapshot_diff picks up exactly the
    changed keys, and compaction rewrites the latest version into fewer
    files without changing its rows."""
    import glob

    import pytest as _pytest
    from pyspark.sql import functions as F

    from security_master_spark.operators.merge import (
        compact_snapshot,
        read_snapshot,
        snapshot_diff,
        upsert_parquet_snapshot,
    )

    base_dir = str(tmp_path / "store")
    rows1 = [(k, float(k * 10), "a") for k in range(20)]
    df1 = spark.createDataFrame(rows1, "k INT, v DOUBLE, tag STRING")
    upsert_parquet_snapshot(spark, base_dir, df1, keys=["k"])
    updates = spark.createDataFrame(
        [(5, 999.0, "b", False), (19, 0.0, "a", True), (100, 1.0, "c", False)],
        "k INT, v DOUBLE, tag STRING, is_del BOOLEAN",
    )
    upsert_parquet_snapshot(
        spark, base_dir, updates, keys=["k"], delete_col="is_del"
    )

    v1 = {r.k: (r.v, r.tag) for r in read_snapshot(spark, base_dir, 1).collect()}
    v2 = {r.k: (r.v, r.tag) for r in read_snapshot(spark, base_dir, 2).collect()}
    assert v1[19] == (190.0, "a") and 19 not in v2  # old version undisturbed
    assert v2[5] == (999.0, "b") and v2[100] == (1.0, "c")
    assert read_snapshot(spark, base_dir).count() == len(v2)  # latest default
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, base_dir, 7)

    diff = {
        r.k: r.change_type
        for r in snapshot_diff(spark, base_dir, 1, 2, keys=["k"]).collect()
    }
    assert diff == {5: "update", 19: "delete", 100: "insert"}

    # Spread the latest snapshot wide, then compact it down.
    wide = read_snapshot(spark, base_dir).repartition(8)
    from security_master_spark.operators.merge import (
        latest_snapshot_version,
        snapshot_path,
    )

    wide.write.mode("overwrite").parquet(
        snapshot_path(base_dir, latest_snapshot_version(spark, base_dir) + 1)
    )
    compacted = compact_snapshot(spark, base_dir, target_partitions=1)
    v_now = latest_snapshot_version(spark, base_dir)
    files = glob.glob(f"{snapshot_path(base_dir, v_now)}/*.parquet")
    assert len(files) == 1
    assert {r.k: (r.v, r.tag) for r in compacted.collect()} == v2


def test_concurrent_upsert_race_loses_nothing(spark, tmp_path):
    """Optimistic-concurrency MERGE: two writers race from the same
    base version; the loser's commit rename MUST fail (never silently
    clobber), and its retry must re-merge against the winner's
    snapshot so both writers' updates survive in the final version."""
    from security_master_spark.operators.merge import (
        _stage_snapshot,
        latest_snapshot_version,
        merge_upsert,
        read_snapshot,
        try_commit_staged,
        upsert_parquet_snapshot_concurrent,
    )

    base = str(tmp_path / "ds")
    seed = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    upsert_parquet_snapshot_concurrent(spark, base, seed, keys=["k"])
    assert latest_snapshot_version(spark, base) == 1

    # Both writers read v1 and stage their merges (the race window).
    t = read_snapshot(spark, base)
    upd_a = spark.createDataFrame([(2, 99.0)], ["k", "v"])
    upd_b = spark.createDataFrame([(3, 30.0)], ["k", "v"])
    stage_a = _stage_snapshot(spark, base, merge_upsert(t, upd_a, ["k"]))
    stage_b = _stage_snapshot(spark, base, merge_upsert(t, upd_b, ["k"]))

    assert try_commit_staged(base, stage_a, 2) is True  # A wins v2
    assert try_commit_staged(base, stage_b, 2) is False  # B must lose

    # B's retry through the public path re-merges against A's v2.
    out = upsert_parquet_snapshot_concurrent(spark, base, upd_b, keys=["k"])
    assert latest_snapshot_version(spark, base) == 3
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}
    # And every committed version stayed intact (copy-on-write).
    assert {(r.k, r.v) for r in read_snapshot(spark, base, 2).collect()} == {
        (1, 10.0),
        (2, 99.0),
    }


def test_concurrent_upsert_threads_all_survive(spark, tmp_path):
    """Four writers racing from FOUR OS threads through the public
    optimistic-commit path simultaneously (not a staged simulation):
    every writer's disjoint key set must be present in the final
    snapshot, the committed version count must equal the number of
    writers, and no version directory may be left half-written."""
    from concurrent.futures import ThreadPoolExecutor

    from security_master_spark.operators.merge import (
        latest_snapshot_version,
        read_snapshot,
        upsert_parquet_snapshot_concurrent,
    )

    base = str(tmp_path / "ds")

    def writer(i):
        upd = spark.createDataFrame(
            [(i * 10 + j, float(i)) for j in range(3)], ["k", "v"]
        )
        upsert_parquet_snapshot_concurrent(
            spark, base, upd, keys=["k"], max_retries=20
        )
        return i

    with ThreadPoolExecutor(max_workers=4) as ex:
        done = list(ex.map(writer, range(4)))
    assert sorted(done) == [0, 1, 2, 3]

    assert latest_snapshot_version(spark, base) == 4
    final = {(r.k, r.v) for r in read_snapshot(spark, base).collect()}
    want = {(i * 10 + j, float(i)) for i in range(4) for j in range(3)}
    assert final == want


def test_crash_between_stage_and_commit_recovers(spark, tmp_path):
    """A writer that dies AFTER staging but BEFORE the commit rename
    must leave the table fully usable: readers see only committed
    versions, the next writer commits normally (the orphan never
    blocks a version number), and sweep_orphaned_staging removes the
    orphan by age without touching committed data or a fresh staging
    dir that could belong to a live writer."""
    import os

    from security_master_spark.operators.merge import (
        _stage_snapshot,
        latest_snapshot_version,
        merge_upsert,
        read_snapshot,
        sweep_orphaned_staging,
        upsert_parquet_snapshot_concurrent,
    )

    base = str(tmp_path / "ds")
    seed = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    upsert_parquet_snapshot_concurrent(spark, base, seed, keys=["k"])

    # writer "crashes" here: staged, never committed
    t = read_snapshot(spark, base)
    dead = spark.createDataFrame([(9, 90.0)], ["k", "v"])
    orphan = _stage_snapshot(spark, base, merge_upsert(t, dead, ["k"]))
    assert os.path.isdir(orphan)

    # table is undisturbed and the next writer proceeds normally
    assert latest_snapshot_version(spark, base) == 1
    upd = spark.createDataFrame([(3, 30.0)], ["k", "v"])
    upsert_parquet_snapshot_concurrent(spark, base, upd, keys=["k"])
    assert latest_snapshot_version(spark, base) == 2
    assert {(r.k, r.v) for r in read_snapshot(spark, base).collect()} == {
        (1, 10.0),
        (2, 20.0),
        (3, 30.0),
    }
    # the crashed writer's keys never leaked into any committed version
    assert 9 not in {r.k for r in read_snapshot(spark, base).collect()}

    # a fresh (young) staging dir survives a guarded sweep...
    assert sweep_orphaned_staging(base, min_age_seconds=3600) == []
    assert os.path.isdir(orphan)
    # ...and an aged orphan is removed, committed versions untouched
    removed = sweep_orphaned_staging(base, min_age_seconds=0)
    assert removed == [orphan]
    assert not os.path.isdir(orphan)
    assert latest_snapshot_version(spark, base) == 2
    assert {(r.k, r.v) for r in read_snapshot(spark, base, 1).collect()} == {
        (1, 10.0),
        (2, 20.0),
    }
