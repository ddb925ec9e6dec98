"""MERGE / upsert (SURVEY.md §2.11 write side): latest-wins key merge
of an updates batch into a target dataset, and the copy-on-write
parquet snapshot pattern that gives plain parquet transactional-ish
upserts without a table format.

At 100 TB the real deployment uses a lakehouse table format (Delta/
Iceberg MERGE INTO) — flagged out of scope in SURVEY.md. What this
module provides is the same MERGE semantics expressed as a pure
DataFrame transform (oracle-checkable SQL: anti-join + union), plus a
snapshot-versioned parquet writer demonstrating the copy-on-write
cycle end-to-end. The merge itself is one shuffle on the merge keys;
at scale, bucketed layout on those keys (see ``write_bucketed_table``)
removes even that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """MERGE semantics as a transform: update rows whose keys match,
    insert the rest (``WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    THEN INSERT``). Both inputs must be key-unique (the SCD-current
    contract; dedupe with ``latest_per_key`` first if not — with
    duplicate keys the winner is arbitrary unless ``order_col`` is
    given).

    With ``delete_col`` (boolean column on ``updates``), true rows act
    as ``WHEN MATCHED THEN DELETE``: the key is dropped from the
    output.

    With ``order_col`` (a column present on BOTH sides, e.g. an event
    timestamp), the row with the highest ``order_col`` wins per key —
    updates only beat the target on ties. Without it the merge is
    arrival-order latest-wins: an out-of-order feed replayed across
    several merges can overwrite newer data with older (round-2
    advice) — pass ``order_col`` for out-of-order sources.

    No join: union + row_number moves every row across the wire exactly
    once (one Exchange per union branch, both into the same key
    partitioning), where a join-based merge shuffles both sides for the
    join and then again for any downstream key grouping. The output
    comes out hash-partitioned by ``keys`` — exactly the layout the
    snapshot write wants.
    """
    upd = updates
    if delete_col is None:
        upd = upd.withColumn("__del", F.lit(False))
    else:
        upd = upd.withColumn("__del", F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    tagged = target.withColumn("__src", F.lit(0)).withColumn(
        "__del", F.lit(False)
    ).unionByName(upd.withColumn("__src", F.lit(1)))
    order = []
    if order_col is not None:
        order.append(F.desc_nulls_last(order_col))
    order.append(F.desc("__src"))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (~F.col("__del")))
        .drop("__rn", "__src", "__del")
    )


def latest_snapshot_version(spark, base_dir: str) -> int:
    """Highest existing snapshot version under ``base_dir`` (0 = none).
    Versions are plain ``v000N`` directories — deliberately not
    ``snapshot=N`` hive partitions, so reading one snapshot never
    grows a partition column."""
    import os

    if not os.path.isdir(base_dir):
        return 0
    versions = [
        int(d[1:])
        for d in os.listdir(base_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    return max(versions, default=0)


def snapshot_path(base_dir: str, version: int) -> str:
    return f"{base_dir}/v{version:04d}"


def read_snapshot(
    spark, base_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: snapshot ``version`` (1-based), or the latest
    when ``version`` is None. Because upserts are copy-on-write, every
    historical version remains a self-contained parquet directory —
    `AS OF` semantics with zero extra bookkeeping. Raises FileNotFoundError
    for a never-written version."""
    import os

    v = latest_snapshot_version(spark, base_dir) if version is None else version
    path = snapshot_path(base_dir, v)
    if v < 1 or not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot v{v} does not exist under {base_dir}")
    return spark.read.parquet(path)


def snapshot_diff(
    spark,
    base_dir: str,
    from_version: int,
    to_version: int,
    keys: Sequence[str],
) -> DataFrame:
    """CDC between two snapshot versions: one row per changed key with
    ``change_type`` ∈ {insert, update, delete} and the post-image value
    columns (pre-image for deletes — the row that disappeared). The
    table-format equivalent is Delta CDF / Iceberg changelog scans;
    under copy-on-write it is a key-wise full-outer compare: one
    shuffle per side on the merge keys, value equality via a single
    struct comparison (null-safe), no per-column join logic. Unchanged
    keys drop out before any downstream work."""
    a = read_snapshot(spark, base_dir, from_version)
    b = read_snapshot(spark, base_dir, to_version)
    ks = list(keys)
    vals = [c for c in a.columns if c not in ks]
    left = a.select(*ks, F.struct(*vals).alias("__before"))
    right = b.select(*ks, F.struct(*vals).alias("__after"))
    j = left.join(right, ks, "full_outer")
    change = (
        F.when(F.col("__before").isNull(), F.lit("insert"))
        .when(F.col("__after").isNull(), F.lit("delete"))
        .when(~F.col("__before").eqNullSafe(F.col("__after")), F.lit("update"))
    )
    image = F.coalesce(F.col("__after"), F.col("__before"))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*ks, "change_type", *[image[c].alias(c) for c in vals])
    )


def compact_snapshot(
    spark, base_dir: str, target_partitions: int
) -> DataFrame:
    """Small-file compaction: rewrite the latest snapshot into
    ``target_partitions`` files as a NEW version (copy-on-write, same
    single-writer contract as the upsert path — readers of vN are
    undisturbed). Incremental upserts accrete one file set per merge;
    compaction restores scan efficiency (fewer, fuller row groups →
    fewer tasks, better column-chunk compression). `coalesce` not
    `repartition` when shrinking: it avoids a full shuffle by stitching
    existing partitions map-side."""
    current = latest_snapshot_version(spark, base_dir)
    df = read_snapshot(spark, base_dir, current)
    shrunk = df.coalesce(target_partitions)
    out = snapshot_path(base_dir, current + 1)
    shrunk.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def upsert_parquet_snapshot(
    spark,
    base_dir: str,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Copy-on-write MERGE into a parquet dataset: read the latest
    snapshot, merge the updates batch, write snapshot N+1, return a
    reader over it. The old snapshot stays readable throughout (no
    read-modify-overwrite race on the same path — Spark cannot safely
    overwrite an input it is lazily reading); retention/vacuum of old
    versions is the operator's policy knob.

    Single-writer fast path: snapshot versioning here is "highest
    v000N directory + 1" with no commit protocol — two concurrent
    writers can both read vN, both write vN+1, and one silently
    clobbers the other. For concurrent writers use
    :func:`upsert_parquet_snapshot_concurrent`, which adds the
    optimistic rename-commit + re-merge-retry protocol (the Delta /
    Iceberg commit discipline) on top of the same merge.
    """
    current = latest_snapshot_version(spark, base_dir)
    if current > 0:
        target = spark.read.parquet(snapshot_path(base_dir, current))
    else:
        # v1 rides the SAME merge path against an empty target, so
        # delete-flagged rows are dropped and duplicate keys collapse
        # exactly as in every later merge (the old fast path INSERTED
        # delete-flagged first-batch rows — round-2 advice, medium).
        schema = (
            updates if delete_col is None else updates.drop(delete_col)
        ).schema
        target = spark.createDataFrame([], schema)
    merged = merge_upsert(
        target, updates, keys, delete_col=delete_col, order_col=order_col
    )
    out = snapshot_path(base_dir, current + 1)
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def _stage_snapshot(spark, base_dir: str, df: DataFrame) -> str:
    """Write ``df`` to a uniquely-named staging directory under
    ``base_dir`` (same filesystem, so the later commit rename is
    atomic). Crash-orphaned staging dirs are inert garbage — they never
    match the ``v000N`` pattern, so readers and version listing ignore
    them; sweep ``_staging/`` at leisure."""
    import os
    import uuid

    staging = f"{base_dir}/_staging/{uuid.uuid4().hex}"
    os.makedirs(f"{base_dir}/_staging", exist_ok=True)
    df.write.mode("overwrite").parquet(staging)
    return staging


def sweep_orphaned_staging(
    base_dir: str, min_age_seconds: float = 3600.0
) -> list[str]:
    """Remove crash-orphaned staging directories older than
    ``min_age_seconds``; returns the paths removed.

    A writer that dies between staging and commit leaves an inert
    directory under ``_staging/`` — invisible to readers (only
    ``v000N`` dirs are data) but consuming storage. The age guard is
    the correctness condition: a LIVE writer's staging dir must never
    be swept mid-commit, so the threshold should comfortably exceed
    the longest plausible stage→commit gap (the rename itself is
    instantaneous; the gap is the staging write). Age is the max
    mtime across the WHOLE staging tree, not the top-level dir: a
    live writer streaming part-files into nested partition subdirs
    does not bump the top-level mtime, so a top-level-only check
    could sweep a slow write mid-flight. Committed versions are
    untouchable by construction — they live outside ``_staging/``.
    """
    import os
    import shutil
    import time

    def _tree_max_mtime(path: str) -> float:
        newest = os.path.getmtime(path)
        for dirpath, dirnames, filenames in os.walk(path):
            for entry in (*dirnames, *filenames):
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, entry))
                    )
                except OSError:
                    continue  # racing writer/cleaner — the dir is live
        return newest

    root = f"{base_dir}/_staging"
    if not os.path.isdir(root):
        return []
    removed = []
    now = time.time()
    for name in os.listdir(root):
        path = os.path.join(root, name)
        try:
            age = now - _tree_max_mtime(path)
        except OSError:
            continue  # concurrently committed (renamed away) — done
        if age >= min_age_seconds:
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed


def try_commit_staged(base_dir: str, staging_path: str, version: int) -> bool:
    """Atomically commit a staged snapshot as ``version``: a single
    POSIX ``rename(staging, v000N)``. Rename onto an existing directory
    fails, so exactly ONE of any number of concurrent committers wins a
    given version — this is the whole commit protocol (the lakehouse
    equivalent is Delta's _delta_log N.json put-if-absent / Iceberg's
    metastore swap). Returns False on conflict, leaving the staging
    directory intact for the caller to retry with."""
    import errno
    import os

    target = snapshot_path(base_dir, version)
    try:
        os.rename(staging_path, target)
        return True
    except OSError as e:
        if e.errno in (errno.EEXIST, errno.ENOTEMPTY, errno.EACCES):
            return False
        raise


def upsert_parquet_snapshot_concurrent(
    spark,
    base_dir: str,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    order_col: str | None = None,
    max_retries: int = 5,
) -> DataFrame:
    """Multi-writer MERGE with optimistic concurrency (closes the
    single-writer honesty note above): read the committed latest,
    merge, write to staging, then attempt the atomic rename-commit of
    version N+1. A loser (someone else committed N+1 first) RE-MERGES
    its updates against the winner's snapshot and retries as N+2 — so
    no update is ever silently clobbered; concurrent merges serialize
    into some order, each seeing the previous one's effects (the same
    guarantee lakehouse MERGE INTO gives, minus column-level conflict
    detection, which full-table latest-wins merge semantics make
    unnecessary: re-merging IS the resolution).

    Copy-on-write means a reader of any committed version is never
    disturbed, and a writer crash leaves only an orphaned staging dir
    (never a half-visible version). Raises RuntimeError after
    ``max_retries`` consecutive lost races (pathological contention —
    back off at the caller)."""
    import shutil

    for _ in range(max_retries):
        current = latest_snapshot_version(spark, base_dir)
        if current > 0:
            target = spark.read.parquet(snapshot_path(base_dir, current))
        else:
            schema = (
                updates if delete_col is None else updates.drop(delete_col)
            ).schema
            target = spark.createDataFrame([], schema)
        merged = merge_upsert(
            target, updates, keys, delete_col=delete_col, order_col=order_col
        )
        staging = _stage_snapshot(spark, base_dir, merged)
        if try_commit_staged(base_dir, staging, current + 1):
            return spark.read.parquet(snapshot_path(base_dir, current + 1))
        # lost the race: discard our stale staging and re-merge against
        # the winner's snapshot
        shutil.rmtree(staging, ignore_errors=True)
    raise RuntimeError(
        f"upsert lost the commit race {max_retries} times under {base_dir}"
    )
