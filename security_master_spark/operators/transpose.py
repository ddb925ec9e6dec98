"""Guarded transpose: make ``DataFrame.transpose``'s small-result
contract a property of the code path, not a docstring.

``DataFrame.transpose`` (Spark 4) collects the index column to the
driver to name the output columns — by API design it is a
small-result operator. A caller who copy-pastes a transpose onto an
uncollapsed fact table gets a driver OOM at scale, not an error. This
wrapper enforces the contract up front with a bounded probe:
``limit(max_rows + 1)`` scans at most ``max_rows + 1`` rows
(LocalLimit short-circuits the scan), so the guard itself is cheap
even when the input is a 100 TB table someone forgot to aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 10_000


def transpose_small(
    df: DataFrame, index_col: str, max_rows: int = DEFAULT_MAX_ROWS
) -> DataFrame:
    """Transpose ``df`` on ``index_col`` iff it has at most
    ``max_rows`` rows; raise ``ValueError`` otherwise.

    Single-evaluation guard: the bounded slice
    ``limit(max_rows + 1)`` is ``localCheckpoint``-ed (eager, at most
    ``max_rows + 1`` rows — trivial), then both the cardinality probe
    and the transpose itself read that one materialization. The input
    plan runs exactly once, so a nondeterministic source (``rand()``,
    ``repartitionByRange`` sampling, ``now()``) can't pass the probe
    and then exceed the bound — or change values — when the transpose
    re-evaluates; an unbounded input still fails fast because the
    limit caps what gets materialized. (Before round 8 the probe was a
    second job over the uncached plan; the double-compute caveat this
    replaced lived in this docstring.)

    Retention: each call stores one ``localCheckpoint`` snapshot
    (≤ ``max_rows + 1`` rows) whose blocks are freed by the
    ContextCleaner only when the returned frame becomes unreachable —
    there is no public API to drop them eagerly, and an
    unpersist-in-finally would let a nondeterministic source recompute
    past the probe (the exact bug this design removed). A long-lived
    session hammering this in a loop should drop references promptly;
    note also that localCheckpoint blocks are not decommission-safe
    (a lost executor invalidates the snapshot — acceptable for a
    driver-bound small-result operator, by the same argument as
    ``transpose`` itself).
    """
    snap = df.limit(max_rows + 1).localCheckpoint(eager=True)
    if snap.count() > max_rows:
        raise ValueError(
            f"transpose_small: input has more than {max_rows} rows "
            f"(index column {index_col!r}); transpose collects the "
            "index to the driver — collapse/aggregate the frame first"
        )
    return snap.transpose(index_col)
