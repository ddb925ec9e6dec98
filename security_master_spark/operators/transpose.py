"""Guarded transpose: make ``DataFrame.transpose``'s small-result
contract a property of the code path, not a docstring.

``DataFrame.transpose`` (Spark 4) collects the index column to the
driver to name the output columns — by API design it is a
small-result operator. A caller who copy-pastes a transpose onto an
uncollapsed fact table gets a driver OOM at scale, not an error. This
wrapper enforces the contract up front with a bounded probe:
``limit(max_rows + 1).count()`` scans at most ``max_rows + 1`` rows
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

    The cardinality probe uses ``limit(max_rows + 1)`` so it never
    counts past the threshold — an unbounded input fails fast instead
    of flooding the driver.

    Cost/consistency note: the probe is a SECOND job over ``df``'s
    (uncached) plan — the input is computed twice, and a
    nondeterministic source (rand(), repartitionByRange sampling,
    now()) could pass the probe yet exceed the bound when the
    transpose re-evaluates it. Hot-path callers with a pre-counted or
    pre-collapsed frame can skip the probe and call
    ``df.transpose(index_col)`` directly; callers on nondeterministic
    input should ``persist()``/``localCheckpoint()`` first so both
    jobs see one materialization.
    """
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"transpose_small: input has more than {max_rows} rows "
            f"(index column {index_col!r}); transpose collects the "
            "index to the driver — collapse/aggregate the frame first"
        )
    return df.transpose(index_col)
