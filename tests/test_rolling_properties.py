"""Property-based verification of the skew-proof rolling operator
(operators/rolling.py, SURVEY.md §5 model): on random small frames —
random keys, NULL-bearing values, every bucket/halo geometry — both
rank modes of ``rolling_distinct_count`` must agree exactly with a
pure-Python trailing-frame reference (an oracle independent of BOTH
the Spark window form and the operator's own mechanism)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from security_master_spark.operators.rolling import rolling_distinct_count

#: NULL is a first-class partition-key value for windows/groupBy —
#: the operators must keep NULL-key rows (a bare name-list join would
#: silently drop them, the bug _nullsafe_attach exists to prevent)
_KEY = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
_VAL = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


def _key_sort(rows):
    return sorted(rows, key=lambda r: (r[0] is None, r[0] or 0, r[1]))


def _reference(rows, frame_rows):
    """rows: [(key, order, value)] with unique (key, order)."""
    out = {}
    by_key: dict[int | None, list[tuple[int, int | None]]] = {}
    for k, o, v in _key_sort(rows):
        by_key.setdefault(k, []).append((o, v))
    for k, seq in by_key.items():
        for i, (o, _v) in enumerate(seq):
            frame = seq[max(0, i - frame_rows + 1): i + 1]
            out[(k, o)] = len({v for _o, v in frame if v is not None})
    return out


def _run_case(spark, rows, frame_rows, bucket_rows, n_ranges,
              distributed_rank):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "o", "v"]).astype(
            {"k": "Int64", "o": "int64", "v": "Int64"}
        )
    )
    got = {
        (r.k, r.o): r.n
        for r in rolling_distinct_count(
            df, ["k"], ["o"], "v", frame_rows=frame_rows, out_col="n",
            bucket_rows=bucket_rows, distributed_rank=distributed_rank,
            n_ranges=n_ranges,
        ).collect()
    }
    want = _reference(rows, frame_rows)
    assert got == want, (
        f"rolling mismatch (frame={frame_rows} bucket={bucket_rows} "
        f"ranges={n_ranges} dist={distributed_rank}):\n"
        f" got={sorted(got.items())}\n want={sorted(want.items())}"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=st.lists(
        st.tuples(_KEY, _VAL), min_size=1, max_size=12, unique_by=None
    ),
    frame_rows=st.integers(min_value=1, max_value=5),
    extra_bucket=st.integers(min_value=0, max_value=3),
    n_ranges=st.integers(min_value=1, max_value=4),
    distributed_rank=st.booleans(),
)
def test_rolling_distinct_matches_python_reference(
    spark, cells, frame_rows, extra_bucket, n_ranges, distributed_rank
):
    # unique (key, order) by construction: order = list position
    rows = [(k, i, v) for i, (k, v) in enumerate(cells)]
    _run_case(
        spark, rows, frame_rows,
        bucket_rows=frame_rows + extra_bucket,  # ≥ frame, halo-heavy
        n_ranges=n_ranges, distributed_rank=distributed_rank,
    )


def _cumsum_reference(rows):
    """rows: [(key, order, value)] → per-(key, order) running sum,
    NULLs ignored, all-NULL prefix → None (Spark SUM semantics)."""
    out = {}
    acc: dict[int | None, tuple[int, int]] = {}  # key -> (sum, n_nonnull)
    for k, o, v in _key_sort(rows):
        s, c = acc.get(k, (0, 0))
        if v is not None:
            s, c = s + v, c + 1
        acc[k] = (s, c)
        out[(k, o)] = s if c > 0 else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=12),
    n_ranges=st.integers(min_value=1, max_value=4),
)
def test_distributed_cumsum_matches_python_reference(
    spark, cells, n_ranges
):
    """operators/rolling.py distributed_cumsum: running totals with
    exact Spark SUM NULL semantics, every range geometry."""
    from security_master_spark.operators.rolling import distributed_cumsum

    rows = [(k, i, v) for i, (k, v) in enumerate(cells)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "o", "v"]).astype(
            {"k": "Int64", "o": "int64", "v": "Int64"}
        )
    )
    got = {
        (r.k, r.o): r.cum
        for r in distributed_cumsum(
            df, ["k"], ["o"], {"cum": "v"}, n_ranges=n_ranges
        ).collect()
    }
    want = _cumsum_reference(rows)
    assert got == want, (
        f"cumsum mismatch (ranges={n_ranges}):\n"
        f" got={sorted(got.items())}\n want={sorted(want.items())}"
    )


def test_rolling_distinct_all_null_frame_counts_zero(spark):
    """A frame whose values are all NULL has distinct count 0 (the
    collect_set/COUNT DISTINCT convention, unlike SUM's NULL)."""
    _run_case(
        spark,
        [(0, 0, None), (0, 1, None)],
        frame_rows=2, bucket_rows=2, n_ranges=2, distributed_rank=True,
    )


# ---------------------------------------------------------------------------
# round-11 members of the toolkit, same discipline: pure-Python
# references independent of BOTH Spark forms
# ---------------------------------------------------------------------------

def _carry_ref(anchors, probes):
    """anchors: [(k, t, v)] unique (k, t); probes: [(rid, k, t)] →
    rid -> last non-null anchor v at t' <= t within k."""
    out = {}
    for rid, k, t in probes:
        best = None
        for ak, at, av in sorted(anchors, key=lambda r: r[1]):
            if ak == k and at <= t and av is not None:
                best = av
        out[rid] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a_cells=st.lists(
        st.tuples(_KEY, st.integers(-5, 20), _VAL),
        min_size=0, max_size=10,
    ),
    p_cells=st.lists(
        st.tuples(_KEY, st.integers(-8, 25)), min_size=1, max_size=10
    ),
    bucket_width=st.integers(min_value=1, max_value=30),
)
def test_asof_carry_bucketed_matches_python_reference(
    spark, a_cells, p_cells, bucket_width
):
    from security_master_spark.operators.asof import asof_carry_bucketed

    seen = set()
    anchors = []
    for k, t, v in a_cells:  # unique (k, t) by the as-of contract
        if (k, t) in seen:
            continue
        seen.add((k, t))
        anchors.append((k, t, v))
    probes = [(i, k, t) for i, (k, t) in enumerate(p_cells)]
    import pandas as pd

    a_df = spark.createDataFrame(
        pd.DataFrame(anchors or [(None, 0, None)][:0],
                     columns=["k", "t", "v"]).astype(
            {"k": "Int64", "t": "int64", "v": "Int64"}
        )
    ) if anchors else spark.createDataFrame([], "k long, t long, v long")
    p_df = spark.createDataFrame(
        pd.DataFrame(probes, columns=["rid", "k", "t"]).astype(
            {"rid": "int64", "k": "Int64", "t": "int64"}
        )
    )
    got = {
        r.rid: r.v
        for r in asof_carry_bucketed(
            p_df, a_df, ["k"], "t", ["v"], bucket_width
        ).collect()
    }
    want = _carry_ref(anchors, probes)
    assert got == want, (
        f"carry mismatch (bw={bucket_width}):\n anchors={anchors}\n"
        f" got={sorted(got.items())}\n want={sorted(want.items())}"
    )


def _pct_ref(values, p):
    """Spark Percentile.getPercentile on a sorted non-null list."""
    vs = sorted(v for v in values if v is not None)
    if not vs:
        return None
    pos = p * (len(vs) - 1)
    import math

    lo, hi = math.floor(pos), math.ceil(pos)
    if lo == hi:
        return float(vs[lo])
    return (hi - pos) * vs[lo] + (pos - lo) * vs[hi]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=14),
    p=st.sampled_from([0.0, 0.25, 0.5, 0.9, 0.95, 1.0]),
    n_ranges=st.integers(min_value=1, max_value=4),
)
def test_distributed_percentile_matches_python_reference(
    spark, cells, p, n_ranges
):
    import pandas as pd

    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )

    df = spark.createDataFrame(
        pd.DataFrame(cells, columns=["k", "v"]).astype(
            {"k": "Int64", "v": "Int64"}
        )
    )
    got = {
        r.k: r.q
        for r in distributed_percentile(
            df, ["k"], "v", [p], out_cols=["q"], n_ranges=n_ranges
        ).collect()
    }
    by_key: dict = {}
    for k, v in cells:
        by_key.setdefault(k, []).append(v)
    want = {k: _pct_ref(vs, p) for k, vs in by_key.items()}
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] == want[k], (k, got[k], want[k])
