"""Property-based as-of join verification (SURVEY.md §5): on random
small key/timestamp sets — including heavy ties — the window-recipe
as-of join must agree exactly with DuckDB's native ASOF JOIN
(semantics: latest right row with r.ts <= l.ts per key; ties on the
right side resolved to the same single row).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from security_master_spark.operators.asof import asof_join

# timestamps drawn from a tiny range so ties are the norm, not the edge
_TS = st.integers(min_value=0, max_value=6)
_KEY = st.integers(min_value=0, max_value=2)


def _run_case(spark, left_rows, right_rows):
    left = pd.DataFrame(left_rows, columns=["k", "lt"]).assign(
        lid=range(len(left_rows))
    )
    # dedupe right on (k, rt): with duplicate right timestamps the
    # matched *row* is engine-ambiguous (both agree on the timestamp,
    # not on which duplicate) — the operator contract documents this;
    # value-determinism requires unique (key, ts) on the right.
    right = (
        pd.DataFrame(right_rows, columns=["k", "rt"])
        .drop_duplicates(["k", "rt"])
        .reset_index(drop=True)
    )
    right["rv"] = right["k"] * 100 + right["rt"]

    l_df = spark.createDataFrame(left.astype("int64"))
    r_df = spark.createDataFrame(right.astype("int64"))
    got = {
        (r.k, r.lt, r.lid, r.rt, r.rv)
        for r in asof_join(l_df, r_df, on=["k"], left_ts="lt", right_ts="rt")
        .select("k", "lt", "lid", "rt", "rv")
        .collect()
    }

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = {
        tuple(int(x) for x in row)
        for row in con.execute(
            """
            SELECT l.k, l.lt, l.lid, r.rt, r.rv
            FROM l ASOF JOIN r ON l.k = r.k AND l.lt >= r.rt
            """
        ).fetchall()
    }
    con.close()
    assert got == want, f"asof mismatch:\n spark={sorted(got)}\n duck={sorted(want)}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=8),
    right_rows=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=8),
)
def test_asof_matches_duckdb_on_ties(spark, left_rows, right_rows):
    _run_case(spark, left_rows, right_rows)


def test_asof_exact_tie_takes_equal_timestamp(spark):
    """lt == rt must match (<= semantics, not <)."""
    _run_case(spark, [(0, 3)], [(0, 3), (0, 2)])


def test_asof_left_before_all_right_drops_row(spark):
    """A left row earlier than every right row has no match (inner)."""
    _run_case(spark, [(0, 0)], [(0, 5)])
