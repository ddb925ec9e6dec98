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
