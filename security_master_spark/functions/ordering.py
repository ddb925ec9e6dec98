"""Cross-engine total-order keys for arg-by aggregates.

``min_by``/``max_by`` (Spark) and ``ARG_MIN``/``ARG_MAX`` (DuckDB) on
a bare timestamp are ENGINE-ARBITRARY when rows tie on the timestamp —
real feeds carry same-instant prints, and the adversarial fixture
(duplicate (key, ts) rows, one user's whole history on a single
instant) flips daily closes between engines. DuckDB's arg functions
take no composite key, so the shared total order must be ONE scalar:
a zero-padded string ``epoch_micros ++ row id`` whose lexicographic
order equals the (ts, id) order on both engines.

Why a string and not arithmetic: ``epoch_us * K + id`` overflows
int64 for any K that clears a real id space (1.7e15 µs × 1e6 ids >
2^63), and a raw timestamp→string cast is NOT order-safe (engines
trim trailing fraction zeros differently, breaking lexicographic
comparison between unequal-length fractions — the d74 lesson).

Contract: non-negative epoch micros (post-1970 data) and ids
< 10^12; both hold for every fixture and any plausible feed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tick_order_key(ts: str = "ts", id_col: str = "event_id") -> Column:
    """Spark side of the shared (ts, id) total order.

    CONTRACT (silently violated, not detected — lpad truncates an
    over-wide id and sorts '-' before digits): ``ts`` must be at or
    after the Unix epoch (non-negative micros) and ``id_col`` must be
    a non-negative integer < 10^12. Out-of-contract rows mis-order
    with no error; run :func:`tick_order_domain_violations` on new
    fixtures / feeds (tools/gen_adversarial.py asserts the same domain
    at generation time)."""
    return F.concat(
        F.lpad(F.unix_micros(F.col(ts)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
    )


def sql_tick_order_key(ts: str = "ts", id_col: str = "event_id") -> str:
    """DuckDB spelling of :func:`tick_order_key` — drop into
    ``ARG_MIN(value, <this>)`` / ``ARG_MAX(value, <this>)``. Same
    domain contract as the Spark side (ts ≥ epoch, 0 ≤ id < 10^12)."""
    return (
        f"LPAD(epoch_us({ts})::VARCHAR, 20, '0') || "
        f"LPAD({id_col}::VARCHAR, 12, '0')"
    )


def tick_order_domain_violations(df, ts: str = "ts",
                                 id_col: str = "event_id"):
    """Debug-path guard for the key's domain contract: returns the
    rows whose (ts, id) the zero-padded key would SILENTLY mis-order —
    pre-epoch timestamps, NULL/negative ids, ids ≥ 10^12. Intended for
    fixture-generation checks and feed onboarding (cheap single scan,
    no shuffle); assert ``.isEmpty()`` before trusting arg-by results
    on a new source."""
    return df.filter(
        F.col(ts).isNull()
        | F.col(id_col).isNull()
        | (F.unix_micros(F.col(ts)) < 0)
        | (F.col(id_col) < 0)
        | (F.col(id_col) >= F.lit(10**12))
    )
