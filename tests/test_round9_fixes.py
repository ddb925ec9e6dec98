"""Round-9 fixes: the opt-in scratch materialization of the trailing
operator's cum-prefix frame (round-8 verdict order #3) and the t3
oracle's integer-microsecond boundary math (round-8 ADVICE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from security_master_spark.operators.trailing import trailing_interval_sum

_ROWS = [
    (1, "k", 0, 5),
    (2, "k", 10, 7),
    (3, "k", 11, None),
    (4, "k", 30, None),
    (5, "k", 30, None),
    (6, "z", 5, 3),
]
_EXPECTED = {
    1: (1, 5),
    2: (2, 12),
    3: (2, 7),
    4: (2, None),
    5: (2, None),
    6: (1, 3),
}


def test_trailing_scratch_path_is_value_identical(spark, tmp_path):
    """scratch_path is a pure performance knob: the materialized
    variant must return exactly the hand-computed frame the default
    path does, and must actually leave the prefix frame on disk."""
    df = spark.createDataFrame(
        _ROWS, "event_id long, k string, us long, u long"
    )
    path = str(tmp_path / "trail_cum")
    out = {
        r.event_id: (r.n_trailing, r.units_trailing)
        for r in trailing_interval_sum(
            df, ["k"], "us", 10, F.col("u"), "event_id",
            scratch_path=path,
        ).collect()
    }
    assert out == _EXPECTED
    # the cum frame really was materialized (both consumers read it)
    cur = spark.read.parquet(path)
    assert cur.count() == len(_ROWS)
    assert {"_cn", "_cu", "_cnn"} <= set(cur.columns)


def test_trailing_scratch_path_runs_the_cum_window_once(spark, tmp_path):
    """The default plan evaluates the cum-prefix window in two
    subtrees (no ReusedExchange); with scratch_path both consumers
    scan the parquet materialization, so the returned plan carries
    only the carry window — one fewer WindowExec than the default."""
    df = spark.createDataFrame(
        _ROWS, "event_id long, k string, us long, u long"
    )

    def n_windows(frame):
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        return plan.count("Window\n") + plan.count("Window (")

    default = trailing_interval_sum(
        df, ["k"], "us", 10, F.col("u"), "event_id"
    )
    scratched = trailing_interval_sum(
        df, ["k"], "us", 10, F.col("u"), "event_id",
        scratch_path=str(tmp_path / "trail_cum2"),
    )
    assert n_windows(scratched) < n_windows(default)


def test_asof_join_tiebreak_pins_duplicate_timestamps(spark):
    """operators/asof.py: duplicate right-side (key, ts) rows are
    engine/partition-arbitrary without a tiebreak; with one the pick
    is a deterministic function of the data."""
    from security_master_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100)], "lid long, k string, lts long"
    )
    right = spark.createDataFrame(
        [("k", 100, 5.0), ("k", 100, 9.0), ("k", 99, 7.0)],
        "k string, rts long, px double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        tiebreak=[F.col("px").desc()],
    ).collect()
    assert len(out) == 1 and out[0].px == 9.0 and out[0].rts == 100


def test_tick_order_key_matches_ts_id_order(spark):
    """functions/ordering.py: the zero-padded string key's
    lexicographic order must equal the (ts, id) order — including
    same-instant rows where the id decides."""
    from security_master_spark.functions.ordering import tick_order_key

    rows = [
        (1, "2024-01-01 00:00:00.000001"),
        (3, "2024-01-01 00:00:00.000001"),
        (2, "2024-01-01 00:00:00.000002"),
        (10, "2024-01-01 00:00:00.000001"),
    ]
    df = spark.createDataFrame(rows, "event_id long, s string").select(
        "event_id", F.col("s").cast("timestamp").alias("ts")
    )
    got = [
        r.event_id
        for r in df.orderBy(tick_order_key()).collect()
    ]
    assert got == [1, 3, 10, 2]  # ts first, then NUMERIC id order


def test_io17_escape_roundtrip_is_lossless(spark, tmp_path):
    """The text-dump newline escape must reverse exactly, including
    payloads with literal backslashes adjacent to 'n' (the odd-parity
    case) — exercised through the registered query's own plan on a
    synthetic documents table."""
    from security_master_spark.plans.sources_io8 import io17_text_roundtrip

    texts = [
        "plain",
        "line one\nline two",
        "tab\there",
        "back\\slash",
        "trap\\nliteral",        # backslash + n, NOT a newline
        "both\\\nmixed",          # backslash then real newline
        "cr\rreturn",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sfx")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    out = {r.doc_id: r.text for r in io17_text_roundtrip(spark, sf_dir).collect()}
    assert out == {i: t for i, t in enumerate(texts)}
