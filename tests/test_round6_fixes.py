"""Round-6 hardening: regression tests for the round-5 ADVICE items —
w7's null-aware leave-one-out rewrite certified CROSS-ENGINE on a
fixture that actually contains NULL values (the shipped events fixture
has none, so the round-5 driver hash never exercised the null branch),
and d59's epsilon-banded denominator certified on perfectly-correlated
series where the naive exact-zero NULLIF is engine-order-dependent.

Both tests synthesize a tiny events.parquet (pyarrow single file, the
driver's round-4+ TIMESTAMP(MICROS) layout) in tmp_path and run the
REGISTERED query + its REGISTERED oracle SQL over it — same code
paths the driver exercises, different data.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest

from security_master_spark.plans.registry import oracle_sql, queries
from tests.oracle import _canon_frame

_Q = queries()
_O = oracle_sql()


def _write_events(tmp_path, event_ids, event_types, ts_list, values):
    table = pa.table(
        {
            "event_id": pa.array(event_ids, pa.int64()),
            "event_type": pa.array(event_types, pa.string()),
            "ts": pa.array(
                pd.to_datetime(ts_list), pa.timestamp("us")
            ),
            "value": pa.array(values, pa.float64()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _cross_engine(spark, name, sf_dir):
    """Run registered query + registered oracle over a fixture dir
    that only needs an events view — the tests/oracle.py compare
    flow, minus the ten-table view bootstrap."""
    spark_pd = _Q[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    duck_pd = con.execute(_O[name]).df()
    con.close()
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: rows {len(spark_pd)} != {len(duck_pd)}"
    )
    s_kinds, s_rows = _canon_frame(spark_pd)
    d_kinds, d_rows = _canon_frame(duck_pd)
    assert s_rows == d_rows, (
        f"{name}: value mismatch; first diffs "
        f"{[(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]}"
    )
    return spark_pd


def test_w7_null_current_row_matches_native_exclude(spark, tmp_path):
    """The null-aware branch of w7's rewrite — (sum − coalesce(x,0)) /
    (cnt − [x not null]) — against DuckDB's NATIVE EXCLUDE CURRENT
    ROW, on data where every 4th value is NULL plus one fully-NULL
    neighborhood. A NULL current row must subtract nothing from
    either side (the naive (sum−x)/(cnt−1) double-discounts); NULL
    peers must vanish from numerator and denominator alike."""
    n = 40
    ids, types, ts, vals = [], [], [], []
    for t_idx, et in enumerate(("A", "B")):
        for i in range(n):
            ids.append(t_idx * 1000 + i)
            types.append(et)
            ts.append(f"2026-01-01 00:{i:02d}:00")
            if et == "B" and 5 <= i < 36:
                vals.append(None)  # a NULL run wider than the 21-row frame
            elif i % 4 == 0:
                vals.append(None)
            else:
                vals.append(float((i * 37) % 101) + t_idx)
    sf = _write_events(tmp_path, ids, types, ts, vals)
    out = _cross_engine(spark, "w7_exclude_current_row", sf)
    # sanity: the fixture really exercised both branches
    assert out["peer_mean"].isna().sum() > 0  # all-NULL neighborhoods
    assert out["peer_mean"].notna().sum() > 0


def test_d59_epsilon_band_nulls_degenerate_pairs_cross_engine(
    spark, tmp_path
):
    """Perfectly-correlated series (B = 2·A tick-for-tick) make
    v1 + v2 − 2·c12 collapse to ~0 — where Spark's and DuckDB's float
    summation orders may disagree between exact 0 and ~1e-18. The
    epsilon band must NULL the weight identically on both engines."""
    closes = [100.0, 110.0, 99.0, 105.0, 120.0, 115.0, 108.0, 111.0]
    ids, types, ts, vals = [], [], [], []
    for t_idx, (et, scale) in enumerate((("AA", 1.0), ("BB", 1.0))):
        for d, c in enumerate(closes):
            ids.append(t_idx * 100 + d)
            types.append(et)
            ts.append(f"2026-02-{d + 1:02d} 12:00:00")
            vals.append(c * scale)
    sf = _write_events(tmp_path, ids, types, ts, vals)
    out = _cross_engine(spark, "d59_min_variance_pairs", sf)
    assert len(out) == 1
    # identical return series → degenerate denominator → banded NULL
    assert out["w_a"].isna().all()
    assert out["min_var_vol"].isna().all()


def test_d59_non_degenerate_pairs_still_produce_weights(spark, tmp_path):
    """The band must not swallow legitimate pairs: independent-ish
    series produce a finite weight on both engines."""
    a = [100.0, 112.0, 98.0, 107.0, 121.0, 113.0, 109.0, 114.0]
    b = [50.0, 51.0, 55.0, 49.0, 52.0, 57.0, 50.0, 54.0]
    ids, types, ts, vals = [], [], [], []
    for t_idx, (et, series) in enumerate((("AA", a), ("BB", b))):
        for d, c in enumerate(series):
            ids.append(t_idx * 100 + d)
            types.append(et)
            ts.append(f"2026-03-{d + 1:02d} 12:00:00")
            vals.append(c)
    sf = _write_events(tmp_path, ids, types, ts, vals)
    out = _cross_engine(spark, "d59_min_variance_pairs", sf)
    assert len(out) == 1
    assert out["w_a"].notna().all()
    assert out["min_var_vol"].notna().all()


# ---------------------------------------------------------------------------
# round-6: the decode_image stub became a real pure-Python BMP/PPM codec
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_all_padding_residues():
    """encode → decode must be the identity for every BMP row-padding
    residue (3·w mod 4 ∈ {0,1,2,3} ⇔ w mod 4 cycles) and odd heights."""
    import numpy as np

    from security_master_spark.multimodal.binary import (
        decode_image,
        encode_bmp,
    )

    rng = np.random.default_rng(42)
    for w in (8, 9, 10, 11, 23):
        for h in (1, 5, 19):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_image(encode_bmp(px)), px), (
                f"roundtrip mismatch at w={w} h={h}"
            )


def test_bmp_topdown_negative_height():
    """A top-down BMP (negative biHeight) must decode to the same
    array as its bottom-up twin."""
    import struct

    import numpy as np

    from security_master_spark.multimodal.binary import (
        decode_image,
        encode_bmp,
    )

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse the (padded) row blocks
    row = (3 * 4 + 3) // 4 * 4
    struct.pack_into("<i", b, 22, -3)
    body = bytes(b[54:])
    rows = [body[i * row:(i + 1) * row] for i in range(3)]
    b[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_image(bytes(b)), px)


def test_ppm_decode_with_comments():
    import numpy as np

    from security_master_spark.multimodal.binary import decode_image

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n# test card\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(blob), px)


def test_decode_rejects_unsupported():
    import pytest as _pytest

    from security_master_spark.multimodal.binary import decode_image

    with _pytest.raises(ValueError, match="truncated BMP"):
        decode_image(b"BM\x00\x01")
    with _pytest.raises(ValueError, match="unsupported|cannot identify"):
        decode_image(b"\x89PNG\r\n\x1a\nnotreallyapng")
    with _pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_render_test_card_matches_closed_form():
    from security_master_spark.multimodal.binary import render_test_card

    px = render_test_card(7, 5, 4)
    assert px.shape == (4, 5, 3)
    assert px[2, 3, 0] == (3 * 3 + 7 * 2 + 7) % 256
    assert px[2, 3, 1] == (5 * 3 + 11 * 2 + 14) % 256
    assert px[2, 3, 2] == (3 * 2 + 21) % 256


def test_wav_roundtrip_and_chunk_walk():
    """encode_wav → decode_wav identity, including a WAV with an extra
    (odd-sized) chunk BEFORE fmt/data — the chunk walker must skip
    unknown chunks with word alignment, not assume the canonical
    44-byte layout."""
    import struct

    import numpy as np

    from security_master_spark.multimodal.binary import (
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 1, -1, 32767, -32768, 12345], dtype="<i2")
    out, rate = decode_wav(encode_wav(s, sample_rate=16000))
    assert rate == 16000 and np.array_equal(out, s)

    # splice an unknown 3-byte chunk (odd size -> 1 pad byte) in front
    b = encode_wav(s)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    hacked = b[:12] + extra + b[12:]
    hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    out2, rate2 = decode_wav(hacked)
    assert rate2 == 8000 and np.array_equal(out2, s)


def test_wav_rejects_unsupported():
    import struct

    import numpy as np
    import pytest as _pytest

    from security_master_spark.multimodal.binary import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # stereo: patch channels=2 into the fmt chunk
    b = bytearray(encode_wav(np.zeros(4, dtype="<i2")))
    struct.pack_into("<H", b, 22, 2)
    with _pytest.raises(ValueError, match="mono 16-bit"):
        decode_wav(bytes(b))


def test_render_test_tone_matches_closed_form():
    from security_master_spark.multimodal.binary import render_test_tone

    s = render_test_tone(11, 500)
    assert len(s) == 500
    assert int(s[7]) == (7 * 7 + 13 * 11) % 65536 - 32768
    assert int(s[499]) == (7 * 499 + 13 * 11) % 65536 - 32768


def test_fifo_interval_join_equals_sequential_queue(spark, sf_dir):
    """d63's cumulative-range interval-join FIFO must equal a
    literal sequential lot-queue simulation (the textbook definition)
    account by account — including oversells, which match nothing
    past the available lots."""
    import collections

    from security_master_spark.plans.registry import queries

    out = {
        r.user_id: (r.matched_qty, round(r.realized_pnl, 6))
        for r in queries()["d63_fifo_realized_pnl"](spark, sf_dir).collect()
    }

    from security_master_spark.datasets import load_table
    from pyspark.sql import functions as F

    trades = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id", "ts", "event_id", "event_type",
            (F.col("event_id") % 5 + 1).alias("qty"),
            F.col("value").alias("px"),
        )
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    lots: dict = collections.defaultdict(collections.deque)
    pnl: dict = collections.defaultdict(float)
    mqty: dict = collections.defaultdict(int)
    for r in trades:
        if r.event_type == "view":  # buy
            lots[r.user_id].append([r.qty, r.px])
        else:  # sell consumes FIFO
            need = r.qty
            q = lots[r.user_id]
            while need > 0 and q:
                lot = q[0]
                take = min(need, lot[0])
                pnl[r.user_id] += take * (r.px - lot[1])
                mqty[r.user_id] += take
                lot[0] -= take
                need -= take
                if lot[0] == 0:
                    q.popleft()
    expect = {
        u: (mqty[u], round(pnl[u], 6)) for u in mqty if mqty[u] > 0
    }
    assert out == expect, (
        f"FIFO mismatch; first diffs: "
        f"{[(u, out.get(u), expect.get(u)) for u in set(out) | set(expect) if out.get(u) != expect.get(u)][:3]}"
    )


def test_fifo_ledger_conserves_buy_units(spark, sf_dir):
    """d63 + d64 must partition every bought unit exactly once:
    matched_qty + open_qty == total buy quantity per account."""
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.plans.registry import queries

    _q = queries()
    matched = {
        r.user_id: r.matched_qty
        for r in _q["d63_fifo_realized_pnl"](spark, sf_dir).collect()
    }
    opened = {
        r.user_id: r.open_qty
        for r in _q["d64_unrealized_pnl"](spark, sf_dir).collect()
    }
    bought = {
        r.user_id: r.total
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.sum(F.col("event_id") % 5 + 1).alias("total"))
        .collect()
    }
    for u, total in bought.items():
        assert matched.get(u, 0) + opened.get(u, 0) == total, (
            f"user {u}: matched {matched.get(u, 0)} + open "
            f"{opened.get(u, 0)} != bought {total}"
        )
