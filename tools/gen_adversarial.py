"""Adversarial fixture generator (round 8): same ten tables, same
schemas, hostile distributions. The driver-sim compare runs Spark and
DuckDB on the SAME parquet, so ANY fixture is a valid oracle fixture —
this one is built to surface the failure classes the friendly TPC-H-ish
tables can't:

- SKEW: one user owns half the events; one (supplier, part) pair owns
  half the lineitems.
- TIES: thousands of events share exact timestamps (RANGE-peer and
  tie-break divergences), duplicate (user, ts) rows.
- BOUNDARIES: l_quantity exactly 25 and l_discount exactly 0.04 (the
  registry's own filter constants — strict/non-strict divergences),
  values exactly 0, negative money.
- DEGENERATE TEXT: empty docs, 1- and 2-token docs (the trigram
  guard), a 50k-token giant, unicode, byte-identical duplicates.
- DEGENERATE VECTORS: all-zero embeddings, duplicated vectors,
  near-zero norms, a null embedding.

Deterministic (fixed seeds). Usage:
    python tools/gen_adversarial.py [/tmp/advfix]
then:
    cd /tmp && SIM_SF_DIR=/tmp/advfix python tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _money(rng, n, lo=-500.0, hi=5000.0):
    # exact 2-dp money incl. negatives and zeros
    v = np.round(rng.uniform(lo, hi, n), 2)
    v[rng.random(n) < 0.02] = 0.0
    return v


def main(out: str = "/tmp/advfix") -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    s = {t: pq.read_schema(f"/root/testdata/sf0.01/{t}.parquet")
         for t in ("region nation customer supplier part orders "
                   "lineitem events documents embeddings").split()}

    def w(name, cols):
        tbl = pa.table(cols, schema=s[name])
        pq.write_table(tbl, f"{out}/{name}.parquet")

    # dims: tiny but referentially complete
    w("region", {"r_regionkey": np.arange(5, dtype="int32"),
                 "r_name": [f"R{i}" for i in range(5)]})
    w("nation", {"n_nationkey": np.arange(25, dtype="int32"),
                 "n_name": [f"N{i}" for i in range(25)],
                 "n_regionkey": (np.arange(25) % 5).astype("int32")})
    n_cust, n_supp, n_part = 200, 50, 300
    w("customer", {"c_custkey": np.arange(1, n_cust + 1, dtype="int64"),
                   "c_name": [f"C{i}" for i in range(n_cust)],
                   "c_nationkey": (np.arange(n_cust) % 25).astype("int32"),
                   "c_acctbal": _money(rng, n_cust),
                   "c_mktsegment": [["AUTO", "BLDG", "MACH"][i % 3]
                                    for i in range(n_cust)]})
    w("supplier", {"s_suppkey": np.arange(1, n_supp + 1, dtype="int64"),
                   "s_name": [f"S{i}" for i in range(n_supp)],
                   "s_nationkey": (np.arange(n_supp) % 25).astype("int32"),
                   "s_acctbal": _money(rng, n_supp)})
    w("part", {"p_partkey": np.arange(1, n_part + 1, dtype="int64"),
               "p_name": [f"P{i}" for i in range(n_part)],
               "p_brand": [f"B{i % 7}" for i in range(n_part)],
               "p_type": [f"T{i % 11}" for i in range(n_part)],
               "p_size": (np.arange(n_part) % 50 + 1).astype("int32"),
               "p_retailprice": _money(rng, n_part, 1.0, 2000.0)})

    # orders: bursty dates (many orders share a day), skewed customer
    n_ord = 5_000
    okey = np.arange(1, n_ord + 1, dtype="int64")
    cust = np.where(rng.random(n_ord) < 0.5, 7,
                    rng.integers(1, n_cust + 1, n_ord)).astype("int64")
    day0 = np.datetime64("2024-01-01", "us")
    odate = day0 + (rng.integers(0, 60, n_ord) * 86_400_000_000
                    ).astype("timedelta64[us]")
    w("orders", {"o_orderkey": okey, "o_custkey": cust,
                 "o_orderstatus": [["O", "F", "P"][i % 3]
                                   for i in range(n_ord)],
                 "o_totalprice": _money(rng, n_ord, 0.0, 50_000.0),
                 "o_orderdate": odate,
                 "o_orderpriority": [f"{1 + i % 5}-PRI"
                                     for i in range(n_ord)]})

    # lineitem: hot (supplier, part) pair; quantity/discount pinned to
    # the registry's own filter boundaries on many rows
    n_li = 20_000
    lok = rng.integers(1, n_ord + 1, n_li).astype("int64")
    hot = rng.random(n_li) < 0.5
    lpart = np.where(hot, 13, rng.integers(1, n_part + 1, n_li)).astype("int64")
    lsupp = np.where(hot, 3, rng.integers(1, n_supp + 1, n_li)).astype("int64")
    qty = rng.integers(1, 51, n_li).astype("float64")
    qty[rng.random(n_li) < 0.2] = 25.0            # q27's < 25 boundary
    disc = np.round(rng.uniform(0.0, 0.1, n_li), 2)
    disc[rng.random(n_li) < 0.2] = 0.04           # q27's > 0.04 boundary
    # v2: 1% NULL discounts/taxes — SUM/AVG null-skipping must agree
    disc_n = pa.array(np.where(rng.random(n_li) < 0.01, np.nan, disc))
    tax = np.round(rng.uniform(0, 0.08, n_li), 2)
    tax_n = pa.array(np.where(rng.random(n_li) < 0.01, np.nan, tax))
    import pyarrow.compute as pc
    disc_n = pc.if_else(pc.is_nan(disc_n), pa.scalar(None, pa.float64()), disc_n)
    tax_n = pc.if_else(pc.is_nan(tax_n), pa.scalar(None, pa.float64()), tax_n)
    w("lineitem", {"l_orderkey": lok, "l_partkey": lpart,
                   "l_suppkey": lsupp,
                   "l_linenumber": (np.arange(n_li) % 7 + 1).astype("int32"),
                   "l_quantity": qty,
                   "l_extendedprice": _money(rng, n_li, 1.0, 100_000.0),
                   "l_discount": disc_n,
                   "l_tax": tax_n,
                   "l_returnflag": [["A", "N", "R"][i % 3]
                                    for i in range(n_li)],
                   "l_linestatus": [["O", "F"][i % 2] for i in range(n_li)],
                   "l_shipdate": day0 + (rng.integers(0, 90, n_li)
                                         * 86_400_000_000
                                         ).astype("timedelta64[us]")})

    # events: user 1 owns half the stream; heavy exact-timestamp ties
    n_ev = 50_000
    eid = np.arange(1, n_ev + 1, dtype="int64")
    uid = np.where(rng.random(n_ev) < 0.5, 1,
                   rng.integers(2, 100, n_ev)).astype("int64")
    # 90 days, but 30% of rows land on one of 500 shared tick instants
    base_us = rng.integers(0, 90 * 86_400_000_000, n_ev)
    shared = rng.integers(0, 500, n_ev) * (86_400_000_000 // 10)
    tie = rng.random(n_ev) < 0.3
    ts_us = np.where(tie, shared, base_us)
    # v2: user 99's ENTIRE history collapses onto one instant — every
    # window/session/as-of tie path degenerates to a single peer group
    ts_us = np.where(uid == 99, 42 * 86_400_000_000, ts_us)
    ts = day0 + ts_us.astype("timedelta64[us]")
    # tick_order_key domain (functions/ordering.py): the zero-padded
    # (epoch_us ++ id) total-order key silently mis-orders pre-epoch
    # timestamps and ids ≥ 10^12 — assert the fixture stays in-domain
    # so every arg-by oracle comparison downstream is meaningful.
    # eid.min() >= 0, not > 0: the tick_order_key contract and the
    # tick_order_domain_violations guard accept 0 <= id < 10^12
    assert ts_us.min() >= 0 and 0 <= eid.min() and eid.max() < 10**12
    w("events", {"event_id": eid, "ts": ts, "user_id": uid,
                 "event_type": [["click", "view", "purchase", "error",
                                 "login"][i % 5] for i in range(n_ev)],
                 "value": _money(rng, n_ev, -100.0, 1000.0),
                 "props": ['{"k":1}'] * n_ev})

    # documents: degenerate shapes first, then normal Zipf filler
    texts = ["", "one", "two words", "three tiny words",
             "dup dup dup", "dup dup dup",
             "καλημέρα κόσμε unicode περιεχόμενο εδώ",
             " ".join(f"w{i % 97}" for i in range(50_000)),
             # v2: pathological repetition (one token 20k times — n-gram
             # tables collapse to a single key), embedded newlines/tabs
             # (sink roundtrip quoting), whitespace-only, emoji +
             # astral-plane codepoints (UTF-8 4-byte handling)
             " ".join(["same"] * 20_000),
             "line one\nline two\ttabbed \"quoted\" text",
             "   ",
             "🚀 emoji 🎉 and astral 𝕊𝕡𝕒𝕣𝕜 codepoints"]
    rngd = np.random.default_rng(7)
    for i in range(992):
        ln = int(rngd.integers(1, 40))
        texts.append(" ".join(
            f"w{int(np.clip(rngd.zipf(1.4), 1, 5000))}" for _ in range(ln)))
    n_doc = len(texts)
    w("documents", {"doc_id": np.arange(n_doc, dtype="int64"),
                    "text": texts,
                    "lang": [["en", "de", "el"][i % 3] for i in range(n_doc)],
                    "source": [["web", "code"][i % 2] for i in range(n_doc)],
                    "n_chars": np.array([len(t) for t in texts],
                                        dtype="int64")})

    # embeddings: zero vectors, exact duplicates, near-zero norms, one null
    n_vec, dim = 500, 64
    m = rngd.normal(0, 1, (n_vec, dim)).astype("float32")
    m[0] = 0.0                       # exact zero vector
    m[1] = m[2]                      # exact duplicate pair
    m[3] = m[4] * 1e-6               # near-zero norm
    # v2: huge magnitude (1e3 ≈ 1000x the N(0,1) corpus) — stresses the
    # dot/norm paths without breaking the ABSOLUTE-rounding compare
    # itself (at ≥1e4 a covariance reaches magnitudes where one
    # summation-order ulp exceeds the 1e-8 quantum on BOTH engines —
    # that calibration note is the methodology boundary, not a bug)
    m[6] = 1e3
    m[7] = -m[6]                     # v2: its antipode (cosine -1 edge)
    vecs = [None if i == 5 else m[i].tolist() for i in range(n_vec)]
    w("embeddings", {"vec_id": np.arange(n_vec, dtype="int64"),
                     "embedding": pa.array(vecs,
                                           type=s["embeddings"]
                                           .field("embedding").type),
                     "label": (np.arange(n_vec) % 10).astype("int32")})
    print(f"adversarial fixture written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
