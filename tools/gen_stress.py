"""Deterministic stress-corpus generators behind the PLANS.md scale
measurements. /tmp is wiped between build rounds; re-run this to
regenerate the exact corpora (fixed seeds).

    python tools/gen_stress.py all          # or: docs | events | emb

Corpora:
- docs   -> /tmp/stress10x/documents.parquet   (50k docs / 10M Zipf tokens,
             122k types, 51k singletons — 10x sf0.1, realistic tail)
- events -> /tmp/stress_events/events.parquet  (6M ticks / 90 days / 5 types)
- emb    -> /tmp/stress_emb/embeddings.parquet (100k x 64, 10 Gaussian
             clusters — the ANN recall/runtime corpus)
- graph  -> /tmp/gstress/{lineitem,orders}  (8 disjoint key-space
             copies of the sf0.1 trade graph — the g1/g2 scaling corpus)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd


def gen_docs(path="/tmp/stress10x"):
    rng = np.random.default_rng(7)
    n_docs, vocab = 50_000, 200_000
    lens = rng.integers(80, 320, size=n_docs)
    tok_ids = np.clip(rng.zipf(1.3, size=int(lens.sum())), 1, vocab)
    toks = np.char.add("w", tok_ids.astype(str))
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype="int64"),
            "text": texts,
            "lang": rng.choice(["en", "de", "fr"], n_docs),
            "source": rng.choice(["web", "code", "wiki", "news"], n_docs),
        }
    )
    df["n_chars"] = df.text.str.len().astype("int64")
    os.makedirs(path, exist_ok=True)
    df.to_parquet(f"{path}/documents.parquet")
    print(f"docs -> {path} ({len(df)} rows, {int(lens.sum())} tokens)")


def gen_events(path="/tmp/stress_events"):
    rng = np.random.default_rng(3)
    n = 6_000_000
    base = np.datetime64("2024-01-01T00:00:00")
    ts = base + np.sort(rng.integers(0, 90 * 24 * 3600, n)).astype(
        "timedelta64[s]"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(1, 5000, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "refund", "search"], n
            ),
            "value": np.abs(rng.normal(100, 20, n)),
            "props": pd.Series(
                ['{"k": %d}' % k for k in rng.integers(0, 100, n)]
            ),
        }
    )
    os.makedirs(path, exist_ok=True)
    df.to_parquet(f"{path}/events.parquet", row_group_size=500_000)
    print(f"events -> {path} ({n} rows)")


def gen_emb(path="/tmp/stress_emb"):
    rng = np.random.default_rng(11)
    n, d, labels_n = 100_000, 64, 10
    centers = rng.normal(0, 1, (labels_n, d)).astype("float32")
    labels = rng.integers(0, labels_n, n)
    vecs = (centers[labels] + rng.normal(0, 0.6, (n, d))).astype("float32")
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": list(vecs),
            "label": labels.astype("int32"),
        }
    )
    os.makedirs(path, exist_ok=True)
    df.to_parquet(f"{path}/embeddings.parquet")
    print(f"emb -> {path} ({n} x {d})")


def gen_graph(path="/tmp/gstress", sf_dir="/root/testdata/sf0.1", copies=8):
    """8 disjoint copies of the sf0.1 trade graph (all key spaces
    offset per copy, so nodes/edges/triangles scale by `copies`) —
    the corpus behind the PLANS.md graph scaling study."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import pyarrow as pa

    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey", "l_suppkey"])
    od = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey"])
    li_parts, od_parts = [], []
    for i in range(copies):
        off = i * 10_000_000
        li_parts.append(pa.table({
            "l_orderkey": pc.add(li["l_orderkey"], off),
            "l_partkey": pc.add(li["l_partkey"], off),
            "l_suppkey": pc.add(li["l_suppkey"], off),
        }))
        od_parts.append(pa.table({
            "o_orderkey": pc.add(od["o_orderkey"], off),
            "o_custkey": pc.add(od["o_custkey"], off),
        }))
    os.makedirs(f"{path}/lineitem", exist_ok=True)
    os.makedirs(f"{path}/orders", exist_ok=True)
    pq.write_table(pa.concat_tables(li_parts), f"{path}/lineitem/part.parquet",
                   row_group_size=500_000)
    pq.write_table(pa.concat_tables(od_parts), f"{path}/orders/part.parquet",
                   row_group_size=500_000)
    print(f"graph -> {path} ({copies}x sf0.1 key-space copies)")


def gen_iostress(path="/tmp/iostress", sf_dir="/root/testdata/sf0.1",
                 copies=8):
    """8 disjoint key-space copies of sf0.1 orders + lineitem (the
    same offset trick as gen_graph), every other table symlinked from
    sf0.1 — a drop-in sf_dir for the io/merge/snapshot family scaling
    study (io6/io8/io15/io21 scale on orders/lineitem only)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for tbl, keycols in (
        ("orders", ["o_orderkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ):
        t = pq.read_table(f"{sf_dir}/{tbl}.parquet")
        parts = []
        for i in range(copies):
            off = i * 10_000_000
            cols = {
                c: (pc.add(t[c], off) if c in keycols else t[c])
                for c in t.column_names
            }
            parts.append(pa.table(cols, schema=t.schema))
        pq.write_table(
            pa.concat_tables(parts),
            f"{path}/{tbl}.parquet",
            row_group_size=500_000,
        )
    for tbl in ("region nation customer supplier part events documents "
                "embeddings").split():
        dst = f"{path}/{tbl}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sf_dir}/{tbl}.parquet", dst)
    print(f"iostress -> {path} ({copies}x sf0.1 orders/lineitem)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("docs", "all"):
        gen_docs()
    if which in ("events", "all"):
        gen_events()
    if which in ("emb", "all"):
        gen_emb()
    if which in ("graph", "all"):
        gen_graph()
    if which in ("iostress", "all"):
        gen_iostress()
