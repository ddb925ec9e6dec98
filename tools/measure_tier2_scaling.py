"""Second-tier bench scaling study (round 10): with every ≥1.5 s
bench query's exponent measured (PLANS.md rounds 8-9), extend the
"none superlinear in its own work unit" claim down to the 1.0-1.5 s
tier — the 11 queries in that band with no prior measurement.

Corpora (drop-in sf_dirs; the scaled table comes from the
tools/gen_stress.py corpora, everything else symlinks to sf0.1):
- /tmp/tier2_events  events 100k → 6M rows (60×):  a23, d37, d42, io12
- /tmp/tier2_docs    documents 5k → 50k docs (10× docs, ~38× tokens —
                     the l44 lesson: doc-count understates the work
                     unit for token-driven queries): l22, l42, l60,
                     l64, m5
- /tmp/iostress      orders+lineitem 8× key-space copies: d49, q24

Method identical to measure_io_scaling.py: one engine session
(get_spark, 16g heap), bench's noop sink, interleaved passes with
System.gc() between queries, MINIMUMS compared (host-contention
lesson). Exponent = log(T_big/T_1x) / log(ratio); 1.0 = linear.

NEEDS AN EXCLUSIVE BOX — do not run concurrently with driver sims.

Usage: python tools/measure_tier2_scaling.py [reps=3]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

#: corpus tag -> (sf_dir, scaled ratio, queries)
STUDIES = {
    "events60x": ("/tmp/tier2_events", 60.0, (
        "a23_rolling_distinct",
        "d37_ewma_exact_distributed",
        "d42_sortino_calmar",
        "io12_zorder_roundtrip",
    )),
    "docs10x": ("/tmp/tier2_docs", 10.0, (
        "l22_distinctive_terms",
        "l42_dedup_pipeline",
        "l60_simhash_dedup_retention",
        "l64_quality_threshold_sweep",
        "m5_image_decode_stats",
    )),
    "io8x": ("/tmp/iostress", 8.0, (
        "d49_fulfillment_sla",
        "q24_lateral_subquery",
    )),
}


def _mixed_dir(path: str, scaled: dict[str, str]) -> None:
    """Build a drop-in sf_dir: ``scaled`` tables symlink to their
    stress corpus file, the rest symlink to sf0.1."""
    os.makedirs(path, exist_ok=True)
    for tbl in TABLES:
        dst = f"{path}/{tbl}.parquet"
        if os.path.lexists(dst):
            continue
        os.symlink(scaled.get(tbl, f"{BASE}/{tbl}.parquet"), dst)


def _ensure_corpora() -> None:
    from tools import gen_stress

    if not os.path.exists("/tmp/stress_events/events.parquet"):
        gen_stress.gen_events()
    if not os.path.exists("/tmp/stress10x/documents.parquet"):
        gen_stress.gen_docs()
    if not os.path.exists("/tmp/iostress/orders.parquet"):
        gen_stress.gen_iostress()
    _mixed_dir("/tmp/tier2_events",
               {"events": "/tmp/stress_events/events.parquet"})
    _mixed_dir("/tmp/tier2_docs",
               {"documents": "/tmp/stress10x/documents.parquet"})


def main(reps: int = 3) -> None:
    _ensure_corpora()

    from security_master_spark.session import get_spark
    from security_master_spark.plans.registry import queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    pairs = [
        (name, tag, sf_dir, ratio)
        for tag, (sf_dir, ratio, names) in STUDIES.items()
        for name in names
    ]
    best: dict[tuple[str, str], float] = {}
    for rep in range(reps):
        for name, tag, sf_dir, _ratio in pairs:
            for arm, d in (("1x", BASE), ("big", sf_dir)):
                t0 = time.perf_counter()
                qs[name](spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                key = (name, arm)
                if key not in best or dt < best[key]:
                    best[key] = dt
                spark.sparkContext._jvm.System.gc()
        print(f"pass {rep + 1}/{reps} done", flush=True)

    print(f"\n{'query':34s} {'corpus':>9s} {'1x':>8s} {'big':>8s} "
          f"{'exponent':>9s}")
    for name, tag, _sf_dir, ratio in pairs:
        t1, tb = best[(name, "1x")], best[(name, "big")]
        exp = math.log(tb / t1) / math.log(ratio)
        print(f"{name:34s} {tag:>9s} {t1:8.2f} {tb:8.2f} {exp:9.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
