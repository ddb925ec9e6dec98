"""io/merge/snapshot family scaling study (round-8 verdict order #4):
the only ≥1.5 s bench family without a measured exponent. Times
io6/io8/io15/io21 at sf0.1 and at the 8× corpus
(tools/gen_stress.py iostress → /tmp/iostress: 8 disjoint key-space
copies of orders+lineitem, everything else symlinked), interleaved
A/B/A/B within one session with minimums taken (host contention
lesson, PLANS.md) and the bench's noop-sink action.

Exponent = log(T_8x / T_1x) / log(8); 1.0 = linear.

NEEDS AN EXCLUSIVE BOX — do not run concurrently with driver sims.

Usage: python tools/measure_io_scaling.py [reps=3]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "io6_merge_upsert",
    "io8_snapshot_diff",
    "io15_incremental_aggregate",
    "io21_nested_json_roundtrip",
)
BASE = "/root/testdata/sf0.1"
BIG = "/tmp/iostress"
COPIES = 8


def main(reps: int = 3) -> None:
    if not os.path.exists(f"{BIG}/orders.parquet"):
        from tools.gen_stress import gen_iostress

        gen_iostress(BIG, BASE, COPIES)

    from security_master_spark.session import get_spark

    spark = get_spark()  # engine defaults incl. 16g driver heap
    from security_master_spark.plans.registry import queries

    qs = queries()
    best: dict[tuple[str, str], float] = {}
    for rep in range(reps):
        for name in QUERIES:
            for tag, sf_dir in (("1x", BASE), ("8x", BIG)):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                key = (name, tag)
                if key not in best or dt < best[key]:
                    best[key] = dt
                spark.sparkContext._jvm.System.gc()
        print(f"pass {rep + 1}/{reps} done", flush=True)

    print(f"\n{'query':32s} {'1x':>8s} {'8x':>8s} {'exponent':>9s}")
    for name in QUERIES:
        t1, t8 = best[(name, "1x")], best[(name, "8x")]
        exp = math.log(t8 / t1) / math.log(COPIES)
        print(f"{name:32s} {t1:8.2f} {t8:8.2f} {exp:9.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
