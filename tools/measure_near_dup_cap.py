"""Near-duplicate density-cap study (round 12, session 2): dq15's
documented hazard is per-(key, window) density — the bucketed pair
join is quadratic in the densest cell. near_duplicate_pairs's
``max_per_cell`` bounds it; this measures both arms on a corpus with
ONE hostile hot cell riding on a benign background, at growing hot
densities. Interleaved A/B per density, minimums, noop sink.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_near_dup_cap.py [reps=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = 60_000_000  # µs window
BACKGROUND_USERS = 20_000  # 3 sparse events each
HOT_DENSITIES = (2_000, 8_000, 16_000)
CAP = 64


def main(reps: int = 2) -> None:
    from pyspark.sql import functions as F

    from security_master_spark.operators.intervals import (
        near_duplicate_pairs,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    bg = (
        spark.range(BACKGROUND_USERS * 3)
        .select(
            F.concat(F.lit("u"), (F.col("id") % BACKGROUND_USERS))
            .alias("user_id"),
            F.lit("view").alias("event_type"),
            F.col("id").alias("event_id"),
            # spread each user's 3 events over distinct windows
            (F.col("id") * 2 * W).alias("us"),
        )
    )

    def corpus(hot_m: int):
        hot = spark.range(hot_m).select(
            F.lit("hot").alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") + 10_000_000).alias("event_id"),
            # all inside ONE window: the dense cell
            (F.col("id") % (W // 100)).alias("us"),
        )
        return bg.unionByName(hot)

    best: dict[tuple[int, str], float] = {}
    for rep in range(reps):
        for m in HOT_DENSITIES:
            df = corpus(m)
            for label, cap in (("uncapped", None), (f"cap{CAP}", CAP)):
                t0 = time.perf_counter()
                near_duplicate_pairs(
                    df, ["user_id", "event_type"], "event_id", "us",
                    W, max_per_cell=cap,
                ).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                k = (m, label)
                if k not in best or dt < best[k]:
                    best[k] = dt
        print(f"pass {rep + 1}/{reps} done", flush=True)

    for m in HOT_DENSITIES:
        u = best[(m, "uncapped")]
        c = best[(m, f"cap{CAP}")]
        print(
            f"hot cell m={m:6d}: uncapped {u:7.2f} s   "
            f"cap={CAP} {c:6.2f} s   ({u / c:.1f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
