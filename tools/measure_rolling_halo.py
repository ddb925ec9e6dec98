"""Rolling-distinct halo study (round 10): the portable window form
(a23's spelling: one WindowExec task per partition KEY — 5 event
types = 5 tasks no matter the cluster) vs the halo-parallel bucketed
form (operators/rolling.py) at the 6M-tick stress corpus, and the
parallelism headroom behind it. Interleaved A/B/A/B in one session,
minimums (host-contention lesson), noop sink.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_rolling_halo.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/tier2_events"


def main(reps: int = 3) -> None:
    if not os.path.exists(f"{CORPUS}/events.parquet"):
        sys.exit("run tools/measure_tier2_scaling.py first (builds corpus)")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import (
        rolling_distinct_count,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    balanced = load_table(spark, CORPUS, "events").select(
        "event_type", "event_id", "ts", "user_id"
    )
    # the real 100 TB hazard: ONE dominant key → the portable form's
    # wall clock is one straggler task. ~96% of rows collapse to
    # 'view' (deterministic user_id rule, no rand()).
    skewed = balanced.withColumn(
        "event_type",
        F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )

    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-99, 0)
    )

    def portable(src):
        return src.select(
            "event_type",
            "event_id",
            F.size(F.collect_set("user_id").over(w))
            .cast("bigint")
            .alias("rolling_users"),
        )

    def halo(src):
        # distributed_rank=False EXPLICITLY: the default flipped to
        # True in round 10, which silently made this arm identical to
        # halo_dist_rank — this arm must measure the serial-rank
        # bucketed configuration (the negative result recorded in
        # PLANS.md: bucketing alone is a net LOSS both ways).
        return rolling_distinct_count(
            src, ["event_type"], ["ts", "event_id"], "user_id",
            frame_rows=100, out_col="rolling_users",
            distributed_rank=False,
        ).select("event_type", "event_id", "rolling_users")

    def halo_dist(src):
        return rolling_distinct_count(
            src, ["event_type"], ["ts", "event_id"], "user_id",
            frame_rows=100, out_col="rolling_users",
            distributed_rank=True,
        ).select("event_type", "event_id", "rolling_users")

    arms = {
        ("balanced", "portable_window"): lambda: portable(balanced),
        ("balanced", "halo_bucketed"): lambda: halo(balanced),
        ("balanced", "halo_dist_rank"): lambda: halo_dist(balanced),
        ("skew96pct", "portable_window"): lambda: portable(skewed),
        ("skew96pct", "halo_bucketed"): lambda: halo(skewed),
        ("skew96pct", "halo_dist_rank"): lambda: halo_dist(skewed),
    }
    best: dict[tuple[str, str], float] = {}
    for rep in range(reps):
        for key, build in arms.items():
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if key not in best or dt < best[key]:
                best[key] = dt
            spark.sparkContext._jvm.System.gc()
        print(f"pass {rep + 1}/{reps} done", flush=True)

    for corpus in ("balanced", "skew96pct"):
        tp = best[(corpus, "portable_window")]
        th = best[(corpus, "halo_bucketed")]
        td = best[(corpus, "halo_dist_rank")]
        print(f"{corpus:10s} portable {tp:7.2f} s  halo {th:7.2f} s "
              f"({tp / th:.2f}x)  dist_rank {td:7.2f} s ({tp / td:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
