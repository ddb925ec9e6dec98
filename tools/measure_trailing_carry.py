"""Trailing-interval distributed-path study (round 11): default
(per-key serial windows) vs distributed_prefix=True — which since
round 11 parallelizes BOTH skew stages (distributed_cumsum prefix +
asof_carry_bucketed boundary carry; the round-10 form kept a serial
per-key carry and measured 1.34x one-key / 0.84x balanced) — at the
6M-tick stress corpus, on balanced keys AND a 96%-one-key corpus.
Interleaved A/B/A/B in one session, minimums (host-contention
lesson), noop sink. The distributed arm releases its load-bearing
persist between runs via cache_registry so repeated passes don't
accumulate cached blocks.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_trailing_carry.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/stress_events"


def main(reps: int = 3) -> None:
    if not os.path.exists(f"{CORPUS}/events.parquet"):
        from tools.gen_stress import gen_events

        gen_events(CORPUS)

    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    balanced = load_table(spark, CORPUS, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "user_id",
    )
    # same skew rule as measure_rolling_halo: ~96% of rows collapse
    # onto one key (deterministic, no rand())
    skewed = balanced.withColumn(
        "event_type",
        F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )

    def run(src, distributed: bool) -> None:
        reg: list = []
        trailing_interval_sum(
            src,
            ["event_type"],
            "us",
            86_400_000_000,
            F.col("cents"),
            "event_id",
            distributed_prefix=distributed,
            cache_registry=reg,
        ).write.mode("overwrite").format("noop").save()
        for p in reg:
            p.unpersist(blocking=True)

    arms = {
        ("balanced", "default"): lambda: run(balanced, False),
        ("balanced", "distributed"): lambda: run(balanced, True),
        ("skew96pct", "default"): lambda: run(skewed, False),
        ("skew96pct", "distributed"): lambda: run(skewed, True),
    }
    best: dict[tuple[str, str], float] = {}
    for rep in range(reps):
        for key, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if key not in best or dt < best[key]:
                best[key] = dt
            spark.sparkContext._jvm.System.gc()
        print(f"pass {rep + 1}/{reps} done", flush=True)

    print(f"\n{'corpus':10s} {'default':>9s} {'distrib':>9s} {'speedup':>8s}")
    for corpus in ("balanced", "skew96pct"):
        d = best[(corpus, "default")]
        x = best[(corpus, "distributed")]
        print(f"{corpus:10s} {d:9.2f} {x:9.2f} {d / x:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
