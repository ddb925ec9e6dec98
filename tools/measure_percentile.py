"""distributed_percentile study (round 11): Spark's ``percentile``
aggregate (per-key value buffer on one reduce task per key) vs
operators/rolling.py:distributed_percentile (distributed rank +
broadcast rank-equi anchor extraction) at the 6M-tick stress corpus,
balanced keys and 96%-one-key skew, 7 fractions. Interleaved
A/B/A/B, minimums, noop sink; the distributed arm unpersists via
cache_registry between runs.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_percentile.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/stress_events"
PS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 1.0]


def main(reps: int = 3) -> None:
    if not os.path.exists(f"{CORPUS}/events.parquet"):
        from tools.gen_stress import gen_events

        gen_events(CORPUS)

    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import (
        distributed_percentile,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    balanced = load_table(spark, CORPUS, "events").select(
        "event_type", "user_id", F.col("value").alias("v")
    )
    skewed = balanced.withColumn(
        "event_type",
        F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )

    def agg_form(src) -> None:
        src.groupBy("event_type").agg(
            F.percentile("v", F.array(*[F.lit(p) for p in PS])).alias("qs")
        ).write.mode("overwrite").format("noop").save()

    def dist_form(src) -> None:
        reg: list = []
        distributed_percentile(
            src, ["event_type"], "v", PS,
            out_cols=[f"q{i}" for i in range(len(PS))],
            cache_registry=reg,
        ).write.mode("overwrite").format("noop").save()
        for p in reg:
            p.unpersist(blocking=True)

    arms = {
        ("balanced", "aggregate"): lambda: agg_form(balanced),
        ("balanced", "distributed"): lambda: dist_form(balanced),
        ("skew96pct", "aggregate"): lambda: agg_form(skewed),
        ("skew96pct", "distributed"): lambda: dist_form(skewed),
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

    print(f"\n{'corpus':10s} {'aggregate':>10s} {'distrib':>9s} {'speedup':>8s}")
    for corpus in ("balanced", "skew96pct"):
        a = best[(corpus, "aggregate")]
        d = best[(corpus, "distributed")]
        print(f"{corpus:10s} {a:10.2f} {d:9.2f} {a / d:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
