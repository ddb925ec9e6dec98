"""distributed_cumsum isolation study (round 12): the window form —
``SUM(v) OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
PRECEDING)`` — vs operators/rolling.py:distributed_cumsum at the
6M-tick stress corpus, balanced keys and 96%-one-key skew.

The round-12 decision table (PLANS.md) carried "n/m" for the
distributed arm's balanced cell: the trailing study wrapped the
cumsum inside the w11 prefix path, so its standalone overhead on
balanced keys was inferred, never measured. This closes that cell
with the house methodology: interleaved A/B/A/B, minimums, noop
sink; the distributed arm unpersists via cache_registry between
runs.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_cumsum.py [reps=3]
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import distributed_cumsum
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # (event_type, user_id, event_id) totally orders each key group — the
    # distributed form's order contract; the window form uses the
    # identical ORDER BY so both arms do the same logical work.
    balanced = load_table(spark, CORPUS, "events").select(
        "event_type", "user_id", "event_id", F.col("value").alias("v")
    )
    skewed = balanced.withColumn(
        "event_type",
        F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )

    def window_form(src) -> None:
        w = (
            Window.partitionBy("event_type")
            .orderBy("user_id", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        src.withColumn("cum_v", F.sum("v").over(w)).write.mode(
            "overwrite"
        ).format("noop").save()

    def dist_form(src) -> None:
        reg: list = []
        distributed_cumsum(
            src,
            ["event_type"],
            ["user_id", "event_id"],
            {"cum_v": "v"},
            cache_registry=reg,
        ).write.mode("overwrite").format("noop").save()
        for p in reg:
            p.unpersist(blocking=True)

    arms = {
        ("balanced", "window"): lambda: window_form(balanced),
        ("balanced", "distributed"): lambda: dist_form(balanced),
        ("skew96pct", "window"): lambda: window_form(skewed),
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

    print(f"\n{'corpus':10s} {'window':>10s} {'distrib':>9s} {'speedup':>8s}")
    for corpus in ("balanced", "skew96pct"):
        w = best[(corpus, "window")]
        d = best[(corpus, "distributed")]
        print(f"{corpus:10s} {w:10.2f} {d:9.2f} {w / d:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
