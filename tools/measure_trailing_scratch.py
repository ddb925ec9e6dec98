"""w11 cum-frame double-compute closure (round-8 verdict order #3):
time the trailing-24h prefix-diff operator at the 6M-tick stress
corpus (tools/gen_stress.py events → /tmp/stress_events) in its two
forms — default (cum window evaluated in both subtrees) vs
scratch-materialized (operators/trailing.py scratch_path) — plus the
same pair at sf0.1 to check the small-scale overhead. Interleaved
A/B/A/B, minimums, noop sink (bench methodology).

NEEDS AN EXCLUSIVE BOX.

Usage: python tools/measure_trailing_scratch.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPORA = (("sf0.1", "/root/testdata/sf0.1"),
           ("6M", "/tmp/stress_events"))


def main(reps: int = 3) -> None:
    if not os.path.exists("/tmp/stress_events/events.parquet"):
        from tools.gen_stress import gen_events

        gen_events("/tmp/stress_events")

    from pyspark.sql import functions as F

    from security_master_spark.session import get_spark

    spark = get_spark()  # engine defaults incl. 16g driver heap
    from security_master_spark.datasets import load_table
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )

    def run(sf_dir: str, scratch: str | None) -> None:
        events = load_table(spark, sf_dir, "events")
        e = events.select(
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        trailing_interval_sum(
            e, ["event_type"], "us", 86_400_000_000, F.col("cents"),
            "event_id", scratch_path=scratch,
        ).write.mode("overwrite").format("noop").save()

    best: dict[tuple[str, str], float] = {}
    for rep in range(reps):
        for tag, sf_dir in CORPORA:
            for variant in ("default", "scratch"):
                scratch = (
                    f"/tmp/sms_io/run{os.getpid()}/{tag}/trail_cum"
                    if variant == "scratch" else None
                )
                t0 = time.perf_counter()
                run(sf_dir, scratch)
                dt = time.perf_counter() - t0
                key = (tag, variant)
                if key not in best or dt < best[key]:
                    best[key] = dt
                spark.sparkContext._jvm.System.gc()
        print(f"pass {rep + 1}/{reps} done", flush=True)

    print(f"\n{'corpus':8s} {'default':>9s} {'scratch':>9s} {'ratio':>7s}")
    for tag, _ in CORPORA:
        d, s = best[(tag, "default")], best[(tag, "scratch")]
        print(f"{tag:8s} {d:9.2f} {s:9.2f} {d / s:7.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
