"""Mid-skew arm for the spelling decision table (round-13 verdict
order #3): rounds 9-12 measured every toolkit member at 20% (balanced,
5 even keys) and 96% (dominant) top-key share, and
recommend_spelling's 0.5 threshold merely BRACKETED the crossover.
This tool measures the carry family (trailing_interval_sum
distributed_prefix — the asof_carry_bucketed path is its second
stage) and the rank family (distributed_row_number) at an
intermediate dominant-key share (default ~60%), same corpus and
discipline as measure_trailing_carry.py: 6M-tick stress events,
interleaved A/B/A/B in one session, per-arm minimums
(host-contention lesson), noop sink, cache_registry release between
runs.

Skew construction (deterministic, no rand()): forcing event_type to
'view' when ``user_id % 8 < k`` yields top-key share k/8 + (1-k/8)*0.2
(the base corpus is uniform over 5 types): k=4 → 0.6, k=3 → 0.5,
k=5 → 0.7.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_mid_skew.py [reps=3] [k=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/stress_events"


def main(reps: int = 3, k: int = 4) -> None:
    if not os.path.exists(f"{CORPUS}/events.parquet"):
        from tools.gen_stress import gen_events

        gen_events(CORPUS)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import (
        distributed_row_number,
    )
    from security_master_spark.operators.spelling import skew_probe
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, CORPUS, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "user_id",
    )
    mid = base.withColumn(
        "event_type",
        F.when(F.col("user_id") % 8 < k, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )
    stats = skew_probe(mid, ["event_type"])
    print(
        f"corpus: {stats.n_rows} rows, {stats.n_keys} keys, "
        f"top share {stats.top_share:.3f} ({stats.top_key})",
        flush=True,
    )

    def run_trailing(distributed: bool) -> None:
        reg: list = []
        trailing_interval_sum(
            mid,
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

    def run_rank(distributed: bool) -> None:
        if distributed:
            reg: list = []
            out = distributed_row_number(
                mid, ["event_type"], ["us", "event_id"],
                cache_registry=reg,
            )
            out.write.mode("overwrite").format("noop").save()
            for p in reg:
                p.unpersist(blocking=True)
        else:
            w = Window.partitionBy("event_type").orderBy(
                "us", "event_id"
            )
            mid.withColumn(
                "row_num", F.row_number().over(w)
            ).write.mode("overwrite").format("noop").save()

    arms = {
        ("trailing", "default"): lambda: run_trailing(False),
        ("trailing", "distributed"): lambda: run_trailing(True),
        ("rank", "window"): lambda: run_rank(False),
        ("rank", "distributed"): lambda: run_rank(True),
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

    print(
        f"\nshare~{stats.top_share:.2f} "
        f"{'family':10s} {'portable':>9s} {'distrib':>9s} {'speedup':>8s}"
    )
    for fam, portable_name in (("trailing", "default"), ("rank", "window")):
        d = best[(fam, portable_name)]
        x = best[(fam, "distributed")]
        print(f"{'':12s}{fam:10s} {d:9.2f} {x:9.2f} {d / x:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 3,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
    )
