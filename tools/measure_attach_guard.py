"""Attach-family broadcast-guard cost (round 12, session 2): the
fused count-window + join-key raise_error guard added to
``_nullsafe_attach`` (rank offsets/totals, cumsum offsets) — default
``max_broadcast_rows`` vs ``None`` — at the 6M-tick stress corpus,
balanced keys and 96%-one-key skew.

The carry's guard-cost study (PLANS.md) established the fused shape
is statistically free for ONE attach; the rank family fuses it into
up to TWO attaches per call (offsets + totals), so this measures the
worst consumer: distributed_row_number with counts_col set, and
distributed_cumsum. Interleaved A/B/A/B, minimums, noop sink;
persists released via cache_registry between runs.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_attach_guard.py [reps=3]
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
    from security_master_spark.operators.rolling import (
        distributed_cumsum,
        distributed_row_number,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    balanced = load_table(spark, CORPUS, "events").select(
        "event_type", "user_id", "event_id", F.col("value").alias("v")
    )
    skewed = balanced.withColumn(
        "event_type",
        F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
            F.col("event_type")
        ),
    )

    def rn(src, bound):
        caches: list = []
        out = distributed_row_number(
            src, ["event_type"], ["user_id", "event_id"],
            counts_col="n_key", cache_registry=caches,
            max_broadcast_rows=bound,
        )
        return out, caches

    def cs(src, bound):
        caches: list = []
        out = distributed_cumsum(
            src, ["event_type"], ["user_id", "event_id"], {"cv": "v"},
            cache_registry=caches, max_broadcast_rows=bound,
        )
        return out, caches

    arms = {}
    for corpus_name, src in (("balanced", balanced), ("skew96pct", skewed)):
        for op_name, build in (("rownum", rn), ("cumsum", cs)):
            for guard_name, bound in (("guarded", 2_000_000), ("off", None)):
                arms[(corpus_name, op_name, guard_name)] = (
                    lambda b=build, s=src, m=bound: b(s, m)
                )

    best: dict[tuple[str, str, str], float] = {}
    for rep in range(reps):
        for key, make in arms.items():
            t0 = time.perf_counter()
            out, caches = make()
            out.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            for f in caches:
                f.unpersist()
            if key not in best or dt < best[key]:
                best[key] = dt
        print(f"pass {rep + 1}/{reps} done", flush=True)

    for corpus_name in ("balanced", "skew96pct"):
        for op_name in ("rownum", "cumsum"):
            g = best[(corpus_name, op_name, "guarded")]
            o = best[(corpus_name, op_name, "off")]
            print(
                f"{corpus_name:10s} {op_name:6s} guarded {g:6.2f} s  "
                f"off {o:6.2f} s  (delta {g - o:+.2f} s)"
            )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
