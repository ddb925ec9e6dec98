"""Forward-fill three-spelling study (round 11): the portable window
form (one ordered task per key) vs the segmented scan
(operators/scan.py — mapInPandas + driver fold) vs the bucketed carry
(operators/timeseries.py:forward_fill_bucketed — JVM-side, parallel
in (key, bucket)) at the 6M-tick stress corpus, balanced keys and
96%-one-key skew. NULLs minted on 'refund' rows (~20%). ts = epoch
µs (unique per key in this corpus by (ts, event_id) rank — built
once, outside the timed region). Interleaved A/B/A/B, minimums,
noop sink.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_ffill.py [reps=3]
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
    from security_master_spark.operators.scan import (
        forward_fill_distributed,
    )
    from security_master_spark.operators.timeseries import (
        forward_fill,
        forward_fill_bucketed,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(skew: bool) -> "DataFrame":
        ev = load_table(spark, CORPUS, "events")
        if skew:
            ev = ev.withColumn(
                "event_type",
                F.when(F.col("user_id") % 25 != 0, F.lit("view")).otherwise(
                    F.col("event_type")
                ),
            )
        # unique integer ts per key (the shared ffill contract),
        # materialized to parquet so ranking cost is OUTSIDE the arms
        rn = F.row_number().over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        )
        out = ev.select(
            "event_id",
            "event_type",
            rn.alias("seq").cast("long").alias("seq"),
            F.when(F.col("event_type") == "refund", F.lit(None))
            .otherwise(F.col("value"))
            .alias("v"),
        )
        path = f"/tmp/ffill_corpus_{'skew' if skew else 'bal'}"
        if not os.path.exists(f"{path}/_SUCCESS"):
            out.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    balanced, skewed = corpus(False), corpus(True)

    def window_form(src) -> None:
        forward_fill(src, ["event_type"], "seq", ["v"]).write.mode(
            "overwrite"
        ).format("noop").save()

    def segscan_form(src) -> None:
        forward_fill_distributed(
            src, ["event_type"], ["seq"], "v", num_partitions=32
        ).write.mode("overwrite").format("noop").save()

    def bucketed_form(src) -> None:
        forward_fill_bucketed(
            src, ["event_type"], "seq", ["v"], bucket_width=65_536
        ).write.mode("overwrite").format("noop").save()

    arms = {
        ("balanced", "window"): lambda: window_form(balanced),
        ("balanced", "segscan"): lambda: segscan_form(balanced),
        ("balanced", "bucketed"): lambda: bucketed_form(balanced),
        ("skew96pct", "window"): lambda: window_form(skewed),
        ("skew96pct", "segscan"): lambda: segscan_form(skewed),
        ("skew96pct", "bucketed"): lambda: bucketed_form(skewed),
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

    print(f"\n{'corpus':10s} {'window':>8s} {'segscan':>8s} {'bucketed':>9s}")
    for corpus_tag in ("balanced", "skew96pct"):
        w = best[(corpus_tag, "window")]
        s = best[(corpus_tag, "segscan")]
        b = best[(corpus_tag, "bucketed")]
        print(
            f"{corpus_tag:10s} {w:8.2f} {s:8.2f} {b:9.2f}"
            f"   (bucketed vs window: {w / b:.2f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
