"""d39_var_es plan study (round-10 verdict order #4): the registered
window-rank form (``row_number()/count() OVER (PARTITION BY
segment)`` — one sort task per segment) vs the distributed form
(operators/rolling.py:distributed_row_number with ride-along
counts_col — shipped as the unregistered d39_var_es_distributed
sibling), at sf0.1 and at a 10x row-replicated segment-skew corpus
built in-session (one segment owns ~96% of rows — the straggler
regime the distributed form exists for). Measured round 11: 0.49x at
sf0.1 / 1.39x at 10x-skew — the recorded reason the registered plan
stays the window form (PLANS.md round-11 d39 study). Interleaved
A/B/A/B, minimums, noop sink. The distributed arm releases its
persist between runs.

NEEDS AN EXCLUSIVE BOX.  Usage: python tools/measure_d39_rank.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 3) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.functions.rounding import dround
    from security_master_spark.operators.rolling import (
        distributed_row_number,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    px_base = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").cast("double").alias("price"),
            "o_orderkey",
        )
    )
    # 10x replicated + skewed variant: offsets keep o_orderkey unique
    # (total-order contract); ~96% of rows collapse onto one segment
    rep10 = px_base.crossJoin(
        spark.range(10).select(F.col("id").alias("_copy"))
    ).select(
        F.when(
            (F.col("o_orderkey") + F.col("_copy")) % 25 != 0,
            F.lit("DOMINANT"),
        )
        .otherwise(F.col("segment"))
        .alias("segment"),
        "price",
        (F.col("o_orderkey") * 10 + F.col("_copy")).alias("o_orderkey"),
    )

    def tail_agg(px):
        in_tail = F.col("rn") <= F.ceil(0.05 * F.col("n")).cast("bigint")
        return px.groupBy("segment").agg(
            F.max("n").cast("bigint").alias("n_orders"),
            dround(F.percentile("price", 0.95), 4).alias("var95"),
            dround(F.avg(F.when(in_tail, F.col("price"))), 4).alias("es95"),
            F.count(F.when(in_tail, 1)).cast("bigint").alias("n_tail"),
        )

    def window_form(src) -> None:
        w = Window.partitionBy("segment").orderBy(
            F.col("price").desc(), F.col("o_orderkey")
        )
        wn = Window.partitionBy("segment")
        px = src.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count("*").over(wn)
        )
        tail_agg(px).write.mode("overwrite").format("noop").save()

    def dist_form(src) -> None:
        # mirrors plans/domain8.py:d39_var_es_distributed — rank +
        # counts via distributed_row_number, percentile anchors pulled
        # from the SAME descending rank (no per-key value buffer)
        reg: list = []
        px = distributed_row_number(
            src,
            ["segment"],
            [F.col("price").desc(), "o_orderkey"],
            out_col="rn",
            counts_col="n",
            cache_registry=reg,
        )
        in_tail = F.col("rn") <= F.ceil(0.05 * F.col("n")).cast("bigint")
        pos = F.lit(0.95) * (F.col("n") - 1).cast("double")
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        agg = px.groupBy("segment").agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.max(
                F.when(F.col("rn") == F.col("n") - lo, F.col("price"))
            ).alias("_vlo"),
            F.max(
                F.when(F.col("rn") == F.col("n") - hi, F.col("price"))
            ).alias("_vhi"),
            F.max(pos).alias("_pos"),
            F.max(lo).alias("_lo"),
            F.max(hi).alias("_hi"),
            dround(F.avg(F.when(in_tail, F.col("price"))), 4).alias("es95"),
            F.count(F.when(in_tail, 1)).cast("bigint").alias("n_tail"),
        )
        var_raw = F.when(
            F.col("_lo") == F.col("_hi"), F.col("_vlo")
        ).otherwise(
            (F.col("_hi").cast("double") - F.col("_pos")) * F.col("_vlo")
            + (F.col("_pos") - F.col("_lo").cast("double")) * F.col("_vhi")
        )
        agg.select(
            "segment",
            "n_orders",
            dround(var_raw, 4).alias("var95"),
            "es95",
            "n_tail",
        ).write.mode("overwrite").format("noop").save()
        for p in reg:
            p.unpersist(blocking=True)

    arms = {
        ("sf0.1", "window"): lambda: window_form(px_base),
        ("sf0.1", "distributed"): lambda: dist_form(px_base),
        ("10x_skew", "window"): lambda: window_form(rep10),
        ("10x_skew", "distributed"): lambda: dist_form(rep10),
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

    print(f"\n{'corpus':9s} {'window':>9s} {'distrib':>9s} {'speedup':>8s}")
    for corpus in ("sf0.1", "10x_skew"):
        w = best[(corpus, "window")]
        d = best[(corpus, "distributed")]
        print(f"{corpus:9s} {w:9.2f} {d:9.2f} {w / d:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
