"""Mid-skew arm for the spelling decision table (round-13 verdict
order #3; families completed per round-14 order #6): rounds 9-12
measured every toolkit member at 20% (balanced, 5 even keys) and 96%
(dominant) top-key share, and recommend_spelling's 0.5 threshold
merely BRACKETED the crossover. This tool measures the portable vs
distributed spellings at an intermediate dominant-key share
(default ~60%) for FIVE families — carry (trailing_interval_sum
distributed_prefix, whose second stage is asof_carry_bucketed), rank
(distributed_row_number), cumsum (distributed_cumsum), percentile
(distributed_percentile), and ffill (forward_fill_bucketed vs the
window form, the same pair as the balanced/dominant cells in
tools/measure_ffill.py) — same corpus and discipline as
measure_trailing_carry.py: 6M-tick stress events, interleaved
A/B/A/B in one session, per-arm minimums (host-contention lesson),
noop sink, cache_registry release between runs.

Skew construction (deterministic, no rand()): forcing event_type to
'view' when ``user_id % 8 < k`` yields top-key share k/8 + (1-k/8)*0.2
(the base corpus is uniform over 5 types): k=4 → 0.6, k=3 → 0.5,
k=5 → 0.7.

NEEDS AN EXCLUSIVE BOX.
Usage: python tools/measure_mid_skew.py [reps=3] [k=4] [families...]
       families default to "trailing rank"; pass any of
       trailing/rank/cumsum/percentile/ffill (the round-13 run
       measured trailing+rank; round 14 ran cumsum+percentile+ffill).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/stress_events"


_FAMILIES = ("trailing", "rank", "cumsum", "percentile", "ffill")


def main(
    reps: int = 3, k: int = 4, families: list[str] | None = None
) -> None:
    families = families or ["trailing", "rank"]
    unknown = [f for f in families if f not in _FAMILIES]
    if unknown:
        # validate BEFORE the timed loop: a typo'd family silently
        # dropping out of the arms would burn the exclusive-box run
        # and then KeyError in the summary (round-14 review finding)
        sys.exit(
            f"unknown families {unknown!r} — choose from {_FAMILIES}"
        )
    if not os.path.exists(f"{CORPUS}/events.parquet"):
        from tools.gen_stress import gen_events

        gen_events(CORPUS)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from security_master_spark.datasets import load_table
    from security_master_spark.operators.rolling import (
        distributed_cumsum,
        distributed_percentile,
        distributed_row_number,
    )
    from security_master_spark.operators.spelling import skew_probe
    from security_master_spark.operators.timeseries import (
        forward_fill,
        forward_fill_bucketed,
    )
    from security_master_spark.operators.trailing import (
        trailing_interval_sum,
    )
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # The ONE skew-rewrite definition every family's source goes
    # through (round-14 review: a second copy of the F.when rewrite
    # could drift from the probed share label)
    def _family_src(cols):
        src = load_table(spark, CORPUS, "events").select(*cols)
        return src.withColumn(
            "event_type",
            F.when(F.col("user_id") % 8 < k, F.lit("view")).otherwise(
                F.col("event_type")
            ),
        )

    mid = _family_src(
        [
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "user_id",
        ]
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

    # The cumsum/percentile/ffill arms mirror their ORIGINAL
    # balanced/dominant tools (measure_cumsum.py / measure_percentile.py
    # / measure_ffill.py) column-for-column — same double value column,
    # same order columns, same fraction list — so the mid cells are
    # comparable with the committed DECISION_TABLE endpoints. (A first
    # cut used the carry family's low-cardinality `cents` long: Spark's
    # Percentile count-map collapses on ~10k distinct values and the
    # aggregate measured 11x faster than its own dominant cell — an
    # artifact, not a regime.) Sources built once, outside the arms.
    cumsum_src = _family_src(
        ["event_type", "user_id", "event_id", F.col("value").alias("v")]
    )
    pct_src = _family_src(
        ["event_type", "user_id", F.col("value").alias("v")]
    )

    def run_cumsum(distributed: bool) -> None:
        src = cumsum_src
        if distributed:
            reg: list = []
            distributed_cumsum(
                src, ["event_type"], ["user_id", "event_id"],
                {"cum_v": "v"}, cache_registry=reg,
            ).write.mode("overwrite").format("noop").save()
            for p in reg:
                p.unpersist(blocking=True)
        else:
            w = (
                Window.partitionBy("event_type")
                .orderBy("user_id", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            src.withColumn("cum_v", F.sum("v").over(w)).write.mode(
                "overwrite"
            ).format("noop").save()

    PS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 1.0]

    def run_percentile(distributed: bool) -> None:
        src = pct_src
        if distributed:
            reg: list = []
            distributed_percentile(
                src, ["event_type"], "v", PS,
                out_cols=[f"q{i}" for i in range(len(PS))],
                cache_registry=reg,
            ).write.mode("overwrite").format("noop").save()
            for p in reg:
                p.unpersist(blocking=True)
        else:
            src.groupBy("event_type").agg(
                F.percentile(
                    "v", F.array(*[F.lit(p) for p in PS])
                ).alias("qs")
            ).write.mode("overwrite").format("noop").save()

    # ffill needs the family's shared contract (unique integer ts per
    # key + NULL gaps); built ONCE outside the timed region, same as
    # tools/measure_ffill.py — NULLs minted deterministically on
    # event_id % 5 (~20%, the base corpus's refund share; the skew
    # rewrite destroys the refund marker itself).
    _ffill_src = None

    def ffill_src():
        nonlocal _ffill_src
        if _ffill_src is None:
            path = f"/tmp/ffill_mid_k{k}"
            if not os.path.exists(f"{path}/_SUCCESS"):
                src = _family_src(
                    ["event_id", "event_type", "user_id", "ts", "value"]
                )
                rn = F.row_number().over(
                    Window.partitionBy("event_type").orderBy(
                        "ts", "event_id"
                    )
                )
                src.select(
                    "event_id",
                    "event_type",
                    rn.cast("long").alias("seq"),
                    F.when(F.col("event_id") % 5 == 0, F.lit(None))
                    .otherwise(F.col("value"))
                    .alias("v"),
                ).write.mode("overwrite").parquet(path)
            _ffill_src = spark.read.parquet(path)
        return _ffill_src

    def run_ffill(distributed: bool) -> None:
        src = ffill_src()
        if distributed:
            out = forward_fill_bucketed(
                src, ["event_type"], "seq", ["v"], bucket_width=65_536
            )
        else:
            out = forward_fill(src, ["event_type"], "seq", ["v"])
        out.write.mode("overwrite").format("noop").save()

    all_arms = {
        ("trailing", "default"): lambda: run_trailing(False),
        ("trailing", "distributed"): lambda: run_trailing(True),
        ("rank", "window"): lambda: run_rank(False),
        ("rank", "distributed"): lambda: run_rank(True),
        ("cumsum", "window"): lambda: run_cumsum(False),
        ("cumsum", "distributed"): lambda: run_cumsum(True),
        ("percentile", "aggregate"): lambda: run_percentile(False),
        ("percentile", "distributed"): lambda: run_percentile(True),
        ("ffill", "window"): lambda: run_ffill(False),
        ("ffill", "distributed"): lambda: run_ffill(True),
    }
    arms = {kk: fn for kk, fn in all_arms.items() if kk[0] in families}
    if "ffill" in families:
        ffill_src()  # materialize outside the timed region
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
    portable_of = {
        "trailing": "default",
        "rank": "window",
        "cumsum": "window",
        "percentile": "aggregate",
        "ffill": "window",
    }
    for fam in families:
        d = best[(fam, portable_of[fam])]
        x = best[(fam, "distributed")]
        print(f"{'':12s}{fam:10s} {d:9.2f} {x:9.2f} {d / x:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 3,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
        sys.argv[3:] or None,
    )
