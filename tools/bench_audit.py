"""Fresh-session bench audit (round-4 order #3, round-5 order #3).

Question: are the battery-bench inflations real plan costs or
battery/JVM artifacts? The full bench runs ~250 codegen-heavy plans in
ONE JVM; accumulated generated classes, broadcast remnants, and host
contention were suspected (but never proven) to inflate late or
GC-adjacent queries — g2_triangle_count jumped 6.99→12.13 s between
rounds 4 and 5 with zero code changes.

Method: each FAMILY of suspect queries gets its own fresh JVM
(subprocess), warmed up exactly like bench.py (one count + one
mapInPandas pass), then N interleaved passes per query with the noop
sink and System.gc() between queries — identical methodology to
bench.py minus the 250-query battery around it. Minimums are compared
against the battery numbers; a large fresh-vs-battery gap on unchanged
code = battery artifact, a matching number = real plan cost.

Usage:
    python tools/bench_audit.py                 # parent: all families
    python tools/bench_audit.py --child g2 g3   # one fresh-JVM family
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

#: suspect families, each run in its own fresh JVM. Prefixes resolve
#: against the registry (g2 -> g2_triangle_count).
FAMILIES: list[list[str]] = [
    ["g2", "g3"],          # graph: the 1.73x unexplained jump
    ["a26"],               # count-min: 1.55x on unchanged code
    ["io11"],              # python datasource: 1.5x
    ["d23"],               # macd: 2.4x vs its r3 time
    ["a8"],                # approx count distinct (r4 flag)
    ["d21", "d22"],        # vwap / bollinger (r4 flags)
    ["l8"],                # simhash: md5-plane rewrite cost check (r6)
]

PASSES = 3


def _child(prefixes: list[str]) -> None:
    from security_master_spark.plans import registry
    from security_master_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sms-bench-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in sorted(qs) if any(n.startswith(p + "_") for p in prefixes)]
    # warm-up identical to bench.py
    qs["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(0, 1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for _ in range(PASSES):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            el = round(time.perf_counter() - t0, 4)
            if name not in timings or el < timings[name]:
                timings[name] = el
            spark._jvm.System.gc()
    print("AUDIT_RESULT " + json.dumps(timings), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2:])
        return
    battery: dict[str, float] = {}
    detail = os.path.join(_REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail):
        with open(detail) as f:
            battery = json.load(f).get("queries", {})
    results: dict[str, float] = {}
    for fam in FAMILIES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", *fam],
            capture_output=True,
            text=True,
            cwd="/tmp",  # outside the repo: exercise the addPyFile path
            env={**os.environ},
        )
        line = next(
            (
                ln
                for ln in out.stdout.splitlines()
                if ln.startswith("AUDIT_RESULT ")
            ),
            None,
        )
        if line is None:
            print(f"family {fam}: FAILED\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            continue
        fam_t = json.loads(line[len("AUDIT_RESULT "):])
        results.update(fam_t)
        for name, t in fam_t.items():
            b = battery.get(name)
            ratio = f"{t / b:5.2f}x" if b else "    —"
            print(
                f"{name:32s} fresh={t:7.2f}s battery={b if b else float('nan'):7.2f}s "
                f"fresh/battery={ratio}",
                flush=True,
            )
    print("\nJSON " + json.dumps(results))


if __name__ == "__main__":
    main()
