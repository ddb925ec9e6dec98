"""Calibrated host-state probe (round-14 verdict order #2).

Rounds 11-14 watched the bench-minimums floor creep 204.6 -> 209.6 ->
222.6 -> 251.6 s with ZERO registered-plan changes, and each round
exonerated the step with an ad-hoc isolation study because there was
no instrument to separate "the host got slower" from "the code got
slower". This tool IS that instrument: guest-visible, deterministic
workloads whose timings scale with the host resources the battery
depends on. Run it BEFORE the battery; append the reading to
HOST_PROBES.jsonl; compare battery floors probe-to-probe, not
second-to-second.

Probes (all minimums over reps; no Spark dependency so it runs in
seconds and can never be confounded by the thing it calibrates):

- cpu_probe_sec: fixed single-thread Python integer loop. The battery
  floor's short-query fixed overhead (task launch, codegen, driver
  planning) is single-thread bound; round-14 measured q1 (trivial,
  untouched) inflating 1.38x in isolated minimums while this probe's
  class of work inflated in proportion.
- cpu_mt_probe_sec: the same loop on every core concurrently
  (multiprocessing) — separates "one core is slow" from "the box is
  oversubscribed".
- disk_warm_mbps: warm sequential read of the sf0.1 fixtures
  (~17.5 MB — at this size the battery is NOT disk-bound; the probe
  exists to falsify disk theories quickly).
- steal_pct / iowait_pct: /proc/stat delta over exactly the
  all-cores-busy mt-probe window — host CPU theft visible from the
  guest (a single-busy-core sample structurally under-reports steal:
  idle vCPUs are never runnable-but-preempted).

Usage:
    python tools/host_probe.py            # print one JSON line
    python tools/host_probe.py --record   # also append to HOST_PROBES.jsonl
"""

from __future__ import annotations

import glob
import json
import multiprocessing
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = "/root/testdata/sf0.1"


def _cpu_once(n: int = 3_000_000) -> float:
    t0 = time.perf_counter()
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
    return time.perf_counter() - t0


def cpu_probe(reps: int = 5) -> float:
    return round(min(_cpu_once() for _ in range(reps)), 4)


def _mt_worker(_i: int) -> float:
    return _cpu_once()


def cpu_mt_probe() -> tuple[float, float, float]:
    """Per-core time for the same loop with every core busy — the MAX
    across workers (the straggler is what a barrier-shaped Spark stage
    pays) — plus steal%/iowait% sampled over EXACTLY this all-cores-
    busy window. Sampling steal while only one core is busy
    under-reports it structurally: /proc/stat steal ticks accrue only
    for vCPUs that are runnable-but-preempted, so 31 idle cores hide
    the theft the battery would actually suffer (round-14 review
    finding — the probe exists to see 'the host got slower', which is
    exactly the signal a single-core sample misses)."""
    n = multiprocessing.cpu_count()
    a = _stat_snap()
    with multiprocessing.Pool(n) as pool:
        times = pool.map(_mt_worker, range(n))
    b = _stat_snap()
    d = [y - x for x, y in zip(a, b)]
    tot = max(sum(d), 1)
    steal = round(100 * d[7] / tot, 2)
    iowait = round(100 * d[4] / tot, 2)
    return round(max(times), 4), steal, iowait


def disk_probe() -> tuple[float, float]:
    total = 0
    t0 = time.perf_counter()
    for f in sorted(glob.glob(os.path.join(_SF_DIR, "*.parquet"))):
        paths = (
            [
                g
                for g in glob.glob(f + "/**/*", recursive=True)
                if os.path.isfile(g)
            ]
            if os.path.isdir(f)
            else [f]
        )
        for p in paths:
            with open(p, "rb") as fh:
                total += len(fh.read())
    el = time.perf_counter() - t0
    return round(total / 1e6, 1), round(total / 1e6 / max(el, 1e-9), 1)


def _stat_snap() -> list[int]:
    with open("/proc/stat") as f:
        return [int(v) for v in f.readline().split()[1:]]


def main(argv: list[str]) -> None:
    record = "--record" in argv
    mb, mbps = disk_probe()
    mt_sec, steal, iowait = cpu_mt_probe()
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cpu_probe_sec": cpu_probe(),
        "cpu_mt_probe_sec": mt_sec,
        "disk_warm_mb": mb,
        "disk_warm_mbps": mbps,
        # steal/iowait sampled over the all-cores-busy mt window (the
        # first three r14 ledger entries predate this and were sampled
        # one-core-busy — treat their 0.01-0.04% as a lower bound)
        "steal_pct": steal,
        "iowait_pct": iowait,
        "nproc": multiprocessing.cpu_count(),
    }
    line = json.dumps(out, sort_keys=True)
    print(line)
    if record:
        with open(os.path.join(_REPO, "HOST_PROBES.jsonl"), "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
