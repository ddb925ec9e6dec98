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
- steal_pct: /proc/stat delta over a multi-rep all-cores-busy window
  — host CPU theft visible from the guest (a single-busy-core sample
  structurally under-reports steal: idle vCPUs are never
  runnable-but-preempted; a single short window misses bursts).
- iowait_pct: /proc/stat delta over a mostly-IDLE window — the
  opposite accrual rule (iowait ticks only on idle CPUs, so a busy
  window reads ~0 regardless of IO pressure).

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

#: /proc/stat cpu-line fields after the "cpu" label:
#: user nice system idle iowait irq softirq steal guest guest_nice.
#: The two indices below are the accrual-rule pair the round-14
#: review findings turned on (steal ticks only on busy-preempted
#: vCPUs, iowait only on idle ones) — pinned by
#: tests/test_host_probe.py so a field-order slip can't silently
#: zero a reading again.
_FIELD_IOWAIT = 4
_FIELD_STEAL = 7


def _pct_of_delta(before: list[int], after: list[int], idx: int) -> float:
    """Share of total jiffies spent in field ``idx`` between two
    /proc/stat snapshots, as a percentage. Pure — the sampling windows
    (busy for steal, idle for iowait) are the callers' contract."""
    d = [y - x for x, y in zip(before, after)]
    return round(100 * d[idx] / max(sum(d), 1), 2)


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


def cpu_mt_probe(reps: int = 4) -> tuple[float, float]:
    """Per-core time for the same loop with every core busy — the MAX
    across workers (the straggler is what a barrier-shaped Spark stage
    pays), minimum over ``reps`` — plus steal% sampled over the WHOLE
    multi-rep all-cores-busy window. Two structural requirements met
    here (both round-14 review findings): steal ticks accrue only for
    runnable-but-preempted vCPUs, so the cores must be BUSY while
    sampling (a single-busy-core sample hides the theft a 32-thread
    battery suffers — same box read 0.04% one-core vs 3.6-5% all-core);
    and one ~0.65 s window is a noisy point sample on a bursty host,
    so the snapshot spans several reps (~2.5 s busy) with the pool
    forked OUTSIDE the window (the fork's idle ramp inflates the
    denominator). iowait deliberately NOT sampled here — it has the
    OPPOSITE requirement (ticks accrue only on idle CPUs), see
    :func:`iowait_sample`."""
    n = multiprocessing.cpu_count()
    with multiprocessing.Pool(n) as pool:
        pool.map(_mt_worker, range(n))  # warm the pool, outside window
        a = _stat_snap()
        per_rep = [
            max(pool.map(_mt_worker, range(n))) for _ in range(reps)
        ]
        b = _stat_snap()
    return round(min(per_rep), 4), _pct_of_delta(a, b, _FIELD_STEAL)


def iowait_sample(window_seconds: float = 2.0) -> float:
    """iowait% over a mostly-IDLE window: Linux accrues iowait ticks
    only on idle CPUs, so sampling it inside the all-cores-busy probe
    structurally reads ~0 no matter how IO-starved the host is
    (round-14 second-review finding). An idle window shows other
    tenants'/processes' IO pressure on this guest's CPUs."""
    a = _stat_snap()
    time.sleep(window_seconds)
    b = _stat_snap()
    return _pct_of_delta(a, b, _FIELD_IOWAIT)


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
    mt_sec, steal = cpu_mt_probe()
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cpu_probe_sec": cpu_probe(),
        "cpu_mt_probe_sec": mt_sec,
        "disk_warm_mb": mb,
        "disk_warm_mbps": mbps,
        # steal: multi-rep all-cores-busy window; iowait: idle window
        # (opposite accrual rules — see the two probes' docstrings).
        # The first four r14 ledger entries predate the busy-window
        # steal fix and were sampled one-core-busy — treat their
        # 0.01-0.04% as a lower bound; the fifth used a single-rep
        # busy window (3.58%).
        "steal_pct": steal,
        "iowait_pct": iowait_sample(),
        "nproc": multiprocessing.cpu_count(),
    }
    line = json.dumps(out, sort_keys=True)
    print(line)
    if record:
        with open(os.path.join(_REPO, "HOST_PROBES.jsonl"), "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
