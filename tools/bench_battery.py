"""One-command minimums battery (round-14 protocol driver).

The round-14 bench re-anchor replaced the latest-floor band trigger
with: host probes around every battery, per-query minimums across two
full batteries, and a regression verdict against the best-ever floor
ledger. That is five manual steps in the right order on a quiet box;
this tool is the one command, the way evidence_age --stage is the one
command for rotation staging:

    python tools/bench_battery.py 15          # writes BENCH_DETAIL_min_r15.json
    python tools/bench_battery.py 15 --runs 3 # extra battery (probe-slow era)

Sequence: host_probe --record, bench.py, host_probe --record,
bench.py, host_probe --record — then assemble the per-query minimums
file, rebuild BENCH_FLOOR_BEST.json, and print the --compare verdict
(median ratio + >1.3x suspects). Run it FIRST in the session with
NOTHING else on the box (the round-11..14 lesson: concurrent pytest
or driver sims inflate the floor and the inflation is
indistinguishable from host drift afterwards).

Each bench.py run leaves its own battery detail in
/tmp/bench_battery_r{N}_b{i}.json; BENCH_DETAIL.json keeps the LAST
battery (the committed sf0.1 record convention).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def merge_minimums(details: list[dict]) -> dict[str, float]:
    """Per-query minimum across battery detail payloads (each already
    an interleaved min-of-2 from bench.py). Every battery must cover
    the same query set — a partial battery would silently lower the
    floor for the queries it skipped."""
    if not details:
        raise ValueError("no battery details to merge")
    names = set(details[0]["queries"])
    for d in details[1:]:
        if set(d["queries"]) != names:
            raise ValueError(
                "battery query sets differ: "
                f"{sorted(names ^ set(d['queries']))}"
            )
    return {
        n: min(d["queries"][n] for d in details) for n in sorted(names)
    }


def _run(cmd: list[str]) -> None:
    print(f">>> {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=_REPO, check=True)


def main(argv: list[str]) -> None:
    if not argv or not argv[0].isdigit():
        sys.exit("usage: python tools/bench_battery.py <round> [--runs N]")
    rnd = int(argv[0])
    if rnd < 1:
        sys.exit("round must be >= 1")
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs") + 1
        if i >= len(argv) or not argv[i].isdigit():
            sys.exit("--runs needs a count")
        runs = int(argv[i])
    # Validate BEFORE the first host_probe --record: isdigit() accepts
    # "0", and a zero-run battery would record a stray ledger entry and
    # then traceback in merge_minimums([]) (round-15 ADVICE, low).
    if runs < 1:
        sys.exit("--runs must be >= 1")

    py = sys.executable
    probe = [py, os.path.join(_REPO, "tools", "host_probe.py"), "--record"]
    detail_src = os.path.join(_REPO, "BENCH_DETAIL.json")
    details: list[dict] = []
    walls: list[float] = []

    _run(probe)
    for b in range(1, runs + 1):
        _run([py, os.path.join(_REPO, "bench.py")])
        copy = f"/tmp/bench_battery_r{rnd}_b{b}.json"
        shutil.copy(detail_src, copy)
        with open(copy, encoding="utf-8") as f:
            d = json.load(f)
        if d.get("sf") != 0.1:
            sys.exit(
                f"battery {b} ran at sf={d.get('sf')} — the minimums "
                "protocol is defined at sf0.1 (unset SPARK_GRAFT_SF_DIR)"
            )
        details.append(d)
        walls.append(d["value"])
        _run(probe)

    mins = merge_minimums(details)
    floor = round(sum(mins.values()), 2)
    out_path = os.path.join(_REPO, f"BENCH_DETAIL_min_r{rnd}.json")
    payload = {
        "method": (
            f"min of {runs} full interleaved batteries (bench.py "
            "back-to-back via tools/bench_battery.py), host probes "
            "recorded in HOST_PROBES.jsonl around every battery"
        ),
        **{f"run{i + 1}_wall_sec": w for i, w in enumerate(walls)},
        "minimums_floor_sec": floor,
        "sf": 0.1,
        "queries_min": mins,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=1)
    print(f"\nwrote {os.path.basename(out_path)}: floor {floor} s, "
          f"walls {walls}")

    # Rebuild the best-ever ledger (which now includes this round) and
    # print the regression verdict against it.
    _run([
        py,
        os.path.join(_REPO, "tools", "bench_floor.py"),
        "--compare",
        os.path.basename(out_path),
    ])


if __name__ == "__main__":
    main(sys.argv[1:])
