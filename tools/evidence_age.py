"""Evidence-age ledger: for every registered query, the latest
CORRECTNESS_r*.json round that carries a row for it — the input to
the evidence-freshness rotation (ROUND{8,9,10}_HEAD in
plans/registry.py). Prints the histogram and the oldest-first
candidate list the next head pin should be built from.

Usage: python tools/evidence_age.py [--max-round N] [--limit K] [--check]
    --max-round N   only list queries whose latest evidence ≤ rN
    --limit K       cap the candidate list (default 60)
    --check         exit nonzero if any query was never driver-checked
                    or the oldest evidence is more than 6 rounds older
                    than the newest round on disk — the standing
                    rolling-freshness bound (round-10 verdict order
                    #5: preflight runs this so the staged-rotation
                    comment can never drift from the committed
                    artifacts)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path, encoding="utf-8") as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main(argv: list[str]) -> None:
    max_round = None
    limit = 60
    check = False
    it = iter(argv)
    for a in it:
        if a == "--max-round":
            max_round = int(next(it))
        elif a == "--limit":
            limit = int(next(it))
        elif a == "--check":
            check = True
        else:
            sys.exit(f"unknown arg {a!r} — see module docstring")

    from security_master_spark.plans.registry import queries

    names = list(queries())
    latest = latest_evidence()
    ages = {n: latest.get(n, 0) for n in names}  # 0 = never checked

    hist = Counter(ages.values())
    print("latest-evidence histogram (0 = never driver-checked):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")

    # oldest first, then registration order (the head-pin ordering)
    cands = sorted(names, key=lambda n: (ages[n], names.index(n)))
    if max_round is not None:
        cands = [n for n in cands if ages[n] <= max_round]
    print(f"\noldest-evidence candidates (first {limit}):")
    for n in cands[:limit]:
        print(f"  r{ages[n]:02d} {n}")

    if check:
        never = sorted(n for n in names if ages[n] == 0)
        newest = max(latest.values(), default=0)
        oldest = min(ages.values(), default=0)
        bound = newest - 6
        if never:
            sys.exit(
                f"EVIDENCE CHECK FAILED: never driver-checked: {never}"
            )
        if oldest < bound:
            stale = sorted(n for n in names if ages[n] < bound)
            sys.exit(
                f"EVIDENCE CHECK FAILED: oldest evidence r{oldest:02d} "
                f"is more than 6 rounds behind r{newest:02d} "
                f"(bound r{bound:02d}); stale: {stale[:20]}"
                + (" …" if len(stale) > 20 else "")
            )
        print(
            f"evidence check ok: oldest r{oldest:02d} within 6 rounds "
            f"of newest r{newest:02d}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
