"""Best-ever per-query floor ledger (round-14 verdict order #2).

The round-11..13 regression trigger was anchored to the LATEST
minimums floor and ratcheted with it (225 -> 230 -> 245 s) while the
floor itself crept 204.6 -> 251.6 s on host drift alone — a trigger
that follows the thing it guards can hide a slow real regression
under successive exonerations. This tool replaces it with an anchor
that CANNOT ratchet: the per-query minimum across every committed
BENCH_DETAIL_min_r*.json (a query's best-ever reproducible time —
host drift can only add new minimums, never raise old ones).

    python tools/bench_floor.py            # rebuild BENCH_FLOOR_BEST.json
    python tools/bench_floor.py --compare BENCH_DETAIL_min_r14.json
        # per-query ratios vs best-ever; prints queries > RATIO_FLAG
        # (default 1.3) sorted worst-first, plus the host-drift
        # reference ratio (median across ALL queries — a real code
        # regression moves ONE query far above the median; host drift
        # moves the median itself)

Regression rule (round-14 protocol): a query is SUSPECT when its
battery minimum exceeds 1.3x its best-ever floor AND the battery's
median ratio is under ~1.15 (i.e. the box itself is not uniformly
slow). When the median ratio is high, compare the probes in
HOST_PROBES.jsonl first — and read steal_pct and cpu_mt_probe_sec
ALONGSIDE cpu_probe_sec: round 15 measured the single-thread probe
UNDER-predicting battery walls by ~25 s while steal (sampled
all-cores-busy) ran 3.6-5.8% around the batteries and up to 15%
later the same session — the host factor is all-core CONTENTION,
which a single-thread probe structurally underweights. The
median-NORMALIZED section printed by --compare divides the battery's
own median back out so a genuine regression surfaces even inside a
uniformly slow era (round-15 isolation spot-checks are the model:
re-run the top normalized outliers alone, min-of-3, before believing
either verdict).

Triage suspects by the ABSOLUTE excess (the +N.NNs column), not the
ratio: a best-ever floor is a per-query MINIMUM over every battery
sample ever recorded, and for short walls that minimum is an extreme
order statistic biased far below the typical quiet-box time —
round-15's quiet-box battery (median 1.09) measured the bias
directly: median ratio 1.19 for queries with sub-0.2 s floors,
falling monotonically to 1.06 for 1-3 s floors, with 42 of 45 raw
"suspects" carrying < 0.3 s of absolute excess. A real plan
regression on a query that matters moves SECONDS, not a noisy
tenth.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO_FLAG = 1.3

#: Minimums batteries recorded BEFORE bench.py cleared the SQL cache
#: between timed queries (the round-15 measurement fix). Their floors
#: for persist-carrying queries — and for any query downstream of a
#: sibling's cached subtree (CacheManager substitutes by canonicalized
#: subtree) — are WARM-CACHE artifacts that can sit structurally below
#: every honest compute-from-parquet measurement (e.g. g3's 0.94 s vs
#: ~4.6 s honest). A suspect whose anchor comes only from these
#: sources is a methodology-era artifact until an honest-era battery
#: re-anchors it; --compare tags those lines. Frozen historical fact —
#: never add post-fix files here.
_PRE_CLEARCACHE_SOURCES = frozenset({
    "BENCH_DETAIL_min_r11.json",
    "BENCH_DETAIL_min_r12.json",
    "BENCH_DETAIL_min_r13.json",
    "BENCH_DETAIL_min_r14.json",
    "BENCH_DETAIL_min_r15.json",
})


def _round_of(path: str) -> int:
    """Numeric round from a minimums filename, so r100 sorts after
    r11 in the sources list instead of lexicographically before it
    (round-15 ADVICE, low — cosmetic for the mins themselves, which
    are order-independent, but misleading in the committed payload).
    A session suffix is allowed (r15s4 → 15) so mid-round batteries
    of the same round sort with it."""
    m = re.search(r"_r(\d+)[a-z0-9]*\.json$", os.path.basename(path))
    return int(m.group(1)) if m else -1


def best_floors() -> tuple[dict[str, float], dict[str, float], list[str]]:
    """Overall best floors, honest-era-only best floors, and sources.

    The overall map keeps the legacy anchor semantics (minimum over
    every committed battery); the honest map restricts to post-
    clearCache-fix sources so a cache-contaminated legacy floor can be
    recognized and eventually superseded.
    """
    files = sorted(
        glob.glob(os.path.join(_REPO, "BENCH_DETAIL_min_r*.json")),
        key=_round_of,
    )
    best: dict[str, float] = {}
    honest: dict[str, float] = {}
    for path in files:
        with open(path, encoding="utf-8") as f:
            qs = json.load(f)["queries_min"]
        pre_fix = os.path.basename(path) in _PRE_CLEARCACHE_SOURCES
        for name, sec in qs.items():
            if name not in best or sec < best[name]:
                best[name] = sec
            if not pre_fix and (name not in honest or sec < honest[name]):
                honest[name] = sec
    return best, honest, [os.path.basename(p) for p in files]


def main(argv: list[str]) -> None:
    best, honest, sources = best_floors()
    out_path = os.path.join(_REPO, "BENCH_FLOOR_BEST.json")
    payload = {
        "method": (
            "per-query minimum across all committed minimums batteries "
            "— the non-ratcheting regression anchor. queries_best_honest "
            "restricts to post-clearCache-fix batteries (see "
            "_PRE_CLEARCACHE_SOURCES in tools/bench_floor.py): legacy "
            "floors for persist-carrying queries are warm-cache "
            "artifacts that no honest measurement can beat."
        ),
        "sources": sources,
        "pre_clearcache_sources": sorted(
            s for s in sources if s in _PRE_CLEARCACHE_SOURCES
        ),
        "total_best_floor_sec": round(sum(best.values()), 2),
        "queries_best": dict(sorted(best.items())),
        "queries_best_honest": dict(sorted(honest.items())),
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=1)
    print(
        f"BENCH_FLOOR_BEST.json: {len(best)} queries, "
        f"total {payload['total_best_floor_sec']} s from {sources}"
    )

    if "--compare" in argv:
        i = argv.index("--compare") + 1
        if i >= len(argv):
            sys.exit("--compare needs a minimums file, e.g. "
                     "BENCH_DETAIL_min_r14.json")
        target = argv[i]
        if target.startswith("--"):
            sys.exit(f"--compare needs a minimums file, got {target!r}")
        try:
            with open(os.path.join(_REPO, target), encoding="utf-8") as f:
                qs = json.load(f)["queries_min"]
        except FileNotFoundError:
            sys.exit(f"no such minimums file: {target}")
        except (KeyError, json.JSONDecodeError) as e:
            sys.exit(f"{target} is not a minimums battery file ({e})")
        ratios = {
            n: qs[n] / best[n] for n in qs if n in best and best[n] > 0
        }
        unanchored = sorted(n for n in qs if n not in ratios)
        if unanchored:
            # Report rather than silently drop: a renamed or brand-new
            # query would otherwise vanish from the ratio set and never
            # acquire a verdict (round-15 ADVICE, low).
            print(
                f"note: {len(unanchored)} target quer"
                f"{'y has' if len(unanchored) == 1 else 'ies have'} no "
                f"best-ever floor (excluded from ratios): "
                f"{', '.join(unanchored)}"
            )
        if not ratios:
            sys.exit(f"{target} shares no queries with the floor ledger")
        med = statistics.median(ratios.values())
        print(f"median ratio vs best-ever: {med:.3f} (host-drift reference)")
        if med <= 0:
            # A zero median means the target's times are themselves
            # zero — nothing to normalize by (self-probe on the
            # round-15 normalized column: r / med must not divide by
            # zero on a degenerate battery file).
            sys.exit("target battery median is 0 — not a real battery")
        def _era_tag(n: str) -> str:
            """Tag a suspect whose anchor is a legacy warm-cache floor.

            When the overall best comes from a pre-clearCache battery
            (best < honest-era best, or no honest floor exists yet),
            the ratio is measured against a number the honest
            methodology may be structurally unable to reproduce; the
            honest-era ratio (when available) is the meaningful one.
            """
            h = honest.get(n)
            if h is None:
                return "  [pre-fix floor, no honest-era anchor yet]"
            if h > best[n]:
                return f"  [pre-fix floor; honest-era {qs[n] / h:.2f}x vs {h:.3f}]"
            return ""

        sus = sorted(
            ((r, n) for n, r in ratios.items() if r > RATIO_FLAG),
            reverse=True,
        )
        for r, n in sus:
            print(
                f"  {n:35s} {qs[n]:8.3f} vs best {best[n]:8.3f}  "
                f"({r:.2f}x raw, {r / med:.2f}x norm, "
                f"+{qs[n] - best[n]:.2f}s)" + _era_tag(n)
            )
        if not sus:
            print(f"  no query above {RATIO_FLAG}x its best-ever floor")
        # Median-normalized outliers (round-14 verdict order #7): under
        # a uniformly slow host every raw ratio rides the median, so a
        # genuinely regressed query hides inside the uniform band. The
        # normalized view divides the median back out; the raw SUSPECT
        # rule above is unchanged — this column is advisory context.
        norm_sus = sorted(
            ((r / med, n) for n, r in ratios.items() if r / med > RATIO_FLAG),
            reverse=True,
        )
        if norm_sus:
            print(
                f"median-normalized outliers (> {RATIO_FLAG}x the "
                "battery's own median):"
            )
            for rn, n in norm_sus:
                print(
                    f"  {n:35s} {qs[n]:8.3f} vs best {best[n]:8.3f}  "
                    f"({ratios[n]:.2f}x raw, {rn:.2f}x norm, "
                    f"+{qs[n] - best[n]:.2f}s)" + _era_tag(n)
                )
        else:
            print(
                f"  no query above {RATIO_FLAG}x the battery median "
                "(normalized view)"
            )


if __name__ == "__main__":
    main(sys.argv[1:])
