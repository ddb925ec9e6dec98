"""Run plan_audit over every registered query's optimized plan — the
mechanized, re-runnable form of the round-12 broadcast-site audit
(PLANS.md): each query is plan-constructed (no job executes) at a
small fixture and checked for the scale-hazard classes.

Usage: python tools/audit_plans.py [--sf DIR] [--aggregates]
                                   [--unbounded-agg]
    --sf DIR      fixture dir (default /root/testdata/sf0.001 — plan
                  SHAPES are SF-invariant; only estimates scale)
    --aggregates  include the opt-in forced-broadcast-aggregate
                  advisories (noisy by design: boundedness of a
                  grouped aggregate's key domain is a human judgment)
    --unbounded-agg  include the opt-in buffer-per-key aggregate
                  advisories (collect_list/set, listagg, exact
                  percentile/median — per-key memory; boundedness of
                  the per-key volume is a human judgment; the
                  adjudicated inventory lives in PLANS.md)

Exit status 1 if any HARD finding (raw-relation broadcast, cartesian)
appears — those two classes were driven to zero in round 12 and a
reappearance is a regression; global-window/sort findings print but
don't fail, because the remaining ones are the documented
collapse-first exceptions (see the sweep table in PLANS.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HARD = {"forced-broadcast-raw-relation", "cartesian"}

#: Documented exceptions: structurally-flagged sites whose
#: boundedness lives in a predicate or data contract the static
#: audit cannot see. Each entry must say WHY; findings on these
#: queries print as "noted" and do not fail the sweep.
DOCUMENTED: dict[str, str] = {
    "l5_cosine_topk": (
        "the broadcast/cross side is the single query vector selected "
        "by vec_id == 0 — O(1) rows by the fixture's data contract; an "
        "equality filter does not collapse cardinality structurally"
    ),
    "q22_skyline": (
        "the global skyline window runs over part rows by design; the "
        "docstring documents the range-partition-on-price scale path "
        "(the 2-D skyline's honest exact cost)"
    ),
    "q26_lateral_topk": (
        "Catalyst decorrelates LATERAL(... ORDER BY .. LIMIT k) via a "
        "range-partitioned global pre-sort of customer (distributed, "
        "not one-task, but one extra sort+shuffle vs the w6/q3 rank "
        "idiom); this row certifies the LATERAL SQL dialect — the "
        "spelling IS the subject. Surfaced only after the round-13 "
        "bounded-table matcher fix (c_nationkey no longer matches "
        "'nation'); w6/q3 is the production per-group top-k"
    ),
    "u1_python_scalar_udf": (
        "SURVEY §2.13's row-at-a-time reference row — the slow path "
        "demonstrated ON PURPOSE; u2/u9/u12 are its Arrow siblings"
    ),
    "u6_udtf_lateral": (
        "classic fixed-returnType Python UDTF surface row — the "
        "contract being demonstrated predates Arrow UDTFs"
    ),
    "u8_polymorphic_udtf": (
        "polymorphic (analyze-at-plan-time) UDTF surface row — same "
        "deliberate-surface rationale as u6"
    ),
}


def main(argv: list[str]) -> None:
    sf_dir = "/root/testdata/sf0.001"
    include_aggregates = False
    include_unbounded_agg = False
    args = list(argv)
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            i += 1
            sf_dir = args[i]
        elif args[i] == "--aggregates":
            include_aggregates = True
        elif args[i] == "--unbounded-agg":
            include_unbounded_agg = True
        else:
            sys.exit(f"unknown arg {args[i]!r} — see module docstring")
        i += 1

    from security_master_spark.plan_audit import audit_plan
    from security_master_spark.plans import registry
    from security_master_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    n_hard = 0
    n_soft = 0
    failed: list[str] = []
    for name, build in registry.queries().items():
        # Isolate each plan from CacheManager substitution: a persist()
        # registered while CONSTRUCTING an earlier query's plan would
        # otherwise replace matching subtrees here with
        # InMemoryRelation and hide that subtree's findings. The
        # persists are lazy (never materialized by the sweep), so this
        # only wipes the registry.
        spark.catalog.clearCache()
        try:
            df = build(spark, sf_dir)
        except Exception as e:  # plan construction must never fail
            failed.append(f"{name}: {type(e).__name__}: {e}")
            continue
        try:
            findings = audit_plan(
                df,
                include_aggregates=include_aggregates,
                include_unbounded_agg=include_unbounded_agg,
            )
        except Exception as e:
            failed.append(f"{name}: audit error {type(e).__name__}: {e}")
            continue
        for f in findings:
            if name in DOCUMENTED:
                tag = "noted"
            elif f.kind in HARD:
                tag = "HARD"
                n_hard += 1
            else:
                tag = "soft"
                n_soft += 1
            print(f"{tag} {name} {f.kind}: {f.detail}")
            if name in DOCUMENTED:
                print(f"     documented: {DOCUMENTED[name]}")
            print(f"     {f.node}")
    print(
        f"\naudited {len(registry.queries())} queries: "
        f"{n_hard} hard finding(s), {n_soft} soft finding(s), "
        f"{len(failed)} audit failure(s)"
    )
    for line in failed:
        print("FAIL", line)
    spark.stop()
    if n_hard or failed:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
