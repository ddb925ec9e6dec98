"""The rotation-window stager (tools/evidence_age.py --stage) must
reproduce the standing rules rounds 10-12 applied by hand:

- main body = every registered query whose latest evidence is the
  oldest round on disk, in head-pin order (evidence age, then
  registration order);
- backfill = next-oldest hash-GREENS only, topping the window up to
  its size — a row whose latest evidence is weak (``no_oracle``)
  never backfills and rotates with its own round's main body;
- while the newest committed artifact is CORRECTNESS_r11, the staged
  window is byte-for-byte the hand-derived ROUND12_HEAD (the pin the
  round-11 verdict ordered). Once r12+ artifacts land this exactness
  clause retires and the structural clauses keep guarding the rules.

No Spark session needed — the stager reads committed JSON and the
registry's name list.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "evidence_age", os.path.join(_REPO, "tools", "evidence_age.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("evidence_age", mod)
    spec.loader.exec_module(mod)
    return mod


def test_stage_window_follows_the_standing_rules():
    tool = _load_tool()
    from security_master_spark.plans.registry import queries

    names = list(queries())
    rows = tool.latest_rows()
    main, backfill, oldest = tool.stage_window(names, rows, 50)

    assert len(main) + len(backfill) == 50
    ages = {n: rows.get(n, (0, {}))[0] for n in names}
    # main body is EXACTLY the oldest-round set (when it fits)
    oldest_set = {n for n in names if ages[n] == oldest}
    if len(oldest_set) <= 50:
        assert set(main) == oldest_set
    # backfill: hash-greens only, none from the oldest round, and in
    # age-then-registration order
    for n in backfill:
        assert ages[n] > oldest
        assert rows[n][1].get("hash_match") is True
    keyed = [(ages[n], names.index(n)) for n in backfill]
    assert keyed == sorted(keyed)
    # no duplicates across the window
    assert len(set(main) | set(backfill)) == 50


def test_stage_reproduces_round12_head_while_r11_is_newest():
    tool = _load_tool()
    from security_master_spark.plans.registry import ROUND12_HEAD, queries

    rows = tool.latest_rows()
    newest = max(rnd for rnd, _r in rows.values())
    if newest != 11:
        return  # exactness clause retired; structural test still runs
    main, backfill, _ = tool.stage_window(list(queries()), rows, 50)
    assert tuple(main + backfill) == ROUND12_HEAD


def test_stage_reproduces_round13_head_while_r12_is_newest():
    """While CORRECTNESS_r12 is the newest committed artifact, the
    stager run with the declared ROUND13_QUEUE_JUMPERS must reproduce
    the pinned ROUND13_HEAD byte-for-byte (the round-13 window was
    pasted from its output). Retires once r13+ artifacts land; the
    structural clauses above keep guarding the rules."""
    tool = _load_tool()
    from security_master_spark.plans.registry import (
        ROUND13_HEAD,
        ROUND13_QUEUE_JUMPERS,
        queries,
    )

    rows = tool.latest_rows()
    newest = max(rnd for rnd, _r in rows.values())
    if newest != 12:
        return  # exactness clause retired
    jump, main, back, _ = tool.stage_with_jumpers(
        list(queries()), rows, 50, ROUND13_QUEUE_JUMPERS
    )
    assert tuple(jump + main + back) == ROUND13_HEAD


def test_stage_with_jumpers_front_loads_and_trims():
    tool = _load_tool()
    from security_master_spark.plans.registry import queries

    names = list(queries())
    rows = tool.latest_rows()
    plain_main, plain_back, oldest = tool.stage_window(names, rows, 50)
    # pick one jumper already in the rule window and one outside it
    inside = plain_main[3]
    outside = next(
        n for n in names if n not in plain_main and n not in plain_back
    )
    jump, main, back, oldest2 = tool.stage_with_jumpers(
        names, rows, 50, (outside, inside)
    )
    assert oldest2 == oldest
    # declared order leads the window; no duplicates anywhere
    assert jump == [outside, inside]
    window = jump + main + back
    assert len(window) == 50
    assert len(set(window)) == 50
    assert inside not in main and inside not in back
    # the rule-derived part is the plain window minus jumpers, with
    # the TAIL trimmed (backfill first) to keep the size
    assert main == [n for n in plain_main if n not in (inside, outside)]
    survivors = [n for n in plain_back if n not in (inside, outside)]
    assert back == survivors[: len(back)]


def test_stage_with_jumpers_rejects_unknown_names():
    tool = _load_tool()
    from security_master_spark.plans.registry import queries

    rows = tool.latest_rows()
    try:
        tool.stage_with_jumpers(list(queries()), rows, 50, ("nope_q",))
    except ValueError as e:
        assert "nope_q" in str(e)
    else:
        raise AssertionError("unknown jumper did not raise")


def test_stage_reproduces_round14_head_while_r13_is_newest():
    """While CORRECTNESS_r13 is the newest committed artifact, the
    plain stager (no queue-jumpers: round 13 changed no registered
    plan text) must reproduce the pinned ROUND14_HEAD byte-for-byte
    (the round-14 window was pasted from its output). Retires once
    r14+ artifacts land; the structural clauses above keep guarding
    the rules."""
    tool = _load_tool()
    from security_master_spark.plans.registry import ROUND14_HEAD, queries

    rows = tool.latest_rows()
    newest = max(rnd for rnd, _r in rows.values())
    if newest != 13:
        return  # exactness clause retired
    main, backfill, _ = tool.stage_window(list(queries()), rows, 50)
    assert tuple(main + backfill) == ROUND14_HEAD


def test_stage_reproduces_round15_head_while_r14_is_newest():
    """While CORRECTNESS_r14 is the newest committed artifact, the
    plain stager (no queue-jumpers: rounds 13-14 changed no registered
    plan text) must reproduce the pinned ROUND15_HEAD byte-for-byte
    (the round-15 window was pasted from its output). Retires once
    r15+ artifacts land; the structural clauses above keep guarding
    the rules."""
    tool = _load_tool()
    from security_master_spark.plans.registry import ROUND15_HEAD, queries

    rows = tool.latest_rows()
    newest = max(rnd for rnd, _r in rows.values())
    if newest != 14:
        return  # exactness clause retired
    main, backfill, _ = tool.stage_window(list(queries()), rows, 50)
    assert tuple(main + backfill) == ROUND15_HEAD


def test_round13_jumpers_are_declared_and_registered():
    # the four plans whose forced broadcasts were dropped in round 12
    # (PLANS.md broadcast-site audit) must be declared for round 13 —
    # and every declared name must resolve in the registry
    from security_master_spark.plans.registry import (
        ROUND12_HEAD,
        ROUND13_QUEUE_JUMPERS,
        queries,
    )

    assert set(ROUND13_QUEUE_JUMPERS) == {
        "w13_ratio_to_report",
        "d47_basket_lift",
        "d49_fulfillment_sla",
        "g4_link_prediction",
        "l22_distinctive_terms",
        "l29_unigram_surprisal",
    }
    assert set(ROUND13_QUEUE_JUMPERS) <= set(queries())
    # the three audit queries NOT declared are covered by ROUND12_HEAD
    for n in ("dq4_ks_test", "d39_var_es", "d40_hhi_concentration"):
        assert n in ROUND12_HEAD
