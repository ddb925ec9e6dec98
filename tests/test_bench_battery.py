"""The minimums-battery driver's pure merge logic: per-query minimum
across batteries, with the partial-battery guard (a battery missing a
query must fail loudly — silently merging would lower the floor for
exactly the queries it skipped). No Spark session needed."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "bench_battery", os.path.join(_REPO, "tools", "bench_battery.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench_battery", mod)
    spec.loader.exec_module(mod)
    return mod


def test_merge_takes_per_query_minimums():
    tool = _load_tool()
    b1 = {"queries": {"q1": 1.0, "q2": 5.0, "q3": 2.2}}
    b2 = {"queries": {"q1": 1.5, "q2": 4.0, "q3": 2.2}}
    assert tool.merge_minimums([b1, b2]) == {
        "q1": 1.0,
        "q2": 4.0,
        "q3": 2.2,
    }


def test_merge_rejects_partial_batteries():
    tool = _load_tool()
    b1 = {"queries": {"q1": 1.0, "q2": 5.0}}
    b2 = {"queries": {"q1": 1.5}}
    with pytest.raises(ValueError, match="q2"):
        tool.merge_minimums([b1, b2])


def test_merge_rejects_empty_input():
    tool = _load_tool()
    with pytest.raises(ValueError):
        tool.merge_minimums([])


def test_single_battery_passthrough():
    tool = _load_tool()
    b1 = {"queries": {"q1": 1.0}}
    assert tool.merge_minimums([b1]) == {"q1": 1.0}
