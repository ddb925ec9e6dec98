"""The host probe's pure surface: /proc/stat field indices and delta
arithmetic (the round-14 accrual-rule findings turned on exactly these
— a steal reading sampled from the wrong field or window silently
reads ~0 and exonerates a contended host), plus the ledger-line
contract the bench protocol consumes (one sorted-key JSON line;
--record appends, plain run doesn't). No Spark, no real sampling —
the heavy probes are monkeypatched."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "host_probe", os.path.join(_REPO, "tools", "host_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("host_probe", mod)
    spec.loader.exec_module(mod)
    return mod


def test_stat_field_indices_match_proc_stat_layout():
    """user nice system idle iowait irq softirq steal ... — iowait is
    field 4 and steal is field 7 after dropping the 'cpu' label. A
    transposition here is the silent-zero failure mode the round-14
    review caught once already."""
    hp = _load()
    assert hp._FIELD_IOWAIT == 4
    assert hp._FIELD_STEAL == 7


def test_pct_of_delta_math():
    hp = _load()
    # 100 jiffies elapsed in total; 25 of them in the probed field.
    before = [0] * 10
    after = [10, 5, 10, 40, 25, 0, 0, 10, 0, 0]
    assert hp._pct_of_delta(before, after, 4) == 25.0
    assert hp._pct_of_delta(before, after, 7) == 10.0


def test_pct_of_delta_zero_window_does_not_divide_by_zero():
    hp = _load()
    snap = [100] * 10
    assert hp._pct_of_delta(snap, snap, 7) == 0.0


def test_live_stat_snap_reads_proc_stat():
    """The real /proc/stat aggregate line parses into >= 8 integer
    fields (steal exists on this kernel) — guards the probe against a
    container that truncates the cpu line."""
    hp = _load()
    snap = hp._stat_snap()
    assert len(snap) >= 8
    assert all(isinstance(v, int) for v in snap)


def _stub_probes(hp, monkeypatch):
    monkeypatch.setattr(hp, "disk_probe", lambda: (17.5, 1000.0))
    monkeypatch.setattr(hp, "cpu_mt_probe", lambda: (0.6, 3.5))
    monkeypatch.setattr(hp, "cpu_probe", lambda: 0.3)
    monkeypatch.setattr(hp, "iowait_sample", lambda: 0.1)


def test_main_prints_one_sorted_json_line(capsys, monkeypatch, tmp_path):
    hp = _load()
    _stub_probes(hp, monkeypatch)
    monkeypatch.setattr(hp, "_REPO", str(tmp_path))
    hp.main([])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    row = json.loads(out[0])
    # the exact key set the bench protocol reads (bench_floor's
    # probes-first rule: steal_pct + cpu_mt_probe_sec + cpu_probe_sec)
    assert set(row) == {
        "ts",
        "cpu_probe_sec",
        "cpu_mt_probe_sec",
        "disk_warm_mb",
        "disk_warm_mbps",
        "steal_pct",
        "iowait_pct",
        "nproc",
    }
    assert list(row) == sorted(row)  # sort_keys: ledger lines diff cleanly
    # no ledger write without --record
    assert not (tmp_path / "HOST_PROBES.jsonl").exists()


def test_record_appends_to_ledger(monkeypatch, tmp_path, capsys):
    hp = _load()
    _stub_probes(hp, monkeypatch)
    monkeypatch.setattr(hp, "_REPO", str(tmp_path))
    hp.main(["--record"])
    hp.main(["--record"])
    capsys.readouterr()
    lines = (tmp_path / "HOST_PROBES.jsonl").read_text().splitlines()
    assert len(lines) == 2  # appends, never truncates
    assert json.loads(lines[0])["steal_pct"] == 3.5
