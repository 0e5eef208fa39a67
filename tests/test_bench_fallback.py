"""Orchestrator fallback chain of bench.py (VERDICT r4 item 1).

bench.py's orchestrator must never publish 0.0 while ANY real measurement
source exists.  These tests exercise the tier machinery without a device:
tiers 1-2 are forced to fail (a subprocess that exits nonzero) and the
warm-watcher tier is fed a synthetic load_trail.jsonl, checking both the
fresh-row relay and the too-stale refusal.
"""

import datetime
import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # point the module at a private trail copy via _HERE redirection
    os.makedirs(tmp_path / "benchmarks", exist_ok=True)
    monkeypatch.setattr(mod, "_HERE", str(tmp_path))
    # isolate the capture lock from any live watcher/patrol on this host
    monkeypatch.setenv("PYFFT_CAPTURE_LOCK", str(tmp_path / "cap.lock"))
    monkeypatch.delenv("PYFFT_LOCK_HELD", raising=False)
    return mod


def _write_trail(bench, rows):
    path = os.path.join(bench._HERE, "benchmarks", "load_trail.jsonl")
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _row(age_s, ms=0.5, gbs=800.0):
    ts = (datetime.datetime.now(datetime.timezone.utc)
          - datetime.timedelta(seconds=age_s)).isoformat(timespec="seconds")
    return {"ts": ts, "headline_ms": ms, "copy_gbs": gbs,
            "kernel_io_gbs": 500.0, "kernel_vs_copy": 0.6, "quiet": False}


def test_watcher_line_fresh(bench):
    import time
    _write_trail(bench, [_row(3600 * 3), _row(10)])
    line = bench._watcher_line(time.time() - 120, time.time())
    assert line is not None
    assert line["value"] > 0
    assert line["extra"]["degraded"] == "warm-watcher-proxy"
    assert line["extra"]["fresh_during_bench"] is True
    # 0.5 ms on the headline config = 2014 GF, clamped at the roofline
    assert line["value"] == pytest.approx(
        bench.EFF_FLOPS / max(0.5e-3, bench.DT_PHYS) / 1e9, rel=1e-3)


def test_watcher_line_stale_accepted_within_hour(bench):
    import time
    _write_trail(bench, [_row(1800)])
    line = bench._watcher_line(time.time(), time.time())  # no poll budget
    assert line is not None
    assert line["extra"]["fresh_during_bench"] is False
    assert line["extra"]["row_age_s"] > 1500


def test_watcher_line_refuses_dead_watcher(bench):
    import time
    _write_trail(bench, [_row(3600 * 2)])
    assert bench._watcher_line(time.time(), time.time()) is None


def test_watcher_line_clamps_at_roofline(bench):
    import time
    _write_trail(bench, [_row(10, ms=0.01)])   # impossibly fast row
    line = bench._watcher_line(time.time() - 60, time.time())
    assert line["value"] <= line["extra"]["roofline_gflops"] + 0.1


def test_orchestrator_falls_through_to_watcher(bench, monkeypatch, capsys):
    """Tiers 1-2 fail (subprocess exits 1) -> tier 3 publishes the row."""
    import subprocess

    _write_trail(bench, [_row(5)])
    monkeypatch.setattr(bench, "TIMEOUT_S", 8)

    def fake_spawn(tier, budget_s, status_path):
        return subprocess.Popen(
            [sys.executable, "-c", "import sys; sys.exit(1)"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    monkeypatch.setattr(bench, "_spawn_tier", fake_spawn)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    line = json.loads(out)
    assert line["value"] > 0
    assert line["extra"]["tier"] == "warm-watcher"


def test_orchestrator_zero_only_when_no_source(bench, monkeypatch, capsys):
    import subprocess

    _write_trail(bench, [_row(3600 * 2)])      # too stale to claim
    monkeypatch.setattr(bench, "TIMEOUT_S", 8)

    def fake_spawn(tier, budget_s, status_path):
        return subprocess.Popen(
            [sys.executable, "-c", "import sys; sys.exit(1)"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    monkeypatch.setattr(bench, "_spawn_tier", fake_spawn)
    with pytest.raises(SystemExit):
        bench.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 0.0


def test_capture_lock_free_and_flagged(bench, monkeypatch):
    # free lock: acquired immediately (returns the held fd)
    f = bench._acquire_capture_lock(max_wait_s=5)
    assert f is not None
    f.close()
    # spawned-by-holder flag: skipped entirely
    monkeypatch.setenv("PYFFT_LOCK_HELD", "1")
    assert bench._acquire_capture_lock(max_wait_s=5) is None


def test_capture_lock_busy_bounded_wait(bench):
    import fcntl
    import time

    path = os.environ["PYFFT_CAPTURE_LOCK"]
    holder = open(path, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    t0 = time.monotonic()
    f = bench._acquire_capture_lock(max_wait_s=0.5)
    waited = time.monotonic() - t0
    # proceeds despite the busy lock, within the bound (+poll slack)
    assert f is not None
    assert waited < 6.0
    holder.close()
    f.close()
