"""Unit tests for the relay-health probe gate (tools/relay_probe.py).

VERDICT r4 weak #5: the gate's failure paths — timeout, child crash,
CPU-only no-op, threshold edges — are exactly the paths that matter
during a relay outage; they are pure logic over a subprocess result, so
they are tested by monkeypatching subprocess.run (no device, no network).
"""

import json
import subprocess

import pytest

from tools import relay_probe


class _Result:
    def __init__(self, stdout="", stderr="", returncode=0):
        self.stdout = stdout
        self.stderr = stderr
        self.returncode = returncode


def _fake_run(rec):
    def run(*a, **k):
        return _Result(stdout=json.dumps(rec) + "\n")

    return run


def test_probe_timeout_is_unhealthy(monkeypatch):
    def run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

    monkeypatch.setattr(relay_probe.subprocess, "run", run)
    rec = relay_probe.run_probe(timeout_s=7)
    assert rec["relay_healthy"] is False
    assert rec["probe_ms"] is None
    assert "timed out after 7s" in rec["probe_note"]


def test_probe_crash_is_unhealthy(monkeypatch):
    monkeypatch.setattr(
        relay_probe.subprocess, "run",
        lambda *a, **k: _Result(stdout="", stderr="Traceback: boom",
                                returncode=1))
    rec = relay_probe.run_probe()
    assert rec["relay_healthy"] is False
    assert "probe crashed" in rec["probe_note"]
    assert "boom" in rec["probe_note"]


def test_probe_cpu_only_is_noop(monkeypatch):
    monkeypatch.setattr(relay_probe.subprocess, "run", _fake_run(
        {"load_s": 0.1, "iter_ms": [1.0, 1.0, 1.0, 1.0],
         "platform": "cpu"}))
    rec = relay_probe.run_probe()
    assert rec["relay_healthy"] is True
    assert rec["probe_ms"] is None
    assert "no accelerator" in rec["probe_note"]


@pytest.mark.parametrize("iters,healthy", [
    ([40.0, 45.0, 50.0, 38.0], True),     # healthy band (32-54 ms)
    ([149.0, 150.0, 150.0, 149.0], True),  # median == threshold: healthy
    ([500.0, 480.0, 510.0, 490.0], False),  # outage collapse
    ([40.0, 40.0, 151.0, 152.0], False),   # median just over threshold
])
def test_probe_threshold(monkeypatch, iters, healthy):
    monkeypatch.setattr(relay_probe.subprocess, "run", _fake_run(
        {"load_s": 12.0, "iter_ms": iters, "platform": "tpu"}))
    rec = relay_probe.run_probe()
    assert rec["relay_healthy"] is healthy
    assert rec["probe_load_s"] == 12.0
    assert rec["probe_ms"] == sorted(iters)[2]


def test_gate_refuses_sick_window(monkeypatch):
    monkeypatch.setattr(relay_probe, "run_probe", lambda **k: {
        "relay_healthy": False, "probe_ms": 400.0, "probe_load_s": 200.0,
        "probe_note": "sick"})
    with pytest.raises(SystemExit, match="relay unhealthy"):
        relay_probe.gate(force=False)
    # --force proceeds and returns the (sick) stamp for the record
    rec = relay_probe.gate(force=True)
    assert rec["relay_healthy"] is False and rec["probe_ms"] == 400.0


def test_gate_skip_records_unprobed(monkeypatch):
    def boom(**k):
        raise AssertionError("probe must not run with skip=True")

    monkeypatch.setattr(relay_probe, "run_probe", boom)
    rec = relay_probe.gate(skip=True)
    assert rec["relay_healthy"] is None
    assert "skipped" in rec["probe_note"]
