"""bench.py startup wedge-recovery guard (_unwedge_guard).

After an ungraceful kill of a previous TPU process, the next process's
first dispatch can wedge indefinitely on the tunnel; bench arms a watchdog
that fires a tiny "nudge" jax subprocess to unwedge it (CLAUDE.md). These
tests pin the guard's contract without touching a device: the nudge is
monkeypatched out.
"""

import subprocess
import sys
import time

import bench


def test_disarm_before_stall_never_nudges(monkeypatch):
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a))
    disarm = bench._unwedge_guard(stall_s=0.15)
    disarm()
    time.sleep(0.5)
    assert calls == []


def test_stall_fires_nudge_then_disarm_stops_it(monkeypatch):
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append((a, k)))
    disarm = bench._unwedge_guard(stall_s=0.1)
    time.sleep(0.45)          # let the watchdog fire at least once
    disarm()
    n_at_disarm = len(calls)
    time.sleep(0.3)           # thread must exit; no further attempts
    assert 1 <= n_at_disarm <= 5
    assert len(calls) == n_at_disarm
    cmd = calls[0][0][0]
    assert cmd[0] == sys.executable
    assert "import jax" in cmd[-1]


def test_nudge_failure_is_one_clean_line(monkeypatch, capsys):
    def boom(*a, **k):
        raise OSError("no such executable")
    monkeypatch.setattr(subprocess, "run", boom)
    disarm = bench._unwedge_guard(stall_s=0.1)
    time.sleep(0.35)
    disarm()
    time.sleep(0.2)
    err = capsys.readouterr().err
    assert "nudge subprocess failed" in err
    assert "Traceback" not in err
