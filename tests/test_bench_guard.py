"""bench.py startup wedge-recovery guard (_unwedge_guard).

After an ungraceful kill of a previous TPU process, the next process's
first dispatch can wedge indefinitely on the tunnel; bench arms a watchdog
that fires a tiny "nudge" jax subprocess to unwedge it (CLAUDE.md). These
tests pin the guard's contract without touching a device: the nudge is
monkeypatched out. Assertion ordering joins the watchdog thread after
disarm (exposed as ``disarm.thread``) so counts can't race the final
in-flight wakeup.
"""

import subprocess
import sys
import time

import bench


class _FakeProc:
    """Stands in for the nudge Popen: finishes instantly."""

    def __init__(self):
        self.killed = False

    def wait(self, timeout=None):
        return 0

    def kill(self):
        self.killed = True


def test_disarm_before_stall_never_nudges(monkeypatch):
    calls = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: calls.append(a) or _FakeProc())
    disarm = bench._unwedge_guard(stall_s=0.15)
    disarm()
    disarm.thread.join(5.0)
    assert not disarm.thread.is_alive()
    assert calls == []


def test_stall_fires_nudge_then_disarm_stops_it(monkeypatch):
    calls = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: calls.append((a, k)) or _FakeProc())
    disarm = bench._unwedge_guard(stall_s=0.1)
    deadline = time.time() + 5.0
    while not calls and time.time() < deadline:
        time.sleep(0.02)
    disarm()
    disarm.thread.join(5.0)
    assert not disarm.thread.is_alive()
    n_at_disarm = len(calls)
    time.sleep(0.3)           # thread has exited; no further attempts
    assert 1 <= n_at_disarm <= 5
    assert len(calls) == n_at_disarm
    cmd = calls[0][0][0]
    # self-limiting wrapper: an orphaned nudge (deadline watchdog
    # os._exit) must time itself out GRACEFULLY (SIGINT) instead of
    # sitting in the device-claim queue blocking the next TPU process
    assert cmd[:3] == ["timeout", "-s", "INT"]
    assert sys.executable in cmd
    assert "import jax" in cmd[-1]


def test_nudge_timeout_kill_is_logged(monkeypatch, capsys):
    class _HungProc(_FakeProc):
        def wait(self, timeout=None):
            if timeout is not None and timeout > 60 and not self.killed:
                raise subprocess.TimeoutExpired("nudge", timeout)
            return 0

    procs = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: procs.append(_HungProc()) or procs[-1])
    disarm = bench._unwedge_guard(stall_s=0.1)
    deadline = time.time() + 5.0
    while not procs and time.time() < deadline:
        time.sleep(0.02)
    disarm()
    disarm.thread.join(5.0)
    err = capsys.readouterr().err
    assert procs and procs[0].killed
    assert "timed out" in err
    assert "Traceback" not in err


def test_nudge_failure_is_one_clean_line(monkeypatch, capsys):
    def boom(*a, **k):
        raise OSError("no such executable")
    monkeypatch.setattr(subprocess, "Popen", boom)
    disarm = bench._unwedge_guard(stall_s=0.1)
    time.sleep(0.35)
    disarm()
    disarm.thread.join(5.0)
    err = capsys.readouterr().err
    assert "nudge subprocess failed" in err
    assert "Traceback" not in err


def test_utils_unwedge_guard_label_and_attempts(monkeypatch, capsys):
    """The shared guard (utils/unwedge.py — also armed by the train/eval
    CLIs) honors label + attempts and fires the same self-limited nudge."""
    from ideepcolor_tpu.utils import unwedge
    calls = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: calls.append((a, k)) or _FakeProc())
    disarm = unwedge.guard(stall_s=0.05, attempts=2, label="train boot")
    deadline = time.time() + 5.0
    while len(calls) < 2 and time.time() < deadline:
        time.sleep(0.02)
    disarm()
    disarm.thread.join(5.0)
    assert len(calls) == 2          # attempts honored, then thread ends
    assert calls[0][0][0][:3] == ["timeout", "-s", "INT"]
    assert "train boot stalled" in capsys.readouterr().err
