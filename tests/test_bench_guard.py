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
    # sitting in the device-claim queue blocking the next TPU process —
    # and -k makes `timeout` SIGKILL a nudge too wedged to process the
    # SIGINT (an uninterruptible futex wait, the very failure mode the
    # guard handles)
    assert cmd[:6] == ["timeout", "-k", "20", "-s", "INT", "400"]
    assert calls[0][1].get("start_new_session") is True
    assert sys.executable in cmd
    assert "import jax" in cmd[-1]


def test_nudge_timeout_kill_is_logged(monkeypatch, capsys):
    class _HungProc(_FakeProc):
        pid = 999999

        def wait(self, timeout=None):
            if timeout is not None and timeout > 60 and not self.killed:
                raise subprocess.TimeoutExpired("nudge", timeout)
            return 0

    procs = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: procs.append(_HungProc()) or procs[-1])
    # the whole nudge process GROUP must be SIGKILLed: killing only the
    # `timeout` wrapper would orphan a truly-wedged python in the
    # device-claim queue (the 14-minute-orphan failure the guard
    # exists to prevent)
    from ideepcolor_tpu.utils import unwedge
    killed_groups = []
    monkeypatch.setattr(
        unwedge.os, "killpg",
        lambda pgid, sig: killed_groups.append((pgid, sig))
        or procs[0].kill())
    disarm = bench._unwedge_guard(stall_s=0.1)
    deadline = time.time() + 5.0
    while not procs and time.time() < deadline:
        time.sleep(0.02)
    disarm()
    disarm.thread.join(5.0)
    err = capsys.readouterr().err
    assert procs and procs[0].killed
    assert killed_groups and killed_groups[0][0] == 999999
    assert "timed out" in err and "process group" in err
    assert "Traceback" not in err


def test_nudge_timeout_killpg_falls_back_to_wrapper_kill(monkeypatch):
    """A nudge group already reaped between wait() and killpg() (or a
    permission oddity) must not crash the watchdog: fall back to killing
    the wrapper."""
    class _HungProc(_FakeProc):
        pid = 999998

        def wait(self, timeout=None):
            if timeout is not None and timeout > 60 and not self.killed:
                raise subprocess.TimeoutExpired("nudge", timeout)
            return 0

    procs = []
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: procs.append(_HungProc()) or procs[-1])
    from ideepcolor_tpu.utils import unwedge

    def _gone(pgid, sig):
        raise ProcessLookupError(pgid)
    monkeypatch.setattr(unwedge.os, "killpg", _gone)
    disarm = bench._unwedge_guard(stall_s=0.1)
    deadline = time.time() + 5.0
    while not procs and time.time() < deadline:
        time.sleep(0.02)
    disarm()
    disarm.thread.join(5.0)
    assert procs and procs[0].killed


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


def test_warm_first_dispatch_arms_env_stall_and_disarms(monkeypatch):
    """The shared one-call protocol (train/eval CLIs): arm with the env
    stall, complete a tiny dispatch, disarm even on failure."""
    from ideepcolor_tpu.utils import unwedge
    seen = {}
    real_guard = unwedge.guard

    def spy(stall_s, label="first dispatch"):
        seen["stall_s"] = stall_s
        d = real_guard(stall_s=stall_s, label=label)
        seen["disarm"] = d
        return d
    monkeypatch.setattr(unwedge, "guard", spy)
    monkeypatch.setenv("IDEEPCOLOR_UNWEDGE_STALL_S", "123")
    unwedge.warm_first_dispatch()
    assert seen["stall_s"] == 123.0
    seen["disarm"].thread.join(5.0)
    assert not seen["disarm"].thread.is_alive()


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
    assert calls[0][0][0][:6] == ["timeout", "-k", "20", "-s", "INT",
                                  "400"]
    assert "train boot stalled" in capsys.readouterr().err
