"""bench.py wall-clock budget contract (VERDICT r3 task 1).

Rounds 2 and 3 both lost their driver-captured perf record — r2's JSON
line was too long, r3's run was too long (driver kill at ~16 min vs a
~35-40 min bench). The contract pinned here: bench.py finishes inside
IDEEPCOLOR_BENCH_BUDGET_S by (a) skipping configs whose estimate no
longer fits (recording {name}_skipped), (b) clamping soak durations, and
(c) a hard deadline watchdog that emits the headline line and exits 0
even if a config hangs.
"""

import json
import os
import subprocess
import sys
import time

import bench

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_run_configs_skips_when_budget_spent(monkeypatch):
    monkeypatch.setattr(bench, "DEADLINE", time.time() + bench.EMIT_RESERVE_S
                        + 10.0)        # 10 s of usable budget
    calls = []

    def cheap(extras):
        calls.append("cheap")
        extras["cheap_done"] = True

    def expensive(extras):            # estimate says it can't fit
        calls.append("expensive")

    cheap.__name__ = "bench_cheap"
    expensive.__name__ = "bench_expensive"
    state = {"extras": {}, "cm": None}
    bench.run_configs((cheap, expensive), state,
                      estimates={"bench_cheap": 1, "bench_expensive": 9999})
    assert calls == ["cheap"]
    assert state["extras"]["bench_expensive_skipped"] == "budget"
    assert state["extras"]["stage_secs"]["bench_cheap"] >= 0


def test_run_configs_records_errors_and_continues(monkeypatch):
    monkeypatch.setattr(bench, "DEADLINE", time.time() + 1000.0)

    def boom(extras):
        raise RuntimeError("kaput")

    def after(extras):
        extras["after_ran"] = True

    boom.__name__ = "bench_boom"
    after.__name__ = "bench_after"
    state = {"extras": {}, "cm": None}
    bench.run_configs((boom, after), state, estimates={})
    assert "kaput" in state["extras"]["bench_boom_error"]
    assert state["extras"]["after_ran"]


def test_soaks_skip_on_spent_budget(monkeypatch):
    monkeypatch.setattr(bench, "DEADLINE", time.time())   # budget gone
    extras = {}
    bench.bench_serve_soak(extras)
    assert extras["bench_serve_soak_skipped"] == "budget"
    extras = {}
    bench.bench_recycle_soak(extras)
    assert extras["bench_recycle_soak_skipped"] == "budget"


def test_default_budget_fits_driver_window():
    # the driver killed r3 at ~16 min; the watchdog emits by
    # DEADLINE - EMIT_RESERVE_S and the process exits right after, so
    # the budget itself is the wall-clock bound (r5: 13.5 min, giving
    # the 14-family coverage pass headroom against slow claim handovers)
    assert bench._budget_secs() <= 14 * 60


def test_full_mode_restores_long_soaks(monkeypatch):
    monkeypatch.setenv("IDEEPCOLOR_BENCH_FULL", "1")
    assert bench._full_mode()
    assert bench._budget_secs() > 3600
    monkeypatch.delenv("IDEEPCOLOR_BENCH_FULL")
    assert not bench._full_mode()


def test_skip_count_surfaces_in_compact_line(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    extras = {"bench_serve_soak_skipped": "budget",
              "bench_streaming_skipped": "budget"}
    full = {"metric": "m", "value": 1.0, "unit": "ms", "vs_baseline": 2.0,
            "baseline_torch_cpu_ms": 3.0, "device": "d", **extras}
    bench.emit_results(full, extras)
    out = capsys.readouterr().out.splitlines()
    assert json.loads(out[-1])["n_config_skipped"] == 2


def test_watchdog_emits_and_exits_zero_on_hung_config(tmp_path):
    """End-to-end emit-under-budget: a subprocess arms the real watchdog
    with a 3 s budget, then 'hangs' — the process must still exit 0 by
    itself with a parseable final line flagged budget-exhausted."""
    script = tmp_path / "hang.py"
    script.write_text(f"""
import os, sys, threading, time
sys.path.insert(0, {REPO!r})
import bench
bench.DEADLINE = time.time() + bench.EMIT_RESERVE_S + 3.0
state = {{"extras": {{"dense_path_p50_ms": 55.5}}, "p50": None, "cm": None,
          "device": "testdev", "baseline_ms": None, "emitted": False,
          "emit_lock": threading.Lock()}}
bench._arm_deadline_watchdog(state, bench.DEADLINE)
os.chdir({str(tmp_path)!r})     # BENCH_FULL.json lands here via abspath
bench.os.path.abspath = lambda p: os.path.join({str(tmp_path)!r}, "bench.py")
time.sleep(600)                  # the 'hung dispatch'
""")
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    last = r.stdout.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert len(last) <= bench.HEADLINE_BYTE_BUDGET
    assert parsed["bench_budget_exhausted"] is True
    # degraded headline: falls back to the dense-path p50 + notes why
    assert parsed["value"] == 55.5
    assert "headline_error" in parsed
    on_disk = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert on_disk["baseline_is_fallback"] is True
    assert "budget exhausted" in r.stderr


def test_main_emits_exactly_once_when_watchdog_already_fired():
    import threading
    state = {"extras": {}, "p50": 1.0, "cm": None, "device": "d",
             "baseline_ms": 2.0, "emitted": True,
             "emit_lock": threading.Lock()}
    assert bench._emit_once(state) is False


def test_every_family_preregistered_and_real(monkeypatch):
    """VERDICT r4 task 1: every config family main() drives must be in
    ALL_FAMILIES (pre-registered as skipped at start, so a watchdog exit
    still reports exactly what was never reached) and must exist."""
    for n in ("baseline_torch_cpu", "bench_recycle_soak",
              "bench_click_latency"):
        assert n in bench.ALL_FAMILIES
    for n in bench.CONFIG_ESTIMATES_S:
        assert n in bench.ALL_FAMILIES
        assert callable(getattr(bench, n)), n


def test_preregistered_skip_cleared_when_config_runs(monkeypatch):
    monkeypatch.setattr(bench, "DEADLINE", time.time() + 1000.0)

    def cheap(extras):
        extras["cheap_done"] = True

    cheap.__name__ = "bench_cheap"
    state = {"extras": {"bench_cheap_skipped": "budget"}, "cm": None}
    bench.run_configs((cheap,), state, estimates={"bench_cheap": 1})
    assert "bench_cheap_skipped" not in state["extras"]
    assert state["extras"]["cheap_done"]


def test_quick_tier_trims_reps(monkeypatch):
    monkeypatch.setattr(bench, "QUICK", True)
    assert bench._q(40, 15) == 15
    assert bench._est("bench_http_serving") < \
        bench.CONFIG_ESTIMATES_S["bench_http_serving"][0]
    monkeypatch.setattr(bench, "QUICK", False)
    assert bench._q(40, 15) == 40
