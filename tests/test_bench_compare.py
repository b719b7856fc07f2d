"""Regression-net contract for scripts/bench_compare.py (VERDICT r2
weak #3: round-over-round swings must be attributed, not just reported).
"""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(REPO, "scripts", "bench_compare.py"))
bc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bc)


def test_transport_swing_is_normalized_away():
    """The r01->r02 case: drag rate 'drops' 37% while the RPC floor rises
    proportionally -> floor-normalized share is unchanged -> not a
    regression."""
    old = {"rpc_floor_p50_ms": 25.0, "drag_pipeline_events_per_sec": 117.6}
    new = {"rpc_floor_p50_ms": 39.5, "drag_pipeline_events_per_sec": 74.4}
    rows, regressions = bc.compare(old, new)
    row = next(r for r in rows if r["metric"] ==
               "drag_pipeline_events_per_sec")
    assert abs(row["norm_pct"]) < 12.0
    assert regressions == 0


def test_real_code_regression_survives_normalization():
    """Same floor, device-bound throughput halves -> REGRESSED."""
    old = {"rpc_floor_p50_ms": 25.0,
           "teacher_batch128_bf16_imgs_per_sec": 1145.0}
    new = {"rpc_floor_p50_ms": 25.0,
           "teacher_batch128_bf16_imgs_per_sec": 570.0}
    rows, regressions = bc.compare(old, new)
    row = next(r for r in rows if "teacher" in r["metric"])
    assert row["verdict"] == "REGRESSED" and regressions == 1


def test_sync_latency_compared_on_floor_residual():
    """Click p50 36->52 ms looks like -44%, but the floor moved 25->42:
    the residual (11 vs 10 ms) is flat -> not a regression."""
    old = {"rpc_floor_p50_ms": 25.0, "value": 36.0}
    new = {"rpc_floor_p50_ms": 42.0, "value": 52.0}
    rows, regressions = bc.compare(old, new)
    row = next(r for r in rows if r["metric"] == "value")
    assert row["verdict"] in ("ok", "noise (within in-run spread)")
    assert regressions == 0


def test_residual_regression_is_flagged():
    """Floor flat, click residual triples -> flagged."""
    old = {"rpc_floor_p50_ms": 25.0, "value": 36.0}
    new = {"rpc_floor_p50_ms": 25.0, "value": 60.0}
    rows, regressions = bc.compare(old, new)
    row = next(r for r in rows if r["metric"] == "value")
    assert row["verdict"] == "REGRESSED"


def test_in_run_spread_classifies_noise():
    """A swing inside the other run's recorded rep spread is noise even
    when the normalized delta is large."""
    old = {"rpc_floor_p50_ms": 25.0, "streaming_fps": 110.0,
           "streaming_fps_spread": [70.0, 115.0]}
    new = {"rpc_floor_p50_ms": 25.0, "streaming_fps": 74.0}
    rows, regressions = bc.compare(old, new)
    row = next(r for r in rows if r["metric"] == "streaming_fps")
    assert row["verdict"].startswith("noise")
    assert regressions == 0


def test_quality_uses_absolute_db_tolerance():
    old = {"eval_auc_db": 21.49}
    new = {"eval_auc_db": 21.40}          # within 0.15 dB
    rows, regressions = bc.compare(old, new)
    assert regressions == 0
    new = {"eval_auc_db": 20.9}           # 0.59 dB drop
    rows, regressions = bc.compare(old, new)
    assert regressions == 1


def test_cli_runs_and_strict_exit(tmp_path, capsys):
    import json
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"rpc_floor_p50_ms": 25.0, "value": 36.0,
                             "eval_auc_db": 21.5}))
    b.write_text(json.dumps({"rpc_floor_p50_ms": 25.0, "value": 37.0,
                             "eval_auc_db": 21.5}))
    assert bc.main([str(a), str(b), "--strict"]) == 0
    out = capsys.readouterr().out
    assert "value" in out and "eval_auc_db" in out
    b.write_text(json.dumps({"rpc_floor_p50_ms": 25.0, "value": 80.0}))
    assert bc.main([str(a), str(b), "--strict"]) == 1
