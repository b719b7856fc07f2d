"""bench.py result-emission contract (emit_results).

VERDICT r2 weak #1: the round-2 bench's single JSON line outgrew the
driver's ~2000-char tail capture and arrived truncated (parsed: null).
The contract now: full results go to BENCH_FULL.json and an early
"FULL: {...}" stdout line; the FINAL stdout line is a compact headline
JSON that always parses and stays under HEADLINE_BYTE_BUDGET bytes.
"""

import json

import bench


def _run(extras, tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    full = {"metric": "m", "value": 1.0, "unit": "ms", "vs_baseline": 2.0,
            "baseline_torch_cpu_ms": 3.0, "device": "d", **extras}
    bench.emit_results(full, extras)
    out = capsys.readouterr().out.splitlines()
    return full, out


def test_final_line_parses_and_fits(tmp_path, monkeypatch, capsys):
    extras = {k: 1.23 for k in bench.HEADLINE_KEYS}
    extras["some_other_field"] = "x" * 500     # belongs in FULL only
    full, out = _run(extras, tmp_path, monkeypatch, capsys)
    last = out[-1]
    parsed = json.loads(last)
    assert len(last) <= bench.HEADLINE_BYTE_BUDGET
    assert parsed["value"] == 1.0 and parsed["unit"] == "ms"
    assert "vs_baseline" in parsed and "device" in parsed
    assert parsed["p95_ms"] == 1.23
    assert "some_other_field" not in parsed


def test_full_results_on_early_line_and_disk(tmp_path, monkeypatch, capsys):
    extras = {"streaming_fps": 70.1, "obscure_detail": "kept"}
    full, out = _run(extras, tmp_path, monkeypatch, capsys)
    full_lines = [ln for ln in out if ln.startswith("FULL: ")]
    assert len(full_lines) == 1
    assert json.loads(full_lines[0][len("FULL: "):]) == full
    on_disk = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert on_disk == full
    assert out[-1] != full_lines[0]            # compact line printed last


def test_oversize_extras_are_dropped_not_truncated(tmp_path, monkeypatch,
                                                   capsys):
    # every headline key huge: line must still parse and fit by dropping
    extras = {k: "y" * 200 for k in bench.HEADLINE_KEYS}
    _, out = _run(extras, tmp_path, monkeypatch, capsys)
    parsed = json.loads(out[-1])
    assert len(out[-1]) <= bench.HEADLINE_BYTE_BUDGET
    assert parsed["value"] == 1.0


def test_config_error_count_surfaces(tmp_path, monkeypatch, capsys):
    extras = {"bench_streaming_error": "boom", "bench_student_error": "pow"}
    _, out = _run(extras, tmp_path, monkeypatch, capsys)
    assert json.loads(out[-1])["n_config_errors"] == 2
