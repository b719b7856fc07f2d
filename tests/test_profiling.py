"""utils.profiling.device_op_summary — the per-HLO audit tool behind the
MXU/fusion claims in docs/BENCHMARKS.md. Parsed format pinned with a
synthetic xplane-style trace dump (device lane keyed by a 'device:'
process_name metadata event; host lanes must be excluded)."""
import gzip
import json
import os

import numpy as np
import pytest

from ideepcolor_tpu.utils.profiling import StageTimer, device_op_summary


def _write_trace(log_dir, events):
    d = os.path.join(log_dir, "plugins", "profile", "run1")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_device_op_summary_groups_and_reps(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0 (device: 0)"}},
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "python host threads"}},
        # device ops (dur in us): 2 reps of the same program
        {"ph": "X", "pid": 7, "name": "convolution.1", "dur": 400.0},
        {"ph": "X", "pid": 7, "name": "convolution.1", "dur": 400.0},
        {"ph": "X", "pid": 7, "name": "add_convert_fusion.2", "dur": 200.0},
        {"ph": "X", "pid": 7, "name": "add_convert_fusion.2", "dur": 200.0},
        {"ph": "X", "pid": 7, "name": "copy.3", "dur": 100.0},
        {"ph": "X", "pid": 7, "name": "copy.3", "dur": 100.0},
        # jit_ wrapper spans and host-pid events must be excluded
        {"ph": "X", "pid": 7, "name": "jit_fn", "dur": 9999.0},
        {"ph": "X", "pid": 3, "name": "convolution.1", "dur": 5555.0},
    ]
    _write_trace(str(tmp_path), events)
    s = device_op_summary(str(tmp_path), reps=2)
    assert abs(s["total_ms_per_rep"] - 0.7) < 1e-9   # (800+400+200)us/2
    assert abs(s["groups"]["convolution"] - 0.4) < 1e-9
    assert abs(s["groups"]["fusion"] - 0.2) < 1e-9
    assert abs(s["groups"]["copy/slice"] - 0.1) < 1e-9
    names = [n for n, _ in s["top_ops"]]
    assert "jit_fn" not in names
    assert names[0] == "convolution.1"


def test_device_op_summary_missing_trace(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_op_summary(str(tmp_path))


def test_stage_timer_percentiles():
    t = StageTimer()
    for ms in (10, 20, 30, 40, 50):
        t.samples["x"].append(ms / 1000.0)
    rep = t.report()
    assert "x" in rep and "30.00" in rep            # p50 of the five
