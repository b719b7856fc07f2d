"""The unified `python -m ideepcolor_tpu` front door."""
import numpy as np
import pytest

from ideepcolor_tpu import __main__ as umain
from ideepcolor_tpu import __version__


def test_help_and_version(capsys):
    assert umain.main([]) == 0
    out = capsys.readouterr().out
    assert "serve" in out and "train" in out and __version__ in out
    assert umain.main(["--version"]) == 0
    assert __version__ in capsys.readouterr().out


def test_unknown_command(capsys):
    assert umain.main(["frobnicate"]) == 2
    assert "frobnicate" in capsys.readouterr().err


def test_dispatches_to_eval(tmp_path):
    """A real dispatch through the front door: the eval app runs a tiny
    sweep end-to-end (random weights, 2 images, 2 hint counts)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray((rng.random((40, 40, 3)) * 255)
                        .astype(np.uint8)).save(tmp_path / f"im{i}.jpg")
    rc = umain.main(["eval", str(tmp_path), "--size", "32",
                     "--batch", "2", "--hints", "0,2"])
    assert rc == 0


def test_fidelity_command_listed_and_lists_artifacts(capsys):
    import ideepcolor_tpu.__main__ as m
    assert "fidelity" in m._COMMANDS
    assert m.main(["fidelity", "--list"]) == 0
    out = capsys.readouterr().out
    for name in ("caffemodel-main-256", "goldens-256", "pth-modern",
                 "notebooks"):
        assert name in out


def test_fidelity_reports_pass_fail_lines(monkeypatch, capsys):
    """One PASS/FAIL line per artifact; nonzero exit iff any failed;
    REAL-checkpoint env hooks surface in the header."""
    import subprocess
    from ideepcolor_tpu.apps import fidelity

    class R:
        def __init__(self, rc):
            self.returncode = rc
            self.stdout = "1 failed in 0.1s"
            self.stderr = ""

    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return R(0 if "goldens" in cmd[3] else 1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("IDEEPCOLOR_REAL_PTH", "/x/pytorch.pth")
    rc = fidelity.main(["--only", "goldens-64,pth-modern"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "REAL checkpoints" in out and "/x/pytorch.pth" in out
    assert "PASS  goldens-64" in out
    assert "FAIL  pth-modern" in out
    assert len(calls) == 2

    calls.clear()
    monkeypatch.delenv("IDEEPCOLOR_REAL_PTH")
    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw:
                        calls.append(cmd) or R(0))
    rc = fidelity.main(["--only", "goldens-64"])
    out = capsys.readouterr().out
    assert rc == 0 and "fixture mode" in out and "ALL PASS" in out
