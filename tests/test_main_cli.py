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
