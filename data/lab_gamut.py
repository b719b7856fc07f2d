"""Drop-in module for reference-style code: re-exports the gamut helpers
under the reference's import path (ref usage: `from data import lab_gamut`
in ui/gui_draw.py:11)."""

from ideepcolor_tpu.data.lab_gamut import (  # noqa: F401
    abGrid,
    lab2rgb_1d,
    qcolor2lab_1d,
    rgb2lab_1d,
    snap_ab,
)
