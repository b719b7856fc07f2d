"""Host-facing gamut helpers: 1-d color conversions, gamut snap, ab grid.

API-compatible stand-in for the reference's ``data/lab_gamut.py`` (snap_ab,
rgb2lab_1d, lab2rgb_1d, abGrid — ref: data/lab_gamut.py:6-90), backed by the
jitted device ops in :mod:`ideepcolor_tpu.ops.gamut` instead of per-call
skimage CPU loops. ``abGrid.update_gamut`` — the 221x221 round-trip the
reference recomputes on CPU at every gamut redraw (ref :66-78) — is one
fused device program here, memoized per L.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import colorspace as _cs
from ..ops import gamut as _gamut

# jitted single-color converters: calling the colorspace ops eagerly on a
# (3,) array dispatches every op as a separate device RPC (~20 per call
# on a tunneled TPU, once per GUI color pick); jitted they are one.
# rgb->lab reuses the shared engine.pipeline.rgb_to_lab_dev program.
_lab2rgb_j = jax.jit(_cs.lab_to_rgb)


def rgb2lab_1d(in_rgb) -> np.ndarray:
    """1-d uint8-scale RGB -> Lab (ref data/lab_gamut.py:12-15)."""
    from ..engine.pipeline import rgb_to_lab_dev
    rgb = np.asarray(in_rgb, np.float64)
    if rgb.max() > 1.0 or np.asarray(in_rgb).dtype == np.uint8:
        rgb = rgb / 255.0
    return np.asarray(rgb_to_lab_dev(jnp.asarray(rgb, jnp.float32)))


def lab2rgb_1d(in_lab, clip: bool = True, dtype: str = "uint8"):
    """1-d Lab -> RGB (ref data/lab_gamut.py:18-25)."""
    rgb = np.asarray(_lab2rgb_j(jnp.asarray(in_lab, jnp.float32)))
    if clip:
        rgb = np.clip(rgb, 0, 1)
    if dtype == "uint8":
        rgb = np.round(rgb * 255).astype("uint8")
    return rgb


def qcolor2lab_1d(qc) -> np.ndarray:
    """QColor -> Lab (ref data/lab_gamut.py:6-9)."""
    return rgb2lab_1d(np.array([qc.red(), qc.green(), qc.blue()], np.uint8))


def snap_ab(input_l, input_rgb, return_type: str = "rgb"):
    """Project a picked color into the sRGB gamut at lightness input_l
    (ref data/lab_gamut.py:28-52). One jitted while_loop on device."""
    rgb = np.asarray(
        _gamut.snap_ab(float(input_l),
                       np.asarray(input_rgb, np.float32))).astype(np.uint8)
    if return_type == "rgb":
        return rgb
    return rgb2lab_1d(rgb)


class abGrid:
    """The gamut widget's ab plane (ref data/lab_gamut.py:55-90)."""

    def __init__(self, gamut_size: int = 110, D: int = 1):
        self.D = D
        self.gamut_size = gamut_size
        r = np.arange(-gamut_size, gamut_size + D, D)
        self.vals_b, self.vals_a = np.meshgrid(r, r)
        self.pts_full_grid = np.stack([self.vals_a, self.vals_b], axis=2)
        self.A, self.B = self.pts_full_grid.shape[:2]
        self.AB = self.A * self.B
        self._cache: dict[float, tuple[np.ndarray, np.ndarray]] = {}

    def update_gamut(self, l_in):
        key = round(float(l_in), 3)
        if key not in self._cache:
            if len(self._cache) >= 512:    # bounded: ~200 KB per entry,
                self._cache.clear()        # unbounded would grow all
                                           # session (every pixel a new L)
            masked_rgb, mask = _gamut.ab_gamut_mask(
                float(l_in), gamut_size=self.gamut_size, D=self.D)
            self._cache[key] = (np.asarray(masked_rgb), np.asarray(mask))
        self.masked_rgb, self.mask = self._cache[key]
        self.pts_rgb = self.masked_rgb
        return self.masked_rgb, self.mask

    def ab2xy(self, a, b):
        return self.gamut_size + b, self.gamut_size + a

    def xy2ab(self, x, y):
        return y - self.gamut_size, x - self.gamut_size
