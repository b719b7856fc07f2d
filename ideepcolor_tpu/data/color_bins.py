"""Quantized ab-gamut bin tables.

The reference ships three tiny .npy tables (ref: data/color_bins/):
  * ``pts_grid``    (529, 2) — the full 23x23 ab grid, step 10, [-110, 110],
  * ``in_hull``     (529,)  bool — which grid cells fall inside the convex
    hull of empirical ImageNet ab values (a constant of the published model,
    NOT derivable from the sRGB gamut: only 229 bin centers are strictly
    in-gamut, the model's hull keeps 313),
  * ``pts_in_hull`` (313, 2) = pts_grid[in_hull].

The grid is generated programmatically; the 529-bit hull membership mask is
embedded as a packed constant so the framework is self-contained. An external
npy (e.g. the reference's own files) can be loaded instead via
``get_bins(path=...)`` for bit-identical interop.

Grid ordering note: the .npy tables iterate a slowly / b fast, while the
torch backend builds its own grid in-code with np.meshgrid ordering (b slow /
a fast, ref: data/colorize_image.py:213). ``make_grid(order=...)`` provides
both so each consumer keeps its reference convention.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

GRID_STEP = 10
GRID_LIM = 110
GRID_SIDE = 23          # (-110..110 step 10)
GRID_SIZE = GRID_SIDE * GRID_SIDE   # 529
NUM_IN_HULL = 313

# 529-bit hull-membership mask, packed MSB-first (np.packbits layout).
_IN_HULL_HEX = (
    "0000000000000003e0003fc001ff800fff003fff00fffe03fffc07fff81ffff07fffe1"
    "ffff83ffff0ffffe3ffffc7ffff1ffffe3ffffc7ffff0ffffe07fe0000000000"
)


def make_grid(order: str = "ab") -> np.ndarray:
    """Full 529x2 ab grid. order='ab': a slow/b fast (the .npy convention);
    order='ba': meshgrid convention used in-code by the torch backends."""
    r = np.arange(-GRID_LIM, GRID_LIM + GRID_STEP, GRID_STEP, dtype=np.int64)
    if order == "ab":
        a, b = np.meshgrid(r, r, indexing="ij")
    else:
        b, a = np.meshgrid(r, r, indexing="ij")
    return np.stack([a.ravel(), b.ravel()], axis=1)


def make_in_hull() -> np.ndarray:
    mask = np.unpackbits(np.frombuffer(bytes.fromhex(_IN_HULL_HEX), np.uint8))
    return mask[:GRID_SIZE].astype(bool)


@dataclasses.dataclass(frozen=True)
class ColorBins:
    pts_grid: np.ndarray     # (529, 2) int64
    in_hull: np.ndarray      # (529,) bool
    pts_in_hull: np.ndarray  # (313, 2) int64

    @property
    def K(self) -> int:
        return self.pts_in_hull.shape[0]


_CACHE: dict[str, ColorBins] = {}


def get_bins(path: str | None = None) -> ColorBins:
    """Built-in tables, or load ``pts_in_hull.npy``-style files from ``path``
    (a directory containing pts_grid.npy / in_hull.npy / pts_in_hull.npy)."""
    key = path or "__builtin__"
    if key in _CACHE:
        return _CACHE[key]
    if path is None:
        grid = make_grid("ab")
        in_hull = make_in_hull()
        bins = ColorBins(grid, in_hull, grid[in_hull])
    else:
        bins = ColorBins(
            np.load(os.path.join(path, "pts_grid.npy")),
            np.load(os.path.join(path, "in_hull.npy")),
            np.load(os.path.join(path, "pts_in_hull.npy")),
        )
    _CACHE[key] = bins
    return bins
