"""Headless UI logic tests: hint edit list, coordinate mapping,
rasterization parity between the dense path and the fused hint table,
and the lab_gamut host wrappers (GUI logic per ref ui/ui_control.py,
tested against a fake-model-free surface as SURVEY section 4 prescribes)."""
import numpy as np

import jax.numpy as jnp

from ideepcolor_tpu.data import lab_gamut
from ideepcolor_tpu.ops import hints as ops_hints
from ideepcolor_tpu.ui.control import UIControl


def _ctrl():
    c = UIControl(win_size=512, load_size=256)
    c.setImageSize((512, 512))
    return c


def test_add_select_move_erase():
    c = _ctrl()
    col, w, is_new = c.addPoint((100, 100), (255, 0, 0), (250, 10, 10), 6.0)
    assert is_new and len(c.userEdits) == 1
    # clicking nearby selects the existing point (within width+1)
    col2, w2, is_new2 = c.addPoint((103, 103), (0, 255, 0), (0, 255, 0), 3.0)
    assert not is_new2 and len(c.userEdits) == 1
    assert col2 == (250, 10, 10) and w2 == 6.0      # adopts old color/width
    # far away -> new point
    _, _, is_new3 = c.addPoint((300, 300), (0, 0, 255), (0, 0, 255), 6.0)
    assert is_new3 and len(c.userEdits) == 2
    assert c.erasePoint((301, 301))
    assert len(c.userEdits) == 1
    assert not c.erasePoint((400, 400))


def test_used_colors_recency_and_dedup():
    c = _ctrl()
    c.addPoint((50, 50), (1, 2, 3), (10, 20, 30), 6.0)
    c.addPoint((200, 200), (4, 5, 6), (40, 50, 60), 6.0)
    c.addPoint((350, 350), (7, 8, 9), (10, 20, 30), 6.0)  # duplicate color
    used = c.used_colors()
    assert used.shape == (2, 3)
    # most recent first
    assert np.allclose(used[0] * 255, [10, 20, 30])
    assert np.allclose(used[1] * 255, [40, 50, 60])


def test_dense_and_table_rasterization_agree():
    c = _ctrl()
    c.addPoint((128, 64), (200, 30, 30), (200, 30, 30), 6.0)
    c.addPoint((400, 300), (30, 200, 30), (30, 200, 30), 4.0)
    im, mask = c.get_input()
    assert im.shape == (256, 256, 3) and mask.shape == (256, 256, 1)
    assert mask.sum() > 0

    boxes, vals, n = c.hint_table()
    assert n == 2
    ab_dev, mask_dev = ops_hints.rasterize_hints(
        jnp.asarray(boxes), jnp.asarray(vals), jnp.int32(n), size=256)
    mask_dev = np.asarray(mask_dev)
    assert np.array_equal(mask_dev[..., 0] > 0, mask[..., 0] > 0)
    # ab values in the hinted region equal the rgb2lab ab of the hint color
    ys, xs = np.nonzero(mask[..., 0])
    ab_dev = np.asarray(ab_dev)
    lab = lab_gamut.rgb2lab_1d(np.array([200, 30, 30], np.uint8))
    assert np.allclose(ab_dev[ys[0], xs[0]], lab[1:], atol=1e-3)


def test_win_letterbox_mapping():
    c = UIControl(win_size=512, load_size=256)
    c.setImageSize((512, 384))       # landscape letterboxed vertically
    # center of the window maps to the center of the network grid
    x, y = c.scale_point(256, 256, 0)
    assert x == 128
    assert abs(y - 128) <= 10


def test_lab_gamut_wrappers():
    lab = lab_gamut.rgb2lab_1d(np.array([255, 0, 0], np.uint8))
    assert lab.shape == (3,) and 50 < lab[0] < 56
    rgb = lab_gamut.lab2rgb_1d(lab)
    assert rgb.dtype == np.uint8 and abs(int(rgb[0]) - 255) <= 1
    snapped = lab_gamut.snap_ab(80.0, np.array([255, 0, 0], np.uint8))
    assert snapped.dtype == np.uint8
    # snapping red to L=80 must brighten it into gamut
    lab_s = lab_gamut.rgb2lab_1d(snapped)
    assert abs(lab_s[0] - 80) < 3

    grid = lab_gamut.abGrid(gamut_size=110, D=1)
    masked_rgb, mask = grid.update_gamut(50.0)
    assert masked_rgb.shape == (221, 221, 3) and mask.shape == (221, 221)
    # cache hit returns identical arrays
    m2, k2 = grid.update_gamut(50.0)
    assert m2 is masked_rgb and k2 is mask
    x, y = grid.ab2xy(10, -20)
    assert grid.xy2ab(x, y) == (10, -20)


def test_reset():
    c = _ctrl()
    c.addPoint((100, 100), (1, 1, 1), (2, 2, 2), 6.0)
    c.reset()
    assert len(c.userEdits) == 0 and c.ui_count == 0
    im, mask = c.get_input()
    assert mask.sum() == 0


def test_update_color_after_select_then_table_reflects_it():
    """Palette flow: add a point, reselect it, change its color — the
    hint table must carry the new color's ab (ref ui/gui_draw.py:206-213)."""
    c = _ctrl()
    c.addPoint((100, 100), (255, 0, 0), (255, 0, 0), 6.0)
    c.addPoint((101, 101), (0, 0, 255), (0, 0, 255), 6.0)   # reselect
    assert len(c.userEdits) == 1
    c.update_color((0, 255, 0), (0, 255, 0))
    boxes, vals, n = c.hint_table()
    assert n == 1
    lab = lab_gamut.rgb2lab_1d(np.array([0, 255, 0], np.uint8))
    assert np.allclose(vals[0], lab[1:], atol=1e-3)
