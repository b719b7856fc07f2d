import numpy as np
import jax.numpy as jnp

from ideepcolor_tpu.ops import hints


def _cv2_oracle(boxes, values, size):
    """Reference behavior: sequential filled-rectangle writes
    (ref ui/ui_control.py:52-63,177-187 uses cv2.rectangle thickness=-1,
    which fills inclusive corners)."""
    import cv2
    ab = np.zeros((size, size, 2), np.float64)
    mask = np.zeros((size, size, 1), np.uint8)
    for (y1, x1, y2, x2), v in zip(boxes, values):
        cv2.rectangle(mask, (x1, y1), (x2, y2), 255, -1)
        cv2.rectangle(ab, (int(x1), int(y1)), (int(x2), int(y2)),
                      (float(v[0]), float(v[1])), -1)
    return ab, (mask > 0).astype(np.float32)


def test_rasterize_matches_cv2():
    rng = np.random.default_rng(4)
    n = 7
    centers = rng.integers(10, 246, (n, 2))
    w = rng.integers(0, 6, (n,))
    boxes = np.stack([centers[:, 0] - w, centers[:, 1] - w,
                      centers[:, 0] + w, centers[:, 1] + w], 1).astype(np.int32)
    values = rng.uniform(-80, 80, (n, 2)).astype(np.float32)

    pad_boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    pad_vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    pad_boxes[:n], pad_vals[:n] = boxes, values

    ab, mask = hints.rasterize_hints(jnp.asarray(pad_boxes),
                                     jnp.asarray(pad_vals),
                                     jnp.int32(n), size=256)
    ab, mask = np.asarray(ab), np.asarray(mask)
    want_ab, want_mask = _cv2_oracle(boxes, values, 256)
    assert np.array_equal(mask[..., 0] > 0, want_mask[..., 0] > 0)
    assert np.max(np.abs(ab - want_ab)) < 1e-5


def test_overlap_later_wins():
    boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 10, 20, 20]; vals[0] = [5.0, -5.0]
    boxes[1] = [15, 15, 25, 25]; vals[1] = [-30.0, 40.0]
    ab, mask = hints.rasterize_hints(jnp.asarray(boxes), jnp.asarray(vals),
                                     jnp.int32(2), size=64)
    ab = np.asarray(ab)
    assert np.allclose(ab[12, 12], [5.0, -5.0])
    assert np.allclose(ab[18, 18], [-30.0, 40.0])   # overlap -> later hint
    assert np.allclose(ab[24, 24], [-30.0, 40.0])
    assert np.asarray(mask)[30, 30, 0] == 0


def test_empty_hints():
    boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    ab, mask = hints.rasterize_hints(jnp.asarray(boxes), jnp.asarray(vals),
                                     jnp.int32(0), size=32)
    assert np.all(np.asarray(ab) == 0) and np.all(np.asarray(mask) == 0)


def test_put_point_matches_notebook_semantics():
    ab = np.zeros((2, 256, 256))
    mask = np.zeros((1, 256, 256))
    hints.put_point(ab, mask, [135, 160], 3, [23, -69])
    assert mask[0, 135, 160] == 1 and mask[0, 132, 157] == 1
    assert mask[0, 138, 163] == 1 and mask[0, 139, 160] == 0
    assert np.all(ab[:, 135, 160] == [23, -69])


def test_points_json_to_table_matches_dense():
    """Table conversion of a serve-style hint list rasterizes identically
    to put_points_json's dense drawing (clamping and later-wins overlap)."""
    import jax.numpy as jnp
    from ideepcolor_tpu.ops.hints import (points_json_to_table,
                                          put_points_json, rasterize_hints,
                                          MAX_HINTS)
    pts = [{"y": 1, "x": 2, "ab": [30, -40], "radius": 3},     # clamps
           {"y": 20, "x": 20, "ab": [-10, 55], "radius": 2},
           {"y": 21, "x": 21, "ab": [5, 5], "radius": 2}]      # overlaps
    ab_d = np.zeros((2, 64, 64), np.float32)
    mask_d = np.zeros((1, 64, 64), np.float32)
    put_points_json(ab_d, mask_d, pts, 64)
    boxes, vals, n = points_json_to_table(pts, 64)
    ab_t, mask_t = rasterize_hints(jnp.asarray(boxes), jnp.asarray(vals),
                                   jnp.int32(n), size=64)
    np.testing.assert_array_equal(np.asarray(ab_t).transpose(2, 0, 1), ab_d)
    np.testing.assert_array_equal(
        np.asarray(mask_t)[..., 0], mask_d[0])
    # overflow -> None (dense fallback); bad radius raises
    assert points_json_to_table(
        [{"y": 5, "x": 5, "ab": [0, 0]}] * (MAX_HINTS + 1), 64) is None
    import pytest as _pt
    with _pt.raises(ValueError):
        points_json_to_table([{"y": 5, "x": 5, "ab": [0, 0],
                               "radius": 40}], 64)
