"""Edge cases and concurrency stress: out-of-bounds hints, boundary L
values, loader thread safety, streaming interleaving."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ideepcolor_tpu.ops import colorspace as cs, gamut, hints


def test_hints_partially_out_of_bounds():
    """Boxes crossing the image edge clip exactly like cv2.rectangle."""
    import cv2
    boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    boxes[0] = [-3, -3, 2, 2]; vals[0] = [10.0, -10.0]       # top-left corner
    boxes[1] = [60, 60, 70, 70]; vals[1] = [-20.0, 30.0]     # bottom-right
    ab, mask = hints.rasterize_hints(jnp.asarray(boxes), jnp.asarray(vals),
                                     jnp.int32(2), size=64)
    mask = np.asarray(mask)[..., 0]
    want = np.zeros((64, 64), np.uint8)
    cv2.rectangle(want, (-3, -3), (2, 2), 1, -1)
    cv2.rectangle(want, (60, 60), (70, 70), 1, -1)
    assert np.array_equal(mask > 0, want > 0)


def test_colorspace_boundary_values():
    lab = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0],
                    [0.0, -110.0, 110.0], [100.0, 110.0, -110.0]],
                   np.float32)
    rgb = np.asarray(cs.lab_to_rgb(lab))
    assert np.all(np.isfinite(rgb)) and rgb.min() >= 0 and rgb.max() <= 1
    back = np.asarray(cs.rgb_to_lab(rgb))
    assert np.all(np.isfinite(back))


def test_snap_ab_extreme_lightness():
    for L in (0.5, 99.5):
        out = np.asarray(gamut.snap_ab(L, np.array([255., 0., 0.],
                                                   np.float32)))
        assert np.all(out >= 0) and np.all(out <= 255)
        lab = np.asarray(cs.rgb_to_lab(out / 255.0))
        # near-extreme L forces colors toward black/white
        assert abs(lab[0] - L) < 6


def test_loader_concurrent_consumers(tmp_path):
    import shutil
    import threading
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    import os
    if not os.path.exists(src):
        pytest.skip("no images")
    shutil.copy(src, tmp_path / "a.jpg")
    from ideepcolor_tpu.train.data import ImageFolderLoader
    loader = ImageFolderLoader(str(tmp_path), batch_size=2, size=32,
                               workers=3, prefetch=2)
    got, errs = [], []

    def consume():
        try:
            for _ in range(5):
                b = next(loader)
                assert b["l"].shape == (2, 32, 32, 1)
                got.append(b["l"].mean())
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=consume) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    loader.close()
    assert not errs and len(got) == 15
    assert all(np.isfinite(v) for v in got)


def test_streaming_interleaved_hint_updates():
    """Hint swaps between submits must apply to subsequent frames only."""
    from ideepcolor_tpu.engine.streaming import StreamingSession
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    sess = StreamingSession(params, size=32, depth=1, with_dist=False)
    frame = np.full((32, 32), 50.0, np.float32)

    outs = []
    for i in range(6):
        if i == 3:
            ab = np.full((32, 32, 2), 40.0, np.float32)
            m = np.ones((32, 32, 1), np.float32)
            sess.set_hints(ab, m)
        r = sess.submit(frame)
        if r is not None:
            outs.append(r[0])
    outs.extend(r[0] for r in sess.drain())
    assert len(outs) == 6
    # frames 0-2 identical (no hints), 3-5 identical (hinted), groups differ
    assert np.array_equal(outs[0], outs[2])
    assert np.array_equal(outs[3], outs[5])
    assert not np.array_equal(outs[0], outs[3])


def test_max_hints_overflow_truncates_cleanly():
    """More edits than MAX_HINTS: the table keeps the first MAX_HINTS."""
    from ideepcolor_tpu.ui.control import UIControl
    c = UIControl(win_size=512, load_size=64)
    c.setImageSize((512, 512))
    for i in range(hints.MAX_HINTS + 16):
        c.addPoint((6 * (i % 64) + 3, 6 * (i // 64) + 3), (i % 255, 0, 0),
                   (i % 255, 0, 0), 1.0)
    boxes, vals, n = c.hint_table()
    assert n == hints.MAX_HINTS
    ab, mask = hints.rasterize_hints(jnp.asarray(boxes), jnp.asarray(vals),
                                     jnp.int32(n), size=64)
    assert np.asarray(mask).sum() > 0
