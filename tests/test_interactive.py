"""Pipelined interactive session (engine/interactive): async submit,
stale-frame dropping, and backend-state consistency with the sync path."""
import os

import numpy as np
import pytest

from ideepcolor_tpu import api
from ideepcolor_tpu.engine.interactive import InteractiveSession
from ideepcolor_tpu.ops.hints import MAX_HINTS

IMG = "/root/reference/test_imgs/mortar_pestle.jpg"

pytestmark = pytest.mark.skipif(not os.path.exists(IMG),
                                reason="test image unavailable")


def _table(*hints):
    """hints: (y1, x1, y2, x2, a, b) tuples -> (boxes, vals, n)."""
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    for i, (y1, x1, y2, x2, a, b) in enumerate(hints):
        boxes[i] = [y1, x1, y2, x2]
        vals[i] = [a, b]
    return boxes, vals, len(hints)


@pytest.fixture(scope="module")
def model():
    m = api.ColorizeImageJax(Xd=64)
    m.prep_net(None)
    m.load_image(IMG)
    return m


def test_latest_matches_sync_path(model):
    sess = InteractiveSession(model)
    t1 = _table((10, 10, 14, 14, 40.0, -30.0))
    t2 = _table((10, 10, 14, 14, 40.0, -30.0), (40, 40, 44, 44, -20.0, 55.0))
    sess.submit(*t1)
    seq = sess.submit(*t2)
    got_seq, frame = sess.latest()
    assert got_seq == seq
    sync = model.net_forward_table(*t2)
    np.testing.assert_array_equal(frame, sync)


def test_drop_accounting():
    m = api.ColorizeImageJax(Xd=64)
    m.prep_net(None)
    m.load_image(IMG)
    sess = InteractiveSession(m, depth=2)
    for i in range(5):
        sess.submit(*_table((i, i, i + 3, i + 3, 10.0, 10.0)))
    assert sess.pending == 2                    # depth bound held
    assert sess.frames_dropped == 3
    _, frame = sess.latest()
    assert frame is not None
    assert sess.pending == 0
    assert sess.frames_materialized == 1
    assert sess.frames_dropped == 4             # one more stale at fetch
    # empty queue: no frame, seq unchanged
    seq, none = sess.latest()
    assert none is None and seq == sess.frames_submitted


def test_state_consistent_after_latest(model):
    sess = InteractiveSession(model)
    t = _table((20, 20, 25, 25, 60.0, 20.0))
    sess.submit(*t)
    _, frame = sess.latest()
    # dense hint mirrors match a direct rasterization
    assert model.input_mask.sum() == 6 * 6
    assert np.allclose(model.input_ab[:, 22, 22], [60.0, 20.0])
    # net-res display frame doubles as output_rgb (no second readback)
    np.testing.assert_array_equal(model.get_img_forward(), frame)
    full = model.get_img_fullres()
    assert full.shape == model.img_rgb_fullres.shape
    assert full.dtype == np.uint8


def test_window_frame_variant(model):
    import jax.numpy as jnp
    from ideepcolor_tpu.engine import pipeline as P
    from ideepcolor_tpu.ops.resize import linear_resize_matrix_np

    rh = jnp.asarray(linear_resize_matrix_np(64, 100, 128))
    rw = jnp.asarray(linear_resize_matrix_np(64, 120, 128))
    l_pad = jnp.zeros((128, 128, 1), jnp.float32)
    sess = InteractiveSession(model)
    t = _table((5, 5, 9, 9, -40.0, 40.0))
    sess.submit(*t, win_args=(l_pad, rh, rw))
    _, win = sess.latest()
    assert win.shape == (128, 128, 3) and win.dtype == np.uint8
    # the net-res frame stays device-resident and materializes lazily to
    # the same pixels the sync program produces
    np.testing.assert_array_equal(model.output_rgb,
                                  model.net_forward_table(*t))


def test_flush_drops_everything(model):
    sess = InteractiveSession(model)
    sess.submit(*_table((1, 1, 3, 3, 5.0, 5.0)))
    sess.flush()
    assert sess.pending == 0
    seq, frame = sess.latest()
    assert frame is None


def test_rejects_backend_without_table_program():
    m = api.ColorizeImageJaxCaffeDist(Xd=64)
    m.prep_net(None)
    with pytest.raises(ValueError):
        InteractiveSession(m)
