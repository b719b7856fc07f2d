import numpy as np
import pytest

from ideepcolor_tpu.utils import ndarray as ndu
from ideepcolor_tpu.utils import session, visualize


def test_flatten_unflatten_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((2, 5, 4, 3))
    flat = ndu.flatten_nd_array(x, axis=1)
    assert flat.shape == (2 * 4 * 3, 5)
    back = ndu.unflatten_2d_array(flat, x, axis=1)
    assert np.array_equal(back, x)


def test_flatten_axis_last():
    rng = np.random.default_rng(1)
    x = rng.random((3, 4, 2))
    flat = ndu.flatten_nd_array(x, axis=2)
    assert flat.shape == (12, 2)
    assert np.array_equal(ndu.unflatten_2d_array(flat, x, axis=2), x)


def test_check_value_and_timer():
    assert ndu.check_value(-1, -1)
    assert not ndu.check_value(np.zeros(3), -1)
    t = ndu.Timer()
    with t:
        sum(range(1000))
    assert t.calls == 1 and t.diff >= 0


def test_grid_vis():
    imgs = np.arange(4 * 2 * 3 * 3).reshape(4, 2, 3, 3).astype(np.uint8)
    grid = visualize.grid_vis(imgs, 2, 2)
    assert grid.shape == (4, 6, 3)
    assert np.array_equal(grid[:2, :3], imgs[0])
    assert np.array_equal(grid[2:, 3:], imgs[3])
    # padding when fewer images than cells
    grid2 = visualize.grid_vis(imgs[:3], 2, 2)
    assert np.all(grid2[2:, 3:] == 0)


def test_pickle_roundtrip(tmp_path):
    p = str(tmp_path / "x.pkl")
    visualize.save_pickle({"a": 1}, p)
    assert visualize.load_pickle(p) == {"a": 1}


def test_params_npz_roundtrip(tmp_path):
    p = str(tmp_path / "params.npz")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    session.save_params_npz(p, params)
    back = session.load_params_npz(p)
    assert np.array_equal(np.asarray(back["w"]), params["w"])


def test_params_orbax_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt")
    params = {"w": np.arange(4, dtype=np.float32)}
    session.save_params_orbax(p, params)
    back = session.load_params_orbax(p)
    assert np.array_equal(np.asarray(back["w"]), params["w"])


def test_session_dump_and_replay(tmp_path):
    from ideepcolor_tpu import api
    rng = np.random.default_rng(3)
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    m.set_image((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    ab = np.zeros((2, 64, 64))
    mask = np.zeros((1, 64, 64))
    ab[:, 30:33, 30:33] = np.array([40.0, -20.0])[:, None, None]
    mask[:, 30:33, 30:33] = 1
    out = m.net_forward(ab, mask)
    d = session.save_session(str(tmp_path / "sess"), m, ab, mask,
                             result_rgb=out, timestamp=False)
    s = session.load_session(d)
    assert np.array_equal(s["im_ab"], ab)
    out2 = session.replay_session(d, m)
    assert np.array_equal(out, out2)


def test_stage_timer():
    from ideepcolor_tpu.utils.profiling import StageTimer
    st = StageTimer()
    for _ in range(3):
        with st.stage("forward"):
            sum(range(100))
    s = st.summary()
    assert s["forward"]["n"] == 3 and s["forward"]["p50_ms"] >= 0
    assert "forward" in st.report()


def test_device_trace_smoke(tmp_path):
    """jax.profiler wrapper produces a trace directory (observability)."""
    import jax
    import jax.numpy as jnp
    from ideepcolor_tpu.utils.profiling import annotate, device_trace
    f = jax.jit(lambda x: x * 2 + 1)
    with device_trace(str(tmp_path)):
        with annotate("stage"):
            np.asarray(f(jnp.ones((64, 64))))
    import os
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no trace files written"


def test_device_op_summary_from_trace(tmp_path):
    """device_trace -> device_op_summary roundtrip (structure check; the
    device lane carries real HLO ops on TPU, may be host-only on the
    CPU test backend)."""
    import jax
    import jax.numpy as jnp
    from ideepcolor_tpu.utils import profiling

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((64, 64))
    float(f(x))
    with profiling.device_trace(str(tmp_path)):
        for _ in range(3):
            r = f(x)
        float(r)
    s = profiling.device_op_summary(str(tmp_path), reps=3)
    assert set(s) == {"total_ms_per_rep", "groups", "top_ops"}
    assert s["total_ms_per_rep"] >= 0.0
    assert isinstance(s["top_ops"], list)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        profiling.device_op_summary(str(tmp_path / "nope"))
