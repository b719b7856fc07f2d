"""Width-scaled student models + teacher->student distillation
(models/siggraph.scaled_channels, train/distill.py)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ideepcolor_tpu.models import siggraph
from ideepcolor_tpu.train import distill


def _batch(rng, n=2, hw=32):
    return {
        "l": jnp.asarray(rng.uniform(0, 100, (n, hw, hw, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (n, hw, hw, 2)), jnp.float32),
    }


def test_scaled_channels_rounding():
    assert siggraph.scaled_channels(1.0) == (64, 128, 256, 512)
    assert siggraph.scaled_channels(0.5) == (32, 64, 128, 256)
    assert siggraph.scaled_channels(0.25) == (16, 32, 64, 128)
    # rounds UP to multiples of 8, floor 8
    assert siggraph.scaled_channels(0.3) == (24, 40, 80, 160)
    assert siggraph.scaled_channels(0.01) == (8, 8, 8, 8)


def test_make_shapes_full_width_is_reference():
    assert siggraph.make_shapes() == siggraph._SHAPES


def test_student_forward_shapes_and_param_count():
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    full = siggraph.init_params(jax.random.key(0))
    n_s = sum(int(np.prod(v.shape)) for v in params.values())
    n_f = sum(int(np.prod(v.shape)) for v in full.values())
    assert n_s < 0.12 * n_f           # ~width^2 scaling
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-50, 50, (1, 32, 32, 1)), jnp.float32)
    B = jnp.zeros((1, 32, 32, 2))
    M = jnp.zeros((1, 32, 32, 1))
    out = siggraph.apply(params, A, B, M, 0.0)
    assert out.shape == (1, 32, 32, 2)
    reg2, cl = siggraph.apply(params, A, B, M, 0.0, dist=True)
    assert reg2.shape == (1, 32, 32, 2) and cl.shape == (1, 32, 32, 529)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.allclose(np.asarray(cl).sum(-1)[..., ::4, ::4], 1.0, atol=1e-4)


def test_student_checkpoint_roundtrip_any_width(tmp_path):
    params = siggraph.init_params(jax.random.key(1), width=0.5)
    path = tmp_path / "student.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    loaded = siggraph.params_from_state_dict(
        dict(np.load(path, allow_pickle=False)))
    assert loaded["model1.0.weight"].shape == (3, 3, 4, 32)
    assert np.array_equal(np.asarray(loaded["model5.0.weight"]),
                          np.asarray(params["model5.0.weight"]))


def test_distill_step_descends_loss():
    cfg = distill.DistillConfig(width=0.25, lr=2e-3)
    # a narrow "teacher" keeps the CPU test fast; the machinery is
    # width-agnostic (any teacher/student pair of params works)
    teacher = siggraph.init_params(jax.random.key(0), width=0.5)
    state = distill.init_student(jax.random.key(1), cfg)
    step = distill.make_distill_step(cfg)
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    first = None
    for i in range(12):
        state, aux = step(state, teacher, batch, jax.random.key(9))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < 0.8 * first, (first, float(aux["loss"]))
    assert int(state["step"]) == 12
    assert float(aux["kl"]) >= 0.0


def test_distill_gt_mix_term():
    cfg = distill.DistillConfig(width=0.25, gt_weight=5.0)
    teacher = siggraph.init_params(jax.random.key(0), width=0.5)
    student = siggraph.init_params(jax.random.key(1), width=0.25)
    rng = np.random.default_rng(3)
    total, aux = distill.distill_loss(student, teacher, _batch(rng),
                                      jax.random.key(0), cfg)
    assert "gt" in aux
    assert float(total) == pytest.approx(
        10.0 * float(aux["reg"]) + float(aux["kl"]) + 5.0 * float(aux["gt"]),
        rel=1e-5)


def test_sharded_distill_matches_unsharded():
    from ideepcolor_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)
    cfg = distill.DistillConfig(width=0.25, lr=1e-3)
    teacher = siggraph.init_params(jax.random.key(0), width=0.5)
    rng = np.random.default_rng(4)
    batch = _batch(rng, n=8)

    state = distill.init_student(jax.random.key(5), cfg)
    want_state, want_aux = distill.make_distill_step(cfg)(
        state, teacher, batch, jax.random.key(6))

    jitted, shard_state, shard_batch, put_teacher = \
        distill.make_sharded_distill_step(cfg, mesh)
    state2 = distill.init_student(jax.random.key(5), cfg)
    with mesh:
        got_state, got_aux = jitted(shard_state(state2), put_teacher(teacher),
                                    shard_batch(batch), jax.random.key(6))
    assert np.allclose(float(got_aux["loss"]), float(want_aux["loss"]),
                       rtol=1e-4)
    k = "model1.0.weight"
    assert np.allclose(np.asarray(got_state["params"][k]),
                       np.asarray(want_state["params"][k]), atol=1e-5)


def test_api_serves_student_width():
    """A width-multiplied student plugs into the public serving API."""
    from ideepcolor_tpu import api
    cm = api.ColorizeImageJax(Xd=64)
    cm.prep_net(path='', width=0.25)
    rng = np.random.default_rng(5)
    cm.set_image((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    out = cm.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
