"""Multi-device (virtual 8-CPU mesh) tests: DP/TP training step, hint
simulation, loss sanity, and the graft entry points."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ideepcolor_tpu.parallel import mesh as pmesh
from ideepcolor_tpu.train import hints_sim, losses, step as tstep


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_hint_sampler_shapes_and_consistency():
    key = jax.random.key(0)
    gt = jnp.asarray(np.random.default_rng(0)
                     .uniform(-80, 80, (4, 32, 32, 2)).astype(np.float32))
    ab, mask = hints_sim.sample_hints(key, gt)
    ab, mask = np.asarray(ab), np.asarray(mask)
    assert ab.shape == (4, 32, 32, 2) and mask.shape == (4, 32, 32, 1)
    # hints only exist where mask is on, and values come from gt range
    assert np.all(ab[mask[..., 0] == 0] == 0)
    if mask.sum() > 0:
        assert np.abs(ab).max() <= 80.0
    # deterministic in the key
    ab2, mask2 = hints_sim.sample_hints(key, gt)
    assert np.array_equal(ab, np.asarray(ab2))


def test_losses():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
    assert float(losses.smooth_l1(a, a)) == 0.0
    assert float(losses.smooth_l1(a, a + 10.0)) == pytest.approx(9.5)
    from ideepcolor_tpu.ops.quantize import make_pts_grid
    centers = jnp.asarray(make_pts_grid(), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(1, 4, 4, 529)).astype(np.float32))
    ab = jnp.asarray(rng.uniform(-80, 80, (1, 4, 4, 2)).astype(np.float32))
    xent = float(losses.class_xent(logits, ab, centers))
    assert np.isfinite(xent) and xent > 0


def test_train_step_descends_loss():
    cfg = tstep.TrainConfig(lr=1e-3, remat=False)
    state = tstep.init_state(jax.random.key(0), cfg)
    train = jax.jit(tstep.make_train_step(cfg))
    rng = np.random.default_rng(2)
    batch = {
        "l": jnp.asarray(rng.uniform(0, 100, (2, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (2, 32, 32, 2)), jnp.float32),
    }
    first = None
    for i in range(5):
        state, aux = train(state, batch, jax.random.key(42))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first
    assert int(state["step"]) == 5


def test_mesh_and_shardings():
    mesh = pmesh.make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    sh = pmesh.param_shardings(params, mesh)
    assert str(sh["model5.0.weight"].spec) != str(sh["model1.0.weight"].spec)


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_global_hint_dropout():
    from ideepcolor_tpu.train.hints_sim import sample_global_hints
    rng = np.random.default_rng(4)
    gt = jnp.asarray(rng.uniform(-80, 80, (16, 32, 32, 2)).astype(np.float32))
    out = np.asarray(sample_global_hints(jax.random.key(0), gt,
                                         keep_ratio=0.5))
    assert out.shape == (16, 314)
    kept = out[:, -1] == 1
    # kept rows carry a normalized histogram; dropped rows are all zero
    assert np.allclose(out[kept, :-1].sum(1), 1.0, atol=1e-4)
    assert np.all(out[~kept] == 0)
    assert 0 < kept.sum() < 16


def test_train_state_checkpoint_resume(tmp_path):
    cfg = tstep.TrainConfig(lr=1e-3, remat=False)
    state = tstep.init_state(jax.random.key(7), cfg)
    train = jax.jit(tstep.make_train_step(cfg))
    rng = np.random.default_rng(8)
    batch = {
        "l": jnp.asarray(rng.uniform(0, 100, (2, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (2, 32, 32, 2)), jnp.float32),
    }
    state, _ = train(state, batch, jax.random.key(0))
    tstep.save_train_state(str(tmp_path / "ck"), state)
    restored = tstep.load_train_state(str(tmp_path / "ck"), cfg)
    assert int(restored["step"]) == 1
    # continuing from the restored state matches continuing directly
    s1, a1 = train(state, batch, jax.random.key(1))
    s2, a2 = train(restored, batch, jax.random.key(1))
    assert np.allclose(float(a1["loss"]), float(a2["loss"]), atol=1e-6)
    k = "model1.0.weight"
    assert np.allclose(np.asarray(s1["params"][k]),
                       np.asarray(s2["params"][k]), atol=1e-7)


def test_shard_params_and_batch_helpers():
    from ideepcolor_tpu.models import siggraph
    mesh = pmesh.make_mesh(8, model_parallel=2)
    params = siggraph.init_params(jax.random.key(1))
    sharded = pmesh.shard_params(params, mesh)
    # TP param physically sharded over 'model'; others replicated
    tp = sharded["model5.0.weight"]
    rep = sharded["model1.0.weight"]
    assert not tp.sharding.is_fully_replicated
    assert rep.sharding.is_fully_replicated
    batch = pmesh.shard_batch({"x": np.zeros((8, 4), np.float32)}, mesh)
    assert not batch["x"].sharding.is_fully_replicated


def test_training_overfits_fixed_batch():
    """Convergence evidence: 30 steps on one fixed batch must cut the
    loss by >40% (the subsystem actually learns, not just descends)."""
    cfg = tstep.TrainConfig(lr=3e-3, remat=False)
    state = tstep.init_state(jax.random.key(11), cfg)
    train = jax.jit(tstep.make_train_step(cfg))
    rng = np.random.default_rng(12)
    batch = {
        "l": jnp.asarray(rng.uniform(20, 80, (2, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-40, 40, (2, 32, 32, 2)),
                          jnp.float32),
    }
    losses_seen = []
    for i in range(30):
        state, aux = train(state, batch, jax.random.key(100))
        losses_seen.append(float(aux["loss"]))
    assert losses_seen[-1] < 0.6 * losses_seen[0], (
        losses_seen[0], losses_seen[-1])


def test_hybrid_dcn_mesh_serving_and_training():
    """(dcn, data, model) hybrid mesh: batch shards over dcn x data, the
    sharded train step and batched serving both run and match the
    unsharded results (DCN carries only the gradient all-reduce)."""
    mesh = pmesh.make_hybrid_mesh(dcn_parallel=2, model_parallel=2)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dcn", "data", "model")
    bs = pmesh.batch_sharding(mesh)
    x = pmesh.shard_batch({"x": np.zeros((8, 4), np.float32)}, mesh)["x"]
    assert not x.sharding.is_fully_replicated
    assert len(x.sharding.device_set) == 8  # batch spans all 8 devices

    # training: one sharded step == one single-device step
    cfg = tstep.TrainConfig(lr=1e-3, remat=False)
    state = tstep.init_state(jax.random.key(3), cfg)
    rng = np.random.default_rng(13)
    batch = {
        "l": jnp.asarray(rng.uniform(0, 100, (8, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (8, 32, 32, 2)), jnp.float32),
    }
    want_state, want_aux = jax.jit(tstep.make_train_step(cfg))(
        state, batch, jax.random.key(5))

    jitted, shard_state, shard_batch = tstep.make_sharded_train_step(
        cfg, mesh)
    state2 = tstep.init_state(jax.random.key(3), cfg)
    with mesh:
        got_state, got_aux = jitted(shard_state(state2),
                                    shard_batch(batch), jax.random.key(5))
    assert np.allclose(float(got_aux["loss"]), float(want_aux["loss"]),
                       rtol=1e-4)
    k = "model1.0.weight"
    assert np.allclose(np.asarray(got_state["params"][k]),
                       np.asarray(want_state["params"][k]), atol=1e-5)

    # serving: mesh-sharded colorize_batch == unsharded
    from ideepcolor_tpu.engine.batch import colorize_batch
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    imgs = (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8)
    plain = colorize_batch(params, imgs)
    sharded = colorize_batch(params, imgs, mesh=mesh)
    assert np.array_equal(plain, sharded)


def test_lr_schedules():
    """Cosine/warmup schedules: the step runs, checkpoints resume with
    the same config, and the schedule actually moves the LR."""
    cfg = tstep.TrainConfig(lr=1e-3, remat=False, schedule="cosine",
                            warmup_steps=2, total_steps=10)
    sched = tstep.make_optimizer(cfg)  # noqa: F841 (builds without error)
    import optax
    lr_fn = optax.warmup_cosine_decay_schedule(0.0, cfg.lr, 2, 10,
                                               cfg.lr / 100)
    assert float(lr_fn(0)) < float(lr_fn(2))      # warmup rises
    assert float(lr_fn(10)) < float(lr_fn(2))     # decay falls
    state = tstep.init_state(jax.random.key(0), cfg)
    train = tstep.make_train_step(cfg)
    rng = np.random.default_rng(5)
    batch = {
        "l": jnp.asarray(rng.uniform(0, 100, (2, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (2, 32, 32, 2)),
                          jnp.float32),
    }
    for i in range(3):
        state, aux = train(state, batch, jax.random.key(i))
    assert np.isfinite(float(aux["loss"]))
    with pytest.raises(ValueError, match="total_steps"):
        tstep.make_optimizer(tstep.TrainConfig(schedule="cosine"))
    with pytest.raises(ValueError, match="unknown schedule"):
        tstep.make_optimizer(tstep.TrainConfig(schedule="nope"))


def test_lr_schedule_checkpoint_resume(tmp_path):
    cfg = tstep.TrainConfig(lr=1e-3, remat=False, schedule="cosine",
                            warmup_steps=1, total_steps=8)
    state = tstep.init_state(jax.random.key(1), cfg)
    train = tstep.make_train_step(cfg)
    rng = np.random.default_rng(6)
    batch = {
        "l": jnp.asarray(rng.uniform(0, 100, (2, 32, 32, 1)), jnp.float32),
        "ab": jnp.asarray(rng.uniform(-60, 60, (2, 32, 32, 2)),
                          jnp.float32),
    }
    state, _ = train(state, batch, jax.random.key(0))
    tstep.save_train_state(str(tmp_path / "ck"), state)
    restored = tstep.load_train_state(str(tmp_path / "ck"), cfg)
    s1, a1 = train(state, batch, jax.random.key(1))
    s2, a2 = train(restored, batch, jax.random.key(1))
    assert np.allclose(float(a1["loss"]), float(a2["loss"]), atol=1e-6)
