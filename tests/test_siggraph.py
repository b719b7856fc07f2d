"""Architecture-parity tests: our JAX SIGGRAPH net vs the reference torch
definition, executed with identical (randomly initialized) weights.

The published checkpoints are not redistributable in this environment, so
parity is established structurally: any weight assignment must produce the
same function. We load the reference's own model.py (read-only) as the
oracle, convert its state_dict, and require <1e-4 max error.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from ideepcolor_tpu.models import siggraph

REF_MODEL = "/root/reference/models/pytorch/model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODEL), reason="reference model def unavailable")


def _load_ref_module():
    spec = importlib.util.spec_from_file_location("ref_siggraph", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_pair(dist, seed=0):
    import torch
    torch.manual_seed(seed)
    ref = _load_ref_module().SIGGRAPHGenerator(dist=dist)
    ref.eval()
    # randomize BN running stats too, so normalization is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    params = siggraph.from_torch_state_dict(sd)
    return ref, params


def _rand_inputs(seed=1, size=64):
    rng = np.random.default_rng(seed)
    A = rng.uniform(-50, 50, (1, size, size, 1)).astype(np.float32)
    B = rng.uniform(-110, 110, (2, size, size)).astype(np.float32)
    B[:, rng.random((size, size)) > 0.05] = 0
    mask = (np.abs(B).sum(0, keepdims=True) > 0).astype(np.float32)
    return A, B.transpose(1, 2, 0)[None], mask.transpose(1, 2, 0)[None]


def test_forward_matches_torch_nodist():
    import torch
    ref, params = _make_pair(dist=False)
    A, B, mask = _rand_inputs()
    with torch.no_grad():
        want = ref.forward(A[0].transpose(2, 0, 1),
                           B[0].transpose(2, 0, 1),
                           mask[0].transpose(2, 0, 1), maskcent=0)
    want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(siggraph.apply(params, A, B, mask, 0.0, dist=False))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 2e-4, np.max(np.abs(got - want))


def test_forward_matches_torch_dist():
    import torch
    ref, params = _make_pair(dist=True)
    A, B, mask = _rand_inputs(seed=2)
    with torch.no_grad():
        want_reg, want_cl = ref.forward(A[0].transpose(2, 0, 1),
                                        B[0].transpose(2, 0, 1),
                                        mask[0].transpose(2, 0, 1),
                                        maskcent=0.5)
    want_reg = want_reg.numpy().transpose(0, 2, 3, 1)
    want_cl = want_cl.numpy().transpose(0, 2, 3, 1)
    got_reg, got_cl = siggraph.apply(params, A, B, mask, 0.5, dist=True)
    got_reg, got_cl = np.asarray(got_reg), np.asarray(got_cl)
    assert got_cl.shape == want_cl.shape == (1, 64, 64, 529)
    assert np.max(np.abs(got_cl - want_cl)) < 1e-5
    # the double-110-scaled regression quirk must match too
    assert np.max(np.abs(got_reg - want_reg)) < 0.05
    assert np.max(np.abs(got_reg)) > 150  # proves the quirk is reproduced


def test_maskcent_traced_not_recompiled():
    _, params = _make_pair(dist=False)
    A, B, mask = _rand_inputs(size=32)
    out0 = np.asarray(siggraph.apply(params, A, B, mask, 0.0))
    out5 = np.asarray(siggraph.apply(params, A, B, mask, 0.5))
    assert not np.allclose(out0, out5)


def test_init_params_shapes_and_run():
    import jax
    params = siggraph.init_params(jax.random.key(0))
    A, B, mask = _rand_inputs(size=32)
    out = np.asarray(siggraph.apply(params, A, B, mask, 0.0))
    assert out.shape == (1, 32, 32, 2)
    assert np.all(np.abs(out) <= 110.0)


@pytest.mark.slow
def test_apply_train_consistent_with_apply():
    """apply_train's outputs must equal apply's modulo the serving-only
    transformations (double-110 scale, softmax(x0.2), x4 upsample)."""
    import jax
    from ideepcolor_tpu.ops.resize import upsample_nearest
    params = siggraph.init_params(jax.random.key(3))
    A, B, mask = _rand_inputs(seed=4, size=32)
    reg_t, logits = siggraph.apply_train(params, A, B, mask, 0.0,
                                         precision_name="highest")
    reg_i, cl = siggraph.apply(params, A, B, mask, 0.0, dist=True)
    reg_t, logits = np.asarray(reg_t), np.asarray(logits)
    reg_i, cl = np.asarray(reg_i), np.asarray(cl)
    assert np.max(np.abs(reg_t * 110.0 - reg_i)) < 1e-2
    want_cl = np.asarray(upsample_nearest(
        jax.nn.softmax(jnp.asarray(logits) * 0.2, axis=-1), 4))
    assert np.max(np.abs(cl - want_cl)) < 1e-5
