"""Parity tests for the Caffe-graph family against a torch oracle.

The published caffemodels are not available, so we verify the graph
structure independently: a torch implementation of the prototxt semantics is
assembled HERE in the test (a second, independent reading of the spec) and
driven with the same randomly initialized weights as our JAX model. Any
disagreement in deconv phase, BN semantics, skip wiring, dilation or head
math shows up as a mismatch.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ideepcolor_tpu.data.color_bins import get_bins
from ideepcolor_tpu.models import caffe_net

EPS = 1e-5


def _t(x):
    return torch.tensor(np.asarray(x))


def _tw(params, name):
    """HWIO -> torch OIHW."""
    return _t(np.asarray(params[f"{name}.weight"]).transpose(3, 2, 0, 1))


def _tdw(params, name):
    """flipped-HWIO (our deconv storage) -> torch ConvTranspose2d (I,O,H,W)."""
    w = np.asarray(params[f"{name}.weight"])[::-1, ::-1].copy()
    return _t(w.transpose(2, 3, 0, 1))


def _tb(params, name):
    return _t(np.asarray(params[f"{name}.bias"]))


class TorchOracle:
    """Independent prototxt interpretation in torch (NCHW)."""

    def __init__(self, params, variant):
        self.p = params
        self.variant = variant

    def conv(self, name, x, dilation=1):
        k = self.p[f"{name}.weight"].shape[0]
        pad = dilation * (k - 1) // 2
        return F.conv2d(x, _tw(self.p, name), _tb(self.p, name),
                        padding=pad, dilation=dilation)

    def deconv(self, name, x):
        return F.conv_transpose2d(x, _tdw(self.p, name), _tb(self.p, name),
                                  stride=2, padding=1)

    def bn(self, name, x):
        mean = _t(np.asarray(self.p[f"{name}.mean"]))
        var = _t(np.asarray(self.p[f"{name}.var"]))
        return (x - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + EPS)

    def trunk(self, data, glob_embedding=None):
        r = torch.relu
        l_ch, abm = data[:, 0:1], data[:, 1:4]
        if self.variant == "global":
            x = r(self.conv("bw_conv1_1", l_ch))
        else:
            x = r(self.conv("bw_conv1_1", l_ch)
                  + self.conv("ab_conv1_1", abm))
        c1 = self.bn("conv1_2norm", r(self.conv("conv1_2", x)))
        x = c1[:, :, ::2, ::2]
        x = r(self.conv("conv2_1", x))
        c2 = self.bn("conv2_2norm", r(self.conv("conv2_2", x)))
        x = c2[:, :, ::2, ::2]
        x = r(self.conv("conv3_1", x))
        x = r(self.conv("conv3_2", x))
        c3 = self.bn("conv3_3norm", r(self.conv("conv3_3", x)))
        x = c3[:, :, ::2, ::2]
        x = r(self.conv("conv4_1", x))
        x = r(self.conv("conv4_2", x))
        c4 = self.bn("conv4_3norm", r(self.conv("conv4_3", x)))
        if glob_embedding is not None:
            c4 = c4 + glob_embedding[:, :, None, None]
        x = c4
        for i in (1, 2, 3):
            x = r(self.conv(f"conv5_{i}", x, dilation=2))
        c5 = self.bn("conv5_3norm", x)
        x = c5
        for i in (1, 2, 3):
            x = r(self.conv(f"conv6_{i}", x, dilation=2))
        c6 = self.bn("conv6_3norm", x)
        x = c6
        for i in (1, 2, 3):
            x = r(self.conv(f"conv7_{i}", x))
        c7 = self.bn("conv7_3norm", x)
        x = r(self.deconv("conv8_1", c7) + self.conv("conv3_3_short", c3))
        x = r(self.conv("conv8_2", x))
        c8 = self.bn("conv8_3norm", r(self.conv("conv8_3", x)))
        return dict(c1=c1, c2=c2, c3=c3, c4=c4, c5=c5, c6=c6, c7=c7, c8=c8)

    def regression(self, t):
        r = torch.relu
        x = r(self.deconv("conv9_1", t["c8"])
              + self.conv("conv2_2_short", t["c2"]))
        x = self.bn("conv9_2norm", r(self.conv("conv9_2", x)))
        x = r(self.deconv("conv10_1", x)
              + self.conv("conv1_2_short", t["c1"]))
        x = r(self.conv("conv10_2", x))
        x = self.conv("conv10_ab", x)
        return torch.tanh(x) * float(self.p["pred_ab.scale"])


def _rand_blob(seed, size=32):
    rng = np.random.default_rng(seed)
    l_mc = rng.uniform(-50, 50, (1, size, size, 1))
    ab = rng.uniform(-80, 80, (1, size, size, 2))
    ab[:, rng.random((size, size)) > 0.05] = 0
    mask = (np.abs(ab).sum(-1, keepdims=True) > 0) * 110.0
    return np.concatenate([l_mc, ab, mask], -1).astype(np.float32)


def test_main_variant_matches_torch_oracle():
    params = caffe_net.init_params(jax.random.key(0), "main")
    blob = _rand_blob(0)
    got = np.asarray(caffe_net.apply_main(params, blob))
    oracle = TorchOracle(params, "main")
    with torch.no_grad():
        t = oracle.trunk(_t(blob.transpose(0, 3, 1, 2)))
        want = oracle.regression(t).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape
    # output is tanh*100; f32 noise through BN amplifies to ~1e-2 max
    assert np.max(np.abs(got - want)) < 0.05
    assert np.mean(np.abs(got - want)) < 1e-3


def test_dist_variant_matches_torch_oracle():
    params = caffe_net.init_params(jax.random.key(1), "dist")
    blob = _rand_blob(1)
    pred_ab, dist_S = caffe_net.apply_dist(params, blob)
    pred_ab, dist_S = np.asarray(pred_ab), np.asarray(dist_S)

    oracle = TorchOracle(params, "dist")
    with torch.no_grad():
        t = oracle.trunk(_t(blob.transpose(0, 3, 1, 2)))
        h = torch.relu(
            oracle.conv("conv3_pred", t["c3"])
            + oracle.deconv("conv4_pred", t["c4"])
            + oracle.deconv("conv5_pred", t["c5"])
            + oracle.deconv("conv6_pred", t["c6"])
            + oracle.deconv("conv7_pred", t["c7"])
            + oracle.conv("conv8_pred", t["c8"]))
        logits = oracle.conv("pred_313", h)
        # fixed bilinear x2 twice, via grouped deconv like caffe
        k = np.array([[.25, .5, .25, 0], [.5, 1., .5, 0],
                      [.25, .5, .25, 0], [0, 0, 0, 0]], np.float32)
        kern = torch.tensor(np.tile(k[None, None], (313, 1, 1, 1)))
        for _ in range(2):
            logits = F.conv_transpose2d(logits, kern, stride=2, padding=1,
                                        groups=313)
        want_S = torch.softmax(logits * float(params["scale_S.scale"]),
                               dim=1).numpy().transpose(0, 2, 3, 1)
        dist_T = torch.softmax(logits * float(params["scale_T.scale"]), dim=1)
        centers = torch.tensor(get_bins().pts_in_hull.astype(np.float32))
        want_ab = torch.einsum("nkhw,kc->nchw", dist_T, centers)
        want_ab = want_ab.numpy().transpose(0, 2, 3, 1)

    assert dist_S.shape == want_S.shape == (1, 32, 32, 313)
    assert np.max(np.abs(dist_S - want_S)) < 1e-4
    assert np.max(np.abs(pred_ab - want_ab)) < 0.05
    assert np.mean(np.abs(pred_ab - want_ab)) < 1e-3


def test_global_variant_matches_torch_oracle():
    params = caffe_net.init_params(jax.random.key(2), "global")
    blob = _rand_blob(2)
    rng = np.random.default_rng(3)
    hist = rng.dirichlet(np.ones(313)).astype(np.float32)
    glob = np.concatenate([hist, [1.0]]).astype(np.float32)[None]
    got = np.asarray(caffe_net.apply_global(params, blob, glob))

    oracle = TorchOracle(params, "global")
    with torch.no_grad():
        g = _t(glob)[:, :, None, None]
        s = torch.zeros((1, 2, 1, 1))
        x = torch.relu(oracle.conv("s_conv1", s)
                       + oracle.conv("glob_conv1", g))
        x = oracle.bn("s_glob_conv1norm", x)
        x = oracle.bn("glob_conv2norm", torch.relu(oracle.conv("glob_conv2", x)))
        x = oracle.bn("glob_conv3norm", torch.relu(oracle.conv("glob_conv3", x)))
        x = oracle.bn("glob_conv4norm", torch.relu(oracle.conv("glob_conv4", x)))
        emb = x[:, :, 0, 0]
        t = oracle.trunk(_t(blob.transpose(0, 3, 1, 2)), glob_embedding=emb)
        want = oracle.regression(t).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape
    # output is tanh*100; f32 noise through BN amplifies to ~1e-2 max
    assert np.max(np.abs(got - want)) < 0.05
    assert np.mean(np.abs(got - want)) < 1e-3


def test_global_zero_histogram_differs_from_nonzero():
    params = caffe_net.init_params(jax.random.key(4), "global")
    blob = _rand_blob(4)
    zero = np.zeros((1, 314), np.float32)
    hist = np.concatenate([np.full(313, 1 / 313), [1.0]]).astype(np.float32)[None]
    out0 = np.asarray(caffe_net.apply_global(params, blob, zero))
    out1 = np.asarray(caffe_net.apply_global(params, blob, hist))
    assert not np.allclose(out0, out1)
