"""The reference's Caffe colorization graphs, rebuilt as one JAX family.

Covers all three deployed prototxt variants with a single functional trunk
(ref: models/reference_model/deploy_nodist.prototxt — 90 layers,
deploy_nopred.prototxt — 77 layers, models/global_model/deploy_nodist.prototxt
— 96 layers):

  variant='main'   : dual-branch conv1 (bw + ab hints, Eltwise add), encoder
                     with fixed stride-2 depthwise '_ss' subsampling convs,
                     dilated conv5/6, decoder deconvs with '_short' skip adds,
                     regression head conv10_ab -> TanH -> Scale(100).
  variant='dist'   : same trunk through conv8_3norm, then the multi-scale
                     hypercolumn head (conv3..8_pred summed), pred_313,
                     two fixed bilinear x2 upsamplers, twin softmax branches
                     scale_S -> dist_ab_S (suggestions) and scale_T ->
                     dist_ab_T -> annealed-mean pred_ab (pts_in_hull weights,
                     injected by the reference at data/colorize_image.py:405).
  variant='global' : L-only conv1, 4-layer 1x1-conv MLP over the 314-ch
                     global histogram (+ 2-ch saturation), broadcast-added
                     into the trunk at conv4_3norm (the reference does this
                     via a Python SpatialRepLayer bridge,
                     ref: caffe_traininglayers.py:14-50; here it is a plain
                     broadcast add inside the same XLA program).

TPU-first design notes:
  * the '_ss' layers (depthwise 1x1 stride-2 convs with constant weight 1,
    ref deploy_nodist.prototxt:87-101) are exactly x[:, ::2, ::2, :] — we
    implement them as slices, zero FLOPs;
  * the '_us' fixed bilinear upsampler deconvs become
    ops.resize.bilinear_up2_fixed (fixed kernel, no params);
  * the annealed-mean 1x1 conv trick becomes an einsum with the bin table;
  * caffe BatchNorm (TEST phase) is normalize-only: (x - mean)/sqrt(var+eps).

Parameter keys use the caffe layer names ('bw_conv1_1.weight', ...), so a
caffemodel converter is a pure relayout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.color_bins import get_bins
from ..ops.resize import bilinear_up2_fixed
from . import layers as L

Params = dict[str, jax.Array]

# Encoder/decoder conv specs shared by every variant:
# (name, in_ch, out_ch, kernel, dilation, kind)
_TRUNK_CONVS = [
    ("bw_conv1_1", 1, 64, 3, 1, "conv"),
    ("ab_conv1_1", 3, 64, 3, 1, "conv"),       # absent in 'global'
    ("conv1_2", 64, 64, 3, 1, "conv"),
    ("conv2_1", 64, 128, 3, 1, "conv"),
    ("conv2_2", 128, 128, 3, 1, "conv"),
    ("conv3_1", 128, 256, 3, 1, "conv"),
    ("conv3_2", 256, 256, 3, 1, "conv"),
    ("conv3_3", 256, 256, 3, 1, "conv"),
    ("conv4_1", 256, 512, 3, 1, "conv"),
    ("conv4_2", 512, 512, 3, 1, "conv"),
    ("conv4_3", 512, 512, 3, 1, "conv"),
    ("conv5_1", 512, 512, 3, 2, "conv"),
    ("conv5_2", 512, 512, 3, 2, "conv"),
    ("conv5_3", 512, 512, 3, 2, "conv"),
    ("conv6_1", 512, 512, 3, 2, "conv"),
    ("conv6_2", 512, 512, 3, 2, "conv"),
    ("conv6_3", 512, 512, 3, 2, "conv"),
    ("conv7_1", 512, 512, 3, 1, "conv"),
    ("conv7_2", 512, 512, 3, 1, "conv"),
    ("conv7_3", 512, 512, 3, 1, "conv"),
    ("conv8_1", 512, 256, 4, 1, "deconv"),
    ("conv3_3_short", 256, 256, 3, 1, "conv"),
    ("conv8_2", 256, 256, 3, 1, "conv"),
    ("conv8_3", 256, 256, 3, 1, "conv"),
]

_MAIN_HEAD_CONVS = [
    ("conv9_1", 256, 128, 4, 1, "deconv"),
    ("conv2_2_short", 128, 128, 3, 1, "conv"),
    ("conv9_2", 128, 128, 3, 1, "conv"),
    ("conv10_1", 128, 128, 4, 1, "deconv"),
    ("conv1_2_short", 64, 128, 3, 1, "conv"),
    ("conv10_2", 128, 128, 3, 1, "conv"),
    ("conv10_ab", 128, 2, 1, 1, "conv"),
]

_DIST_HEAD_CONVS = [
    ("conv3_pred", 256, 384, 3, 1, "conv"),
    ("conv4_pred", 512, 384, 4, 1, "deconv"),
    ("conv5_pred", 512, 384, 4, 1, "deconv"),
    ("conv6_pred", 512, 384, 4, 1, "deconv"),
    ("conv7_pred", 512, 384, 4, 1, "deconv"),
    ("conv8_pred", 256, 384, 3, 1, "conv"),
    ("pred_313", 384, 313, 1, 1, "conv"),
]

_GLOBAL_MLP_CONVS = [
    ("s_conv1", 2, 512, 1, 1, "conv"),
    ("glob_conv1", 314, 512, 1, 1, "conv"),
    ("glob_conv2", 512, 512, 1, 1, "conv"),
    ("glob_conv3", 512, 512, 1, 1, "conv"),
    ("glob_conv4", 512, 512, 1, 1, "conv"),
]

_BNS = ["conv1_2norm", "conv2_2norm", "conv3_3norm", "conv4_3norm",
        "conv5_3norm", "conv6_3norm", "conv7_3norm", "conv8_3norm"]
_MAIN_BNS = ["conv9_2norm"]
_GLOBAL_BNS = ["s_glob_conv1norm", "glob_conv2norm", "glob_conv3norm",
               "glob_conv4norm"]


def _convs_for(variant: str):
    convs = [c for c in _TRUNK_CONVS
             if not (variant == "global" and c[0] == "ab_conv1_1")]
    if variant in ("main", "global"):
        convs += _MAIN_HEAD_CONVS
    if variant == "dist":
        convs += _DIST_HEAD_CONVS
    if variant == "global":
        convs += _GLOBAL_MLP_CONVS
    return convs


def _bns_for(variant: str):
    bns = list(_BNS)
    if variant in ("main", "global"):
        bns += _MAIN_BNS
    if variant == "global":
        bns += _GLOBAL_BNS
    return bns


def init_params(key: jax.Array, variant: str = "main",
                dtype=jnp.float32) -> Params:
    params: Params = {}
    for name, cin, cout, k, _d, kind in _convs_for(variant):
        key, sub = jax.random.split(key)
        fan_in = cin * k * k
        params[f"{name}.weight"] = (
            jax.random.normal(sub, (k, k, cin, cout), dtype)
            * np.sqrt(2.0 / fan_in))
        params[f"{name}.bias"] = jnp.zeros((cout,), dtype)
    for name in _bns_for(variant):
        cout = {"conv1_2norm": 64, "conv2_2norm": 128, "conv3_3norm": 256,
                "conv9_2norm": 128, "conv8_3norm": 256}.get(name, 512)
        params[f"{name}.mean"] = jnp.zeros((cout,), dtype)
        params[f"{name}.var"] = jnp.ones((cout,), dtype)
    if variant in ("main", "global"):
        params["pred_ab.scale"] = jnp.asarray(100.0, dtype)
    if variant == "dist":
        params["scale_S.scale"] = jnp.asarray(0.2, dtype)
        params["scale_T.scale"] = jnp.asarray(2.6, dtype)
    return params


def _trunk(params: Params, data: jax.Array, variant: str, precision,
           glob_embedding: jax.Array | None = None):
    """Shared encoder through conv8_3norm.

    data: (N, H, W, 4) = concat(L - 50, ab_hints, mask*110) — the caffe
    blob convention (ref data/colorize_image.py:379-427, mask_mult=110).
    Returns the intermediate norms needed by the heads.
    """
    cv = partial(_named_conv, params, precision=precision)
    bn = partial(_named_bn, params)

    data_l = data[..., 0:1]
    data_ab_mask = data[..., 1:4]

    if variant == "global":
        x = L.relu(cv("bw_conv1_1", data_l))
    else:
        x = L.relu(cv("bw_conv1_1", data_l) + cv("ab_conv1_1", data_ab_mask))
    conv1_2norm = bn("conv1_2norm", L.relu(cv("conv1_2", x)))

    x = conv1_2norm[:, ::2, ::2, :]                  # conv1_2norm_ss
    x = L.relu(cv("conv2_1", x))
    conv2_2norm = bn("conv2_2norm", L.relu(cv("conv2_2", x)))

    x = conv2_2norm[:, ::2, ::2, :]                  # conv2_2norm_ss
    x = L.relu(cv("conv3_1", x))
    x = L.relu(cv("conv3_2", x))
    conv3_3norm = bn("conv3_3norm", L.relu(cv("conv3_3", x)))

    x = conv3_3norm[:, ::2, ::2, :]                  # conv3_3norm_ss
    x = L.relu(cv("conv4_1", x))
    x = L.relu(cv("conv4_2", x))
    conv4_3norm = bn("conv4_3norm", L.relu(cv("conv4_3", x)))

    if glob_embedding is not None:
        # SpatialRepLayer broadcast + Eltwise add (ref global_model/
        # deploy_nodist.prototxt:502-518) — a plain broadcast in XLA.
        conv4_3norm = conv4_3norm + glob_embedding[:, None, None, :]

    x = conv4_3norm
    for i in (1, 2, 3):
        x = L.relu(cv(f"conv5_{i}", x, dilation=2))
    conv5_3norm = bn("conv5_3norm", x)
    x = conv5_3norm
    for i in (1, 2, 3):
        x = L.relu(cv(f"conv6_{i}", x, dilation=2))
    conv6_3norm = bn("conv6_3norm", x)
    x = conv6_3norm
    for i in (1, 2, 3):
        x = L.relu(cv(f"conv7_{i}", x))
    conv7_3norm = bn("conv7_3norm", x)

    conv8_1 = _named_deconv(params, "conv8_1", conv7_3norm, precision)
    x = L.relu(conv8_1 + cv("conv3_3_short", conv3_3norm))
    x = L.relu(cv("conv8_2", x))
    conv8_3norm = bn("conv8_3norm", L.relu(cv("conv8_3", x)))

    return dict(conv1_2norm=conv1_2norm, conv2_2norm=conv2_2norm,
                conv3_3norm=conv3_3norm, conv4_3norm=conv4_3norm,
                conv5_3norm=conv5_3norm, conv6_3norm=conv6_3norm,
                conv7_3norm=conv7_3norm, conv8_3norm=conv8_3norm)


def _named_conv(params, name, x, dilation=1, precision=None):
    return L.conv2d(x, params[f"{name}.weight"], params[f"{name}.bias"],
                    dilation=dilation, precision=precision)


def _named_deconv(params, name, x, precision):
    return L.conv_transpose2d_k4s2p1(
        x, params[f"{name}.weight"], params[f"{name}.bias"],
        precision=precision)


def _named_bn(params, name, x):
    return L.batchnorm(x, params[f"{name}.mean"], params[f"{name}.var"])


def _regression_head(params: Params, t: dict, precision) -> jax.Array:
    cv = partial(_named_conv, params, precision=precision)
    x = _named_deconv(params, "conv9_1", t["conv8_3norm"], precision)
    x = L.relu(x + cv("conv2_2_short", t["conv2_2norm"]))
    x = _named_bn(params, "conv9_2norm", L.relu(cv("conv9_2", x)))
    x = _named_deconv(params, "conv10_1", x, precision)
    x = L.relu(x + cv("conv1_2_short", t["conv1_2norm"]))
    x = L.relu(cv("conv10_2", x))
    x = cv("conv10_ab", x)
    return jnp.tanh(x) * params["pred_ab.scale"]


@partial(jax.jit, static_argnames=("precision_name",))
def apply_main(params: Params, data: jax.Array,
               precision_name: str = "highest") -> jax.Array:
    """variant='main' forward: (N,H,W,4) blob -> (N,H,W,2) pred_ab."""
    precision = _prec(precision_name)
    t = _trunk(params, data, "main", precision)
    return _regression_head(params, t, precision)


@partial(jax.jit, static_argnames=("precision_name",))
def apply_dist(params: Params, data: jax.Array,
               precision_name: str = "highest"):
    """variant='dist' forward -> (pred_ab, dist_ab_S) with shapes
    (N,H,W,2) and (N,H,W,313).

    dist_ab_S is the suggestion-softened distribution (scale_S, default .2,
    ref data/colorize_image.py:482-485); pred_ab is the annealed-mean point
    estimate through scale_T (ref deploy_nopred.prototxt:806-850).
    """
    precision = _prec(precision_name)
    cv = partial(_named_conv, params, precision=precision)
    t = _trunk(params, data, "dist", precision)

    h = (cv("conv3_pred", t["conv3_3norm"])
         + _named_deconv(params, "conv4_pred", t["conv4_3norm"], precision)
         + _named_deconv(params, "conv5_pred", t["conv5_3norm"], precision)
         + _named_deconv(params, "conv6_pred", t["conv6_3norm"], precision)
         + _named_deconv(params, "conv7_pred", t["conv7_3norm"], precision)
         + cv("conv8_pred", t["conv8_3norm"]))
    h = L.relu(h)
    logits = cv("pred_313", h)                       # (N, H/4, W/4, 313)
    logits = bilinear_up2_fixed(bilinear_up2_fixed(logits))  # x4 to full res

    dist_S = jax.nn.softmax(logits * params["scale_S.scale"], axis=-1)
    dist_T = jax.nn.softmax(logits * params["scale_T.scale"], axis=-1)
    centers = jnp.asarray(get_bins().pts_in_hull, jnp.float32)
    pred_ab = jnp.einsum("nhwk,kc->nhwc", dist_T, centers,
                         precision=jax.lax.Precision.HIGHEST)
    return pred_ab, dist_S


@partial(jax.jit, static_argnames=("precision_name",))
def apply_global(params: Params, data: jax.Array, glob_ab_313_mask: jax.Array,
                 s_avg_mask: jax.Array | None = None,
                 precision_name: str = "highest") -> jax.Array:
    """variant='global' forward.

    glob_ab_313_mask: (N, 314) — 313-bin global histogram + on/off flag in
    the last channel (ref data/colorize_image.py:452-459).
    s_avg_mask: (N, 2) mean saturation + flag; defaults to zeros (the
    reference GUI path never feeds it).
    """
    precision = _prec(precision_name)
    cv = partial(_named_conv, params, precision=precision)
    bn = partial(_named_bn, params)
    if s_avg_mask is None:
        s_avg_mask = jnp.zeros((data.shape[0], 2), data.dtype)

    g = glob_ab_313_mask[:, None, None, :]           # 1x1 "image"
    s = s_avg_mask[:, None, None, :]
    x = L.relu(cv("s_conv1", s) + cv("glob_conv1", g))
    x = bn("s_glob_conv1norm", x)
    x = bn("glob_conv2norm", L.relu(cv("glob_conv2", x)))
    x = bn("glob_conv3norm", L.relu(cv("glob_conv3", x)))
    x = bn("glob_conv4norm", L.relu(cv("glob_conv4", x)))
    glob_embedding = x[:, 0, 0, :]                   # (N, 512)

    t = _trunk(params, data, "global", precision,
               glob_embedding=glob_embedding)
    return _regression_head(params, t, precision)


def _prec(name: str):
    return {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[name]


def make_blob(img_l_mc: jax.Array, input_ab: jax.Array,
              input_mask: jax.Array, mask_mult: float = 110.0) -> jax.Array:
    """Assemble the (N,H,W,4) input blob from channel-last planes.

    img_l_mc: (H,W,1) mean-centered L; input_ab: (H,W,2) raw hint ab;
    input_mask: (H,W,1) in {0,1}. Matches the blob stuffing at
    ref data/colorize_image.py:425-427 (caffe mask_mult=110).
    """
    blob = jnp.concatenate(
        [img_l_mc, input_ab, input_mask * mask_mult], axis=-1)
    return blob[None] if blob.ndim == 3 else blob
