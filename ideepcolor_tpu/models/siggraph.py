"""SIGGRAPH user-guided colorization U-Net (the reference's PyTorch family).

Re-designed TPU-first but architecture-equivalent to ``SIGGRAPHGenerator``
(ref: models/pytorch/model.py:5-175): 4-channel input concat(L/100, ab/110,
mask - maskcent), encoder conv1-4 with stride-2 slicing, dilated conv5/6,
conv7, decoder with ConvTranspose x2 + skip 1x1... (3x3) adds from
conv3/2/1, regression head tanh*110, optional 529-way distribution head
softmax(logits*0.2) nearest-x4-upsampled.

Differences by design (not behavior):
  * NHWC layout, weights HWIO — TPU/XLA-native; the torch converter
    transposes once at load.
  * stride-2 subsampling slices are explicit x[:, ::2, ::2, :] (the torch
    model does the same in NCHW).
  * the whole forward is one traced program; no module objects at runtime.

Parameters: a flat dict keyed by torch state_dict names ('model1.0.weight',
...), so checkpoint conversion is a pure relayout with no renaming.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import upsample_nearest
from . import layers as L

# (block, [conv indices within the torch Sequential], bn index or None)
# Mirrors the Sequential layouts of ref models/pytorch/model.py:13-132.
_BLOCKS: list[tuple[str, list[int], int | None]] = [
    ("model1", [0, 2], 4),
    ("model2", [0, 2], 4),
    ("model3", [0, 2, 4], 6),
    ("model4", [0, 2, 4], 6),
    ("model5", [0, 2, 4], 6),
    ("model6", [0, 2, 4], 6),
    ("model7", [0, 2, 4], 6),
    ("model8up", [0], None),
    ("model3short8", [0], None),
    ("model8", [1, 3], 5),
    ("model9up", [0], None),
    ("model2short9", [0], None),
    ("model9", [1], 3),
    ("model10up", [0], None),
    ("model1short10", [0], None),
    ("model10", [1], None),
    ("model_class", [0], None),
    ("model_out", [0], None),
]

def make_shapes(c1: int = 64, c2: int = 128, c3: int = 256,
                c4: int = 512) -> dict[str, list[tuple[int, int, int, int]]]:
    """(in_ch, out_ch, kernel, dilation) per conv, in _BLOCKS order.

    Parameterized over the four channel tiers so reduced-width student
    variants (see :func:`scaled_channels`) share the exact topology —
    the runtime ``apply`` reads channel counts from the weights, so any
    tier assignment runs through the same traced program structure.
    """
    return {
        "model1": [(4, c1, 3, 1), (c1, c1, 3, 1)],
        "model2": [(c1, c2, 3, 1), (c2, c2, 3, 1)],
        "model3": [(c2, c3, 3, 1), (c3, c3, 3, 1), (c3, c3, 3, 1)],
        "model4": [(c3, c4, 3, 1), (c4, c4, 3, 1), (c4, c4, 3, 1)],
        "model5": [(c4, c4, 3, 2)] * 3,
        "model6": [(c4, c4, 3, 2)] * 3,
        "model7": [(c4, c4, 3, 1)] * 3,
        "model8up": [(c4, c3, 4, 1)],
        "model3short8": [(c3, c3, 3, 1)],
        "model8": [(c3, c3, 3, 1), (c3, c3, 3, 1)],
        "model9up": [(c3, c2, 4, 1)],
        "model2short9": [(c2, c2, 3, 1)],
        "model9": [(c2, c2, 3, 1)],
        "model10up": [(c2, c2, 4, 1)],
        "model1short10": [(c1, c2, 3, 1)],
        "model10": [(c2, c2, 3, 1)],
        "model_class": [(c3, 529, 1, 1)],
        "model_out": [(c2, 2, 1, 1)],
    }


# The reference architecture (ref models/pytorch/model.py:13-132).
_SHAPES = make_shapes()


def scaled_channels(width: float) -> tuple[int, int, int, int]:
    """Channel tiers for a width-multiplied student, rounded up to
    multiples of 8 (TPU lane alignment; FLOPs scale ~width^2)."""
    r8 = lambda c: max(8, int(-(-c * width // 8)) * 8)  # noqa: E731
    return r8(64), r8(128), r8(256), r8(512)

_DECONV_BLOCKS = {"model8up", "model9up", "model10up"}

Params = dict[str, jax.Array]


def init_params(key: jax.Array, dtype=jnp.float32,
                width: float = 1.0) -> Params:
    """He-normal random init (for tests / training from scratch).

    width < 1 builds a reduced-FLOP student with the same topology
    (channel tiers from :func:`scaled_channels`); ``apply`` runs it
    unchanged since channel counts travel in the weights.
    """
    shapes = _SHAPES if width == 1.0 else make_shapes(*scaled_channels(width))
    params: Params = {}
    for block, conv_idx, bn_idx in _BLOCKS:
        for j, (cin, cout, k, _d) in zip(conv_idx, shapes[block]):
            key, sub = jax.random.split(key)
            fan_in = cin * k * k
            w = jax.random.normal(sub, (k, k, cin, cout), dtype) * np.sqrt(
                2.0 / fan_in)
            params[f"{block}.{j}.weight"] = w
            params[f"{block}.{j}.bias"] = jnp.zeros((cout,), dtype)
        if bn_idx is not None:
            cout = shapes[block][-1][1]
            params[f"{block}.{bn_idx}.weight"] = jnp.ones((cout,), dtype)
            params[f"{block}.{bn_idx}.bias"] = jnp.zeros((cout,), dtype)
            params[f"{block}.{bn_idx}.running_mean"] = jnp.zeros((cout,), dtype)
            params[f"{block}.{bn_idx}.running_var"] = jnp.ones((cout,), dtype)
    return params


def from_torch_state_dict(sd: Mapping[str, Any]) -> Params:
    """Convert a ``SIGGRAPHGenerator`` torch state_dict (e.g. the published
    ``pytorch.pth`` / ``caffemodel.pth`` checkpoints, ref prep_net at
    data/colorize_image.py:216-233) into our HWIO/NHWC param dict."""
    params: Params = {}
    for block, conv_idx, bn_idx in _BLOCKS:
        is_deconv = block in _DECONV_BLOCKS
        for j in conv_idx:
            w = np.asarray(sd[f"{block}.{j}.weight"])
            conv = (L.torch_convT_to_hwio if is_deconv
                    else L.torch_conv_to_hwio)
            params[f"{block}.{j}.weight"] = conv(w)
            params[f"{block}.{j}.bias"] = jnp.asarray(
                np.asarray(sd[f"{block}.{j}.bias"]))
        if bn_idx is not None:
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                params[f"{block}.{bn_idx}.{suffix}"] = jnp.asarray(
                    np.asarray(sd[f"{block}.{bn_idx}.{suffix}"]))
    return params


def to_torch_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of :func:`from_torch_state_dict`: our HWIO param dict ->
    a ``SIGGRAPHGenerator`` torch state_dict layout (OIHW convs, IOHW
    deconvs, ``num_batches_tracked`` zeros included so
    ``load_state_dict(strict=True)`` accepts it). Lets checkpoints
    trained here run under the reference's own torch definition
    (ref models/pytorch/model.py:5-175); width-scaled students export
    too, but only full-width matches the reference class's shapes."""
    out: dict[str, np.ndarray] = {}
    for block, conv_idx, bn_idx in _BLOCKS:
        is_deconv = block in _DECONV_BLOCKS
        for j in conv_idx:
            w = params[f"{block}.{j}.weight"]
            conv = (L.hwio_to_torch_convT if is_deconv
                    else L.hwio_to_torch_conv)
            out[f"{block}.{j}.weight"] = conv(w)
            out[f"{block}.{j}.bias"] = np.asarray(params[f"{block}.{j}.bias"])
        if bn_idx is not None:
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                out[f"{block}.{bn_idx}.{suffix}"] = np.asarray(
                    params[f"{block}.{bn_idx}.{suffix}"])
            out[f"{block}.{bn_idx}.num_batches_tracked"] = np.zeros(
                (), np.int64)
    return out


def params_from_state_dict(sd: Mapping[str, Any]) -> Params:
    """Accept either an already-converted param dict (HWIO: the 4 input
    channels sit in axis 2 of the first conv) or a raw torch state dict
    (OIHW: they sit in axis 1). Works at any width tier."""
    if np.asarray(sd["model1.0.weight"]).shape[2] == 4:
        return {k: jnp.asarray(v) for k, v in sd.items()}
    return from_torch_state_dict(sd)


def load_params(path: str) -> Params:
    """Load a params-only SIGGRAPH checkpoint from any supported
    container (.npz / .pth / orbax dir / train-state dir), converting
    torch state dicts to our layout. The one loader behind the train
    CLI's --init-from and the .pth export direction of
    scripts/convert_checkpoint.py."""
    from ..api.colorize import _load_checkpoint  # lazy: no import cycle
    sd = _load_checkpoint(path)
    if sd is None:
        raise ValueError("empty checkpoint path")
    if "model1.0.weight" not in sd:
        raise ValueError(
            f"{path} is not a SIGGRAPH-family checkpoint (no "
            "'model1.0.weight' — caffe_net params have their own keying "
            "and load via api.ColorizeImageJaxCaffe*, not this path)")
    return params_from_state_dict(sd)


def _block(params: Params, name: str, x: jax.Array,
           precision) -> jax.Array:
    """Apply one Sequential block: convs with ReLU between, optional BN.

    Activation placement follows the torch Sequentials exactly:
    model1-7: [conv relu]*n bn; model8/9: relu-led (the leading ReLU is
    applied by the caller after the skip add); model10: relu conv leaky.
    """
    _, conv_idx, bn_idx = next(b for b in _BLOCKS if b[0] == name)
    shapes = _SHAPES[name]
    for i, (j, (_cin, _cout, _k, dil)) in enumerate(zip(conv_idx, shapes)):
        w = params[f"{name}.{j}.weight"]
        b = params[f"{name}.{j}.bias"]
        if name in _DECONV_BLOCKS:
            x = L.conv_transpose2d_k4s2p1(x, w, b, precision=precision)
        else:
            x = L.conv2d(x, w, b, dilation=dil, precision=precision)
        is_last = i == len(conv_idx) - 1
        if name == "model10" and is_last:
            x = L.leaky_relu(x, 0.2)
        elif name in ("model_class", "model_out") or name.endswith("up") \
                or name.startswith(("model3short", "model2short",
                                    "model1short")):
            pass                       # bare conv; caller handles activation
        else:
            x = L.relu(x)
    if bn_idx is not None:
        x = L.batchnorm(
            x,
            params[f"{name}.{bn_idx}.running_mean"],
            params[f"{name}.{bn_idx}.running_var"],
            params[f"{name}.{bn_idx}.weight"],
            params[f"{name}.{bn_idx}.bias"],
        )
    return x


@partial(jax.jit, static_argnames=("dist", "precision_name",
                                   "dist_lowres"))
def apply(params: Params, input_A: jax.Array, input_B: jax.Array,
          mask_B: jax.Array, maskcent: jax.Array | float = 0.0,
          dist: bool = False, precision_name: str = "highest",
          dist_lowres: bool = False):
    """Forward pass.

    input_A (N,H,W,1) lightness - 50 in [-50, 50];
    input_B (N,H,W,2) hint ab in [-110, 110];
    mask_B  (N,H,W,1) hint mask in [0, 1] (maskcent subtracted here, like
    ref models/pytorch/model.py:142).

    Returns out_reg (N,H,W,2) ab in [-110,110]; with dist=True returns
    (out_reg * 110, out_cl) replicating the reference's double-scaling quirk
    at ref models/pytorch/model.py:166-168 (callers ignore that value; the
    dist head out_cl is (N,H,W,529) softmax probabilities).
    """
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "default": jax.lax.Precision.DEFAULT}[precision_name]
    blk = lambda n, x: _block(params, n, x, precision)  # noqa: E731

    x = jnp.concatenate(
        [input_A / 100.0, input_B / 110.0, mask_B - maskcent], axis=-1)

    conv1_2 = blk("model1", x)
    conv2_2 = blk("model2", conv1_2[:, ::2, ::2, :])
    conv3_3 = blk("model3", conv2_2[:, ::2, ::2, :])
    conv4_3 = blk("model4", conv3_3[:, ::2, ::2, :])
    conv5_3 = blk("model5", conv4_3)
    conv6_3 = blk("model6", conv5_3)
    conv7_3 = blk("model7", conv6_3)

    conv8_up = blk("model8up", conv7_3) + blk("model3short8", conv3_3)
    conv8_3 = blk("model8", L.relu(conv8_up))

    def decode_tail(c8):
        conv9_up = blk("model9up", c8) + blk("model2short9", conv2_2)
        conv9_3 = blk("model9", L.relu(conv9_up))
        conv10_up = blk("model10up", conv9_3) + blk("model1short10", conv1_2)
        conv10_2 = blk("model10", L.relu(conv10_up))
        out = blk("model_out", conv10_2)
        return jnp.tanh(out) * 110.0

    if dist:
        logits = blk("model_class", conv8_3)
        out_cl = jax.nn.softmax(logits * 0.2, axis=-1)
        if not dist_lowres:
            # The reference nearest-upsamples the distribution x4 to full
            # res (ref models/pytorch/model.py:131,160). Point lookups on
            # the upsampled map equal lookups at (h//4, w//4) on the H/4
            # map, so dist_lowres=True keeps the (..., H/4, W/4, 529)
            # form and avoids a 16x memory blowup on the hot path.
            out_cl = upsample_nearest(out_cl, 4)
        out_reg = decode_tail(conv8_3)
        # NB: reference multiplies by 110 a second time in dist mode
        # (ref models/pytorch/model.py:166-168); value unused by callers
        # but reproduced for bit parity of the public return.
        return out_reg * 110.0, out_cl
    return decode_tail(conv8_3)


def apply_train(params: Params, input_A: jax.Array, input_B: jax.Array,
                mask_B: jax.Array, maskcent: jax.Array | float = 0.0,
                precision_name: str = "default"):
    """Training-mode forward: (out_reg ab in [-110,110], class logits).

    Same trunk as :func:`apply` but returns RAW classification logits at the
    conv8 resolution (H/4) and the singly-scaled regression output — the
    inference-path softmax/upsample/double-110 quirks belong to serving,
    not to the loss (losses soft-encode targets at H/4 directly).
    """
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "default": jax.lax.Precision.DEFAULT}[precision_name]
    blk = lambda n, x: _block(params, n, x, precision)  # noqa: E731

    x = jnp.concatenate(
        [input_A / 100.0, input_B / 110.0, mask_B - maskcent], axis=-1)
    conv1_2 = blk("model1", x)
    conv2_2 = blk("model2", conv1_2[:, ::2, ::2, :])
    conv3_3 = blk("model3", conv2_2[:, ::2, ::2, :])
    conv4_3 = blk("model4", conv3_3[:, ::2, ::2, :])
    conv5_3 = blk("model5", conv4_3)
    conv6_3 = blk("model6", conv5_3)
    conv7_3 = blk("model7", conv6_3)
    conv8_up = blk("model8up", conv7_3) + blk("model3short8", conv3_3)
    conv8_3 = blk("model8", L.relu(conv8_up))

    logits = blk("model_class", conv8_3)

    conv9_up = blk("model9up", conv8_3) + blk("model2short9", conv2_2)
    conv9_3 = blk("model9", L.relu(conv9_up))
    conv10_up = blk("model10up", conv9_3) + blk("model1short10", conv1_2)
    conv10_2 = blk("model10", L.relu(conv10_up))
    out_reg = jnp.tanh(blk("model_out", conv10_2)) * 110.0
    return out_reg, logits
