"""Shared functional NN building blocks (NHWC, XLA-friendly).

All parameters live in flat dicts of jnp arrays; every function is pure and
jit-traceable. Conv weights use HWIO layout (TPU-native); converters from
torch (OIHW) / caffe (OIHW) transpose once at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Parity mode runs convs at HIGHEST precision (f32-exact on TPU); perf mode
# (bfloat16 params/activations) uses the default fast path.
DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
           stride: int = 1, dilation: int = 1, padding: int | None = None,
           groups: int = 1,
           precision=DEFAULT_PRECISION) -> jax.Array:
    """Standard 2-D conv, NHWC x HWIO -> NHWC, torch-style symmetric padding.

    ``padding=None`` means 'same-ish' torch convention: p = dilation*(k-1)//2.
    """
    k = w.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    # the parameter dtype selects the compute dtype (bfloat16 serving mode
    # casts activations down here; accumulation stays f32 via
    # preferred_element_type)
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose2d_k4s2p1(x: jax.Array, w: jax.Array,
                            b: jax.Array | None = None,
                            precision=DEFAULT_PRECISION) -> jax.Array:
    """Transposed conv with kernel 4, stride 2, padding 1 (exact 2x upsample).

    This is the only deconv geometry the reference uses (torch
    ConvTranspose2d(k=4,s=2,p=1) at models/pytorch/model.py:75,86,96 and the
    Caffe Deconvolution layers). Implemented as an lhs-dilated conv so XLA
    lowers it onto the MXU like any other conv.

    ``w`` must already be in 'equivalent regular conv' HWIO layout, i.e.
    spatially flipped relative to the transposed-conv kernel; converters
    handle this (see :func:`torch_convT_to_hwio`).
    """
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),        # k-1-p per side
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def batchnorm(x: jax.Array, mean: jax.Array, var: jax.Array,
              gamma: jax.Array | None = None, beta: jax.Array | None = None,
              eps: float = 1e-5) -> jax.Array:
    """Inference-mode batch normalization over the channel (last) axis."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    out = (x - mean) * inv
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out.astype(x.dtype)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


# --- layout converters ------------------------------------------------------

def torch_conv_to_hwio(w) -> jnp.ndarray:
    """torch Conv2d weight (O, I, H, W) -> HWIO."""
    return jnp.asarray(w).transpose(2, 3, 1, 0)


def torch_convT_to_hwio(w) -> jnp.ndarray:
    """torch ConvTranspose2d weight (I, O, H, W) -> flipped HWIO for the
    lhs-dilated-conv formulation used by conv_transpose2d_k4s2p1."""
    w = jnp.asarray(w)[:, :, ::-1, ::-1]
    return w.transpose(2, 3, 0, 1)


def hwio_to_torch_conv(w):
    """Inverse of :func:`torch_conv_to_hwio`: HWIO -> torch OIHW."""
    import numpy as np
    return np.asarray(w).transpose(3, 2, 0, 1)


def hwio_to_torch_convT(w):
    """Inverse of :func:`torch_convT_to_hwio`: flipped-HWIO
    (H, W, I, O) -> torch ConvTranspose2d (I, O, H, W)."""
    import numpy as np
    return np.ascontiguousarray(
        np.asarray(w).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
