"""ab-color quantization: 313-bin soft encode/decode, annealed-mean decode.

TPU-native replacement for the reference's ``NNEncode`` (sklearn
NearestNeighbors + RBF weights, ref: caffe_files/color_quantization.py:7-39),
the ``NNEncLayer`` Caffe Python layer (ref: caffe_files/
caffe_traininglayers.py:161-196, NN=1, sigma=5), and the Caffe dist head's
scale/softmax/1x1-conv annealed-mean trick (ref: deploy_nopred.prototxt:806-850
with pts_in_hull injected at data/colorize_image.py:405-407).

The bin tables are tiny (313 x 2) and live on device; encoding one image is a
(H*W, 313) distance matrix -> top-k, which XLA maps onto the MXU as a single
batched matmul-like contraction — no per-pixel host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.color_bins import get_bins


def soft_encode(ab: jax.Array, centers: jax.Array | None = None,
                nn: int = 1, sigma: float = 5.0) -> jax.Array:
    """Soft-encode ab values over the quantized gamut.

    ab: (..., 2) -> (..., K) soft one-hot. NN search + RBF weights
    exp(-d^2 / 2 sigma^2), normalized over the NN selected neighbors
    (ref: color_quantization.py:20-33). With nn=1 (the NNEncLayer default)
    this reduces to a hard one-hot of the nearest bin.
    """
    if centers is None:
        centers = jnp.asarray(get_bins().pts_in_hull, jnp.float32)
    K = centers.shape[0]
    flat = ab.reshape(-1, 2).astype(jnp.float32)
    # Squared distances via the expanded form -> one MXU contraction.
    d2 = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * jnp.einsum("pc,kc->pk", flat, centers,
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centers**2, axis=1)[None, :]
    )
    if nn == 1:
        enc = jax.nn.one_hot(jnp.argmin(d2, axis=1), K, dtype=jnp.float32)
    else:
        neg_d2, inds = jax.lax.top_k(-d2, nn)
        # Softmax-style stabilization: subtract the max (the exp rescale
        # cancels in the normalization, so values are mathematically
        # unchanged) — without it, points far from the hull underflow
        # every f32 exp to 0 and normalize to NaN (found by
        # tests/test_properties.py; the reference computes in f64 where
        # the same inputs merely underflow later).
        neg_d2 = neg_d2 - neg_d2[:, :1]
        wts = jnp.exp(neg_d2 / (2.0 * sigma**2))
        wts = wts / jnp.sum(wts, axis=1, keepdims=True)
        enc = jnp.zeros((flat.shape[0], K), jnp.float32)
        enc = enc.at[jnp.arange(flat.shape[0])[:, None], inds].set(wts)
    return enc.reshape(ab.shape[:-1] + (K,))


def decode(enc: jax.Array, centers: jax.Array | None = None) -> jax.Array:
    """(..., K) encoding -> (..., 2) ab by dotting with bin centers
    (ref: color_quantization.py:35-39)."""
    if centers is None:
        centers = jnp.asarray(get_bins().pts_in_hull, jnp.float32)
    return jnp.einsum("...k,kc->...c", enc, centers,
                      precision=jax.lax.Precision.HIGHEST)


def annealed_mean(logits: jax.Array, T: float,
                  centers: jax.Array | None = None,
                  axis: int = -1) -> jax.Array:
    """Temperature-sharpened softmax expectation over the ab bins.

    Reproduces the Caffe dist head's Scale(T) -> Softmax -> 1x1 conv with
    pts_in_hull weights (ref: deploy_nopred.prototxt:825-850). ``T`` is the
    Scale multiplier (the reference uses T=2.6 for the point estimate and
    S=0.2 for the suggestion distribution).
    """
    if centers is None:
        centers = jnp.asarray(get_bins().pts_in_hull, jnp.float32)
    p = jax.nn.softmax(logits * T, axis=axis)
    return jnp.moveaxis(
        jnp.einsum("...k,kc->...c", jnp.moveaxis(p, axis, -1), centers,
                   precision=jax.lax.Precision.HIGHEST), -1, axis
    )


@partial(jax.jit, static_argnames=("grid_hw",))
def scatter_to_grid(dist313: jax.Array, in_hull: jax.Array,
                    grid_hw: tuple[int, int] = (23, 23)) -> jax.Array:
    """Scatter a (313, ...) in-gamut distribution into the full (529, ...) grid.

    Mirrors ``dist_ab_full[in_hull] = dist_ab`` (ref: data/
    colorize_image.py:499-506); returns the (A, B, ...) gridded view too.
    """
    AB = grid_hw[0] * grid_hw[1]
    full = jnp.zeros((AB,) + dist313.shape[1:], dist313.dtype)
    (idx,) = jnp.nonzero(jnp.asarray(in_hull), size=dist313.shape[0])
    full = full.at[idx].set(dist313)
    return full.reshape(grid_hw + dist313.shape[1:])


def entropy(dist: jax.Array, axis: int = 0) -> jax.Array:
    """sum p log p over the bin axis (ref: data/colorize_image.py:545-547,
    which computes sum(p*log(p)) — note the reference omits the minus sign
    and negates at plot time; we keep its convention for parity)."""
    return jnp.sum(dist * jnp.log(dist), axis=axis)


def make_pts_grid(step: int = 10, lim: int = 110) -> np.ndarray:
    """Full 23x23 ab grid, matching np.meshgrid ordering used by the
    reference (ref: data/colorize_image.py:213,283)."""
    g = np.array(np.meshgrid(np.arange(-lim, lim + step, step),
                             np.arange(-lim, lim + step, step)))
    return g.reshape((2, -1)).T.astype(np.int64)
