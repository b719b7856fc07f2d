"""Simulated user-hint sampling for training (jittable, static shapes).

The published training recipe reveals random ground-truth color patches to
the network: the number of points is geometrically distributed, locations
are drawn from a center-weighted 2-D Gaussian, patch sizes are uniform, and
each revealed patch carries the mean gt ab of its area. The whole sampler is
one traced program: a fixed MAX_POINTS slot table with a live-count, so no
data-dependent shapes reach XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_POINTS = 32


@partial(jax.jit, static_argnames=("p_keep", "p_full"))
def sample_hints(key: jax.Array, gt_ab: jax.Array,
                 p_keep: float = 1.0 / 8.0, p_full: float = 0.01):
    """gt_ab: (N, H, W, 2) ground-truth ab -> (hint_ab, hint_mask) planes.

    Each of MAX_POINTS slots is alive with probability continuation
    (geometric number of revealed points, mean ~1/p_keep); each alive slot
    reveals a (2p+1)^2 patch, p ~ U{0..4}, centered at a clipped Gaussian
    location, carrying the MEAN gt ab of its in-image area (the recipe's
    average-patch hint; computed with fixed 9x9 dynamic-slice windows so
    the sampler stays shape-static).

    With probability ``p_full`` a sample instead reveals the FULL ground
    truth (mask all-ones, ab = gt) — the published recipe's 1% full-reveal
    (SIGGRAPH'17 §3.2), which anchors the dense-hint end of the curve:
    the net must learn to copy hints faithfully when they are abundant,
    not just propagate sparse ones.
    """
    n, h, w, _ = gt_ab.shape
    k_alive, k_loc, k_size, k_full = jax.random.split(key, 4)

    # Geometric(p_keep) hint count, capped at MAX_POINTS: slot i is alive
    # iff the first i+1 'continue' coins all succeed, so P(0 hints) =
    # p_keep (the recipe trains the automatic-colorization case too).
    cont = jax.random.uniform(k_alive, (n, MAX_POINTS)) > p_keep
    alive = jnp.cumprod(cont, axis=1).astype(bool)

    loc = _gaussian_locations(k_loc, n, h, w)
    half = jax.random.randint(k_size, (n, MAX_POINTS), 0, 5)
    hint_ab, hint_mask = _reveal_batch(gt_ab, loc, half, alive)
    if p_full <= 0.0:
        return hint_ab, hint_mask
    full = jax.random.bernoulli(k_full, p_full,
                                (n, 1, 1, 1)).astype(jnp.float32)
    return (hint_ab * (1.0 - full) + gt_ab * full,
            jnp.maximum(hint_mask, full))


def _gaussian_locations(key: jax.Array, n: int, h: int, w: int) -> jax.Array:
    """Center-weighted 2-D Gaussian patch centers, clipped in-image."""
    loc = jax.random.normal(key, (n, MAX_POINTS, 2))
    return jnp.stack([
        jnp.clip(loc[..., 0] * (h / 4) + h / 2, 0, h - 1),
        jnp.clip(loc[..., 1] * (w / 4) + w / 2, 0, w - 1)], -1
    ).astype(jnp.int32)


def _reveal_batch(gt_ab: jax.Array, loc: jax.Array, half: jax.Array,
                  alive: jax.Array):
    """Rasterize per-slot mean-ab patches -> (hint_ab, hint_mask) planes."""
    _n, h, w, _ = gt_ab.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    PMAX = 4                                      # max half-width drawn

    def one(gt, loc_i, half_i, alive_i):
        inside = ((ys[None] >= (loc_i[:, 0] - half_i)[:, None, None])
                  & (ys[None] <= (loc_i[:, 0] + half_i)[:, None, None])
                  & (xs[None] >= (loc_i[:, 1] - half_i)[:, None, None])
                  & (xs[None] <= (loc_i[:, 1] + half_i)[:, None, None])
                  & alive_i[:, None, None])
        mask = jnp.any(inside, axis=0)
        last = (MAX_POINTS - 1) - jnp.argmax(inside[::-1], axis=0)
        # mean gt ab of each slot's in-image patch area: a fixed
        # (2*PMAX+1)^2 window around the center, weighted by the live
        # patch extent and the image bounds (no data-dependent shapes)
        gtp = jnp.pad(gt, ((PMAX, PMAX), (PMAX, PMAX), (0, 0)))
        dy = jnp.arange(-PMAX, PMAX + 1)

        def patch_mean(y, x, p):
            win = jax.lax.dynamic_slice(
                gtp, (y, x, 0), (2 * PMAX + 1, 2 * PMAX + 1, 2))
            in_patch = (jnp.abs(dy)[:, None] <= p) & (jnp.abs(dy)[None] <= p)
            in_img = (((y + dy >= 0) & (y + dy <= h - 1))[:, None]
                      & ((x + dy >= 0) & (x + dy <= w - 1))[None])
            wgt = (in_patch & in_img).astype(jnp.float32)[..., None]
            return jnp.sum(win * wgt, axis=(0, 1)) / jnp.maximum(
                jnp.sum(wgt, axis=(0, 1)), 1.0)

        vals = jax.vmap(patch_mean)(loc_i[:, 0], loc_i[:, 1], half_i)
        ab = jnp.where(mask[..., None], vals[last], 0.0)
        return ab, mask[..., None].astype(jnp.float32)

    return jax.vmap(one)(gt_ab, loc, half, alive)


@partial(jax.jit, static_argnames=("half",))
def reveal_hints_fixed(key: jax.Array, gt_ab: jax.Array, count,
                       half: int = 2):
    """Exactly ``count`` revealed patches per image (evaluation protocol:
    the PSNR-vs-hint-count sweep). count is a traced int <= MAX_POINTS, so
    one compiled program serves the whole sweep; each patch is a fixed
    (2*half+1)^2 square (half <= 4) carrying the mean gt ab of its
    in-image area, at the same center-weighted Gaussian locations the
    training sampler uses."""
    if not 0 <= half <= 4:
        # _reveal_batch's patch-mean window is fixed at 9x9 (PMAX=4);
        # a larger half would reveal a mask whose values silently average
        # only the central 9x9
        raise ValueError(f"half must be in [0, 4], got {half}")
    n, h, w, _ = gt_ab.shape
    loc = _gaussian_locations(key, n, h, w)
    halves = jnp.full((n, MAX_POINTS), half, jnp.int32)
    alive = (jnp.arange(MAX_POINTS)[None] <
             jnp.asarray(count, jnp.int32)) & jnp.ones((n, 1), bool)
    return _reveal_batch(gt_ab, loc, halves, alive)


@partial(jax.jit, static_argnames=("keep_ratio",))
def sample_global_hints(key: jax.Array, gt_ab: jax.Array,
                        keep_ratio: float = 0.5) -> jax.Array:
    """Training-time global-histogram conditioning with random dropout.

    The TPU-native equivalent of the reference's training-graph chain
    ab 4x4 avgpool -> NNEncLayer -> global avgpool ->
    ColorGlobalDropoutLayer (ref caffe_files/caffe_traininglayers.py:122-158
    and global_stats.prototxt:101-244): per-example, with probability
    keep_ratio the ground-truth global histogram is revealed (flag channel
    = 1), otherwise zeroed.

    gt_ab: (N, H, W, 2) -> (N, 314) [313-bin histogram, keep flag].
    """
    from ..ops.quantize import soft_encode

    n, h, w, _ = gt_ab.shape
    ab_rs = gt_ab.reshape(n, h // 4, 4, w // 4, 4, 2).mean(axis=(2, 4))
    enc = soft_encode(ab_rs, nn=1)                  # (n, h/4, w/4, 313)
    hist = jnp.mean(enc, axis=(1, 2))               # (n, 313)
    keep = jax.random.bernoulli(key, keep_ratio, (n, 1)).astype(jnp.float32)
    return jnp.concatenate([hist * keep, keep], axis=1)
