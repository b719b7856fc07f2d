"""On-device color-suggestion sampling: CMF inverse transform + k-means.

TPU-native replacement for the reference's per-click CPU suggestion path
(ref: data/colorize_image.py:511-543): cumsum the per-pixel 313-bin pdf,
inverse-transform sample 25k ab points, sklearn KMeans(K), sort clusters by
occupancy. Here the whole chain is one jitted device program; the host
receives only the (K, 2) centers + (K,) confidences.

k-means: k-means++-free fixed-iteration Lloyd over the 313 distinct support
points. Because samples take only <=313 distinct values, we run Lloyd on the
*weighted bins* (histogram of sampled bin indices) instead of 25k raw points
— mathematically identical to sklearn on the same sample set, and O(313*K)
per iteration instead of O(25000*K).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("N",))
def sample_bins(pdf: jax.Array, key: jax.Array, N: int = 25000) -> jax.Array:
    """Histogram of N inverse-transform samples from a (K,) pdf.

    Matches np.digitize over the normalized CMF (ref: data/
    colorize_image.py:520-527): a uniform u falls in bin i iff
    cmf[i-1] <= u < cmf[i].
    Returns integer counts per bin, sum = N.
    """
    cmf = jnp.cumsum(pdf)
    cmf = cmf / cmf[-1]
    u = jax.random.uniform(key, (N,))
    inds = jnp.searchsorted(cmf, u, side="right")
    return jnp.bincount(inds, length=pdf.shape[0])


def _kmeanspp_init(pts, w, key, K):
    """k-means++ seeding over weighted support points (sklearn's strategy,
    which the reference relies on for good suggestion clusters)."""
    P = pts.shape[0]
    keys = jax.random.split(key, K)
    first = jax.random.choice(keys[0], P, p=w / jnp.sum(w))
    centers = jnp.zeros((K, pts.shape[1]), jnp.float32).at[0].set(pts[first])

    def pick(i, centers):
        d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        live = jnp.arange(K) < i
        dmin = jnp.min(jnp.where(live[None, :], d2, jnp.inf), axis=1)
        p = w * dmin
        p = jnp.where(jnp.sum(p) > 0, p, w)     # degenerate: all mass covered
        idx = jax.random.choice(keys[i], P, p=p / jnp.sum(p))
        return centers.at[i].set(pts[idx])

    return jax.lax.fori_loop(1, K, pick, centers)


def _lloyd(pts, w, centers0, K, iters):
    def step(centers, _):
        d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)                     # (P,)
        onehot = jax.nn.one_hot(assign, K, dtype=jnp.float32) * w[:, None]
        mass = jnp.sum(onehot, axis=0)                      # (K,)
        newc = jnp.einsum("pk,pc->kc", onehot, pts,
                          precision=jax.lax.Precision.HIGHEST
                          ) / jnp.maximum(mass, 1e-12)[:, None]
        newc = jnp.where((mass > 0)[:, None], newc, centers)
        return newc, None

    centers, _ = jax.lax.scan(step, centers0, None, length=iters)
    d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    inertia = jnp.sum(w * jnp.min(d2, axis=1))
    assign = jnp.argmin(d2, axis=1)
    mass = jnp.sum(jax.nn.one_hot(assign, K, dtype=jnp.float32) * w[:, None],
                   axis=0)
    return centers, mass, inertia


@partial(jax.jit, static_argnames=("K", "iters", "n_init"))
def weighted_kmeans(points: jax.Array, weights: jax.Array, key: jax.Array,
                    K: int = 5, iters: int = 30, n_init: int = 4):
    """Weighted k-means with k-means++ seeding and multi-restart.

    points: (P, 2); weights: (P,) nonnegative. ``n_init`` restarts run as one
    vmapped device program; the lowest-inertia solution wins (mirroring
    sklearn's n_init behavior the reference depends on). Returns
    (centers (K, 2) sorted by cluster occupancy desc, occupancy fractions).
    """
    pts = points.astype(jnp.float32)
    w = weights.astype(jnp.float32)

    def one(k):
        c0 = _kmeanspp_init(pts, w, k, K)
        return _lloyd(pts, w, c0, K, iters)

    centers_all, mass_all, inertia_all = jax.vmap(one)(
        jax.random.split(key, n_init))
    best = jnp.argmin(inertia_all)
    centers, mass = centers_all[best], mass_all[best]
    order = jnp.argsort(-mass)
    frac = mass[order] / jnp.sum(w)
    return centers[order], frac


@partial(jax.jit, static_argnames=("K", "N", "iters"))
def ab_recommendations(dist: jax.Array, centers_tbl: jax.Array,
                       key: jax.Array, K: int = 5, N: int = 25000,
                       iters: int = 30):
    """Full suggestion chain for one pixel's (Q,) bin distribution.

    Mirrors ``get_ab_reccs`` (ref: data/colorize_image.py:511-543):
    sample N draws from the pdf, map to ab bin centers, k-means(K), sort by
    occupancy. Returns (K, 2) ab centers + (K,) confidence fractions.
    """
    k1, k2 = jax.random.split(key)
    counts = sample_bins(dist, k1, N=N)
    return weighted_kmeans(centers_tbl.astype(jnp.float32), counts, k2,
                           K=K, iters=iters)
