"""Training losses for user-guided colorization.

The reference delegates training to an external repo (ref README.md:129-131
points at junyanz/colorization-pytorch); the published paper trains the
SIGGRAPH net with a smooth-L1 (Huber) regression loss on ab and, for the
distribution head, a cross-entropy against soft-encoded ab targets. We keep
training first-class here so the framework is complete.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quantize import soft_encode


def smooth_l1(pred: jax.Array, target: jax.Array,
              delta: float = 1.0) -> jax.Array:
    """Huber loss, mean over all elements. pred/target (..., 2) ab values
    (callers normalize by 110 to keep delta=1 meaningful)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < delta, 0.5 * d * d / delta, d - 0.5 * delta))


def class_xent(logits: jax.Array, target_ab: jax.Array,
               centers: jax.Array, nn: int = 10,
               sigma: float = 5.0) -> jax.Array:
    """Cross-entropy between predicted bin logits and soft-encoded targets.

    logits: (N, H, W, Q); target_ab: (N, H, W, 2). Targets are soft-encoded
    with the NN+RBF scheme (the NNEncLayer semantics, NN=10/sigma=5 during
    training per the published recipe).
    """
    q = soft_encode(target_ab, centers=centers, nn=nn, sigma=sigma)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(q * logp, axis=-1))


def psnr(pred_rgb: jax.Array, target_rgb: jax.Array,
         max_val: float = 255.0) -> jax.Array:
    """Quality probe matching get_result_PSNR
    (ref data/colorize_image.py:98-109)."""
    mse = jnp.mean((pred_rgb.astype(jnp.float32)
                    - target_rgb.astype(jnp.float32)) ** 2)
    return 20.0 * jnp.log10(max_val / jnp.sqrt(mse))
