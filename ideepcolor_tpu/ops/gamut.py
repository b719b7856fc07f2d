"""sRGB-gamut projection and gamut-mask computation, fully on device.

Replaces the reference's CPU hot loops in ``data/lab_gamut.py``:
  * ``snap_ab`` — <=20 lab->rgb->lab fixed-point round trips per color pick
    (ref: data/lab_gamut.py:28-52). Here one jitted ``lax.while_loop``;
    vmaps over many colors at once.
  * ``abGrid.update_gamut`` — a 221x221 lab->rgb->lab round trip per gamut
    redraw (ref: data/lab_gamut.py:66-78). Here a single fused device program.

The reference quantizes to uint8 RGB inside these loops (it feeds a uint8 GUI
widget); we reproduce that rounding exactly so masks/snaps agree bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import colorspace as cs


@partial(jax.jit, static_argnames=("max_iters",))
def snap_ab(input_l: jax.Array, input_rgb: jax.Array,
            max_iters: int = 20) -> jax.Array:
    """Project (L, rgb-derived ab) into the sRGB gamut; returns uint8-rgb.

    input_l: scalar or (...,) lightness; input_rgb: (..., 3) uint8-scale RGB.
    Mirrors ref data/lab_gamut.py:28-52: overwrite L each iteration, round
    trip through clipped RGB until the Lab delta is below 1 (or 20 iters).
    Returns RGB in uint8 scale (0..255 float; cast by the caller).
    """
    rgb01 = input_rgb.astype(jnp.float32) / 255.0
    lab = cs.rgb_to_lab(rgb01)
    input_l = jnp.broadcast_to(jnp.asarray(input_l, jnp.float32), lab.shape[:-1])

    def body(state):
        i, lab, _ = state
        lab = lab.at[..., 0].set(input_l)
        old = lab
        rgb = cs.lab_to_rgb(lab)          # already clipped to [0,1]
        new_lab = cs.rgb_to_lab(rgb)
        dif = jnp.sum(jnp.abs(new_lab - old), axis=-1)
        return i + 1, new_lab, jnp.max(dif)

    def cond(state):
        i, _, dif = state
        return jnp.logical_and(i < max_iters, dif >= 1.0)

    _, lab, _ = jax.lax.while_loop(
        cond, body, (0, lab, jnp.float32(jnp.inf)))
    # Final uint8 quantization (ref lab2rgb_1d with dtype='uint8' rounds).
    return jnp.rint(jnp.clip(cs.lab_to_rgb(lab), 0.0, 1.0) * 255.0)


def snap_ab_lab(input_l: jax.Array, input_rgb: jax.Array) -> jax.Array:
    """snap_ab with return_type='lab' (ref: data/lab_gamut.py:50-52)."""
    rgb_u8 = snap_ab(input_l, input_rgb)
    return cs.rgb_to_lab(rgb_u8 / 255.0)


@partial(jax.jit, static_argnames=("gamut_size", "D"))
def ab_gamut_mask(l_in: jax.Array, gamut_size: int = 110,
                  D: int = 1) -> tuple[jax.Array, jax.Array]:
    """In-gamut mask + display RGB over the (2G/D+1)^2 ab plane at fixed L.

    Returns (masked_rgb uint8 (A, B, 3) with out-of-gamut set to 255,
    mask bool (A, B)). Mirrors ``abGrid.update_gamut``
    (ref: data/lab_gamut.py:66-78): round trip through uint8 RGB, mask where
    the Lab L2 delta < 1. Grid layout: rows = a, cols = b (meshgrid of the
    reference builds vals_a varying along rows).
    """
    r = jnp.arange(-gamut_size, gamut_size + D, D, dtype=jnp.float32)
    a, b = jnp.meshgrid(r, r, indexing="ij")
    lab = jnp.stack([jnp.full_like(a, jnp.asarray(l_in, jnp.float32)), a, b],
                    axis=-1)
    # NB: the reference truncates here (.astype('uint8')), unlike lab2rgb_1d
    # which rounds — reproduce the truncation (ref: data/lab_gamut.py:70).
    rgb_u8f = jnp.floor(jnp.clip(cs.lab_to_rgb(lab), 0.0, 1.0) * 255.0)
    lab_back = cs.rgb_to_lab(rgb_u8f / 255.0)
    dif = jnp.linalg.norm(lab - lab_back, axis=-1)
    mask = dif < 1.0
    masked_rgb = jnp.where(mask[..., None], rgb_u8f, 255.0)
    return masked_rgb.astype(jnp.uint8), mask
