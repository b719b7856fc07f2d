"""Vectorized sRGB <-> CIE Lab / HSV conversions as pure jittable functions.

TPU-native replacement for the reference's CPU colorspace calls
(skimage ``color.rgb2lab`` / ``color.lab2rgb`` used at
``/root/reference/data/colorize_image.py:27,36`` and
``/root/reference/data/lab_gamut.py:15,20``, and the Caffe Python layers
``BGR2HSVLayer`` / ``BGR2LabLayer`` at
``/root/reference/caffe_files/caffe_traininglayers.py:53-119``).

Conventions (identical to skimage / the reference):
  * rgb is float in [0, 1], channel-last ``(..., 3)``.
  * Lab: L in [0, 100], a/b roughly [-110, 110], D65 white point,
    2-degree observer.
  * ``lab2rgb`` clips the result into [0, 1] (skimage does the same).

Everything is elementwise VPU work; under jit XLA fuses the whole chain
into the surrounding program (e.g. the colorize pipeline's output stage),
so no standalone kernel launch or host round-trip remains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sRGB -> XYZ matrix (IEC 61966-2-1, same constants skimage uses).
_RGB2XYZ = jnp.array(
    [
        [0.412456439089692, 0.357576077643909, 0.180437483266399],
        [0.212672851405623, 0.715152155287818, 0.072174993306560],
        [0.019333895582329, 0.119192025881303, 0.950304078536368],
    ],
    dtype=jnp.float32,
)

_XYZ2RGB = jnp.linalg.inv(_RGB2XYZ)

# D65 reference white, 2-degree observer.
_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)

_EPS = 216.0 / 24389.0          # (6/29)^3
_KAPPA = 24389.0 / 27.0         # 29^3 / 3^3


def srgb_to_linear(srgb: jax.Array) -> jax.Array:
    srgb = srgb.astype(jnp.float32)
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        ((srgb + 0.055) / 1.055) ** 2.4,
    )


def linear_to_srgb(lin: jax.Array) -> jax.Array:
    lin = lin.astype(jnp.float32)
    # Guard the fractional power against tiny negatives from upstream math.
    safe = jnp.maximum(lin, 0.0)
    return jnp.where(
        lin <= 0.0031308,
        lin * 12.92,
        1.055 * safe ** (1.0 / 2.4) - 0.055,
    )


def _apply_3x3(m: jax.Array, v: jax.Array) -> jax.Array:
    """Explicit 3x3 linear map as VPU multiply-adds.

    A (..., 3) @ (3, 3) matmul would be routed to the MXU at default
    (reduced) matmul precision — for a 3-vector the elementwise form is both
    exact in f32 and cheaper.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
         m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
         m[2, 0] * x + m[2, 1] * y + m[2, 2] * z], axis=-1)


def rgb_to_xyz(rgb: jax.Array) -> jax.Array:
    return _apply_3x3(_RGB2XYZ, srgb_to_linear(rgb))


def xyz_to_rgb(xyz: jax.Array) -> jax.Array:
    # skimage's xyz2rgb clips into [0, 1]; the reference relies on that.
    return jnp.clip(linear_to_srgb(_apply_3x3(_XYZ2RGB, xyz)), 0.0, 1.0)


def _lab_f(t: jax.Array) -> jax.Array:
    return jnp.where(t > _EPS, jnp.cbrt(t), (_KAPPA * t + 16.0) / 116.0)


def _lab_finv(ft: jax.Array) -> jax.Array:
    return jnp.where(ft > 6.0 / 29.0, ft**3, (116.0 * ft - 16.0) / _KAPPA)


def xyz_to_lab(xyz: jax.Array) -> jax.Array:
    f = _lab_f(xyz / _WHITE)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return jnp.stack(
        [116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1
    )


def lab_to_xyz(lab: jax.Array) -> jax.Array:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    return jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1) * _WHITE


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """sRGB [0,1] (..., 3) -> Lab (..., 3). Matches skimage.color.rgb2lab."""
    return xyz_to_lab(rgb_to_xyz(rgb))


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    """Lab (..., 3) -> sRGB [0,1] (..., 3), clipped (skimage.color.lab2rgb)."""
    return xyz_to_rgb(lab_to_xyz(lab))


def lab_to_rgb_u8(lab: jax.Array) -> jax.Array:
    """Lab -> uint8 RGB with the reference's clip+scale convention.

    Reproduces ``lab2rgb_transpose`` (ref: data/colorize_image.py:20-28):
    ``(clip(lab2rgb(lab), 0, 1) * 255).astype(uint8)`` (truncation, not round).
    """
    return (lab_to_rgb(lab) * 255.0).astype(jnp.uint8)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """sRGB [0,1] (..., 3) -> HSV (..., 3). Matches skimage.color.rgb2hsv.

    Replaces ``BGR2HSVLayer`` (ref: caffe_files/caffe_traininglayers.py:53-85),
    used by the global-stats extraction graph for the mean-saturation input.
    """
    rgb = rgb.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    c = v - jnp.min(rgb, axis=-1)
    safe_c = jnp.where(c == 0, 1.0, c)
    h_r = ((g - b) / safe_c) % 6.0
    h_g = (b - r) / safe_c + 2.0
    h_b = (r - g) / safe_c + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b)) / 6.0
    h = jnp.where(c == 0, 0.0, h)
    s = jnp.where(v == 0, 0.0, c / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    """HSV (..., 3) -> sRGB [0,1]. Inverse of :func:`rgb_to_hsv`."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# --- reference-layout helpers (channel-first single image) -----------------

def lab2rgb_transpose(img_l: jax.Array, img_ab: jax.Array) -> jax.Array:
    """(1,H,W) L + (2,H,W) ab -> (H,W,3) uint8 RGB.

    Same contract as the reference helper of the same name
    (ref: data/colorize_image.py:20-28), as a jittable device function.
    """
    lab = jnp.concatenate([img_l, img_ab], axis=0).transpose(1, 2, 0)
    return lab_to_rgb_u8(lab)


def rgb2lab_transpose(img_rgb: jax.Array) -> jax.Array:
    """(H,W,3) RGB [0,1] -> (3,H,W) Lab (ref: data/colorize_image.py:31-36)."""
    return rgb_to_lab(img_rgb).transpose(2, 0, 1)
