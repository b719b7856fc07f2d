"""Image resampling ops matching the reference's host-side resizers.

The reference mixes three resizers on the hot path:
  * ``scipy.ndimage.zoom(order=1)`` for the full-res ab upsample
    (ref: data/colorize_image.py:123-158) — align-corners bilinear,
  * ``scipy.ndimage.zoom(order=0)`` for full-res masks — align-corners nearest,
  * ``cv2.resize`` (half-pixel) for image loading (ref: data/colorize_image.py:58).

Here all of them are pure jittable gathers so they fuse into the surrounding
XLA program (the full-res fusion pipeline runs upsample + L-fusion + lab2rgb
as one device program instead of three host libraries).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _align_corners_coords(n_in: int, n_out: int) -> jax.Array:
    """Output-pixel -> input-pixel coordinates, scipy.ndimage.zoom style."""
    if n_out == 1 or n_in == 1:
        return jnp.zeros((n_out,), jnp.float32)
    return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))


def _linear_1d(x: jax.Array, n_out: int, axis: int) -> jax.Array:
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    c = _align_corners_coords(n_in, n_out)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    w = c - i0.astype(jnp.float32)
    shape = [1] * x.ndim
    shape[axis] = n_out
    w = w.reshape(shape)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    return x0 * (1.0 - w) + x1 * w


def _nearest_1d(x: jax.Array, n_out: int, axis: int) -> jax.Array:
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    c = _align_corners_coords(n_in, n_out)
    # scipy order=0 rounds half up (coordinate + 0.5 floored).
    idx = jnp.clip(jnp.floor(c + 0.5).astype(jnp.int32), 0, n_in - 1)
    return jnp.take(x, idx, axis=axis)


@partial(jax.jit, static_argnames=("out_hw", "order", "h_axis", "w_axis"))
def zoom_to(x: jax.Array, out_hw: tuple[int, int], order: int = 1,
            h_axis: int = -2, w_axis: int = -1) -> jax.Array:
    """Resample two axes to ``out_hw`` with scipy.ndimage.zoom semantics.

    ``order=1`` -> align-corners bilinear, ``order=0`` -> nearest.
    Defaults to (C, H, W) layout (the reference's channel-first arrays).
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    fn = _linear_1d if order == 1 else _nearest_1d
    x = fn(x.astype(jnp.float32) if order == 1 else x, out_hw[0], h_axis)
    x = fn(x, out_hw[1], w_axis)
    return x


def scipy_zoom_out_size(n_in: int, factor: float) -> int:
    """Output length scipy.ndimage.zoom produces for a given factor."""
    return int(round(n_in * factor))


def _linear_resize_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) align-corners bilinear interpolation matrix."""
    c = _align_corners_coords(n_in, n_out)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    w = c - i0.astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, i0].add(1.0 - w)
    m = m.at[rows, i1].add(w)
    return m


def linear_resize_matrix_np(n_in: int, n_out: int,
                            n_rows: int | None = None) -> "np.ndarray":
    """Host-side align-corners interpolation matrix, optionally padded to
    ``n_rows`` total rows (extra rows zero). Passing these matrices as
    DATA lets one compiled resize program serve every output size within a
    padded bucket (full-res shapes vary per image; recompiling a fused
    program per photo costs ~15-25 s on a tunneled TPU)."""
    import numpy as _np
    n_rows = n_rows or n_out
    m = _np.zeros((n_rows, n_in), _np.float32)
    if n_out == 1 or n_in == 1:
        m[:n_out, 0] = 1.0
        return m
    c = _np.arange(n_out) * ((n_in - 1) / (n_out - 1))
    i0 = _np.clip(_np.floor(c).astype(_np.int32), 0, n_in - 1)
    i1 = _np.clip(i0 + 1, 0, n_in - 1)
    w = (c - i0).astype(_np.float32)
    rows = _np.arange(n_out)
    _np.add.at(m, (rows, i0), 1.0 - w)
    _np.add.at(m, (rows, i1), w)
    return m


def nearest_resize_matrix_np(n_in: int, n_out: int,
                             n_rows: int | None = None) -> "np.ndarray":
    """Host-side align-corners NEAREST matrix (scipy zoom order=0
    semantics: round half up), optionally padded to n_rows."""
    import numpy as _np
    n_rows = n_rows or n_out
    m = _np.zeros((n_rows, n_in), _np.float32)
    if n_out == 1 or n_in == 1:
        m[:n_out, 0] = 1.0
        return m
    c = _np.arange(n_out) * ((n_in - 1) / (n_out - 1))
    idx = _np.clip(_np.floor(c + 0.5).astype(_np.int32), 0, n_in - 1)
    m[_np.arange(n_out), idx] = 1.0
    return m


def cubic_resize_matrix_np(n_in: int, n_out: int,
                           n_rows: int | None = None) -> "np.ndarray":
    """Host-side cv2.INTER_CUBIC interpolation matrix (half-pixel centers,
    Catmull-Rom-style kernel with A=-0.75, replicated borders), optionally
    padded to ``n_rows``.

    Bicubic resampling is separable-linear, so the same
    ``zoom_with_matrices`` device program serves it — the GUI's
    window-frame resize reaches cv2.INTER_CUBIC parity (ref:
    ui/gui_draw.py:84,94,281) purely by swapping the data matrices.
    """
    import numpy as _np
    n_rows = n_rows or n_out
    m = _np.zeros((n_rows, n_in), _np.float32)
    if n_in == 1:
        m[:n_out, 0] = 1.0
        return m
    A = -0.75
    c = (_np.arange(n_out, dtype=_np.float64) + 0.5) * (n_in / n_out) - 0.5
    sx = _np.floor(c).astype(_np.int64)
    t = c - sx
    # OpenCV interpolateCubic coefficient polynomial (A = -0.75).
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    rows = _np.arange(n_out)
    for k, w in ((-1, w0), (0, w1), (1, w2), (2, w3)):
        idx = _np.clip(sx + k, 0, n_in - 1)
        _np.add.at(m, (rows, idx), w.astype(_np.float32))
    return m


@jax.jit
def zoom_with_matrices(x: jax.Array, rh: jax.Array,
                       rw: jax.Array) -> jax.Array:
    """(..., h, w, C) resize with data interpolation matrices rh (H, h) /
    rw (W, w) — one compiled program per (bucket, h, w) instead of per
    exact output size."""
    x = x.astype(jnp.float32)
    y = jnp.einsum("Hh,...hwc->...Hwc", rh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Ww,...Hwc->...HWc", rw, y,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("out_hw",))
def zoom_to_matmul(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Align-corners bilinear resize of (..., h, w, C) as two MXU matmuls.

    Bilinear resampling is a linear map, so on TPU the fastest large-output
    formulation is dense: out = R_h @ x @ R_w^T per channel. For the
    reference's full-res path (256^2 ab -> ~2048^2) this replaces
    gather-heavy indexing with two systolic-array contractions that XLA
    fuses with the downstream lab2rgb. Identical numerics to
    zoom_to(order=1) (same interpolation matrix).
    """
    h, w = x.shape[-3], x.shape[-2]
    H, W = out_hw
    rh = _linear_resize_matrix(h, H)
    rw = _linear_resize_matrix(w, W)
    x = x.astype(jnp.float32)
    # (..., h, w, C): contract h then w on the MXU.
    y = jnp.einsum("Hh,...hwc->...Hwc", rh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Ww,...Hwc->...HWc", rw, y,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("out_hw", "antialias"))
def resize_half_pixel(x: jax.Array, out_hw: tuple[int, int],
                      antialias: bool = False) -> jax.Array:
    """Half-pixel-centers bilinear resize of (H, W, C), cv2.INTER_LINEAR-like.

    Used for the 256x256 network-input resize (ref: data/colorize_image.py:58
    uses cv2.resize, which is half-pixel bilinear without antialiasing).
    """
    return jax.image.resize(
        x.astype(jnp.float32), (out_hw[0], out_hw[1], x.shape[-1]),
        method="linear", antialias=antialias)


def upsample_nearest(x: jax.Array, factor: int,
                     h_axis: int = -3, w_axis: int = -2) -> jax.Array:
    """Integer-factor nearest upsample (torch nn.Upsample(mode='nearest')).

    Used by the SIGGRAPH dist head's x4 distribution upsample
    (ref: models/pytorch/model.py:131).  Default layout NHWC.
    """
    x = jnp.repeat(x, factor, axis=h_axis % x.ndim)
    return jnp.repeat(x, factor, axis=w_axis % x.ndim)


# Fixed 2x bilinear upsampling kernel the reference injects into the Caffe
# '*_us' grouped deconvolutions (ref: data/colorize_image.py:409-413).
CAFFE_US_KERNEL = jnp.array(
    [[0.25, 0.5, 0.25, 0.0],
     [0.5, 1.0, 0.5, 0.0],
     [0.25, 0.5, 0.25, 0.0],
     [0.0, 0.0, 0.0, 0.0]], dtype=jnp.float32)


def bilinear_up2_fixed(x: jax.Array) -> jax.Array:
    """Depthwise 2x transposed conv with the fixed reference kernel.

    Equivalent to Caffe ``Deconvolution(kernel=4, stride=2, pad=1,
    group=C, weights=CAFFE_US_KERNEL)`` (ref: deploy_nopred.prototxt:777-804).
    Layout NHWC, output spatial dims exactly 2x input.
    """
    n, h, w, c = x.shape
    # Transposed conv == conv over an lhs-dilated input with flipped kernel;
    # the kernel is symmetric under the required flip except for the zero
    # row/col, which the flip moves to the leading edge.
    k = CAFFE_US_KERNEL[::-1, ::-1].astype(x.dtype)  # match serving dtype
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),   # k-1-p = 2 per side (exact 2x output)
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
