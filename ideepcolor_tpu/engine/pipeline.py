"""Fused jitted inference pipelines.

The reference's per-click path crosses host<->device and C++<->Python
repeatedly (rasterize with cv2, normalize in numpy, caffe/torch forward,
lab2rgb in skimage — ref: ui/gui_draw.py:272-286,
data/colorize_image.py:416-434). Here each stage chain is ONE XLA program:

  prep        : rgb (full-res + net-res) -> Lab planes, mean-centered L
  forward     : (ab, mask) hints -> model -> output ab + composed uint8 RGB
  fullres     : output ab -> align-corners upsample + full-res L fusion +
                lab2rgb -> uint8 RGB
  suggest     : dist pixel -> CMF sample -> k-means -> K ab centers

Everything that can stay on device does; the host only ever receives
uint8 frames or K x 2 suggestion tables. Functions are jitted per input
shape (full-res shapes vary per image; the 256-net shapes compile once).

Latency note (measured on v5e via the axon tunnel): the model forward is
~2.4 ms of device time; a synchronous dispatch+readback round trip costs
~38 ms of RPC latency. The engine therefore returns jax Arrays (dispatch is
async) and lets callers overlap readback with the next interaction; the API
facade materializes lazily.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import colorspace as cs
from ..ops import kmeans as km
from ..ops.resize import zoom_to


@jax.jit
def rgb_to_lab_dev(rgb: jax.Array) -> jax.Array:
    """(H,W,3) RGB [0,1] -> (H,W,3) Lab, one fused program per shape."""
    return cs.rgb_to_lab(rgb)


@jax.jit
def rgb_to_lab_dev_u8(rgb_u8: jax.Array) -> jax.Array:
    """uint8 (H,W,3) RGB -> Lab with the /255 dequant fused on device
    (image loads upload 4x fewer bytes than the f32 form)."""
    return cs.rgb_to_lab(rgb_u8.astype(jnp.float32) / 255.0)


@jax.jit
def center_plane(lab: jax.Array, mean: jax.Array, norm: jax.Array
                 ) -> jax.Array:
    """(H,W,3) Lab -> mean-centered L plane (H,W,1), one fused dispatch
    (the only image-prep tensor the forward programs consume)."""
    return (lab[..., :1] - mean) / norm


@jax.jit
def compose_rgb_u8(img_l: jax.Array, ab: jax.Array) -> jax.Array:
    """(H,W,1) L + (H,W,2) ab -> (H,W,3) uint8 RGB, fused lab2rgb+clip."""
    return cs.lab_to_rgb_u8(jnp.concatenate([img_l, ab], axis=-1))


@partial(jax.jit, static_argnames=("out_hw",))
def fullres_fuse(img_l_fullres: jax.Array, ab_small: jax.Array,
                 out_hw: tuple[int, int]) -> jax.Array:
    """Full-resolution reconstruction, one program.

    Mirrors get_img_fullres (ref data/colorize_image.py:123-131):
    align-corners bilinear ab upsample (scipy zoom order=1 semantics) fused
    with the ORIGINAL full-res L and lab2rgb -> uint8.
    img_l_fullres: (H,W,1); ab_small: (h,w,2) channel-last.

    The upsample runs as two MXU matmuls (ops.resize.zoom_to_matmul) —
    dense interpolation matrices beat gathers on TPU and XLA fuses the
    downstream lab2rgb into the second contraction's epilogue.
    """
    from ..ops.resize import zoom_to_matmul
    ab_up = zoom_to_matmul(ab_small, out_hw)
    return compose_rgb_u8(img_l_fullres, ab_up)


FULLRES_BUCKET = 256


def bucket_size(n: int) -> int:
    return ((n + FULLRES_BUCKET - 1) // FULLRES_BUCKET) * FULLRES_BUCKET


@jax.jit
def fullres_fuse_bucketed(l_padded: jax.Array, ab_small: jax.Array,
                          rh: jax.Array, rw: jax.Array) -> jax.Array:
    """Bucketed full-res reconstruction: interpolation matrices travel as
    DATA (ops.resize.linear_resize_matrix_np padded to the bucket), so one
    compiled program serves every image resolution within a bucket —
    loading a new photo no longer recompiles the full-res path. The caller
    crops the padded uint8 frame back to the true size.
    """
    from ..ops.resize import zoom_with_matrices
    ab_up = zoom_with_matrices(ab_small, rh, rw)
    return compose_rgb_u8(l_padded, ab_up)


@jax.jit
def mask_fullres_bucketed(mask: jax.Array, rh0: jax.Array,
                          rw0: jax.Array) -> jax.Array:
    """Bucketed get_img_mask_fullres: nearest-upsample the (h,w,1) mask
    with 0/1 data matrices, render 100*(1-mask) as L
    (ref data/colorize_image.py:145-149). Caller crops the pad."""
    from ..ops.resize import zoom_with_matrices
    up = zoom_with_matrices(mask, rh0, rw0)
    l = 100.0 * (1.0 - up)
    return compose_rgb_u8(l, jnp.zeros(l.shape[:2] + (2,), jnp.float32))


@jax.jit
def sup_fullres_bucketed(planes: jax.Array, rh0: jax.Array,
                         rw0: jax.Array) -> jax.Array:
    """Bucketed get_sup_fullres: nearest-upsample (h,w,3)=[mask, ab],
    render 50*mask as L with the hint ab (ref data/
    colorize_image.py:154-158). Caller crops the pad."""
    from ..ops.resize import zoom_with_matrices
    up = zoom_with_matrices(planes, rh0, rw0)
    return compose_rgb_u8(50.0 * up[..., :1], up[..., 1:])


@partial(jax.jit, static_argnames=("out_hw", "order"))
def zoom_planes(planes: jax.Array, out_hw: tuple[int, int],
                order: int = 1) -> jax.Array:
    """(h,w,C) -> (H,W,C) with scipy zoom semantics (masks use order=0)."""
    return zoom_to(planes, out_hw, order=order, h_axis=0, w_axis=1)


@partial(jax.jit, static_argnames=("K", "N"))
def suggest_at(dist_S: jax.Array, h: jax.Array, w: jax.Array,
               centers_tbl: jax.Array, key: jax.Array,
               K: int = 5, N: int = 25000):
    """Color suggestions at pixel (h, w) of a (H,W,Q) distribution map.

    The gather + CMF sampling + k-means chain runs on device; only (K,2)
    centers and (K,) confidences return to host
    (ref: data/colorize_image.py:511-543 does all of this on CPU per click).
    """
    pdf = dist_S[h, w, :]
    return km.ab_recommendations(pdf, centers_tbl, key, K=K, N=N)


@jax.jit
def dist_entropy(dist: jax.Array) -> jax.Array:
    """Per-pixel sum p log p over the bin axis (last). Keeps the
    reference's sign convention (ref data/colorize_image.py:545-547)."""
    return jnp.sum(dist * jnp.log(dist), axis=-1)


@jax.jit
def requantized_ab(rgb_u8: jax.Array) -> jax.Array:
    """uint8 RGB -> ab planes of its own Lab.

    Parity detail: the reference derives ``output_ab`` from the QUANTIZED
    uint8 output image, not the raw prediction (ref data/
    colorize_image.py:196-198). Fusing this into the click program removes
    one full dispatch+readback round trip per click.
    """
    return cs.rgb_to_lab(rgb_u8.astype(jnp.float32) / 255.0)[..., 1:]


# ab quantization for the transport-lean click payload: u8 over
# [-110, 110] (the reference's ab clamp) = 0.863 ab units/step — finer
# than the granularity the uint8 RGB frame itself imposes on requantized
# ab, so the host-composed frame differs from the device compose by at
# most ~1 uint8 LSB per channel
AB_CLIP = 110.0
AB_Q_SCALE = 255.0 / 220.0


@jax.jit
def quantize_ab_u8(ab: jax.Array) -> jax.Array:
    return jnp.round((jnp.clip(ab, -AB_CLIP, AB_CLIP) + AB_CLIP)
                     * AB_Q_SCALE).astype(jnp.uint8)


def make_table_click_abq_program(apply_fn, size: int, half: bool = False):
    """Table click returning ONLY the u8-quantized ab prediction — the
    transport-lean click for tunnel-attached devices.

    The (S,S,2) u8 payload is 2/3 of the u8 RGB frame's bytes (1/6 with
    ``half=True`` chroma subsampling, video 4:2:0 style); the display
    frame composes ON HOST from the L plane the host already has
    (api.colorize.compose_net_abq_host — the native-LUT / banded-zoom
    twins of this device chain). Measured r5 over the tunnel: payload
    p50 39.4 ms (u8 RGB) -> 34.2 (u8 ab) -> 27.2 (u8 ab half) against a
    25.1 ms 8-byte RPC floor.
    """
    from ..ops.hints import rasterize_hints

    @jax.jit
    def click(l_mc, params, boxes, values, count):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        pred = apply_fn(params, l_mc, ab[None], mask[None])[0]
        if half:
            # phase-correct 2x2 average (cv2 INTER_AREA): the averaged
            # pixel's center sits at (2i+0.5), exactly where the host's
            # half-pixel-center cubic up-matrix expects it — a strided
            # [::2] subsample instead shifts the field by half a source
            # pixel and doubles the roundtrip error
            s = size // 2
            pred = pred.reshape(s, 2, s, 2, 2).mean(axis=(1, 3))
        return quantize_ab_u8(pred)

    return click


def make_table_click_program(apply_fn, size: int):
    """Fused click program fed by the fixed-slot hint table.

    Uploads per click shrink from ~768 KB of dense (ab, mask) planes to the
    (256, 7) hint table (~7 KB); rasterization happens inside the same XLA
    program as the forward (ops.hints.rasterize_hints). apply_fn receives
    (params, l_mc (H,W,1), ab (1,H,W,2), mask (1,H,W,1)) -> (N,H,W,2) ab
    prediction. All image state travels as arguments (closed-over device
    arrays would be baked as compile-time constants and go stale when the
    image changes).
    """
    from ..ops.hints import rasterize_hints

    @jax.jit
    def click(l_net, l_mc, params, boxes, values, count):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        pred = apply_fn(params, l_mc, ab[None], mask[None])[0]
        rgb = compose_rgb_u8(l_net, pred)
        return rgb, requantized_ab(rgb)

    return click


def make_table_click_win_program(apply_fn, size: int):
    """Table click that ALSO composes the GUI's window-size frame.

    Same as make_table_click_program plus a bucketed matrix-resize of the
    requantized output ab fused with a padded window-size L plane — the
    display frame leaves in the same dispatch instead of a second round
    trip. rh (Hb, size) / rw (Wb, size) are data interpolation matrices
    (ops.resize.linear_resize_matrix_np), l_win_pad is (Hb, Wb, 1).
    """
    from ..ops.hints import rasterize_hints
    from ..ops.resize import zoom_with_matrices

    @jax.jit
    def click(l_net, l_mc, l_win_pad, rh, rw, params, boxes, values, count):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        pred = apply_fn(params, l_mc, ab[None], mask[None])[0]
        rgb = compose_rgb_u8(l_net, pred)
        out_ab = requantized_ab(rgb)
        win_ab = zoom_with_matrices(out_ab, rh, rw)
        win = compose_rgb_u8(l_win_pad, win_ab)
        return rgb, out_ab, win

    return click


def make_table_click_win_suggest_program(apply_fn, size: int, K: int = 9,
                                         N: int = 25000, map_div: int = 1):
    """Dist-session GUI click: frame + window frame + color suggestions in
    ONE dispatch.

    The reference's dist click chain pays three separate passes on the
    host (ref ui/gui_draw.py:179-193: suggestion sampling + kmeans, then
    the forward, then the window compose); round 1 still paid one extra
    RPC round trip per click for the suggestion dispatch + the previous-
    frame pixel readback. Here everything rides the click program:
    rasterize + forward + net/window frames + CMF-sample + k-means over
    the (device-resident) per-image distribution map + the Lab->RGB
    palette conversion. Returns (rgb, out_ab, win, colors) where colors
    is the reference suggest_color contract: (K+1, 3) float [0,1], row 0
    = the previous frame's pixel at the click (ref ui/gui_draw.py:260-270
    concatenates current-pixel color before the K suggestions).

    map_div: dist-map coordinate divisor (4 for the SIGGRAPH lowres
    map, 1 for the caffe-dist full-res map).
    """
    from ..ops import kmeans as km
    from ..ops.hints import rasterize_hints
    from ..ops.resize import zoom_with_matrices

    @jax.jit
    def click(l_net, l_mc, l_win_pad, rh, rw, params, boxes, values, count,
              dist_map, h, w, centers_tbl, prev_rgb, key):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        pred = apply_fn(params, l_mc, ab[None], mask[None])[0]
        rgb = compose_rgb_u8(l_net, pred)
        out_ab = requantized_ab(rgb)
        win_ab = zoom_with_matrices(out_ab, rh, rw)
        win = compose_rgb_u8(l_win_pad, win_ab)

        pdf = dist_map[h // map_div, w // map_div, :]
        centers, _conf = km.ab_recommendations(pdf, centers_tbl, key,
                                               K=K, N=N)
        L = jnp.full((K, 1), l_net[h, w, 0], jnp.float32)
        colors = jnp.clip(
            cs.lab_to_rgb(jnp.concatenate([L, centers], axis=1)[:, None, :]),
            0.0, 1.0)[:, 0, :]
        cur = prev_rgb[h, w].astype(jnp.float32) / 255.0
        colors = jnp.concatenate([cur[None], colors], axis=0)   # (K+1, 3)
        return rgb, out_ab, win, colors

    return click


def make_table_click_suggest_program(apply_fn, size: int, K: int = 9,
                                     N: int = 25000, map_div: int = 1):
    """Dist-session click + suggestions WITHOUT the device window frame.

    Transport-shaped variant of make_table_click_win_suggest_program: on
    the tunneled chip the dominant per-click cost is READBACK BANDWIDTH
    (~7-14 MB/s), and the 512-px window frame is ~786 KB vs the net-res
    frame's ~196 KB. The reference composes its window frame on the host
    CPU anyway (ref ui/gui_draw.py:280-284, cv2.resize + concat +
    lab2rgb); the host runtime (ops.host, native/hostops.cpp) does the
    same from the net frame, so only ONE buffer ever crosses the tunnel:
    the palette is PACKED into an extra frame row (each np.asarray is a
    full sync RPC, ~25-30 ms — a second readback for 30 floats would
    forfeit half the win). Returns (packed, out_ab) where packed is
    (size+1, size, 3) uint8: packed[:size] the frame, packed[size, :K+1]
    the palette (row 0 = previous frame's click pixel, exact; suggestion
    rows quantized to 1/255, below display precision).
    """
    from ..ops import kmeans as km
    from ..ops.hints import rasterize_hints

    @jax.jit
    def click(l_net, l_mc, params, boxes, values, count,
              dist_map, h, w, centers_tbl, prev_rgb, key):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        pred = apply_fn(params, l_mc, ab[None], mask[None])[0]
        rgb = compose_rgb_u8(l_net, pred)
        out_ab = requantized_ab(rgb)
        pdf = dist_map[h // map_div, w // map_div, :]
        centers, _conf = km.ab_recommendations(pdf, centers_tbl, key,
                                               K=K, N=N)
        L = jnp.full((K, 1), l_net[h, w, 0], jnp.float32)
        colors = jnp.clip(
            cs.lab_to_rgb(jnp.concatenate([L, centers], axis=1)[:, None, :]),
            0.0, 1.0)[:, 0, :]
        pal = jnp.concatenate(
            [prev_rgb[h, w][None].astype(jnp.uint8),
             jnp.round(colors * 255.0).astype(jnp.uint8)], axis=0)
        row = jnp.zeros((1, size, 3), jnp.uint8).at[0, :K + 1].set(pal)
        return jnp.concatenate([rgb, row], axis=0), out_ab

    return click


def make_table_suggest_program(dist_fwd, size: int, K: int = 9,
                               N: int = 25000, map_div: int = 4):
    """Serving suggest: hint-table dist forward + CMF sampling + k-means
    + uint8 palette conversion in ONE dispatch.

    The unfused serving chain (predict_dist_table -> suggest_at ->
    Lab->RGB of the K centers) pays two to three sync round trips per
    request over a tunneled chip; here only the (K,3) palette and (K,)
    confidences read back. The distribution map is also returned
    (device-resident, async) so the caller keeps it for later
    get_ab_reccs / entropy without re-running the forward.
    dist_fwd(params, l_mc (H,W,1), ab (H,W,2), mask (H,W,1)) ->
    (H/map_div, W/map_div, Q) distribution map.
    """
    from ..ops import kmeans as km
    from ..ops.hints import rasterize_hints

    @jax.jit
    def sugg(l_net, l_mc, params, boxes, values, count, h, w,
             centers_tbl, key):
        ab, mask = rasterize_hints(boxes, values, count, size=size)
        dist_map = dist_fwd(params, l_mc, ab, mask)
        pdf = dist_map[h // map_div, w // map_div, :]
        centers, conf = km.ab_recommendations(pdf, centers_tbl, key,
                                              K=K, N=N)
        L = jnp.full((K, 1), l_net[h, w, 0], jnp.float32)
        colors = cs.lab_to_rgb_u8(
            jnp.concatenate([L, centers], axis=1)[:, None, :])[:, 0, :]
        return dist_map, colors, conf

    return sugg


def make_click_program(apply_fn):
    """Build the fused one-dispatch click program for a model family.

    apply_fn(blob_or_inputs...) -> ab prediction (N,H,W,2).
    The returned jitted function performs: model forward + L-fusion +
    lab2rgb + uint8 quantization + requantized-ab extraction, returning
    (rgb_u8 (H,W,3), out_ab (H,W,2)) — the host reads back only rgb_u8
    (~196 KB); out_ab stays device-resident for the full-res getter.
    """
    @jax.jit
    def click(l_net, *model_args):
        ab = apply_fn(*model_args)[0]
        rgb = compose_rgb_u8(l_net, ab)
        return rgb, requantized_ab(rgb)

    return click
