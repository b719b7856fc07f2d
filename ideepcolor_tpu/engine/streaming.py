"""Streaming colorization: a grayscale frame stream with persistent hints.

BASELINE.json config 5 — "30 fps grayscale stream with persistent hints,
distribution decode on". The reference's architecture (per-click blob
stuffing + synchronous C++ forward, ref data/colorize_image.py:425-431)
cannot pipeline; here the session keeps hint tensors device-resident and
overlaps dispatch with readback: frame t+1 is dispatched before frame t's
uint8 result is materialized, hiding the host<->device (or tunnel) latency
behind device compute.
"""

from __future__ import annotations

from collections import deque
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models import siggraph
from ..ops import colorspace as cs


@partial(jax.jit, static_argnames=("with_dist",))
def _stream_step(params, l_raw, hint_ab, hint_mask, maskcent,
                 with_dist=True):
    """One stream frame: raw (1,H,W,1) L in [0,100] -> (uint8 frame,
    529-bin suggestion distribution at H/4 resolution — point lookups at
    (h//4, w//4) equal the reference's x4-nearest-upsampled map, without
    the 16x buffer blowup per frame). ``with_dist=False`` skips the
    529-way class head entirely (pure-throughput sessions shouldn't pay
    its conv+softmax per frame)."""
    if with_dist:
        reg2, dist = siggraph.apply(params, l_raw - 50.0, hint_ab,
                                    hint_mask, maskcent, dist=True,
                                    precision_name="default",
                                    dist_lowres=True)
        ab = reg2 / 110.0                     # undo the dist-mode rescale
    else:
        ab = siggraph.apply(params, l_raw - 50.0, hint_ab, hint_mask,
                            maskcent, dist=False,
                            precision_name="default")
        dist = None
    rgb = cs.lab_to_rgb_u8(jnp.concatenate([l_raw, ab], axis=-1))
    # return batch-squeezed arrays: materialization must touch the SAME
    # array the async host copy was started on (slicing later would create
    # a new lazy computation and re-pay the round trip)
    return rgb[0], (None if dist is None else dist[0])


@partial(jax.jit, static_argnames=("with_dist",))
def _stream_step_u8(params, gray_u8, hint_ab, hint_mask, maskcent,
                    with_dist=True):
    """uint8 gray-frame variant: the dequant to L in [0,100] happens on
    device, so an 8-bit video source uploads a quarter of the bytes per
    frame (64 KB vs 256 KB at 256^2) — the stream is transfer-bound on
    PCIe/tunnel links, not compute-bound."""
    l_raw = gray_u8.astype(jnp.float32) * (100.0 / 255.0)
    return _stream_step(params, l_raw, hint_ab, hint_mask, maskcent,
                        with_dist=with_dist)


@partial(jax.jit, static_argnames=("with_dist",))
def _stream_step_u8_srgb(params, gray_u8, hint_ab, hint_mask, maskcent,
                         with_dist=True):
    """uint8 sRGB gray-frame variant: computes the true L* of the gray
    value on device (the tone curve the reference applies when it loads a
    grayscale image through rgb2lab, ref data/colorize_image.py:27-37) —
    use this for real video/camera sources; the linear ``_stream_step_u8``
    is for sources that already carry L in [0,100] quantized to 8 bits."""
    g = gray_u8.astype(jnp.float32) / 255.0
    rgb = jnp.concatenate([g, g, g], axis=-1)
    l_raw = cs.rgb_to_lab(rgb)[..., :1]
    return _stream_step(params, l_raw, hint_ab, hint_mask, maskcent,
                        with_dist=with_dist)


@partial(jax.jit, static_argnames=("size", "with_dist", "srgb"))
def _stream_step_u8_table(params, gray_u8, boxes, values, count,
                          maskcent, size=256, with_dist=True,
                          srgb=False):
    """Tracked-hint variant: hints arrive as a fixed-shape
    (MAX_HINTS, 4)/(MAX_HINTS, 2) table and rasterize ON DEVICE each
    frame, so PER-FRAME hint updates (motion-tracked hints,
    apps/video ``--track-hints``) upload ~3 KB instead of re-uploading
    the ~768 KB dense planes — the stream stays transfer-bound on the
    frame bytes alone, and the device rasterize rides the same fused
    program as the forward."""
    from ..ops.hints import rasterize_hints
    ab, mask = rasterize_hints(boxes, values, count, size=size)
    if srgb:
        g = gray_u8.astype(jnp.float32) / 255.0
        rgb = jnp.concatenate([g, g, g], axis=-1)
        l_raw = cs.rgb_to_lab(rgb)[..., :1]
    else:
        l_raw = gray_u8.astype(jnp.float32) * (100.0 / 255.0)
    return _stream_step(params, l_raw, ab[None], mask[None], maskcent,
                        with_dist=with_dist)


class StreamingSession:
    """Pipelined hint-persistent colorization of an L-frame stream.

    ``submit(l_frame)`` dispatches asynchronously and returns the OLDEST
    completed frame once the pipeline is primed (``depth`` frames in
    flight, default 4), so steady-state throughput is bounded by device
    time, not round-trip latency. ``set_hints`` swaps the persistent hint
    tensors between frames without recompilation. Single-consumer: call
    ``submit``/``drain`` from one thread.
    """

    def __init__(self, params, size: int = 256, maskcent: float = 0.0,
                 depth: int = 4, with_dist: bool = True):
        self.params = params
        self.size = size
        self.maskcent = jnp.float32(maskcent)
        self.depth = max(1, depth)
        self.with_dist = with_dist
        self._hint_ab = jnp.zeros((1, size, size, 2), jnp.float32)
        self._hint_mask = jnp.zeros((1, size, size, 1), jnp.float32)
        self._table = None
        self._inflight: deque = deque()
        self.frames_in = 0
        self.frames_out = 0

    def set_hints(self, hint_ab: np.ndarray, hint_mask: np.ndarray):
        """hint_ab (H,W,2), hint_mask (H,W,1) — persist across frames."""
        self._hint_ab = jnp.asarray(hint_ab, jnp.float32)[None]
        self._hint_mask = jnp.asarray(hint_mask, jnp.float32)[None]
        self._table = None

    def set_hint_table(self, boxes: np.ndarray, values: np.ndarray,
                       count: int | None = None):
        """Swap hints as an (m,4) int32 box / (m,2) float32 ab table
        (m <= ops.hints.MAX_HINTS), rasterized on device each frame —
        the cheap way to move hints EVERY frame (~3 KB upload vs the
        ~768 KB dense planes of :meth:`set_hints`). uint8-frame
        submissions only (the video path)."""
        from ..ops import hints as oh
        boxes = np.asarray(boxes, np.int32).reshape(-1, 4)
        values = np.asarray(values, np.float32).reshape(-1, 2)
        n = len(boxes) if count is None else int(count)
        if n > oh.MAX_HINTS:
            raise ValueError(f"{n} hints > MAX_HINTS={oh.MAX_HINTS}")
        b = np.zeros((oh.MAX_HINTS, 4), np.int32)
        v = np.zeros((oh.MAX_HINTS, 2), np.float32)
        b[:n], v[:n] = boxes[:n], values[:n]
        self._table = (jnp.asarray(b), jnp.asarray(v), jnp.int32(n))

    def submit(self, l_frame: np.ndarray, srgb: bool = False):
        """l_frame (H,W): raw L in [0,100] (float), or a uint8 gray frame
        (dequantized to L on device — 4x fewer upload bytes; with
        ``srgb=True`` the gray value is interpreted as sRGB and converted
        to true L*). Returns a completed (rgb_u8, dist) pair once the
        pipeline is primed, else None."""
        if getattr(l_frame, "dtype", None) == np.uint8:
            g = jnp.asarray(l_frame)[None, ..., None]
            if self._table is not None:
                boxes, values, count = self._table
                out = _stream_step_u8_table(
                    self.params, g, boxes, values, count, self.maskcent,
                    size=self.size, with_dist=self.with_dist, srgb=srgb)
            else:
                step = _stream_step_u8_srgb if srgb else _stream_step_u8
                out = step(self.params, g, self._hint_ab,
                           self._hint_mask, self.maskcent,
                           with_dist=self.with_dist)
        elif self._table is not None:
            raise ValueError("set_hint_table requires uint8 gray frames "
                             "(use set_hints for float-L submissions)")
        else:
            l = jnp.asarray(l_frame, jnp.float32)[None, ..., None]
            out = _stream_step(self.params, l, self._hint_ab,
                               self._hint_mask, self.maskcent,
                               with_dist=self.with_dist)
        # start the device->host copy immediately so materialization later
        # only waits on an already-running transfer (hides the readback
        # round trip behind subsequent frames' compute)
        try:
            out[0].copy_to_host_async()
        except AttributeError:      # backend without async copies
            pass
        self._inflight.append(out)
        self.frames_in += 1
        if len(self._inflight) > self.depth:
            return self._materialize(self._inflight.popleft())
        return None

    def drain(self):
        """Yield all remaining completed frames."""
        while self._inflight:
            yield self._materialize(self._inflight.popleft())

    def _materialize(self, out):
        rgb, dist = out
        self.frames_out += 1
        if self.with_dist:
            return np.asarray(rgb), dist        # dist stays device-side
        return np.asarray(rgb), None
