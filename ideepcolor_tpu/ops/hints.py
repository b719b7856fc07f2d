"""User-hint rasterization: point edits -> (ab, mask) network input tensors.

TPU-native replacement for the reference's per-edit ``cv2.rectangle`` loop
(``UIControl.get_input`` + ``PointEdit.updateInput``,
ref: ui/ui_control.py:52-63,177-187) and the notebooks' ``put_point`` numpy
patch writes (ref: DemoInteractiveColorization.ipynb cell 7).

Design: the edit list is carried as fixed-capacity arrays (MAX_HINTS slots +
a live count), so the rasterizer has static shapes and jits once. Each pixel
tests membership in every hint box; later hints overwrite earlier ones by a
reversed arg-max (matching the sequential overwrite order of cv2.rectangle).
At 256^2 x 256 slots this is a tiny fused VPU program — no per-edit host
loop, no host->device transfer beyond the (256, 7) hint table per click.
Capacity is sized so marathon GUI sessions (hundreds of edits) never fall
back to the dense-plane path, which leaks host RSS over the axon tunnel
transport (see CLAUDE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_HINTS = 256


@partial(jax.jit, static_argnames=("size",))
def rasterize_hints(boxes: jax.Array, values: jax.Array, count: jax.Array,
                    size: int = 256) -> tuple[jax.Array, jax.Array]:
    """Rasterize hint boxes into dense (ab, mask) planes.

    boxes:  (M, 4) int32 [y1, x1, y2, x2] inclusive corners (cv2.rectangle
            with thickness=-1 fills the inclusive rectangle).
    values: (M, 2) float32 ab value per hint.
    count:  () int32 number of live hints (<= M).

    Returns ab (size, size, 2) float32 and mask (size, size, 1) float32 in
    {0, 1}. Later hints win where boxes overlap.
    """
    M = boxes.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    live = jnp.arange(M) < count                              # (M,)
    inside = (
        (ys[None] >= boxes[:, 0, None, None])
        & (xs[None] >= boxes[:, 1, None, None])
        & (ys[None] <= boxes[:, 2, None, None])
        & (xs[None] <= boxes[:, 3, None, None])
        & live[:, None, None]
    )                                                          # (M, S, S)
    mask = jnp.any(inside, axis=0)
    # Index of the LAST covering hint: argmax over reversed slots.
    last = (M - 1) - jnp.argmax(inside[::-1], axis=0)          # (S, S)
    ab = jnp.where(mask[..., None], values[last], 0.0)
    return ab.astype(jnp.float32), mask[..., None].astype(jnp.float32)


def put_point(input_ab: np.ndarray, mask: np.ndarray, loc, p, val):
    """Reference notebook helper, host-side (DemoInteractiveColorization
    cell 7): write a (2p+1)^2 patch at loc into channel-first (2,H,W) ab and
    (1,H,W) mask arrays in place."""
    input_ab[:, loc[0] - p:loc[0] + p + 1, loc[1] - p:loc[1] + p + 1] = (
        np.array(val)[:, np.newaxis, np.newaxis])
    mask[:, loc[0] - p:loc[0] + p + 1, loc[1] - p:loc[1] + p + 1] = 1
    return input_ab, mask


def put_points_json(input_ab: np.ndarray, mask: np.ndarray, hints,
                    size: int):
    """Apply a serve/video-style hint list of {"y","x","ab":[a,b],
    "radius"} dicts with validation and edge clamping (put_point's raw
    negative slice starts would silently write nothing for points within
    ``radius`` of the top/left edge). Raises ValueError on malformed
    payloads; mutates the channel-first arrays in place."""
    if hints is None:
        return input_ab, mask
    if not isinstance(hints, list):
        raise ValueError("hints must be a JSON list of point dicts")
    for h in hints:
        p = int(h.get("radius", 3))
        if not 0 <= p < size // 2:
            raise ValueError(f"hint radius {p} out of range")
        y = min(max(int(h["y"]), p), size - 1 - p)
        x = min(max(int(h["x"]), p), size - 1 - p)
        put_point(input_ab, mask, [y, x], p,
                  [float(h["ab"][0]), float(h["ab"][1])])
    return input_ab, mask


def points_json_to_table(hints, size: int):
    """Serve/video hint list -> (boxes, values, count) for the fused
    table programs, with put_points_json's validation and edge clamping
    (identical rasterization semantics: inclusive [y-p, y+p] box,
    later hints win). Returns None when the list exceeds MAX_HINTS —
    callers fall back to the dense path."""
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    values = np.zeros((MAX_HINTS, 2), np.float32)
    if hints is None:
        return boxes, values, 0
    if not isinstance(hints, list):
        raise ValueError("hints must be a JSON list of point dicts")
    if len(hints) > MAX_HINTS:
        return None
    for i, h in enumerate(hints):
        p = int(h.get("radius", 3))
        if not 0 <= p < size // 2:
            raise ValueError(f"hint radius {p} out of range")
        y = min(max(int(h["y"]), p), size - 1 - p)
        x = min(max(int(h["x"]), p), size - 1 - p)
        boxes[i] = [y - p, x - p, y + p, x + p]
        values[i] = [float(h["ab"][0]), float(h["ab"][1])]
    return boxes, values, len(hints)
