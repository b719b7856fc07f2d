"""Pipelined interactive editing: async click dispatch + stale-frame drop.

The reference recomputes synchronously on EVERY mouse-motion event
(ref ui/gui_draw.py:340-345 -> compute_result:272-286), so drag frame rate
is bounded by the full dispatch+readback round trip. On a link with
latency/bandwidth costs (tunnel RPC here, PCIe readback on a host-attached
chip) that wastes the device: one ~2.4 ms forward sits behind a ~38 ms
round trip.

``InteractiveSession`` decouples the two sides:

  * ``submit(table)`` dispatches the fused table-click program and returns
    immediately (XLA dispatch is async) — every motion event can submit;
  * ``latest()`` materializes ONLY the newest submitted frame and drops the
    stale in-flight ones unread (dropped frames cost device compute but
    never pay the readback, which is the expensive side of the link);
  * the wrapped backend's state (``output_rgb``, ``output_ab``,
    ``input_ab/mask`` mirrors) always reflects the newest *materialized*
    edit, so the getter/save surface stays consistent with what the user
    sees.

The GUI drives this from its drag handler (submit per motion event, one
``latest()`` per paint cycle); headless callers can use it to replay a
scripted edit stream at device rate. Single-consumer: call ``submit`` /
``latest`` from one thread.
"""

from __future__ import annotations

from collections import deque

import numpy as np

import jax.numpy as jnp


class InteractiveSession:
    """Async interactive click pipeline over a backend's fused table-click
    programs (api.colorize backends build ``_click_tbl`` /
    ``_click_tbl_win`` in ``prep_net``).

    depth bounds the in-flight queue: submitting past it silently drops the
    oldest undisplayed frame (its device buffers are simply released).
    """

    def __init__(self, model, depth: int = 4):
        if getattr(model, "_click_tbl", None) is None:
            raise ValueError(
                "backend has no table click program (prep_net a non-dist "
                "ColorizeImageJax*/Caffe* backend first)")
        self.model = model
        self.depth = max(1, depth)
        self._inflight: deque = deque()   # (seq, rgb, out_ab, frame, win?)
        self._seq = 0
        self._last_table = None
        self.frames_submitted = 0
        self.frames_materialized = 0
        self.frames_dropped = 0

    @property
    def pending(self) -> int:
        return len(self._inflight)

    def submit(self, boxes, values, count, win_args=None) -> int:
        """Dispatch one edit state; returns its sequence number.

        boxes (MAX_HINTS,4) int32, values (MAX_HINTS,2) f32, count live
        hints (ui.control.UIControl.hint_table). With ``win_args =
        (l_win_pad, rh, rw)`` the window-size display frame is composed in
        the same dispatch (the GUI path); otherwise the net-res frame is
        the display frame. Never blocks on device completion.
        """
        m = self.model
        if not (m.img_l_set and m.net_set):
            raise RuntimeError("model needs an image and a net")
        boxes = np.asarray(boxes, np.int32)
        values = np.asarray(values, np.float32)
        self._last_table = (boxes, values, int(count))
        db = jnp.asarray(boxes)
        dv = jnp.asarray(values)
        dc = jnp.int32(count)
        if win_args is not None:
            l_win_pad, rh, rw = win_args
            rgb, out_ab, win = m._click_tbl_win(
                m._dev_l_net, m._dev_l_mc, l_win_pad, rh, rw,
                m.params, db, dv, dc)
            frame = win
        else:
            rgb, out_ab = m._click_tbl(m._dev_l_net, m._dev_l_mc,
                                       m.params, db, dv, dc)
            win = None
            frame = rgb
        # pre-start the host copy of the would-be display frame so a
        # subsequent latest() only waits on an already-running transfer
        try:
            frame.copy_to_host_async()
        except AttributeError:            # backend without async copies
            pass
        self._seq += 1
        self.frames_submitted += 1
        self._inflight.append((self._seq, rgb, out_ab, frame, win))
        while len(self._inflight) > self.depth:
            self._inflight.popleft()      # stale: never read back
            self.frames_dropped += 1
        return self._seq

    def latest(self):
        """Materialize the NEWEST in-flight frame; drop older ones unread.

        Returns (seq, frame_u8) — the display frame of the last ``submit``
        (window-size when it was submitted with ``win_args``, else
        net-res) — or (last_seq, None) when nothing is in flight. Updates
        the backend's output state and dense hint mirrors to match.
        """
        if not self._inflight:
            return self._seq, None
        while len(self._inflight) > 1:
            self._inflight.popleft()
            self.frames_dropped += 1
        seq, rgb, out_ab, frame, win = self._inflight.popleft()
        frame_np = np.asarray(frame)
        self.frames_materialized += 1
        m = self.model
        # dense numpy hint mirrors (input_ab/input_mask + normalized forms)
        # for the getter/save surface — native host rasterizer, cheap
        from ..api.colorize import ColorizeImageBase
        from ..ops import host
        boxes, values, count = self._last_table
        ab_np, mask_np = host.rasterize_hints(boxes, values, count, m.Xd)
        ColorizeImageBase.net_forward(m, ab_np.transpose(2, 0, 1),
                                      mask_np.transpose(2, 0, 1))
        m._dev_output_ab = out_ab
        # net-res frame: already host-side when it IS the display frame,
        # else left device-resident (lazy readback, api.colorize)
        m.output_rgb = frame_np if win is None else rgb
        m._set_out_ab_()
        return seq, frame_np

    def flush(self):
        """Drop everything in flight without materializing (e.g. the image
        changed under the session)."""
        self.frames_dropped += len(self._inflight)
        self._inflight.clear()
