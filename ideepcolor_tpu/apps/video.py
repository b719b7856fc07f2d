"""Video colorization CLI over the pipelined streaming engine.

A capability the reference cannot express (it is strictly one synchronous
forward per GUI event, ref data/colorize_image.py:416-434): colorize a
grayscale video or frame folder with persistent user hints, pipelined so
throughput is device-bound (engine.streaming overlaps dispatch with
readback; uint8 gray frames upload 4x fewer bytes and convert to L* on
device).

Input : a video file (anything cv2.VideoCapture opens) or a directory of
        image frames (sorted by name).
Hints : optional JSON file, a list of {"y", "x", "ab": [a, b], "radius"}
        in net-resolution coordinates (the same schema the HTTP server's
        X-Hints header uses).
Output: a directory of PNG frames (default), or an .avi (MJPG) when
        ``--out`` ends in .avi.

Run: python -m ideepcolor_tpu.apps.video INPUT --out OUT \
         [--weights W] [--hints hints.json] [--size 256] [--fps 30]
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="video file or directory of frames")
    ap.add_argument("--out", type=str, default="./colorized",
                    help="output directory of PNGs, or an .avi path")
    ap.add_argument("--weights", type=str, default="",
                    help="checkpoint (.pth/.npz/orbax dir)")
    ap.add_argument("--hints", type=str, default="",
                    help="JSON file of hint points (net-res coords)")
    ap.add_argument("--size", type=int, default=256,
                    help="network resolution (frames are resized to it)")
    ap.add_argument("--fps", type=float, default=30.0,
                    help="output fps for .avi output")
    ap.add_argument("--depth", type=int, default=4,
                    help="pipeline depth (frames in flight)")
    ap.add_argument("--maskcent", action="store_true")
    ap.add_argument("--limit", type=int, default=0,
                    help="stop after N frames (0 = all)")
    ap.add_argument("--track-hints", action="store_true",
                    help="advect the hint points along dense optical "
                         "flow so they stick to moving content (hints "
                         "re-rasterize on device from a ~3 KB table "
                         "each frame)")
    return ap.parse_args(argv)


class HintTracker:
    """Advect hint points along dense optical flow so user hints stick
    to CONTENT as it moves across frames.

    The reference's interaction model is strictly per-still (one
    synchronous forward per GUI event, ref data/colorize_image.py:416-434
    — it has no video story at all); with a frame stream, a static hint
    placed on an object becomes wrong the moment the object moves. Flow
    (Farneback) runs on the host at net resolution (a few ms per 256^2
    frame on one core); the per-frame hint update ships as the device-
    rasterized fixed-shape table (StreamingSession.set_hint_table,
    ~3 KB), so tracking adds no meaningful upload bytes to the
    transfer-bound stream.
    """

    def __init__(self, hints: list, size: int):
        import numpy as np

        from ..ops.hints import MAX_HINTS
        self.size = size
        self.hints = [dict(h) for h in hints]
        if len(self.hints) > MAX_HINTS:
            raise ValueError(f"{len(self.hints)} hints > MAX_HINTS="
                             f"{MAX_HINTS}; tracked hints use the fixed "
                             f"table path")
        self.pts = np.array([[float(h["y"]), float(h["x"])]
                             for h in self.hints], np.float32)
        self.prev = None

    def step(self, gray_net):
        """Update positions with the prev->cur flow; return the current
        (boxes, values, count) hint table."""
        import cv2
        import numpy as np

        from ..ops.hints import points_json_to_table
        if self.prev is not None and len(self.pts):
            flow = cv2.calcOpticalFlowFarneback(
                self.prev, gray_net, None, pyr_scale=0.5, levels=3,
                winsize=15, iterations=3, poly_n=5, poly_sigma=1.2,
                flags=0)
            iy = np.clip(np.round(self.pts[:, 0]).astype(int), 0,
                         self.size - 1)
            ix = np.clip(np.round(self.pts[:, 1]).astype(int), 0,
                         self.size - 1)
            self.pts[:, 0] += flow[iy, ix, 1]
            self.pts[:, 1] += flow[iy, ix, 0]
            np.clip(self.pts, 0, self.size - 1, out=self.pts)
        self.prev = gray_net
        for h, (y, x) in zip(self.hints, self.pts):
            h["y"], h["x"] = int(round(float(y))), int(round(float(x)))
        return points_json_to_table(self.hints, self.size)


def _frame_source(path: str):
    """Yield uint8 gray frames from a video file or a frame directory."""
    import cv2
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for n in names:
            bgr = cv2.imread(os.path.join(path, n))
            if bgr is not None:
                yield cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        return
    cap = cv2.VideoCapture(path)
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    finally:
        cap.release()


class _FrameSink:
    """PNG-directory or MJPG-avi writer."""

    def __init__(self, out: str, size: int, fps: float):
        import cv2
        self.cv2 = cv2
        self.n = 0
        self.writer = None
        self.out = out
        if out.endswith(".avi"):
            os.makedirs(os.path.dirname(os.path.abspath(out)),
                        exist_ok=True)
            self.writer = cv2.VideoWriter(
                out, cv2.VideoWriter_fourcc(*"MJPG"), fps, (size, size))
            if not self.writer.isOpened():  # codec unavailable: fall back
                self.writer = None
                self.out = out[:-4]
        if self.writer is None:
            os.makedirs(self.out, exist_ok=True)

    def write(self, rgb_u8):
        bgr = rgb_u8[:, :, ::-1]
        if self.writer is not None:
            self.writer.write(bgr)
        else:
            self.cv2.imwrite(
                os.path.join(self.out, f"frame_{self.n:06d}.png"), bgr)
        self.n += 1

    def close(self):
        if self.writer is not None:
            self.writer.release()


def run(args) -> int:
    import time

    import cv2
    import numpy as np

    from ..api.colorize import _load_checkpoint
    from ..engine.streaming import StreamingSession
    from ..models import siggraph
    from ..ops.hints import put_points_json

    sd = _load_checkpoint(args.weights)
    if sd is None:
        import jax
        params = siggraph.init_params(jax.random.key(0))
    else:
        params = siggraph.params_from_state_dict(sd)

    sess = StreamingSession(params, size=args.size,
                            maskcent=0.5 if args.maskcent else 0.0,
                            depth=args.depth, with_dist=False)
    tracker = None
    if args.hints:
        hints = json.load(open(args.hints))
        if args.track_hints:
            tracker = HintTracker(hints, args.size)
        else:
            ab = np.zeros((2, args.size, args.size), np.float32)
            mask = np.zeros((1, args.size, args.size), np.float32)
            put_points_json(ab, mask, hints, args.size)
            sess.set_hints(ab.transpose(1, 2, 0), mask.transpose(1, 2, 0))
    elif args.track_hints:
        print("--track-hints needs --hints; ignoring")

    sink = _FrameSink(args.out, args.size, args.fps)
    t0 = time.perf_counter()
    t_first = None                 # first completed frame = end of warmup
    n_in = 0
    for gray in _frame_source(args.input):
        if args.limit and n_in >= args.limit:
            break
        g = cv2.resize(gray, (args.size, args.size))
        if tracker is not None:
            boxes, values, count = tracker.step(g)
            sess.set_hint_table(boxes, values, count)
        done = sess.submit(g, srgb=True)
        n_in += 1
        if done is not None:
            if t_first is None:
                t_first = time.perf_counter()
            sink.write(done[0])
    for done in sess.drain():
        if t_first is None:
            t_first = time.perf_counter()
        sink.write(done[0])
    sink.close()
    dt = time.perf_counter() - t0
    # separate the one-off warmup (first program compile/load, 15-40 s on
    # a tunneled chip) from the pipelined steady-state rate
    steady = ((sink.n - 1) / max(time.perf_counter() - t_first, 1e-9)
              if t_first is not None and sink.n > 1 else 0.0)
    print(f"colorized {sink.n} frames in {dt:.1f} s "
          f"(warmup {0 if t_first is None else t_first - t0:.1f} s, "
          f"steady {steady:.1f} fps) -> {sink.out}")
    return 0


def main(argv=None):
    from ..config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    return run(parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
