"""HTTP serving endpoint over the colorization engine.

The reference has no server (it is a desktop app + notebooks); this is the
natural production surface over the same fused XLA programs the GUI uses.
Stdlib-only (``http.server``), one process per chip: requests serialize
through a lock onto the single device queue (concurrent TPU processes
contend; a thread pool inside one process pipelines naturally).

Endpoints
---------
GET  /healthz
    {"status": "ok", "device": ..., "size": Xd, "requests": N}

GET  /stats
    Per-endpoint latency percentiles (p50/p95/mean over the most recent
    1000 requests) — the observability surface SURVEY.md §5 calls for.

GET  /metrics
    The same counters/gauges/latency summaries in Prometheus text
    exposition format (requests, sheds, sessions incl. recycle-parked,
    RSS, recycle generation, per-stage quantiles) for standard scraping.

POST /colorize           (Content-Type: image/jpeg | image/png)
    Body: encoded image bytes. Optional ``X-Hints`` header: JSON list of
    {"y": int, "x": int, "ab": [a, b], "radius": int} in Xd-grid
    coordinates (the notebook's put_point semantics,
    ref DemoInteractiveColorization.ipynb cell 7). Query ``?fullres=0``
    returns the Xd x Xd frame instead of the full-resolution fusion.
    Response: image/png of the colorized result.
    With ``--student-weights``, ``?model=fast`` serves the request on the
    distilled reduced-width student (train/distill.py) — the
    latency/throughput tier; each tier has its own dynamic batcher.
    With ``--auto-batch N``, concurrent ``fullres=0`` requests coalesce
    into one batched device dispatch (dynamic batching: whatever queues
    while the device is busy joins the next batch, padded to power-of-two
    buckets so at most log2(N)+1 programs ever compile). Full-res
    requests keep the per-request fused path (their output resolution is
    per-image).

POST /colorize_batch     (Content-Type: application/x-npz)
    Body: npz with ``images`` (N,S,S,3 uint8) and optional dense
    ``hint_ab`` (N,S,S,2) / ``hint_mask`` (N,S,S,1).
    Response: npz with ``frames`` (N,S,S,3 uint8) via engine.batch
    (optionally mesh-sharded over batch with --mesh).

POST /colorize_global    (Content-Type: application/x-npz)
    Global histogram transfer as a service (the reference's
    DemoGlobalHistogramTransfer notebook flow, SURVEY.md §3.5): npz body
    with ``image`` and ``ref`` (both encoded image bytes as uint8
    arrays). The ref image's 313-bin global ab histogram
    (models/global_stats.extract) conditions the colorization of
    ``image`` through the global-hints graph. ``?fullres=0`` for the
    net-res frame. Response: image/png.

POST /session            (Content-Type: image bytes)
    Open an interactive session: the image uploads ONCE and stays
    device-resident (the GUI's model state as a service). Response:
    {"id": ..., "size": Xd}. Sessions are LRU-capped (16); DELETE
    /session?id=X closes one explicitly.

POST /session/click?id=X[&fullres=1]   (Content-Type: application/json)
    Body: the hint list (as in X-Hints). Re-colorizes the session's
    image -- per-click upload is the ~1.8 KB hint table, the GUI's
    fast path over HTTP. Response: image/png (net-res by default).

POST /suggest?h=Y&w=X[&k=K]   (Content-Type: image bytes)
    Color recommendations at pixel (h, w) in Xd-grid coordinates — the
    GUI's suggestion palette as a service (distribution head + on-device
    CMF sampling + k-means, ref data/colorize_image.py:322-355). Optional
    ``X-Hints`` header as in /colorize. Response: JSON
    {"colors": [[r,g,b] x K] uint8, "conf": [K floats]}.

Run: ``python -m ideepcolor_tpu.apps.serve --port 8723 [--weights W]``.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ServerBusy(Exception):
    """Bulk admission refused: the bulk queue is at its cap. Handlers map
    this to 429 + Retry-After (backpressure instead of unbounded bulk
    latency under saturation)."""

    def __init__(self, backlog: int, retry_after_s: int):
        super().__init__(f"bulk queue full ({backlog} waiting); "
                         f"retry in ~{retry_after_s}s")
        self.retry_after_s = retry_after_s


class PriorityLock:
    """Two-level device lock: interactive work (session clicks, suggests,
    net-res colorize) is admitted before bulk work (full-res fusion,
    /colorize_batch, global transfer, warmup) regardless of arrival
    order, so a ~30 ms click never queues behind a ~760 ms full-res job
    that happened to arrive first. Plain ``threading.Lock`` admits
    waiters in arbitrary order, which under mixed load made soak clicks
    measure ~417 ms p50 against a ~48 ms solo path.

    ``with lock:`` acquires at interactive priority; ``with
    lock.bulk():`` at bulk priority. Anti-starvation: after
    ``BULK_BOOST`` consecutive interactive grants while bulk work waits,
    the oldest bulk waiter is admitted (bounds bulk added wait to
    ~BULK_BOOST x one interactive dispatch).
    """

    BULK_BOOST = 6

    def __init__(self):
        import collections
        self._cv = threading.Condition()
        self._held = False
        self._waiters = (collections.deque(), collections.deque())
        self._streak = 0        # interactive grants while bulk waited
        self.bulk_jumped = 0    # stats: grants that bypassed queued bulk

    def _head(self):
        inter, bulk = self._waiters
        if bulk and (not inter or self._streak >= self.BULK_BOOST):
            return bulk[0]
        return inter[0] if inter else (bulk[0] if bulk else None)

    def bulk_backlog(self) -> int:
        with self._cv:
            return len(self._waiters[1])

    def acquire(self, level: int = 0, cap: int | None = None) -> None:
        me = object()
        with self._cv:
            if level == 1 and cap is not None:
                backlog = len(self._waiters[1])
                if backlog >= cap:
                    # admission check is atomic with enqueue (under _cv),
                    # so the cap is exact, not best-effort
                    raise ServerBusy(
                        backlog, max(1, round(backlog * 0.7)))
            self._waiters[level].append(me)
            while self._held or self._head() is not me:
                self._cv.wait()
            self._waiters[level].remove(me)
            self._held = True
            if level == 0 and self._waiters[1]:
                self._streak += 1
                self.bulk_jumped += 1
            else:
                self._streak = 0

    def release(self) -> None:
        with self._cv:
            self._held = False
            self._cv.notify_all()

    def __enter__(self):
        self.acquire(0)
        return self

    def __exit__(self, *exc):
        self.release()
        return False

    def bulk(self, cap: int | None = None):
        return _BulkAcquire(self, cap)


class _BulkAcquire:
    def __init__(self, lock: PriorityLock, cap: int | None = None):
        self._lock = lock
        self._cap = cap

    def __enter__(self):
        self._lock.acquire(1, cap=self._cap)
        return self._lock

    def __exit__(self, *exc):
        self._lock.release()
        return False


class _AutoBatcher:
    """Dynamic request batching: net-res /colorize requests that arrive
    while the device is busy coalesce into ONE batched dispatch
    (engine.batch.colorize_batch). The collector takes the first queued
    request, then admits whatever else arrives within ``max_wait_ms`` (or
    until ``max_batch``); batches pad to power-of-two buckets so at most
    log2(max_batch)+1 programs ever compile. The device-bound batch rate
    (~1040 imgs/s bf16 at 256²) then serves concurrent clients instead of
    the serialized per-request rate."""

    def __init__(self, service: "ColorizeService", model,
                 max_batch: int = 16, max_wait_ms: float = 5.0):
        import queue
        self.service = service
        self.model = model          # which net this batcher dispatches
        # (the --student-weights fast tier gets its own batcher; mixed
        # models cannot share one device dispatch)
        # batch shapes must divide the mesh's batch axes when sharded
        self.align = 1
        if service.mesh is not None:
            self.align = (service.mesh.shape.get("data", 1)
                          * service.mesh.shape.get("dcn", 1))
            if self.align > max(int(max_batch), 1):
                # padding above the configured bound would silently break
                # the user's memory budget — make the conflict loud
                raise ValueError(
                    f"--auto-batch {max_batch} is below the mesh batch "
                    f"alignment {self.align}; raise it or shrink the mesh")
        # dispatch sizes come from a fixed bucket ladder: align-multiples
        # doubling up to max_batch rounded DOWN to the alignment (never
        # above the configured bound, bounded program count, mesh-valid
        # shapes even for non-power-of-two device layouts)
        self.max_batch = max(int(max_batch), 1)
        if self.align == 1:
            self.max_batch = 1 << (self.max_batch.bit_length() - 1)
        else:
            self.max_batch = (self.max_batch // self.align) * self.align
        b, self._buckets = self.align, []
        while b < self.max_batch:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(self.max_batch)
        self.wait_s = float(max_wait_ms) / 1e3
        self.q: "queue.Queue" = queue.Queue()
        self.dispatches = 0
        self.batched_requests = 0
        threading.Thread(target=self._run, daemon=True,
                         name="serve-autobatch").start()

    def submit(self, rgb_net: np.ndarray, boxes: np.ndarray,
               values: np.ndarray, count: int) -> np.ndarray:
        """Blocks until the coalesced dispatch completes; returns the
        (S,S,3) uint8 frame for this request. Hints travel as a fixed
        (MAX_HINTS, 4)/(MAX_HINTS, 2) table + live count (~1.5 KB vs
        ~768 KB dense planes — the tunnel transport retains upload bytes
        in host RSS, so the table path is also the memory-stable one)."""
        ev = threading.Event()
        slot: dict = {}
        self.q.put((rgb_net, boxes, values, count, ev, slot))
        ev.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["frame"]

    def cap_for(self, n: int) -> int:
        """Padded dispatch size for an n-item batch: the smallest ladder
        bucket that fits (n <= max_batch always holds — the collector
        stops there)."""
        return next(b for b in self._buckets if b >= n)

    def bucket_caps(self) -> list[int]:
        """Every dispatch size this batcher can produce (what warmup
        must compile)."""
        return list(self._buckets)

    def _run(self):
        import queue as _q
        import time as _t
        from ..engine.batch import colorize_batch_table
        while True:
            items = [self.q.get()]
            deadline = _t.monotonic() + self.wait_s
            while len(items) < self.max_batch:
                left = deadline - _t.monotonic()
                if left <= 0:
                    break
                try:
                    items.append(self.q.get(timeout=left))
                except _q.Empty:
                    break
            n = len(items)
            pad = self.cap_for(n) - n
            try:
                imgs = np.stack([it[0] for it in items]
                                + [items[0][0]] * pad)
                boxes = np.stack([it[1] for it in items]
                                 + [items[0][1]] * pad)
                values = np.stack([it[2] for it in items]
                                  + [items[0][2]] * pad)
                counts = np.asarray([it[3] for it in items] + [0] * pad,
                                    np.int32)
                svc = self.service
                with svc.lock, svc.timer.stage("colorize_batched"):
                    svc.requests += n
                    frames = colorize_batch_table(
                        self.model.params, imgs, boxes, values, counts,
                        maskcent=float(self.model.mask_cent),
                        mesh=svc.mesh)
                self.dispatches += 1
                self.batched_requests += n
                for i, it in enumerate(items):
                    it[5]["frame"] = frames[i]
                    it[4].set()
            except Exception as e:   # propagate to every waiter
                for it in items:
                    it[5]["err"] = e
                    it[4].set()


class ColorizeService:
    """Model state + request handlers, shared across server threads."""

    def __init__(self, weights: str = '', size: int = 256,
                 maskcent: bool = False, use_mesh: bool = False,
                 dtype: str | None = "bfloat16", auto_batch: int = 0,
                 glob_weights: str = '', student_weights: str = '',
                 max_bulk_backlog: int = 0):
        """dtype: serving precision, DEFAULT bfloat16 — the fast MXU mode,
        frame delta vs f32 is tiny (~56 dB PSNR, worst pixels within a few
        uint8 LSB; bench records the exact per-run delta); pass
        'float32' for bit-parity serving.

        max_bulk_backlog: bulk-class admission cap — when that many bulk
        requests (full-res fusion, /colorize_batch, global transfer)
        already wait on the device, further bulk work is shed with 429 +
        Retry-After instead of queueing unboundedly (0 = unbounded)."""
        from .. import api
        self.size = size
        self.model = api.ColorizeImageJax(Xd=size, maskcent=maskcent)
        self.model.prep_net(path=weights, dtype=dtype)
        # optional fast tier: a distilled reduced-width student (width is
        # implicit in its checkpoint) served at ?model=fast
        self.model_fast = None
        if student_weights:
            self.model_fast = api.ColorizeImageJax(Xd=size,
                                                   maskcent=maskcent)
            self.model_fast.prep_net(path=student_weights, dtype=dtype)
        self.lock = PriorityLock()
        self.max_bulk_backlog = int(max_bulk_backlog)
        self.shed_429 = 0           # bulk requests refused at the cap
        self._shed_lock = threading.Lock()
        # drain-and-recycle state (RecycleGuard): while draining, handlers
        # shed new POSTs with 503 and the guard waits for inflight == 0
        self.draining = False
        self.inflight = 0
        self._inflight_cv = threading.Condition()
        self.requests = 0
        self._weights = weights
        self._maskcent = maskcent
        self._dtype = dtype
        self._dist = None            # built lazily on first /suggest
        self._dist_init_lock = threading.Lock()
        self._glob = None            # built lazily on first /colorize_global
        self._sessions: dict = {}    # interactive sessions, LRU order
        self._pending_sessions: dict = {}   # recycle-parked (lazy replay)
        self._glob_weights = glob_weights   # the glob graph is a separate
        # param family (caffe global-hints net), so it takes its own
        # checkpoint; '' = seeded random init
        from ..utils.profiling import StageTimer
        self.timer = StageTimer(maxlen=1000)
        self.boot_stages: dict = {}   # filled by main(); in /healthz
        self.mesh = None
        if use_mesh:
            import jax
            from ..parallel import mesh as pmesh
            if len(jax.devices()) > 1:
                self.mesh = pmesh.make_mesh()
        self.batcher = (_AutoBatcher(self, self.model,
                                     max_batch=auto_batch)
                        if auto_batch > 0 else None)
        self.batcher_fast = (
            _AutoBatcher(self, self.model_fast, max_batch=auto_batch)
            if auto_batch > 0 and self.model_fast is not None else None)

    def _bulk(self):
        """Bulk-priority device acquisition with the admission cap
        (ServerBusy raises from __enter__ and maps to 429)."""
        return self.lock.bulk(self.max_bulk_backlog or None)

    def _count_shed(self):
        with self._shed_lock:
            self.shed_429 += 1

    # -- single image --
    def colorize(self, img_bytes: bytes, hints=None,
                 fullres: bool = True, fast: bool = False) -> bytes:
        import cv2
        from ..ops.hints import put_points_json
        if fast and self.model_fast is None:
            raise ValueError("no fast tier: start with --student-weights")
        model = self.model_fast if fast else self.model
        batcher = self.batcher_fast if fast else self.batcher
        raw = np.frombuffer(img_bytes, np.uint8)
        bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("undecodable image body")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if not fullres and batcher is not None:
            from ..ops.hints import points_json_to_table
            table = points_json_to_table(hints, self.size)
            if table is not None:     # falls through on >MAX_HINTS hints
                # dynamic batching: coalesce with concurrent net-res
                # requests (the dispatch counts the request, under the
                # lock); hints ride the ~1.5 KB table
                rgb_net = cv2.resize(rgb, (self.size, self.size))
                result = batcher.submit(rgb_net, *table)
                ok, png = cv2.imencode(".png", result[:, :, ::-1])
                if not ok:
                    raise RuntimeError("png encode failed")
                return png.tobytes()
        ab = np.zeros((2, self.size, self.size), np.float32)
        mask = np.zeros((1, self.size, self.size), np.float32)
        put_points_json(ab, mask, hints, self.size)
        # full-res fusion holds the device for hundreds of ms -> bulk
        # priority (interactive clicks/suggests go first)
        lock_ctx = self._bulk() if fullres else self.lock
        with lock_ctx, self.timer.stage(
                "colorize_fullres" if fullres else "colorize"):
            self.requests += 1
            model.load_image_array(rgb)
            if fullres:
                finish = model.net_forward_fullres_async(ab, mask)
                if finish == -1:
                    raise RuntimeError("forward failed")
            else:
                # net-res only: plain click program, no full-res fusion
                # or full-frame readback
                result = model.net_forward(ab, mask)
                if isinstance(result, int):
                    raise RuntimeError("forward failed")
        if fullres:
            # block for the frame OUTSIDE the device lock: the dominant
            # device->host copy of the full-res frame overlaps
            # interactive clicks instead of serializing behind them
            # (its own stage so /stats still accounts the dominant term;
            # the in-lock stage above now measures device-hold only)
            with self.timer.stage("fullres_readback"):
                result = finish()
        ok, png = cv2.imencode(".png", result[:, :, ::-1])
        if not ok:
            raise RuntimeError("png encode failed")
        return png.tobytes()

    # -- suggestions --
    def suggest(self, img_bytes: bytes, h: int, w: int, k: int = 9,
                hints=None) -> dict:
        import cv2
        from ..ops.hints import put_points_json
        if not (0 <= h < self.size and 0 <= w < self.size):
            raise ValueError(f"(h,w) must be in [0,{self.size}), "
                             f"got ({h},{w})")
        raw = np.frombuffer(img_bytes, np.uint8)
        bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("undecodable image body")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        from ..ops.hints import points_json_to_table
        table = points_json_to_table(hints, self.size)  # validates; None
        dist = self._ensure_dist()
        if not 1 <= k <= dist.MAX_SUGGEST_K:     # client-controlled -> 400
            raise ValueError(
                f"k must be in [1, {dist.MAX_SUGGEST_K}], got {k}")
        if table is not None:
            # a novel (k, N) means a full-model XLA compile — do it HERE,
            # outside the device lock, so it never stalls queued clicks
            dist.ensure_suggest_program(K=k, compile_now=True)
        with self.lock, self.timer.stage("suggest"):    # on overflow
            self.requests += 1
            self._dist.load_image_array(rgb)
            if table is not None:
                # fully fused: table dist forward + CMF/k-means + palette
                # in ONE dispatch (single sync round trip)
                res = self._dist.suggest_table(*table, h=h, w=w, K=k)
                if isinstance(res, int):         # -1 sentinel, not a tuple
                    raise RuntimeError("suggest forward failed "
                                       "(image or net unset)")
                colors, conf = res
                return {"colors": colors.tolist(),
                        "conf": [float(c) for c in conf]}
            ab = np.zeros((2, self.size, self.size), np.float32)
            mask = np.zeros((1, self.size, self.size), np.float32)
            put_points_json(ab, mask, hints, self.size)
            self._dist.net_forward(ab, mask)
            centers, conf = self._dist.get_ab_reccs(h=h, w=w, K=k,
                                                    return_conf=True)
            # still under the lock: a concurrent /suggest would reload
            # the shared dist model's image before we read its pixel L
            return self._reccs_to_colors(self._dist, centers, conf,
                                         h, w, k)

    def _ensure_dist(self):
        # own lock (not the device lock): suggest handlers build the dist
        # model and AOT-compile novel k programs BEFORE queueing on the
        # device, so a compile never stalls interactive traffic
        with self._dist_init_lock:
            if self._dist is None:
                from .. import api
                d = api.ColorizeImageJaxDist(Xd=self.size,
                                             maskcent=self._maskcent)
                # assign only after a successful prep (a bad weights path
                # must not wedge the endpoint; cf. the glob model)
                d.prep_net(path=self._weights, dtype=self._dtype)
                self._dist = d
        return self._dist

    def _reccs_to_colors(self, d, centers, conf, h, w, k) -> dict:
        # pixel L via the native host converter (no device readback);
        # one fixed-shape device dispatch converts all K colors
        from ..api.colorize import lab2rgb_transpose
        from ..ops import host
        L = float(host.rgb2lab(
            d.img_rgb[h, w][None, None].astype(np.float32)
            / 255.0)[0, 0, 0])
        lab = np.concatenate(
            [np.full((k, 1), L, np.float32),
             np.asarray(centers, np.float32)], axis=1).T[:, :, None]
        colors = lab2rgb_transpose(lab[:1], lab[1:]).reshape(k, 3)
        return {"colors": colors.tolist(),
                "conf": [float(c) for c in np.asarray(conf)]}

    # -- interactive sessions (image device-resident across clicks) --
    MAX_SESSIONS = 16

    def session_open(self, img_bytes: bytes, fast: bool = False) -> dict:
        import copy
        import uuid
        import cv2
        if fast and self.model_fast is None:
            raise ValueError("no fast tier: start with --student-weights")
        raw = np.frombuffer(img_bytes, np.uint8)
        bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("undecodable image body")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        with self.lock, self.timer.stage("session_open"):
            self.requests += 1
            # a shallow copy shares params AND the compiled click
            # programs (a fresh prep_net would re-wrap them in new jits
            # and recompile per session); load_image_array then replaces
            # all per-image state
            m = copy.copy(self.model_fast if fast else self.model)
            m.load_image_array(rgb)
            m._sess_fast = fast      # tier, for dump/replay across recycle
            sid = uuid.uuid4().hex[:16]
            self._sessions[sid] = m
            while len(self._sessions) > self.MAX_SESSIONS:
                self._sessions.pop(next(iter(self._sessions)))  # LRU
        return {"id": sid, "size": self.size}

    def dump_sessions(self, path: str) -> int:
        """Persist every live session's identity + source image to one npz
        (the drain step of the RecycleGuard). Device-side Lab state is NOT
        saved — replay rebuilds it from the image, which is the whole
        point: the re-exec'd process starts with a fresh (leak-free)
        transport."""
        arrays, meta = {}, {}
        with self.lock:
            # sessions still parked from the PREVIOUS recycle (lazy
            # replay, never touched this generation) carry over too —
            # but the LIVE sessions take priority and the TOTAL is capped
            # at MAX_SESSIONS: without the cap, clients that abandoned
            # their sessions would re-park a full-res image in host
            # memory across every future recycle, growing RSS without
            # bound (ADVICE r3). Oldest parked entries drop first, the
            # same fate LRU eviction gives an untouched live session.
            keep_parked = max(self.MAX_SESSIONS - len(self._sessions), 0)
            parked = list(self._pending_sessions.items())
            for sid, (img, fast) in parked[len(parked) - keep_parked:]:
                arrays[sid] = img
                meta[sid] = bool(fast)
            for sid, m in self._sessions.items():
                arrays[sid] = np.asarray(m.img_rgb_fullres)
                meta[sid] = bool(getattr(m, "_sess_fast", False))
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8)
        with open(path, "wb") as f:
            np.savez(f, **arrays)
        return len(meta)

    def replay_sessions(self, path: str, lazy: bool = False) -> int:
        """Restore sessions dumped by dump_sessions under their ORIGINAL
        ids (clients keep clicking the same /session/click?id=X across a
        recycle).

        ``lazy=True`` (the re-exec boot path) parks each session's image
        host-side in ``self._pending_sessions`` and restores it on FIRST
        TOUCH instead of replaying everything before serving: an eager
        replay of N sessions runs N image uploads + forwards while
        clients queue in the kernel accept backlog, so the recycle
        straddler's worst case grew with the session count (measured
        soak10_max_ms ~418 s at 600 s soak scale). Lazily, the first
        request only waits for exec + device init + ITS OWN session."""
        import copy
        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            with self.lock:
                for sid, fast in meta.items():
                    if fast and self.model_fast is None:
                        fast = False
                    if lazy:
                        self._pending_sessions[sid] = (
                            np.asarray(z[sid]), fast)
                        continue
                    m = copy.copy(self.model_fast if fast else self.model)
                    m.load_image_array(np.asarray(z[sid]))
                    m._sess_fast = fast
                    self._sessions[sid] = m
                # parked entries obey the same LRU cap as live sessions
                # (dump_sessions also caps; this guards a hand-rolled
                # oversized dump): newest kept, oldest dropped
                while len(self._pending_sessions) > self.MAX_SESSIONS:
                    self._pending_sessions.pop(
                        next(iter(self._pending_sessions)))
        return len(meta)

    def _lookup_session(self, sid: str):
        """LRU-touch lookup; restores a recycle-parked session on first
        touch. Call with ``self.lock`` (or the bulk lock) HELD."""
        import copy
        m = self._sessions.pop(sid, None)
        if m is None and sid in self._pending_sessions:
            img, fast = self._pending_sessions.pop(sid)
            m = copy.copy(self.model_fast if fast else self.model)
            m.load_image_array(img)
            m._sess_fast = fast
        if m is None:
            raise LookupError(f"unknown session {sid!r}")
        self._sessions[sid] = m                             # LRU touch
        while len(self._sessions) > self.MAX_SESSIONS:      # restore can
            self._sessions.pop(next(iter(self._sessions)))  # overfill
        return m

    def session_click(self, sid: str, hints, fullres: bool = False
                      ) -> bytes:
        import cv2
        from ..ops.hints import points_json_to_table, put_points_json
        table = points_json_to_table(hints, self.size)
        # fullres session clicks pay the full-res fusion under the lock
        lock_ctx = self._bulk() if fullres else self.lock
        with lock_ctx, self.timer.stage("session_click"):
            self.requests += 1
            # lookup under the lock: a concurrent DELETE or LRU eviction
            # between a pre-lock check and here must be a clean 404
            m = self._lookup_session(sid)
            if table is not None:
                # IDEEPCOLOR_NET_CLICK=abq[_half] opts into the u8-ab
                # payload + host compose (api.colorize.net_click_mode —
                # measured a wash on the 1-core tunnel rig, a win on
                # multi-core or <5 MB/s links). Backends without the abq
                # program (dist) return -1 and fall back to rgb.
                from ..api.colorize import net_click_mode
                mode = net_click_mode()
                result = -1
                # fullres clicks stay on rgb even in abq mode: the
                # full-res fusion reads the device out_ab mirror, and
                # abq's lazy host->device re-upload (~512 KB/click)
                # is exactly the upload-leak class the table path
                # exists to avoid (CLAUDE.md)
                if mode != "rgb" and not fullres:
                    result = m.net_forward_table_abq(
                        *table, half=(mode == "abq_half"))
                if isinstance(result, int):
                    result = m.net_forward_table(*table)
            else:                       # >MAX_HINTS: dense fallback
                ab = np.zeros((2, self.size, self.size), np.float32)
                mask = np.zeros((1, self.size, self.size), np.float32)
                put_points_json(ab, mask, hints, self.size)
                result = m.net_forward(ab, mask)
            if isinstance(result, int):
                raise RuntimeError("forward failed")
            finish = m.get_img_fullres_async() if fullres else None
        if finish is not None:
            # full-res readback outside the lock (stage-timed for /stats)
            with self.timer.stage("fullres_readback"):
                result = finish()
        ok, png = cv2.imencode(".png", result[:, :, ::-1])
        if not ok:
            raise RuntimeError("png encode failed")
        return png.tobytes()

    def session_suggest(self, sid: str, hints, h: int, w: int,
                        k: int = 9) -> dict:
        """Color recommendations at (h, w) for a session's image —
        no image re-upload: the session lazily keeps its own dist-model
        copy (shared params/programs) with device-resident Lab planes."""
        import copy
        from ..ops.hints import points_json_to_table
        if not (0 <= h < self.size and 0 <= w < self.size):
            raise ValueError(f"(h,w) must be in [0,{self.size}), "
                             f"got ({h},{w})")
        table = points_json_to_table(hints, self.size)
        if table is None:
            raise ValueError("too many hints for the suggestion table")
        # validate k and compile a novel (k, N) program BEFORE taking the
        # device lock (session dist copies share the service dist model's
        # program cache via copy.copy, so ensuring here covers them all)
        self._ensure_dist().ensure_suggest_program(K=k, compile_now=True)
        with self.lock, self.timer.stage("session_suggest"):
            self.requests += 1
            m = self._lookup_session(sid)       # lookup under the lock
            d = getattr(m, "_sess_dist", None)
            if d is None:
                d = copy.copy(self._dist)
                # net-res image only: the suggestion path never touches
                # full-res state, and a full-res reload would re-upload
                # megabytes per session on a transport that retains
                # upload bytes in RSS
                d.load_image_array(m.img_rgb)
                m._sess_dist = d
            # fused: table dist forward + CMF/k-means + palette, one
            # dispatch, one sync round trip
            res = d.suggest_table(*table, h=h, w=w, K=k)
            if isinstance(res, int):             # -1 sentinel, not a tuple
                raise RuntimeError("suggest forward failed "
                                   "(image or net unset)")
            colors, conf = res
            return {"colors": colors.tolist(),
                    "conf": [float(c) for c in conf]}

    def session_close(self, sid: str) -> bool:
        with self.lock:
            parked = self._pending_sessions.pop(sid, None) is not None
            return (self._sessions.pop(sid, None) is not None) or parked

    # -- global histogram transfer --
    def colorize_global(self, body: bytes, fullres: bool = True) -> bytes:
        """npz {image, ref} (encoded bytes as uint8 arrays) -> PNG of
        ``image`` colorized under ``ref``'s global ab histogram."""
        import cv2
        try:
            with np.load(io.BytesIO(body)) as z:
                if "image" not in z or "ref" not in z:
                    raise ValueError("npz must contain 'image' and 'ref'")
                img_raw = np.asarray(z["image"], np.uint8)
                ref_raw = np.asarray(z["ref"], np.uint8)
        except ValueError:
            raise
        except Exception as e:          # zipfile/pickle decode errors
            raise ValueError(f"not a valid npz body: {e}")
        bgr = cv2.imdecode(img_raw, cv2.IMREAD_COLOR)
        ref_bgr = cv2.imdecode(ref_raw, cv2.IMREAD_COLOR)
        if bgr is None or ref_bgr is None:
            raise ValueError("undecodable image/ref body")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        # the stats graph is fixed-size (4x4 avgpool needs %4 dims; the
        # reference's global_stats.prototxt input is 256^2) and resizing
        # keeps ONE compiled extract program across arbitrary ref sizes
        ref_rgb = cv2.resize(cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB),
                             (self.size, self.size))
        ab = np.zeros((2, self.size, self.size), np.float32)
        mask = np.zeros((1, self.size, self.size), np.float32)
        with self._bulk(), self.timer.stage("colorize_global"):
            self.requests += 1
            if self._glob is None:
                from .. import api
                g = api.ColorizeImageJaxCaffeGlobDist(Xd=self.size)
                # assign only after a successful prep: a half-initialized
                # model left behind by a bad --glob-weights path would
                # turn every later request into an opaque 500
                g.prep_net(caffemodel_path=self._glob_weights)
                self._glob = g
            from ..models import global_stats
            hist = np.asarray(global_stats.extract(
                ref_rgb.astype(np.float32) / 255.0)["glob_ab_313"])
            self._glob.load_image_array(rgb)
            if fullres:
                # fused forward + full-res: one synchronization point
                # instead of two full round trips; frame readback blocks
                # outside the lock
                finish = self._glob.net_forward_fullres_async(ab, mask,
                                                              hist)
                if finish == -1:
                    raise RuntimeError("forward failed")
            else:
                result = self._glob.net_forward(ab, mask, hist)
                if isinstance(result, int):
                    raise RuntimeError("forward failed")
        if fullres:
            with self.timer.stage("fullres_readback"):
                result = finish()
        ok, png = cv2.imencode(".png", result[:, :, ::-1])
        if not ok:
            raise RuntimeError("png encode failed")
        return png.tobytes()

    # -- batch --
    def colorize_batch(self, body: bytes) -> bytes:
        from ..engine.batch import colorize_batch, colorize_batch_table
        with np.load(io.BytesIO(body)) as z:
            images = z["images"]
            hint_ab = z["hint_ab"] if "hint_ab" in z else None
            hint_mask = z["hint_mask"] if "hint_mask" in z else None
            boxes = z["boxes"] if "boxes" in z else None
            values = z["values"] if "values" in z else None
            counts = z["counts"] if "counts" in z else None
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(f"images must be (N,S,S,3), got {images.shape}")
        if boxes is not None:
            # table-hint form: (N,M,4) boxes + (N,M,2) values + (N,)
            # counts, rasterized on device (the memory-stable upload)
            if values is None or counts is None:
                raise ValueError("boxes requires values and counts")
            if hint_ab is not None:
                raise ValueError("pass either table or dense hints")
            n = len(images)
            if (boxes.ndim != 3 or boxes.shape[0] != n
                    or boxes.shape[2] != 4
                    or values.shape != (*boxes.shape[:2], 2)
                    or counts.shape != (n,)):
                raise ValueError(
                    f"table shapes mismatch: {boxes.shape} "
                    f"{values.shape} {counts.shape} for {n} images")
            with self._bulk(), self.timer.stage("colorize_batch"):
                self.requests += 1
                frames = colorize_batch_table(
                    self.model.params, images, boxes, values, counts,
                    maskcent=float(self.model.mask_cent), mesh=self.mesh)
            buf = io.BytesIO()
            np.savez(buf, frames=frames)
            return buf.getvalue()
        with self._bulk(), self.timer.stage("colorize_batch"):
            self.requests += 1
            frames = colorize_batch(self.model.params, images,
                                    hint_ab=hint_ab, hint_mask=hint_mask,
                                    maskcent=float(self.model.mask_cent),
                                    mesh=self.mesh)
        buf = io.BytesIO()
        # uncompressed npz: photo-like uint8 frames barely compress and
        # deflate costs 100+ ms per batch on the response path
        np.savez(buf, frames=frames)
        return buf.getvalue()

    def ready_probe(self) -> dict:
        """One tiny net-res forward: forces jax device init, the first
        dispatch and the cached click-program load to complete during
        boot (while handlers still answer 503-booting) instead of inside
        the first client's request. Much cheaper than warmup() — recycled
        generations hit the persistent compile cache.

        Returns a stage decomposition (VERDICT r4 task 5: the r4 soak's
        87 s service-built -> device-ready gap was a single opaque
        number): device enumeration (tunnel connect + lease acquisition
        — after a recycle exec this waits out the previous generation's
        lease release), the first trivial dispatch+readback, and the
        serving-program load+dispatch (persistent-compile-cache load on
        recycled generations, full compile on a cold cache)."""
        import time as _t

        import cv2
        stages = {}
        t0 = _t.time()
        import jax
        jax.devices()
        stages["probe_jax_devices_s"] = round(_t.time() - t0, 2)
        t0 = _t.time()
        import jax.numpy as jnp
        np.asarray(jax.jit(lambda x: x + 1.0)(jnp.zeros((2,),
                                                        jnp.float32)))
        stages["probe_first_dispatch_s"] = round(_t.time() - t0, 2)
        t0 = _t.time()
        gray = np.full((self.size, self.size, 3), 128, np.uint8)
        ok, png = cv2.imencode(".png", gray)
        self.colorize(png.tobytes(), None, fullres=False)
        stages["probe_program_load_s"] = round(_t.time() - t0, 2)
        return stages

    def warmup(self, suggest: bool = False) -> None:
        """Compile every serving program before admitting traffic (the
        first request per program otherwise pays 15-40 s of compile on a
        tunneled chip; a concurrent first burst pays it per batch
        bucket). Safe to call on a live server."""
        import cv2
        gray = np.full((self.size, self.size, 3), 128, np.uint8)
        ok, png = cv2.imencode(".png", gray)
        body = png.tobytes()
        self.colorize(body, None, fullres=True)
        self.colorize(body, None, fullres=False)
        if self.model_fast is not None:
            self.colorize(body, None, fullres=True, fast=True)
            self.colorize(body, None, fullres=False, fast=True)
        from ..engine.batch import colorize_batch_table
        from ..ops.hints import MAX_HINTS
        for b in (self.batcher, self.batcher_fast):
            if b is None:
                continue
            for cap in b.bucket_caps():
                imgs = np.full((cap, self.size, self.size, 3), 128,
                               np.uint8)
                with self.lock.bulk():
                    # one table program per bucket per tier (covers
                    # hinted and hint-less traffic alike)
                    colorize_batch_table(
                        b.model.params, imgs,
                        np.zeros((cap, MAX_HINTS, 4), np.int32),
                        np.zeros((cap, MAX_HINTS, 2), np.float32),
                        np.zeros((cap,), np.int32),
                        maskcent=float(b.model.mask_cent),
                        mesh=self.mesh)
        if suggest:
            self.suggest(body, h=self.size // 2, w=self.size // 2, k=9)
        # the session click path (batch-1 table program the GET / UI
        # uses by default)
        sid = self.session_open(body)["id"]
        click = [{"y": self.size // 2, "x": self.size // 2,
                  "ab": [20.0, -20.0], "radius": 2}]
        self.session_click(sid, click)
        from ..api.colorize import net_click_mode
        if net_click_mode() != "rgb":
            # under IDEEPCOLOR_NET_CLICK=abq[_half] the click above
            # compiled only the abq program; fullres session clicks are
            # forced onto the batch-1 rgb table program (see
            # session_click), so warm that too or the first
            # /session/click?fullres=1 pays its compile mid-request
            self.session_click(sid, click, fullres=True)
        if suggest:
            self.session_suggest(sid, [], h=self.size // 2,
                                 w=self.size // 2, k=9)
        self.session_close(sid)
        # /colorize_global: its first request otherwise builds + compiles
        # the glob graph while holding the model lock, stalling all
        # endpoints — exactly what warmup exists to prevent
        gbuf = io.BytesIO()
        np.savez(gbuf, image=np.frombuffer(body, np.uint8),
                 ref=np.frombuffer(body, np.uint8))
        self.colorize_global(gbuf.getvalue())

    def health(self) -> dict:
        import jax
        from ..utils.soakload import rss_mb
        return {"status": "draining" if self.draining else "ok",
                "device": str(jax.devices()[0]),
                "size": self.size, "requests": self.requests,
                "has_fast": self.model_fast is not None,
                "sessions": len(self._sessions),
                "pending_sessions": len(self._pending_sessions),
                "rss_mb": round(rss_mb(), 1),
                "recycle_gen": int(
                    os.environ.get("IDEEPCOLOR_RECYCLE_GEN", "0")),
                "inflight": self.inflight,
                "bulk_backlog": self.lock.bulk_backlog(),
                "shed_429": self.shed_429,
                "boot_stages": self.boot_stages,
                "mesh": None if self.mesh is None else
                dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}


class RecycleGuard(threading.Thread):
    """Drain-and-recycle worker-memory guard (VERDICT r2 task 2).

    The axon tunnel transport leaks host RSS proportional to bytes
    uploaded (CLAUDE.md: live JAX arrays stay flat while VmRSS grows
    ~2.2 MB per image-carrying request), so a long-lived serving process
    on that transport OOMs regardless of how careful the serving stack
    is. The fix at the process level: when VmRSS crosses ``cap_mb``,
    (1) stop admitting new POSTs (handlers answer 503 + Retry-After),
    (2) wait for in-flight requests to finish, (3) dump every live
    session (id + source image) via ColorizeService.dump_sessions,
    (4) re-exec the worker IN PLACE (same pid) with the listening socket
    kept open across exec — the kernel holds the TCP accept queue, so no
    connection attempt is refused — and (5) the fresh process replays the
    sessions under their original ids before serving.

    exec (not fork+exec) means there is never a second TPU process: the
    drained process has no dispatch in flight when its tunnel fd closes,
    which is the graceful-release case (the wedge hazard is killing
    mid-dispatch).
    """

    def __init__(self, service: "ColorizeService",
                 server: ThreadingHTTPServer, cap_mb: float,
                 exec_argv: list, poll_s: float | None = None,
                 dump_path: str | None = None,
                 min_requests: int | None = None):
        super().__init__(daemon=True, name="serve-recycle-guard")
        self.service = service
        self.server = server
        self.cap_mb = float(cap_mb)
        self.exec_argv = list(exec_argv)
        self.poll_s = float(poll_s if poll_s is not None else
                            os.environ.get("IDEEPCOLOR_RECYCLE_POLL_S", 2))
        # exec-loop protection: a cap misconfigured below the process's
        # BASELINE RSS would otherwise recycle forever without serving —
        # require at least this many requests served this generation
        self.min_requests = int(
            min_requests if min_requests is not None else
            os.environ.get("IDEEPCOLOR_RECYCLE_MIN_REQUESTS", 1))
        self.dump_path = dump_path or os.path.join(
            tempfile.gettempdir(),
            f"ideepcolor_sessions_{os.getpid()}.npz")
        self._stop = threading.Event()
        self.rss_peak_mb = 0.0

    def stop(self):
        self._stop.set()

    def run(self):
        from ..utils.soakload import rss_mb

        # glibc arena slack: ~20-25% of the tunnel client's per-upload
        # RSS growth is freed-but-retained memory that malloc_trim
        # returns to the OS (measured r5: 64 -> 49 MB after 80 image
        # uploads; the remaining ~48 MB is held by the axon provider,
        # which survives even clear_backends — an exec is the only
        # reclaim for that part). Trimming before each poll read delays
        # recycles for free and makes the cap trigger on TRUE retention.
        try:
            import ctypes
            _trim = ctypes.CDLL("libc.so.6").malloc_trim
        except Exception:           # non-glibc: skip, never fail the guard
            _trim = None
        while not self._stop.wait(self.poll_s):
            if _trim is not None:
                try:
                    _trim(0)
                except Exception:
                    _trim = None
            rss = rss_mb()
            self.rss_peak_mb = max(self.rss_peak_mb, rss)
            if rss >= self.cap_mb and \
                    self.service.requests >= self.min_requests:
                self.recycle(rss)
                return              # unreachable (exec), defensive

    def recycle(self, rss: float) -> None:
        import time as _t
        svc = self.service
        print(f"# recycle: RSS {rss:.0f} MB >= cap {self.cap_mb:.0f} MB; "
              f"draining", file=sys.stderr, flush=True)
        svc.draining = True
        with svc._inflight_cv:
            drained = svc._inflight_cv.wait_for(
                lambda: svc.inflight == 0, timeout=300)
        if not drained:              # pragma: no cover - stuck request
            print(f"# recycle: {svc.inflight} requests still in flight "
                  f"after 300s; recycling anyway", file=sys.stderr)
        n = svc.dump_sessions(self.dump_path)
        gen = int(os.environ.get("IDEEPCOLOR_RECYCLE_GEN", "0")) + 1
        fd = self.server.socket.fileno()
        os.set_inheritable(fd, True)
        os.environ["IDEEPCOLOR_LISTEN_FD"] = str(fd)
        os.environ["IDEEPCOLOR_REPLAY_SESSIONS"] = self.dump_path
        os.environ["IDEEPCOLOR_RECYCLE_GEN"] = str(gen)
        # boot-stage decomposition: lets the new generation report how
        # long the exec + interpreter restart itself took
        os.environ["IDEEPCOLOR_RECYCLE_T0"] = str(_t.time())
        print(f"# recycle: gen {gen}, {n} sessions dumped, exec in place",
              file=sys.stderr, flush=True)
        # release the backend before exec: clears the client + program
        # caches so nothing touches the device mid-exec. Measured r5:
        # this does NOT shorten the next generation's ~1.5-2 min
        # first-dispatch wait — the device handover is governed
        # server-side (the axon provider's claim timeout; fds are
        # already CLOEXEC so the exec closes the tunnel exactly like a
        # process exit; fastest observed handover 8 s, typical 100-370 s
        # regardless of release style). The boot stays SAFE rather than
        # fast: accept-early answers 503+Retry-After through the window
        # and ready_probe's stage decomposition attributes it
        # (probe_first_dispatch_s dominates; program load is ~2.5 s via
        # the persistent compile cache).
        try:
            import jax.extend.backend
            t0 = _t.time()
            jax.extend.backend.clear_backends()
            print(f"# recycle: backend released in "
                  f"{_t.time() - t0:.1f}s", file=sys.stderr, flush=True)
        except Exception as e:  # never let the release block the recycle
            print(f"# recycle: backend release failed "
                  f"({type(e).__name__}: {str(e)[:80]}); exec anyway",
                  file=sys.stderr, flush=True)
        sys.stdout.flush()
        os.execv(self.exec_argv[0], self.exec_argv)


MAX_BODY_BYTES = 512 << 20      # reject absurd uploads before allocating


class _Handler(BaseHTTPRequestHandler):
    service: ColorizeService = None  # injected by attach_service
    boot_t0: float = 0.0             # when the listener opened (booting)
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _booting(self) -> bool:
        """True while the listener accepts but the service is still
        building (jax init / prep_net / session replay after a recycle
        exec). Handlers answer fast 503 + Retry-After instead of letting
        clients wait out the whole boot in the kernel accept queue — the
        212 s recycle straddler of the r3 soak (VERDICT r3 task 3)."""
        return self.service is None

    def _reply_booting(self):
        import time as _t
        waited = _t.time() - type(self).boot_t0
        self.close_connection = True
        self._err(503, f"worker booting ({waited:.0f}s); retry shortly",
                  {"Retry-After": "2", "Connection": "close"})

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _err(self, code: int, msg: str, headers: dict | None = None):
        body = json.dumps({"error": msg}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = self.path.split("?")[0]
        if self._booting():
            if path == "/healthz":
                import time as _t
                from ..utils.soakload import rss_mb
                # rss_mb is known even mid-boot: a prober that lands in
                # a recycle's boot window still gets the RSS-vs-cap
                # answer instead of nothing (VERDICT r4 task 4)
                self._reply(200, json.dumps(
                    {"status": "booting",
                     "booting_s": round(_t.time() - type(self).boot_t0, 1),
                     "rss_mb": round(rss_mb(), 1),
                     "recycle_gen": int(os.environ.get(
                         "IDEEPCOLOR_RECYCLE_GEN", "0"))}).encode(),
                    "application/json")
            else:
                self._reply_booting()
            return
        if path in ("/", "/demo"):
            # embedded browser UI over the same HTTP API (the headless
            # deployment's equivalent of the reference's Qt app)
            from .webui import PAGE
            self._reply(200, PAGE.encode(), "text/html; charset=utf-8")
        elif path == "/healthz":
            h = self.service.health()
            # the handle_error counter lives on the server object; it
            # replaced the per-disconnect log line, so it must be
            # readable somewhere or the signal is simply gone
            h["quiet_disconnects"] = getattr(self.server,
                                             "quiet_disconnects", 0)
            self._reply(200, json.dumps(h).encode(), "application/json")
        elif path == "/stats":
            stats = {"requests": self.service.requests,
                     "latency": self.service.timer.summary(),
                     "lock_bulk_jumped": self.service.lock.bulk_jumped,
                     "bulk_backlog": self.service.lock.bulk_backlog(),
                     "shed_429": self.service.shed_429,
                     "quiet_disconnects": getattr(
                         self.server, "quiet_disconnects", 0)}
            for key, b in (("auto_batch", self.service.batcher),
                           ("auto_batch_fast",
                            self.service.batcher_fast)):
                if b is not None:
                    stats[key] = {
                        "dispatches": b.dispatches,
                        "requests": b.batched_requests,
                        "avg_batch": round(b.batched_requests
                                           / max(b.dispatches, 1), 2)}
            self._reply(200, json.dumps(stats).encode(),
                        "application/json")
        elif path == "/metrics":
            # Prometheus text exposition of the same counters/percentiles
            # as /healthz + /stats, so the server scrapes into standard
            # monitoring without an adapter
            self._reply(200, self._prometheus().encode(),
                        "text/plain; version=0.0.4; charset=utf-8")
        else:
            self._err(404, f"unknown path {self.path}")

    def _prometheus(self) -> str:
        svc = self.service
        h = svc.health()
        lines = [
            "# TYPE ideepcolor_requests_total counter",
            f"ideepcolor_requests_total {svc.requests}",
            "# TYPE ideepcolor_shed_429_total counter",
            f"ideepcolor_shed_429_total {svc.shed_429}",
            "# TYPE ideepcolor_sessions gauge",
            f"ideepcolor_sessions {h['sessions']}",
            "# TYPE ideepcolor_pending_sessions gauge",
            f"ideepcolor_pending_sessions {h['pending_sessions']}",
            "# TYPE ideepcolor_rss_mb gauge",
            f"ideepcolor_rss_mb {h['rss_mb']}",
            "# TYPE ideepcolor_recycle_generation gauge",
            f"ideepcolor_recycle_generation {h['recycle_gen']}",
            "# TYPE ideepcolor_inflight gauge",
            f"ideepcolor_inflight {h['inflight']}",
            "# TYPE ideepcolor_bulk_backlog gauge",
            f"ideepcolor_bulk_backlog {h['bulk_backlog']}",
            "# TYPE ideepcolor_draining gauge",
            f"ideepcolor_draining {1 if svc.draining else 0}",
            "# TYPE ideepcolor_stage_latency_ms summary",
        ]
        for stage, s in sorted(svc.timer.summary().items()):
            for q, key in (("0.5", "p50_ms"), ("0.95", "p95_ms")):
                lines.append(
                    f'ideepcolor_stage_latency_ms{{stage="{stage}",'
                    f'quantile="{q}"}} {s[key]:.3f}')
            lines.append(f'ideepcolor_stage_latency_ms_sum'
                         f'{{stage="{stage}"}} '
                         f'{s["mean_ms"] * s["n"]:.3f}')
            lines.append(f'ideepcolor_stage_latency_ms_count'
                         f'{{stage="{stage}"}} {s["n"]}')
        for key, b in (("default", svc.batcher),
                       ("fast", svc.batcher_fast)):
            if b is not None:
                lines.append(f'ideepcolor_autobatch_dispatches_total'
                             f'{{tier="{key}"}} {b.dispatches}')
                lines.append(f'ideepcolor_autobatch_requests_total'
                             f'{{tier="{key}"}} {b.batched_requests}')
        return "\n".join(lines) + "\n"

    def do_DELETE(self):
        if self._booting():
            self._reply_booting()
            return
        path, _, query = self.path.partition("?")
        if path == "/session":
            from urllib.parse import parse_qs
            q = parse_qs(query)
            sid = q.get("id", [""])[0]
            if self.service.session_close(sid):
                self._reply(200, b'{"closed": true}', "application/json")
            else:
                self._err(404, f"unknown session {sid!r}")
        else:
            self._err(404, f"unknown path {path}")

    def do_POST(self):
        if self._booting():
            # shed before reading the body (as in the draining path)
            self._reply_booting()
            return
        svc = self.service
        if svc.draining:
            # recycle in progress: shed before reading the body; close the
            # connection (an unread body would corrupt keep-alive framing)
            self.close_connection = True
            self._err(503, "recycling worker; retry shortly",
                      {"Retry-After": "3", "Connection": "close"})
            return
        with svc._inflight_cv:
            svc.inflight += 1
        try:
            self._do_post_inner()
        finally:
            with svc._inflight_cv:
                svc.inflight -= 1
                svc._inflight_cv.notify_all()

    def _do_post_inner(self):
        path, _, query = self.path.partition("?")
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                # the unread body would corrupt a keep-alive connection
                # (the next "request line" parses mid-upload) — close it
                self.close_connection = True
                self._err(413, f"body {n} bytes exceeds {MAX_BODY_BYTES}")
                return
            body = self.rfile.read(n)
            if path == "/colorize":
                hints = None
                if self.headers.get("X-Hints"):
                    hints = json.loads(self.headers["X-Hints"])
                fullres = "fullres=0" not in query
                png = self.service.colorize(body, hints, fullres=fullres,
                                            fast="model=fast" in query)
                self._reply(200, png, "image/png")
            elif path == "/colorize_batch":
                out = self.service.colorize_batch(body)
                self._reply(200, out, "application/x-npz")
            elif path == "/colorize_global":
                png = self.service.colorize_global(
                    body, fullres="fullres=0" not in query)
                self._reply(200, png, "image/png")
            elif path == "/session":
                out = self.service.session_open(
                    body, fast="model=fast" in query)
                self._reply(200, json.dumps(out).encode(),
                            "application/json")
            elif path == "/session/click":
                from urllib.parse import parse_qs
                q = parse_qs(query)
                hints = json.loads(body) if body else []
                sid = q["id"][0]     # missing param -> KeyError -> 400
                try:
                    png = self.service.session_click(
                        sid, hints, fullres="fullres=1" in query)
                except KeyError:
                    raise            # service-internal bug, not a 404
                except LookupError as e:
                    self._err(404, str(e))
                    return
                self._reply(200, png, "image/png")
            elif path == "/session/suggest":
                from urllib.parse import parse_qs
                q = parse_qs(query)
                hints = json.loads(body) if body else []
                sid, h, w = q["id"][0], int(q["h"][0]), int(q["w"][0])
                k = int(q.get("k", ["9"])[0])
                try:
                    out = self.service.session_suggest(sid, hints, h=h,
                                                       w=w, k=k)
                except KeyError:
                    raise
                except LookupError as e:
                    self._err(404, str(e))
                    return
                self._reply(200, json.dumps(out).encode(),
                            "application/json")
            elif path == "/suggest":
                from urllib.parse import parse_qs
                q = parse_qs(query)
                hints = None
                if self.headers.get("X-Hints"):
                    hints = json.loads(self.headers["X-Hints"])
                out = self.service.suggest(
                    body, h=int(q["h"][0]), w=int(q["w"][0]),
                    k=int(q.get("k", ["9"])[0]), hints=hints)
                self._reply(200, json.dumps(out).encode(),
                            "application/json")
            else:
                self._err(404, f"unknown path {path}")
        except ServerBusy as e:
            # bulk-class backpressure: bounded queue instead of unbounded
            # tail latency under saturation
            self.service._count_shed()
            self._err(429, str(e),
                      {"Retry-After": str(e.retry_after_s)})
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            self._err(400, str(e))
        except Exception as e:  # pragma: no cover - defensive 500
            self._err(500, str(e))


class _QuietDisconnectServer(ThreadingHTTPServer):
    """Client disconnects (reset/broken pipe mid-response) are routine
    under concurrent load; log ONE line instead of a traceback so ops
    output (and bench tails) stay parseable. Real handler bugs still get
    the full traceback.

    The listen backlog is raised from socketserver's default of 5: a
    16-way connect burst (the auto-batch pattern) or a post-recycle
    reconnect stampede overflows a 5-deep SYN queue and the kernel RSTs
    the excess — clients saw ConnectionResetError, retried, and the
    late arrivals coalesced into SMALLER batches (the r3 autobatch
    collapse, 34.8 -> 12.3 req/s at avg_batch 8.0 -> 5.3)."""

    request_queue_size = 128
    quiet_disconnects = 0       # per-instance after first increment
    _qd_lock = threading.Lock()  # handle_error runs on handler threads

    def handle_error(self, request, client_address):
        import sys
        et, ev = sys.exc_info()[:2]
        if et is not None and issubclass(
                et, (ConnectionResetError, BrokenPipeError, TimeoutError)):
            # routine under concurrent load; under pytest even the one
            # clean line is noise in the suite's output (VERDICT r4
            # weak #7) — count it silently instead. Locked: += on an
            # attribute is a racy read-modify-write across the
            # concurrent handler threads where disconnects happen.
            with self._qd_lock:
                self.quiet_disconnects += 1
            if not os.environ.get("PYTEST_CURRENT_TEST"):
                print(f"# serve: client {client_address} disconnected "
                      f"({et.__name__})", file=sys.stderr)
        else:
            super().handle_error(request, client_address)


def make_listening_server(port: int = 0, host: str = "127.0.0.1"
                          ) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral) and return a server whose handlers
    answer 503 + Retry-After until :func:`attach_service` installs the
    built ColorizeService. Starting serve_forever() on this BEFORE the
    heavy boot (jax init, prep_net, replay) is what bounds the recycle
    straddler: clients get fast retryable sheds instead of waiting out
    the whole boot in the kernel accept queue.

    If IDEEPCOLOR_LISTEN_FD is set (a RecycleGuard re-exec), the already-
    bound listening socket is adopted instead of binding anew — client
    connections queued in the kernel during the recycle are served, none
    refused."""
    import socket as _socket
    import time as _t
    handler = type("BoundHandler", (_Handler,),
                   {"service": None, "boot_t0": _t.time()})
    listen_fd = os.environ.pop("IDEEPCOLOR_LISTEN_FD", None)
    if listen_fd is None:
        return _QuietDisconnectServer((host, port), handler)
    srv = _QuietDisconnectServer((host, port), handler,
                                 bind_and_activate=False)
    srv.socket.close()
    srv.socket = _socket.socket(fileno=int(listen_fd))
    srv.server_address = srv.socket.getsockname()
    srv.server_name, srv.server_port = srv.server_address[:2]
    return srv


def attach_service(srv: ThreadingHTTPServer,
                   service: ColorizeService) -> None:
    """Install the service on a listening server — from this point
    handlers serve instead of answering 503-booting."""
    srv.RequestHandlerClass.service = service


def make_server(port: int = 0, host: str = "127.0.0.1",
                **service_kw) -> ThreadingHTTPServer:
    """Build a ready-to-serve ThreadingHTTPServer (port 0 = ephemeral;
    address in ``server.server_address``). Caller runs serve_forever()."""
    srv = make_listening_server(port, host)
    attach_service(srv, ColorizeService(**service_kw))
    return srv


class _SafeStream:
    """stdout/stderr wrapper that swallows write failures: a (possibly
    recycled) worker whose supervisor died — its stdout pipe closed —
    must keep serving, not die of BrokenPipeError on its next print."""

    def __init__(self, stream):
        self._s = stream

    def write(self, data):
        try:
            return self._s.write(data)
        except OSError:
            return len(data)

    def flush(self):
        try:
            self._s.flush()
        except OSError:
            pass

    def __getattr__(self, name):
        return getattr(self._s, name)


def main(argv=None):
    sys.stdout = _SafeStream(sys.stdout)
    sys.stderr = _SafeStream(sys.stderr)
    p = argparse.ArgumentParser(description="ideepcolor-tpu HTTP serving")
    p.add_argument("--port", type=int, default=8723)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--weights", type=str, default="",
                   help="checkpoint (.pth/.npz/orbax dir); seeded random "
                        "weights when empty")
    p.add_argument("--load_size", type=int, default=256)
    p.add_argument("--pytorch_maskcent", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard /colorize_batch over all local devices")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   help="serving precision (default bfloat16, the fast "
                        "MXU mode, ~56 dB PSNR vs f32 frames — bench "
                        "records the delta; pass float32 for bit-parity "
                        "serving)")
    p.add_argument("--auto-batch", type=int, default=0,
                   help="max dynamic batch for net-res /colorize "
                        "(0 = off); concurrent requests coalesce into "
                        "one device dispatch")
    p.add_argument("--student-weights", type=str, default="",
                   help="distilled student checkpoint served at "
                        "?model=fast (width implicit in the checkpoint)")
    p.add_argument("--glob-weights", type=str, default="",
                   help="checkpoint for the global-hints graph "
                        "(/colorize_global; a separate param family from "
                        "--weights)")
    p.add_argument("--warmup", action="store_true",
                   help="compile all serving programs (incl. every "
                        "auto-batch bucket and /suggest) before "
                        "accepting traffic")
    p.add_argument("--max-bulk-backlog", type=int, default=32,
                   help="bulk-class admission cap: when this many bulk "
                        "requests (full-res, batch, global) already "
                        "queue, further ones get 429 + Retry-After "
                        "(0 = unbounded)")
    p.add_argument("--rss-cap-mb", type=float, default=0,
                   help="drain-and-recycle the worker (re-exec in place, "
                        "sessions preserved, listener kept open) when "
                        "VmRSS crosses this; mitigates the tunnel "
                        "transport's upload-RSS leak (0 = off)")
    p.add_argument("--rss-growth-cap-mb", type=float, default=0,
                   help="like --rss-cap-mb but relative: recycle when "
                        "VmRSS grows this much beyond its post-warmup "
                        "baseline (robust to backend/model footprint)")
    args = p.parse_args(argv)
    import time as _t
    boot_t0 = _t.time()
    boot_stages: dict = {}
    # set by the RecycleGuard just before execv: decomposes the exec +
    # interpreter restart cost out of the total boot (VERDICT r3 task 3)
    exec_t0 = os.environ.pop("IDEEPCOLOR_RECYCLE_T0", None)
    if exec_t0:
        boot_stages["exec_to_main_s"] = round(boot_t0 - float(exec_t0), 2)
    # test/ops hook: the axon plugin ignores the JAX_PLATFORMS env var, so
    # offer explicit backend selection (survives the recycle exec)
    plat = os.environ.get("IDEEPCOLOR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from ..config import bundled_weights, enable_persistent_compile_cache
    enable_persistent_compile_cache()
    # out-of-box behavior: fall back to the committed on-chip-trained
    # demo checkpoints (weights/README.md) so an unconfigured server
    # colorizes instead of running random init
    if not args.weights and bundled_weights("teacher"):
        args.weights = bundled_weights("teacher")
        print(f"using bundled demo weights: {args.weights}")
    if not args.student_weights and bundled_weights("student_w05"):
        args.student_weights = bundled_weights("student_w05")
        print(f"fast tier (bundled student): {args.student_weights}")
    # accept IMMEDIATELY (503-booting until the service attaches below):
    # a recycle's queued clients get fast retryable sheds instead of
    # waiting out jax init + prep_net in the kernel accept queue
    srv = make_listening_server(port=args.port, host=args.host)
    threading.Thread(target=srv.serve_forever, daemon=True,
                     name="serve-accept").start()
    print(f"# accepting (booting) on port {srv.server_address[1]}",
          flush=True)
    boot_stages["accept_open_s"] = round(_t.time() - boot_t0, 2)
    service = ColorizeService(
        weights=args.weights, size=args.load_size,
        maskcent=args.pytorch_maskcent, use_mesh=args.mesh,
        dtype=args.dtype, auto_batch=args.auto_batch,
        glob_weights=args.glob_weights,
        student_weights=args.student_weights,
        max_bulk_backlog=args.max_bulk_backlog)
    boot_stages["service_built_s"] = round(_t.time() - boot_t0, 2)
    gen0 = os.environ.get("IDEEPCOLOR_RECYCLE_GEN", "0") == "0"
    if args.warmup and gen0:
        # recycled generations skip the full warmup: with the persistent
        # compile cache, on-demand program loads cost seconds, while a
        # full re-warm would turn every recycle into ~a minute of
        # downtime; gen 0 still pre-compiles everything (populating the
        # cache the later generations hit)
        print("warming serving programs ...", flush=True)
        service.warmup(suggest=True)
        print("warmup done")
    else:
        # no full warmup (recycled gen, or gen 0 without --warmup): run
        # ONE tiny net-res forward so jax device init + the first
        # dispatch + the cached click-program load all complete BEFORE
        # clients are admitted — the first real request must not pay them
        boot_stages.update(service.ready_probe())
    boot_stages["device_ready_s"] = round(_t.time() - boot_t0, 2)
    replay = os.environ.pop("IDEEPCOLOR_REPLAY_SESSIONS", None)
    if replay and os.path.exists(replay):
        # lazy: park images host-side and restore each session on first
        # touch, so the first queued client waits for exec + device init
        # + ONE session instead of the whole replay (the 418 s recycle
        # straddler measured in the r3 bench soak)
        n = service.replay_sessions(replay, lazy=True)
        os.unlink(replay)
        gen = os.environ.get("IDEEPCOLOR_RECYCLE_GEN", "?")
        print(f"# recycle gen {gen}: replayed {n} sessions", flush=True)
    cap = args.rss_cap_mb
    if args.rss_growth_cap_mb > 0:
        prior = os.environ.get("IDEEPCOLOR_RSS_CAP_ABS")
        if prior is not None:
            grown = float(prior)
        else:
            from ..utils.soakload import rss_mb
            grown = rss_mb() + args.rss_growth_cap_mb  # post-warmup base
            # persist the resolved ABSOLUTE watermark across the recycle
            # exec: a recycled generation re-arming growth from its own
            # (lower, un-warmed) baseline would recycle in a cascade
            os.environ["IDEEPCOLOR_RSS_CAP_ABS"] = str(grown)
        cap = min(cap, grown) if cap > 0 else grown
    if cap > 0:
        # the guard re-execs THIS command line; module form keeps the
        # package's relative imports working after exec
        RecycleGuard(service, srv, cap,
                     [sys.executable, "-m", "ideepcolor_tpu.apps.serve"]
                     + list(argv if argv is not None else sys.argv[1:])
                     ).start()
        print(f"# recycle guard armed: cap {cap:.0f} MB "
              f"(gen {os.environ.get('IDEEPCOLOR_RECYCLE_GEN', '0')})",
              flush=True)
    boot_stages["ready_s"] = round(_t.time() - boot_t0, 2)
    service.boot_stages = boot_stages
    attach_service(srv, service)        # from here handlers serve
    print(f"# boot stages: {json.dumps(boot_stages)}", flush=True)
    print(f"serving on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]}  (POST /colorize, /colorize_batch; "
          f"GET /healthz)", flush=True)
    try:
        # the accept loop runs in the daemon thread; park here for signals
        while True:
            _t.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        srv.server_close()
        # close the backend client before interpreter teardown — cheap
        # hygiene (ordered destruction instead of whatever teardown
        # order the runtime picks). Measured r5 (CLAUDE.md): this does
        # NOT shorten the next process's device-claim handover; nothing
        # client-side does.
        try:
            import jax.extend.backend
            jax.extend.backend.clear_backends()
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
