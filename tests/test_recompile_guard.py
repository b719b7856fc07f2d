"""Recompilation guards for the interactive hot paths.

A recompile mid-session costs 15-25 s on a tunneled TPU (CLAUDE.md), so
the click/table/getter programs are bucketed and shape-static by design:
loading a NEW image of a different resolution (same bucket) or clicking
with different hint counts must reuse compiled programs. These tests pin
that invariant by capturing jax's compile logs.
"""
import logging

import numpy as np
import pytest

import jax

from ideepcolor_tpu import api
from ideepcolor_tpu.ops import hints as oh


class _CompileLog(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())

    # single-primitive utility jits (array staging like [None]/astype on a
    # new shape) compile in sub-ms and are not session programs
    _TRIVIAL = ("broadcast_in_dim", "convert_element_type", "copy",
                "transpose", "reshape", "squeeze", "concatenate", "slice",
                "multiply", "true_divide", "_uint8")

    def compiles(self):
        out = []
        for m in self.messages:
            if not m.startswith("Compiling jit("):
                continue
            name = m[len("Compiling jit("):].split(")")[0]
            if name not in self._TRIVIAL:
                out.append(m)
        return out


@pytest.fixture
def compile_log():
    handler = _CompileLog()
    logger = logging.getLogger("jax")
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(handler)
    try:
        yield handler
    finally:
        logger.removeHandler(handler)
        jax.config.update("jax_log_compiles", old)


def _rand_image(seed, h, w):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_no_recompile_across_images_and_clicks(compile_log):
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [20, 20, 24, 24]; vals[0] = [35.0, -25.0]

    # warm EVERYTHING on image A (200x220: pads to the 256x256 bucket)
    m.load_image_array(_rand_image(1, 200, 220))
    m.net_forward_table(boxes, vals, 1)
    m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    m.net_forward_fullres(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    m.get_img_fullres()
    m.get_img_gray_fullres()
    m.get_img_mask_fullres()
    m.get_sup_fullres()

    compile_log.messages.clear()
    # image B: different content AND different resolution within the same
    # 256-bucket; more hints; every getter again
    m.load_image_array(_rand_image(2, 240, 250))
    boxes[1] = [40, 10, 42, 12]; vals[1] = [-15.0, 55.0]
    m.net_forward_table(boxes, vals, 2)
    m.net_forward_table(boxes, vals, 1)
    m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    m.net_forward_fullres(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    m.get_img_fullres()
    m.get_img_gray_fullres()
    m.get_img_mask_fullres()
    m.get_sup_fullres()
    assert compile_log.compiles() == []


def test_streaming_no_recompile_on_hint_swap(compile_log):
    from ideepcolor_tpu.engine.streaming import StreamingSession
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    sess = StreamingSession(params, size=32, depth=1, with_dist=False)
    rng = np.random.default_rng(3)
    frame = rng.uniform(0, 100, (32, 32)).astype(np.float32)
    sess.submit(frame)
    list(sess.drain())

    compile_log.messages.clear()
    hint_ab = np.zeros((32, 32, 2), np.float32)
    hint_mask = np.zeros((32, 32, 1), np.float32)
    hint_ab[3:5, 3:5] = [20, -40]; hint_mask[3:5, 3:5] = 1
    sess.set_hints(hint_ab, hint_mask)     # swap hints between frames
    sess.submit(frame)
    sess.submit(rng.uniform(0, 100, (32, 32)).astype(np.float32))
    list(sess.drain())
    assert compile_log.compiles() == []


def test_colorize_batch_no_retrace_across_requests(compile_log):
    """Repeated serving calls (the HTTP batch endpoint) must reuse the
    module-level jitted programs — per-call wrappers would recompile the
    full U-Net on every request."""
    from ideepcolor_tpu.engine.batch import colorize_batch
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    rng = np.random.default_rng(5)
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    colorize_batch(params, imgs)                      # warm
    compile_log.messages.clear()
    colorize_batch(params, imgs)
    colorize_batch(params, (rng.random((2, 32, 32, 3)) * 255)
                   .astype(np.uint8))
    assert compile_log.compiles() == []
    # tracing (cheaper than compiling but still per-call work) must not
    # recur either for the main forward
    assert not any("tracing" in m and "batch_forward_frames" in m
                   for m in compile_log.messages)


def test_interactive_submits_do_not_recompile(compile_log):
    """Drag pipelining relies on submit being dispatch-only: varying hint
    counts, positions and images (same bucket) must never retrace the
    table-click program."""
    from ideepcolor_tpu.engine.interactive import InteractiveSession

    m = api.ColorizeImageJax(Xd=64)
    m.prep_net(None)
    m.load_image_array(_rand_image(0, 120, 150))
    sess = InteractiveSession(m, depth=3)
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 10, 14, 14]; vals[0] = [30, -40]
    sess.submit(boxes, vals, 1)
    sess.latest()                                   # warm everything
    compile_log.messages.clear()
    for i in range(6):                              # moving hint, growing
        boxes[i % 3] = [10 + i, 12, 15 + i, 17]     # and changing count
        vals[i % 3] = [10.0 * i - 30, 5.0 * i]
        sess.submit(boxes, vals, (i % 3) + 1)
    sess.latest()
    m.load_image_array(_rand_image(1, 130, 140))    # same bucket
    sess.submit(boxes, vals, 2)
    sess.latest()
    assert compile_log.compiles() == []


@pytest.mark.slow
def test_auto_batch_buckets_bound_compiles(compile_log):
    """Bursts of every size 1..6 through the serve auto-batcher compile
    at most the power-of-two bucket programs {1,2,4,8}, not one program
    per burst size."""
    import threading
    from ideepcolor_tpu.apps import serve

    srv = serve.make_server(port=0, size=64, auto_batch=8)
    svc = srv.RequestHandlerClass.service
    svc.batcher.wait_s = 0.25
    try:
        from ideepcolor_tpu.ops.hints import MAX_HINTS

        def burst(n, seed):
            outs = []
            zb = np.zeros((MAX_HINTS, 4), np.int32)
            zv = np.zeros((MAX_HINTS, 2), np.float32)
            def one(i):
                outs.append(svc.batcher.submit(
                    _rand_image(seed + i, 64, 64), zb, zv, 0))
            th = [threading.Thread(target=one, args=(i,))
                  for i in range(n)]
            for t in th:
                t.start()
            for t in th:
                t.join(timeout=300)
            assert len(outs) == n
        burst(1, 0)                      # warm bucket 1
        before = len(compile_log.compiles())
        for n in (2, 3, 4, 5, 6, 1, 3):
            burst(n, n * 10)
        new = len(compile_log.compiles()) - before
        # buckets {2, 4, 8} at most (1 already warm; 3->4, 5/6->8), each
        # bucket = 2 programs (_prep_l_mc + batch_forward_frames); burst
        # sizes 3/5/6 must NOT compile their own programs
        assert new <= 6, compile_log.compiles()[-new:]
    finally:
        srv.server_close()
