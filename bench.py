"""Benchmark: the five BASELINE.json configs on the real TPU chip.

Headline metric (the JSON line's value): p50 click-to-frame latency at
256x256 on the local-hints path — the reference's interactive UX number —
measured through the same public API a GUI click uses, frame readback
included, at the PRODUCT-DEFAULT precision (bfloat16, the GUI --dtype
and apps/serve default since round 2; its 1-2 uint8 LSB frame delta vs
f32 is recorded in bf16_* each run, and the f32 bit-parity path — round
1's headline — stays recorded as f32_table_click_p50/p95_ms).
vs_baseline compares against the reference's own execution path
(SIGGRAPH torch model, CPU) measured on this host.

Extra fields cover the remaining configs: zero-hint auto colorization with
full-res reconstruction, global-histogram conditioning, batched 2048px
full-res fusion throughput, and the pipelined streaming session.

The run is WALL-CLOCK BUDGETED (default 11 min, IDEEPCOLOR_BENCH_BUDGET_S;
soaks scaled down accordingly — set IDEEPCOLOR_BENCH_FULL=1 for attended
full-duration runs) and always finishes inside the budget: configs that no
longer fit are skipped with {name}_skipped fields, and a hard deadline
watchdog emits partial results and exits 0 even if a dispatch hangs.

Prints the full dict on an early "FULL:" line + a compact headline JSON
as the very LAST line (the driver parses that one).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/ideepcolor_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

REFERENCE_DIR = "/root/reference"
FALLBACK_BASELINE_MS = 1312.8   # measured on this host (bench run r1)


# --- wall-clock budget (VERDICT r3 task 1) -------------------------------
#
# Rounds 2 AND 3 both lost their official perf record: r2's line was too
# long, r3's RUN was too long (the driver kills bench at ~16 min; the full
# run had grown to ~35-40 min behind a 600 s soak). The contract now:
# bench.py ALWAYS finishes inside IDEEPCOLOR_BENCH_BUDGET_S (default 660 s
# = 11 min, comfortably under the driver's kill) by (a) scaling the soak
# durations down by default (full durations behind IDEEPCOLOR_BENCH_FULL=1
# for attended runs), (b) skipping not-yet-run configs whose estimated
# cost no longer fits (recording {config}_skipped), and (c) a hard
# deadline watchdog that — even if a config hangs on a wedged tunnel —
# emits BENCH_FULL.json plus the compact headline line and exits 0.

def _full_mode() -> bool:
    return os.environ.get("IDEEPCOLOR_BENCH_FULL") == "1"


def _budget_secs() -> float:
    # 810 s = 13.5 min: the driver kills at ~16 min, the watchdog emits
    # by deadline - EMIT_RESERVE_S, and the headroom over r4's 12 min
    # lets the 14-family coverage pass absorb a slow device-claim
    # handover without losing tail configs
    dflt = "86400" if _full_mode() else "810"
    return float(os.environ.get("IDEEPCOLOR_BENCH_BUDGET_S", dflt))


# absolute time.time() deadline, set by main(); soak configs clamp their
# durations against it so a long soak can never starve the headline
DEADLINE: float = float("inf")

# seconds reserved at the tail of the budget for writing/printing results
# (and, on the watchdog path, for the emit itself)
EMIT_RESERVE_S = 45.0


def _remaining() -> float:
    return DEADLINE - EMIT_RESERVE_S - time.time()


# --- two-tier coverage (VERDICT r4 task 1) --------------------------------
#
# r4's watchdog saved the record but 9 of 14 config families never got a
# turn: the full-rep headline + soaks ate the budget front-to-back. The
# contract now: a COVERAGE pass first — every family at trimmed reps (the
# compiled programs and measured medians are identical; only the sample
# counts shrink) — then a DEEPEN pass re-runs the headline click loops at
# full reps with whatever budget remains (the programs are already
# compiled in-process, so deepening is pure dispatch time).
QUICK = False


def _q(full: int, quick: int) -> int:
    """Rep count for the current tier."""
    return quick if QUICK else full


def _sync(x):
    """Force completion incl. readback of a small dependent slice (the axon
    tunnel's block_until_ready does not reliably synchronize)."""
    return np.asarray(x if getattr(x, "ndim", 0) == 0 else x.ravel()[:8])


def _unwedge_guard(stall_s: float = 120.0):
    """Arm the wedged-first-dispatch watchdog (the canonical
    implementation + rationale live in ideepcolor_tpu/utils/unwedge.py;
    the training/eval CLIs arm the same guard)."""
    from ideepcolor_tpu.utils.unwedge import guard
    return guard(stall_s=stall_s)


def measure_baseline_torch_cpu() -> float:
    model_py = os.path.join(REFERENCE_DIR, "models/pytorch/model.py")
    if not os.path.exists(model_py):
        return FALLBACK_BASELINE_MS
    try:
        import importlib.util
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        spec = importlib.util.spec_from_file_location("ref_model", model_py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        net = mod.SIGGRAPHGenerator(dist=False)
        net.eval()
        A = np.zeros((1, 256, 256), np.float32)
        B = np.zeros((2, 256, 256), np.float32)
        M = np.zeros((1, 256, 256), np.float32)
        with torch.no_grad():
            net.forward(A, B, M, 0)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                net.forward(A, B, M, 0)
                ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1000.0)
    except Exception as e:  # pragma: no cover
        print(f"# baseline measurement failed ({e}); using fallback",
              file=sys.stderr)
        return FALLBACK_BASELINE_MS


def bench_click_latency(extras, cm=None):
    """Config 2: scripted local-hints session, per-click latency.

    Pass a prebuilt ``cm`` to re-measure at full reps without paying the
    per-instance program builds again (the deepen pass)."""
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ops.hints import put_point

    if cm is None:
        cm = api.ColorizeImageJax(Xd=256)
        cm.prep_net(path='')
        img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")
        if os.path.exists(img):
            cm.load_image(img)
        else:
            rng = np.random.default_rng(0)
            cm.set_image((rng.random((256, 256, 3)) * 255)
                         .astype(np.uint8))

    input_ab = np.zeros((2, 256, 256))
    mask = np.zeros((1, 256, 256))

    # config 1: zero-hint auto colorization + full-res reconstruction
    # (single fused dispatch: forward + upsample + L-fusion + both frames)
    t0 = time.perf_counter()
    cm.net_forward_fullres(input_ab, mask)
    # setdefault: the deepen pass re-runs this fn with the program warm —
    # only the first (cold) timing is the compile number
    extras.setdefault("compile_first_forward_s",
                      round(time.perf_counter() - t0, 1))
    ts = []
    for _ in range(_q(10, 5)):
        t0 = time.perf_counter()
        cm.net_forward_fullres(input_ab, mask)
        ts.append(time.perf_counter() - t0)
    extras["auto_plus_fullres_ms"] = round(float(np.median(ts)) * 1000, 2)

    # config 2: 5-click scripted session (hint rebuild + forward per click)
    put_point(input_ab, mask, [135, 160], 3, [23, -69])
    put_point(input_ab, mask, [100, 160], 3, [0, 0])
    for _ in range(3):
        cm.net_forward(input_ab, mask)
    lat = []
    for i in range(_q(40, 12)):
        put_point(input_ab, mask, [40 + (i % 8) * 20, 60], 2,
                  [((i * 7) % 100) - 50, ((i * 13) % 100) - 50])
        t0 = time.perf_counter()
        cm.net_forward(input_ab, mask)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(lat) * 1000.0
    extras["p95_ms"] = round(float(lat[min(int(len(lat) * 0.95),
                                           len(lat) - 1)]), 2)
    extras["dense_path_p50_ms"] = round(float(lat[len(lat) // 2]), 2)

    # the GUI's actual click path: fixed-slot hint table, device
    # rasterize. f32 is the bit-parity serving mode (kept as a named
    # secondary — it was the round-1 headline)
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    boxes[0] = [133, 158, 138, 163]; vals[0] = [23, -69]
    boxes[1] = [98, 158, 102, 162]; vals[1] = [0, 0]
    cm.net_forward_table(boxes, vals, 2)

    def click_loop(n=None):
        n = _q(40, 15) if n is None else n
        lat_ = []
        for i in range(n):
            k = 2 + (i % (MAX_HINTS - 2))
            boxes[k] = [40 + (i % 8) * 20, 60, 44 + (i % 8) * 20, 64]
            vals[k] = [((i * 7) % 100) - 50, ((i * 13) % 100) - 50]
            t0 = time.perf_counter()
            cm.net_forward_table(boxes, vals, k + 1)
            lat_.append(time.perf_counter() - t0)
        return np.sort(lat_) * 1000.0

    tlat = click_loop()
    extras["f32_table_click_p50_ms"] = round(float(tlat[len(tlat) // 2]), 2)
    extras["f32_table_click_p95_ms"] = round(
        float(tlat[min(int(len(tlat) * .95), len(tlat) - 1)]), 2)

    # HEADLINE: the same click loop in bfloat16 — the PRODUCT DEFAULT
    # precision of both the GUI (--dtype bfloat16) and apps/serve since
    # round 2 — with the frame-quality delta vs f32 recorded alongside
    # (the evidence behind defaulting to the fast MXU mode)
    import jax.numpy as jnp
    f32_params = cm.params
    f32_frame = np.asarray(cm.net_forward_table(boxes, vals, 8))
    cm.params = {k: v.astype(jnp.bfloat16) for k, v in f32_params.items()}
    bf16_frame = np.asarray(cm.net_forward_table(boxes, vals, 8))
    d = np.abs(bf16_frame.astype(int) - f32_frame.astype(int))
    extras["bf16_max_lsb"] = int(d.max())
    extras["bf16_frac_pixels_changed"] = round(float((d > 0).mean()), 4)
    mse = float(np.mean(d.astype(np.float64) ** 2))
    extras["bf16_vs_f32_psnr_db"] = round(
        20 * np.log10(255.0 / np.sqrt(max(mse, 1e-9))), 1)
    cm.net_forward_table(boxes, vals, 2)     # warm the bf16 program
    blat = click_loop()
    extras["headline_dtype"] = "bfloat16"
    extras["headline_reps"] = int(len(blat))
    extras["p95_ms"] = round(float(blat[min(int(len(blat) * .95),
                                            len(blat) - 1)]), 2)

    # the OPT-IN abq transport modes (api.colorize.net_click_mode:
    # u8-quantized-ab readback + native host compose; measured a wash on
    # this 1-core rig — kept measured per run so the trade is visible
    # per deployment), plus the frame delta they carry
    rgb_frame8 = np.asarray(cm.net_forward_table(boxes, vals, 8))
    abq_frame8 = cm.net_forward_table_abq(boxes, vals, 8)   # warm+compile
    d8 = np.abs(abq_frame8.astype(int) - rgb_frame8.astype(int))
    extras["abq_max_lsb"] = int(d8.max())
    mse8 = float(np.mean(d8.astype(np.float64) ** 2))
    extras["abq_vs_rgb_psnr_db"] = round(
        20 * np.log10(255.0 / np.sqrt(max(mse8, 1e-9))), 1)

    def abq_loop(n, half=False):
        lat_ = []
        for i in range(n):
            k = 2 + (i % (MAX_HINTS - 2))
            boxes[k] = [40 + (i % 8) * 20, 60, 44 + (i % 8) * 20, 64]
            vals[k] = [((i * 7) % 100) - 50, ((i * 13) % 100) - 50]
            t0 = time.perf_counter()
            cm.net_forward_table_abq(boxes, vals, k + 1, half=half)
            lat_.append(time.perf_counter() - t0)
        return np.sort(lat_) * 1000.0

    alat = abq_loop(_q(20, 8))
    extras["abq_click_p50_ms"] = round(float(alat[len(alat) // 2]), 2)
    cm.net_forward_table_abq(boxes, vals, 8, half=True)     # compile
    hlat = abq_loop(_q(20, 8), half=True)
    extras["abq_half_click_p50_ms"] = round(
        float(hlat[len(hlat) // 2]), 2)
    # the GUI-default WINDOW click on the HEADLINE backend + precision
    # (SIGGRAPH, bf16): net-res table click + host window compose — the
    # apples-to-apples "what a GUI user feels" number next to the
    # headline p50 (VERDICT r3 task 5; the caffe-backend win_click_host
    # row in bench_dist_fused_click times a heavier device net)
    from ideepcolor_tpu.api.colorize import compose_window_host
    from ideepcolor_tpu.ops.resize import cubic_resize_matrix_np
    win, bucket = 512, 128
    wb = -(-win // bucket) * bucket
    rh_np = cubic_resize_matrix_np(256, win, wb)
    rw_np = rh_np.copy()
    l_win_np = np.zeros((wb, wb, 1), np.float32)
    cm.net_forward_table_win_host(boxes, vals, 8, l_win_np, rh_np, rw_np)
    wlat = []
    for i in range(_q(20, 8)):
        boxes[9] = [100 + i, 100, 106 + i, 106]
        vals[9] = [10, 20]
        t0 = time.perf_counter()
        cm.net_forward_table_win_host(boxes, vals, 10, l_win_np, rh_np,
                                      rw_np)
        wlat.append(time.perf_counter() - t0)
    extras["win_click_host_siggraph_p50_ms"] = round(
        float(np.sort(wlat)[len(wlat) // 2]) * 1000.0, 2)
    cm.params = f32_params

    # transport floor control for tail attribution: dispatch + 8-byte
    # readback of a trivial program over the same link — if its p95/p50
    # spread matches the click loop's, the tail is RPC jitter, not the
    # framework's
    import jax
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((2,), jnp.float32)
    _sync(tiny(z))
    flat = []
    for _ in range(_q(40, 20)):
        t0 = time.perf_counter()
        _sync(tiny(z))
        flat.append(time.perf_counter() - t0)
    flat = np.sort(flat) * 1000.0
    extras["rpc_floor_p50_ms"] = round(float(flat[len(flat) // 2]), 2)
    extras["rpc_floor_p95_ms"] = round(
        float(flat[min(int(len(flat) * .95), len(flat) - 1)]), 2)
    return float(blat[len(blat) // 2]), cm


def bench_throughput(cm, extras):
    """Pipelined single-image throughput (device-bound)."""
    import jax.numpy as jnp
    from ideepcolor_tpu.models import siggraph
    A = cm._dev_l_mc[None]
    B = jnp.asarray(cm.input_ab_mc.transpose(1, 2, 0))[None]
    M = jnp.asarray(cm.input_mask_mult.transpose(1, 2, 0))[None]
    run = lambda: siggraph.apply(cm.params, A, B, M, 0.0,  # noqa: E731
                                 precision_name="default")
    _sync(run())
    N = _q(100, 40)
    t0 = time.perf_counter()
    for _ in range(N - 1):
        run()
    _sync(run())
    extras["pipelined_imgs_per_sec"] = round(
        N / (time.perf_counter() - t0), 1)


def bench_drag_pipeline(cm, extras):
    """Pipelined drag editing (engine/interactive): motion-event absorption
    rate — submits per event, one newest-frame fetch at the end (the GUI's
    drag path); stale in-flight frames drop unread."""
    from ideepcolor_tpu.engine.interactive import InteractiveSession
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    sess = InteractiveSession(cm)
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    boxes[0] = [60, 60, 64, 64]
    vals[0] = [40, -30]
    sess.submit(boxes, vals, 1)
    sess.latest()                                    # warm (compiled above)
    # 3 reps, median + spread: this metric is transport-bound and swung
    # -37% r01->r02 purely from tunnel variance/host contention (VERDICT
    # r2 weak #3) — the spread makes run-to-run noise visible in-run
    N = _q(30, 20)
    rates = []
    for _ in range(_q(3, 2)):
        t0 = time.perf_counter()
        for i in range(N):
            boxes[0] = [60, 60 + i, 64, 64 + i]
            sess.submit(boxes, vals, 1)
        sess.latest()                                # newest frame only
        rates.append(N / (time.perf_counter() - t0))
    extras["drag_pipeline_events_per_sec"] = round(
        float(np.median(rates)), 1)
    extras["drag_pipeline_spread"] = [round(min(rates), 1),
                                      round(max(rates), 1)]


def bench_batched_serving(extras):
    """Batched hint-conditioned serving throughput (batch 16, bfloat16)."""
    import jax
    import jax.numpy as jnp
    from ideepcolor_tpu.engine.batch import batch_forward_frames
    from ideepcolor_tpu.models import siggraph
    params = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                          siggraph.init_params(jax.random.key(0)))
    rng = np.random.default_rng(4)
    N = 16
    l = jnp.asarray(rng.uniform(-50, 50, (N, 256, 256, 1))
                    .astype(np.float32))
    hab = jnp.zeros((N, 256, 256, 2))
    hm = jnp.zeros((N, 256, 256, 1))
    run = lambda: batch_forward_frames(params, l, hab, hm,  # noqa: E731
                                       jnp.float32(0.0))
    _sync(run()[0])
    reps = _q(30, 10)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        run()
    _sync(run()[0])
    dt = (time.perf_counter() - t0) / reps
    extras["batch16_bf16_imgs_per_sec"] = round(N / dt, 1)


def bench_student(extras):
    """The width ladder at batch 128 bf16: teacher (width 1.0) plus the
    distilled width-0.5/0.25 students (~width^2 FLOPs, train/distill.py)
    — the fewer-FLOPs path past the teacher's 75-80% MXU ceiling. Batch
    must be large here: at batch 16 the tunnel's dispatch rate
    (~66 steps/s) masks device speed (measured ~1050 imgs/s for every
    width, teacher included)."""
    import jax
    import jax.numpy as jnp
    from ideepcolor_tpu.engine.batch import batch_forward_frames
    from ideepcolor_tpu.models import siggraph
    rng = np.random.default_rng(6)
    N = 128
    l = jnp.asarray(rng.uniform(-50, 50, (N, 256, 256, 1))
                    .astype(np.float32))
    hab = jnp.zeros((N, 256, 256, 2))
    hm = jnp.zeros((N, 256, 256, 1))
    # width 1.0 = the teacher at the same batch: its batch-16 number
    # (~1050 imgs/s = ~65 steps/s) sits AT the tunnel's ~66 steps/s
    # dispatch ceiling, so this is the device-bound teacher rate
    for width, tag in ((1.0, "teacher"), (0.5, "student_w05"),
                       (0.25, "student_w025")):
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16),
            siggraph.init_params(jax.random.key(0), width=width))
        run = lambda: batch_forward_frames(params, l, hab, hm,  # noqa: E731
                                           jnp.float32(0.0))
        _sync(run()[0])
        reps = _q(20, 8)
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            run()
        _sync(run()[0])
        dt = (time.perf_counter() - t0) / reps
        extras[f"{tag}_batch128_bf16_imgs_per_sec"] = round(
            N / dt, 1)


def bench_dist_fused_click(extras):
    """The GUI dist-session click: fused click+window+suggest program
    (ONE dispatch returns frame, window frame and the K=9 suggestion
    palette) vs the round-1 3-pass recipe (suggest dispatch + previous-
    frame readback + click dispatch)."""
    import jax.numpy as jnp
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    from ideepcolor_tpu.ops.resize import cubic_resize_matrix_np
    img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")
    if not os.path.exists(img):
        return
    m = api.ColorizeImageJaxCaffe(Xd=256)
    m.prep_net(None)
    d = api.ColorizeImageJaxCaffeDist(Xd=256)
    d.prep_net(None)
    m.load_image(img)
    d.load_image(img)
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    boxes[0] = [130, 150, 136, 156]
    vals[0] = [30, -40]
    d.predict_dist_table(boxes, vals, 0)
    win, bucket = 512, 128
    hb = wb = -(-win // bucket) * bucket
    l_win_pad = jnp.zeros((hb, wb, 1), jnp.float32)
    rh = jnp.asarray(cubic_resize_matrix_np(256, win, hb))
    rw = jnp.asarray(cubic_resize_matrix_np(256, win, wb))
    rh_np = np.asarray(rh)
    rw_np = np.asarray(rw)
    l_win_np = np.zeros((hb, wb, 1), np.float32)
    m.net_forward_table(boxes, vals, 1)         # previous frame
    # HOST-window variant (the GUI default on this transport): one device
    # dispatch returns net frame + palette (~196 KB + 30 floats); the
    # window frame composes on host — vs the device-window variant whose
    # 512px frame readback (~786 KB at 7-14 MB/s) dominated r02's 96 ms
    m.net_forward_table_suggest_host(boxes, vals, 1, l_win_np, rh_np,
                                     rw_np, d, 130, 150, K=9)   # compile
    ts = []
    for i in range(_q(20, 8)):
        boxes[1] = [100 + i, 100, 106 + i, 106]
        vals[1] = [10, 20]
        t0 = time.perf_counter()
        m.net_forward_table_suggest_host(boxes, vals, 2, l_win_np, rh_np,
                                         rw_np, d, 100 + i, 100, K=9)
        ts.append(time.perf_counter() - t0)
    ts = np.sort(ts) * 1000.0
    extras["dist_click_fused_p50_ms"] = round(float(ts[len(ts) // 2]), 2)
    extras["dist_click_fused_p95_ms"] = round(
        float(ts[min(int(len(ts) * .95), len(ts) - 1)]), 2)
    # device-window variant kept for the decomposition record
    m.net_forward_table_win_suggest(boxes, vals, 1, l_win_pad, rh, rw,
                                    d, 130, 150, K=9)       # compile
    ts3 = []
    for i in range(_q(20, 8)):
        boxes[1] = [100 + i, 100, 106 + i, 106]
        t0 = time.perf_counter()
        m.net_forward_table_win_suggest(boxes, vals, 2, l_win_pad, rh, rw,
                                        d, 100 + i, 100, K=9)
        ts3.append(time.perf_counter() - t0)
    extras["dist_click_devwin_p50_ms"] = round(
        float(np.sort(ts3)[len(ts3) // 2]) * 1000.0, 2)
    # plain (non-dist) GUI window click, host-compose variant — the
    # default GUI click cost on this transport
    m.net_forward_table_win_host(boxes, vals, 1, l_win_np, rh_np, rw_np)
    ts4 = []
    for i in range(_q(20, 8)):
        boxes[1] = [100 + i, 100, 106 + i, 106]
        t0 = time.perf_counter()
        m.net_forward_table_win_host(boxes, vals, 2, l_win_np, rh_np,
                                     rw_np)
        ts4.append(time.perf_counter() - t0)
    extras["win_click_host_p50_ms"] = round(
        float(np.sort(ts4)[len(ts4) // 2]) * 1000.0, 2)
    # stage decomposition of the GUI window click (VERDICT r3 task 5):
    # the win click IS net_forward_table + compose_window_host on this
    # backend — time each stage separately so the residual between the
    # 41 ms HEADLINE click and the win click is attributable. NOTE the
    # headline measures the SIGGRAPH backend; this `m` is the (heavier
    # on device) Caffe main net, so stage_net here is expected ABOVE the
    # headline p50 — the siggraph win-click row below is the
    # apples-to-apples GUI-click number for the headline model.
    from ideepcolor_tpu.api.colorize import compose_window_host
    t_net, t_comp = [], []
    for i in range(_q(20, 8)):
        boxes[1] = [100 + i, 100, 106 + i, 106]
        t0 = time.perf_counter()
        out = m.net_forward_table(boxes, vals, 2)
        t1 = time.perf_counter()
        compose_window_host(out, l_win_np, rh_np, rw_np)
        t2 = time.perf_counter()
        t_net.append(t1 - t0)
        t_comp.append(t2 - t1)
    extras["win_click_stage_net_p50_ms"] = round(
        float(np.sort(t_net)[len(t_net) // 2]) * 1000.0, 2)
    extras["win_click_stage_compose_p50_ms"] = round(
        float(np.sort(t_comp)[len(t_comp) // 2]) * 1000.0, 2)
    ts2 = []
    for i in range(_q(20, 8)):
        boxes[1] = [100 + i, 100, 106 + i, 106]
        t0 = time.perf_counter()
        d.get_ab_reccs(100 + i, 100, K=9, N=25000, return_conf=True)
        m.get_img_forward()
        m.net_forward_table_win(boxes, vals, 2, l_win_pad, rh, rw)
        ts2.append(time.perf_counter() - t0)
    extras["dist_click_unfused_p50_ms"] = round(
        float(np.sort(ts2)[len(ts2) // 2]) * 1000.0, 2)


def bench_trained_quality(extras):
    """Quality numbers from the TRAINED committed weights (weights/):
    eval AUC (count-averaged PSNR over the hint sweep, apps/eval.py) on
    the held-out corpus images, plus the distilled students' AUC drop.
    Skipped silently when no trained weights are committed."""
    wdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights")
    teacher_path = os.path.join(wdir, "teacher.npz")
    if not os.path.exists(teacher_path):
        return
    import jax
    from ideepcolor_tpu.apps.eval import (auc_spread, curve_auc, evaluate,
                                          per_image_auc)
    from ideepcolor_tpu.models import siggraph

    # deterministic holdout set (never trained on): built by
    # scripts/build_offline_corpus.py from reference + bundled samples
    import importlib.util
    import subprocess
    corpus = "/tmp/bench_corpus"
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "build_offline_corpus.py")
    spec = importlib.util.spec_from_file_location("corpus_script", script)
    corpus_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(corpus_mod)
    # manifest-gated: a partial build (crash between makedirs and the
    # copies) or one from an older script version must rebuild, not be
    # silently reused
    if not corpus_mod.manifest_is_current(corpus):
        r = subprocess.run([sys.executable, script, corpus],
                           capture_output=True, text=True)
        if r.returncode != 0 or not corpus_mod.manifest_is_current(corpus):
            print(f"# corpus build failed: {r.stderr.strip()[:160]}",
                  file=sys.stderr)
            return
    from ideepcolor_tpu.apps.eval import load_eval_images
    images = load_eval_images(os.path.join(corpus, "holdout"), 256)
    if not len(images):
        return
    counts = (0, 1, 2, 5, 10, 25)

    def params_of(path):
        from ideepcolor_tpu.api.colorize import _load_checkpoint
        return siggraph.params_from_state_dict(_load_checkpoint(path))

    def auc_of(params):
        curve, per_img = evaluate(params, images, counts,
                                  batch=len(images),
                                  return_per_image=True)
        return curve, curve_auc(curve), per_image_auc(per_img)

    tp = params_of(teacher_path)
    curve, auc, t_aucs = auc_of(tp)
    extras["eval_auc_db"] = round(auc, 2)
    # per-image spread: the honesty bars behind the small-holdout mean
    # (VERDICT r4 task 6 — "teacher > student by 0.19 dB" must be
    # distinguishable from n=3 noise)
    for k, v in auc_spread(t_aucs).items():
        extras[f"eval_{k}"] = v
    extras["eval_psnr_0_hints_db"] = round(curve[0], 2)
    extras["eval_psnr_25_hints_db"] = round(curve[25], 2)
    extras["eval_curve_monotone"] = bool(
        all(curve[a] <= curve[b] + 0.3     # 0.3 dB noise allowance
            for a, b in zip(counts, counts[1:])))
    # hint-fidelity: the paper's interaction contract, corpus-size-
    # independent (VERDICT r2 task 4) — does the output ADOPT the clicked
    # color at the click (deltaE, lower=better adherence), even a
    # counterfactual one (rot 180), and how far does one click reach
    from ideepcolor_tpu.apps.eval import hint_fidelity
    # QUICK keeps the load-bearing 1-hint adherence + counterfactual +
    # radius; the 5-hint sweep is depth (r5b: quality ran 133 s vs a
    # 70 s estimate — the fidelity sweeps are the elastic part)
    fid = hint_fidelity(tp, images, batch=len(images),
                        counts=(1,) if QUICK else (1, 5),
                        rotations=(0.0, 180.0))
    extras["hint_deltaE_1"] = fid["deltaE_h1_rot0"]
    extras["hint_deltaE_1_nohint"] = fid["deltaE_h1_rot0_nohint"]
    if "deltaE_h5_rot0" in fid:
        extras["hint_deltaE_5"] = fid["deltaE_h5_rot0"]
    extras["hint_deltaE_counterfactual_1"] = fid["deltaE_h1_rot180"]
    extras["hint_deltaE_counterfactual_1_nohint"] = \
        fid["deltaE_h1_rot180_nohint"]
    extras["hint_radius_r50_px"] = fid["radius_r50_px"]
    extras["hint_radius_r90_px"] = fid["radius_r90_px"]
    for tag in ("w05", "w025"):
        spath = os.path.join(wdir, f"student_{tag}.npz")
        if os.path.exists(spath):
            sp = params_of(spath)
            _c, sauc, s_aucs = auc_of(sp)
            extras[f"student_{tag}_auc_db"] = round(sauc, 2)
            extras[f"student_{tag}_auc_drop_db"] = round(auc - sauc, 2)
            # PAIRED per-image drops (same images, same hint keys): the
            # stderr of the drop itself, much tighter than comparing two
            # independent means on a handful of images
            drops = t_aucs - s_aucs
            if len(drops) > 1:
                extras[f"student_{tag}_auc_drop_stderr_db"] = round(
                    float(drops.std(ddof=1) / np.sqrt(len(drops))), 2)
            if QUICK:
                # student hint-fidelity is the most expensive non-AUC
                # sweep; the coverage pass keeps the AUC drops (the
                # distillation contract) and leaves fidelity to the
                # teacher row above
                continue
            sfid = hint_fidelity(sp, images, batch=len(images),
                                 counts=(1,), rotations=(0.0, 180.0))
            extras[f"student_{tag}_hint_deltaE_1"] = sfid["deltaE_h1_rot0"]
            extras[f"student_{tag}_hint_deltaE_cf_1"] = \
                sfid["deltaE_h1_rot180"]
            extras[f"student_{tag}_hint_radius_r90_px"] = \
                sfid["radius_r90_px"]


def bench_global_hints(extras):
    """Config 3: global histogram transfer."""
    from ideepcolor_tpu import api
    from ideepcolor_tpu.models import global_stats
    rng = np.random.default_rng(1)
    m = api.ColorizeImageJaxCaffeGlobDist(Xd=256)
    m.prep_net(None)
    img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")
    if os.path.exists(img):
        m.load_image(img)      # real full-res frame for the fullres metric
    else:
        m.set_image((rng.random((256, 256, 3)) * 255).astype(np.uint8))
    glob = np.asarray(global_stats.extract(
        rng.random((256, 256, 3)).astype(np.float32))["glob_ab_313"])
    ab = np.zeros((2, 256, 256))
    mask = np.zeros((1, 256, 256))
    m.net_forward(ab, mask, glob)
    ts = []
    for _ in range(_q(10, 5)):
        t0 = time.perf_counter()
        m.net_forward(ab, mask, glob)
        ts.append(time.perf_counter() - t0)
    extras["global_hints_ms"] = round(float(np.median(ts)) * 1000, 2)
    # fused glob forward + full-res (one synchronization point)
    m.net_forward_fullres(ab, mask, glob)
    ts = []
    for _ in range(_q(10, 5)):
        t0 = time.perf_counter()
        m.net_forward_fullres(ab, mask, glob)
        ts.append(time.perf_counter() - t0)
    extras["global_plus_fullres_ms"] = round(float(np.median(ts)) * 1000, 2)


def bench_batch_fullres(extras):
    """Config 4: batched 32-image 2048px ab-upsample + L-fusion.

    Runs as 4 chunks of 8 (this environment's remote compile service
    rejects programs with >~1 GB of argument buffers); the chunks pipeline
    so throughput is still device-bound.
    """
    import jax.numpy as jnp
    from ideepcolor_tpu.engine.batch import batch_fullres_fuse
    rng = np.random.default_rng(2)
    N, CH, HW = 32, 8, 2048
    l_full = jnp.asarray(rng.uniform(0, 100, (CH, HW, HW, 1))
                         .astype(np.float32))
    ab = jnp.asarray(rng.uniform(-80, 80, (CH, 256, 256, 2))
                     .astype(np.float32))
    _sync(batch_fullres_fuse(l_full, ab, (HW, HW)))
    reps = _q(2, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        for _ in range(N // CH - 1):
            batch_fullres_fuse(l_full, ab, (HW, HW))
        _sync(batch_fullres_fuse(l_full, ab, (HW, HW)))
    dt = (time.perf_counter() - t0) / reps
    extras["batch32_fullres2048_imgs_per_sec"] = round(N / dt, 1)


def bench_http_serving(extras):
    """Production surface: in-process HTTP server, single-image latency
    (decode + load + fused forward/full-res + PNG encode) and batch-16
    npz throughput. Reuses the programs the click bench already compiled."""
    import http.client
    import io
    import threading
    from ideepcolor_tpu.apps import serve
    srv = serve.make_server(port=0, size=256, auto_batch=16)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        host, port = srv.server_address
        img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")
        if not os.path.exists(img):
            return
        body = open(img, "rb").read()
        c = http.client.HTTPConnection(host, port, timeout=600)
        c.request("POST", "/colorize", body=body)   # warm/compile
        c.getresponse().read()
        ts = []
        for _ in range(_q(5, 3)):
            t0 = time.perf_counter()
            c.request("POST", "/colorize", body=body)
            c.getresponse().read()
            ts.append(time.perf_counter() - t0)
        extras["http_colorize_fullres_p50_ms"] = round(
            float(np.median(ts)) * 1000, 1)

        rng = np.random.default_rng(7)
        imgs = (rng.random((16, 256, 256, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.savez_compressed(buf, images=imgs)
        payload = buf.getvalue()
        c.request("POST", "/colorize_batch", body=payload)   # warm
        c.getresponse().read()
        nb = _q(3, 2)
        t0 = time.perf_counter()
        for _ in range(nb):
            c.request("POST", "/colorize_batch", body=payload)
            c.getresponse().read()
        dt = (time.perf_counter() - t0) / nb
        extras["http_batch16_imgs_per_sec"] = round(16 / dt, 1)

        # interactive session: image device-resident, clicks ship only
        # the hint list (the GUI's table-click path over HTTP)
        c.request("POST", "/session", body=body)
        sid = json.loads(c.getresponse().read())["id"]
        hints = [{"y": 135, "x": 160, "ab": [23.0, -69.0], "radius": 3}]
        c.request("POST", f"/session/click?id={sid}",
                  body=json.dumps(hints).encode())
        c.getresponse().read()      # warm
        ts = []
        for i in range(_q(10, 6)):
            hints[0]["y"] = 100 + i * 5
            t0 = time.perf_counter()
            c.request("POST", f"/session/click?id={sid}",
                      body=json.dumps(hints).encode())
            c.getresponse().read()
            ts.append(time.perf_counter() - t0)
        extras["http_session_click_p50_ms"] = round(
            float(np.median(ts)) * 1000, 1)

        # dynamic batching: 16 concurrent net-res clients coalesce into
        # few device dispatches (bucket programs precompiled by warmup;
        # the persistent cache makes that cheap on reruns)
        svc = srv.RequestHandlerClass.service
        svc.warmup()

        statuses = []
        retries = [0]

        def one_netres(i):
            # transient resets happen under 16-way bursts; retry with a
            # fresh connection and log ONE clean line, never a traceback
            for attempt in range(3):
                try:
                    cc = http.client.HTTPConnection(host, port, timeout=600)
                    cc.request("POST", "/colorize?fullres=0", body=body)
                    r = cc.getresponse()
                    r.read()
                    statuses.append(r.status)
                    return
                except OSError as e:
                    retries[0] += 1
                    print(f"# autobatch client {i} retry {attempt + 1}: "
                          f"{type(e).__name__}", file=sys.stderr)
            statuses.append(599)

        # 4 bursts, median of the warm ones: a retrying straggler (reset
        # connection re-forming late -> a SMALLER coalesced batch) must
        # show up as a visible retry count, not silently halve the rate
        # (the r3 autobatch collapse; the server's listen backlog is now
        # 128, so resets should be gone at 16-way)
        rates, batches = [], []
        for trial in range(_q(4, 2)):
            statuses.clear()
            d0, r0 = svc.batcher.dispatches, svc.batcher.batched_requests
            threads = [threading.Thread(target=one_netres, args=(i,))
                       for i in range(16)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            burst = time.perf_counter() - t0
            if all(s == 200 for s in statuses) and len(statuses) == 16:
                if trial > 0:          # burst 0 warms the thread pool
                    rates.append(16 / burst)
                    batches.append(
                        (svc.batcher.batched_requests - r0)
                        / max(svc.batcher.dispatches - d0, 1))
            else:
                extras["http_autobatch_error"] = (
                    f"{sum(1 for s in statuses if s != 200)} non-200s")
        if rates:
            extras["http_autobatch16_req_per_sec"] = round(
                float(np.median(rates)), 1)
            extras["http_autobatch16_burst_rates"] = [
                round(r, 1) for r in rates]
            extras["http_autobatch_avg_batch"] = round(
                float(np.median(batches)), 1)
        extras["http_autobatch_client_retries"] = retries[0]
    finally:
        srv.shutdown()
        srv.server_close()


def _rss_mb() -> float:
    from ideepcolor_tpu.utils.soakload import rss_mb
    return rss_mb()


def bench_serve_soak(extras):
    """Mixed-traffic soak: 8 concurrent clients driving fullres / netres /
    session-click / session-suggest against one in-process server;
    records aggregate p99, per-class p50s, 5xx count and host RSS growth
    (load-skew hardening evidence — sessions ride the small-upload table
    path, so RSS must stay bounded on this leaky transport).
    Duration via IDEEPCOLOR_SOAK_SECS (coverage tier 30 s, 60 s
    full-rep, 120 s in full mode)."""
    secs = float(os.environ.get(
        "IDEEPCOLOR_SOAK_SECS",
        "120" if _full_mode() else str(_q(60, 30))))
    # never let the soak run the budget out: leave room for the CPU
    # control + the emit (the watchdog would still save the record, but
    # a clamped soak gives a complete one)
    secs = min(secs, max(_remaining() - 90.0, 0.0))
    if secs < 15.0:
        extras["bench_serve_soak_skipped"] = "budget"
        return
    import http.client
    import threading
    from ideepcolor_tpu.apps import serve
    from ideepcolor_tpu.utils import soakload
    img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")
    if not os.path.exists(img):
        return
    body = open(img, "rb").read()
    srv = serve.make_server(port=0, size=256, auto_batch=16)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        host, port = srv.server_address
        svc = srv.RequestHandlerClass.service
        svc.warmup()
        # pre-warm the stateless image paths once (compiles + transport
        # staging excluded from the soak window)
        c = http.client.HTTPConnection(host, port, timeout=600)
        c.request("POST", "/colorize", body=body)
        c.getresponse().read()

        # per-client sessions open BEFORE the RSS/live-array window so the
        # measured growth is steady-state serving, not session setup
        # (8 sessions hold ~18 MB device state each; the warm suggest
        # materializes the lazy per-session dist planes, ~6 MB)
        conns = [soakload.open_warm_session(host, port, body,
                                            ("click", "suggest"))
                 for _ in range(8)]

        def on_reconnect(ci, e):
            print(f"# soak client {ci}: {type(e).__name__}, reconnecting",
                  file=sys.stderr)

        import jax
        la0 = sum(int(a.nbytes) for a in jax.live_arrays())
        rss0 = _rss_mb()
        counters: dict = {}
        lat, errors = soakload.run_clients(
            host, port, conns, body, secs,
            ("click", "netres", "click", "suggest", "click", "fullres"),
            size=256, on_reconnect=on_reconnect, counters=counters)
        rss1 = _rss_mb()
        la1 = sum(int(a.nbytes) for a in jax.live_arrays())
        all_lat = np.sort(np.concatenate(
            [np.asarray(v) for v in lat.values() if v])) * 1000.0
        extras["soak_secs"] = secs
        extras["soak_requests"] = int(len(all_lat))
        extras["soak_req_per_sec"] = round(len(all_lat) / secs, 1)
        extras["soak_p99_ms"] = round(float(all_lat[int(len(all_lat)
                                                        * 0.99)]), 1)
        # the aggregate p99 is dominated by bulk fullres, which the
        # PriorityLock de-prioritizes BY DESIGN under saturation — split
        # out the interactive-class p99 (clicks/suggests/netres) that the
        # scheduling exists to protect
        inter_parts = [np.asarray(v) for k, v in lat.items()
                       if k != "fullres" and v]
        if inter_parts:
            inter = np.sort(np.concatenate(inter_parts)) * 1000.0
            extras["soak_interactive_p99_ms"] = round(
                float(inter[int(len(inter) * 0.99)]), 1)
        for kind, v in lat.items():
            if v:
                extras[f"soak_{kind}_p50_ms"] = round(
                    float(np.median(v)) * 1000, 1)
        # 599 is the CLIENT-side reconnect sentinel (soakload.run_clients
        # on OSError), not a server error — count it separately so the
        # A/B against the CPU control leg (which filters 599 the same
        # way, scripts/soak_control.py) compares like with like
        extras["soak_5xx"] = sum(1 for e in errors if e != 599)
        extras["soak_client_reconnects"] = sum(
            1 for e in errors if e == 599)
        for k, v in counters.items():     # per-kind attribution (task 8)
            if k.startswith("reconnects_"):
                extras[f"soak_{k}"] = v
        # scheduling evidence: interactive grants that bypassed queued
        # bulk work under the PriorityLock (clicks preempting fullres)
        extras["soak_lock_bulk_jumped"] = int(svc.lock.bulk_jumped)
        extras["soak_rss_growth_mb"] = round(rss1 - rss0, 1)
        # Attribute the growth (VERDICT r1 weak + tunnel-leak note in
        # CLAUDE.md): (a) JAX-array liveness is flat -> not an array leak;
        # (b) per-image-request rate ~= the image's device-upload bytes ->
        # consistent with the transport's upload-staging leak;
        # (c) the CPU-backend control below reruns the same server and mix
        # without the tunnel and must show ~flat RSS.
        extras["soak_live_array_growth_mb"] = round((la1 - la0) / 1e6, 2)
        img_reqs = len(lat["fullres"]) + len(lat["netres"])
        if img_reqs:
            extras["soak_rss_kb_per_img_request"] = round(
                (rss1 - rss0) * 1024.0 / img_reqs, 1)
    finally:
        srv.shutdown()
        srv.server_close()


def bench_soak_cpu_control(extras):
    """CPU-backend control for the soak: same server + request mix in a
    subprocess on the in-process CPU backend (no tunnel). Flat RSS here
    pins the TPU soak's RSS growth on the axon transport's upload staging,
    not on the serving stack. Runs last — a CPU-heavy subprocess would
    contend with TPU latency benches (CLAUDE.md)."""
    import subprocess
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "soak_control.py")
    secs = os.environ.get("IDEEPCOLOR_CONTROL_SECS",
                          "45" if _full_mode() else str(_q(30, 20)))
    try:
        out = subprocess.run(
            [sys.executable, script, "--secs", secs],
            capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        extras["soak_cpu_control_error"] = "timeout"
        return
    line = next((ln for ln in reversed(out.stdout.splitlines())
                 if ln.startswith("{")), None)
    if out.returncode != 0 or line is None:
        tail = (out.stderr or out.stdout).strip().splitlines()
        extras["soak_cpu_control_error"] = (tail[-1][:160] if tail
                                            else f"rc={out.returncode}")
        return
    for k, v in json.loads(line).items():
        extras[f"soak_{k.replace('cpu_', 'cpu_control_', 1)}"] = v


def bench_recycle_soak(extras):
    """Image-carrying soak (default 10 min) against a SUBPROCESS server
    with the RSS recycle guard and bulk backpressure armed (VERDICT r2
    tasks 2/7): RSS must stay under the stated cap via drain->dump->
    exec-in-place->replay recycles, with 0 dropped sessions and bounded
    p99 across the recycles. Runs FIRST, before this process touches the
    device — the server subprocess owns the chip for the duration (one
    TPU process at a time, CLAUDE.md). Default duration is budget-scaled
    (75 s; the full 600 s behind IDEEPCOLOR_BENCH_FULL=1)."""
    secs = float(os.environ.get("IDEEPCOLOR_RECYCLE_SOAK_SECS",
                                "600" if _full_mode() else "75"))
    # the soak runs first: reserve the bulk of the budget for everything
    # after it (headline clicks + the other configs ~ 7 min warm)
    secs = min(secs, max(_remaining() - 480.0, 0.0))
    if secs <= 0:
        extras["bench_recycle_soak_skipped"] = "budget"
        return
    import http.client
    import re
    import subprocess
    import threading

    from ideepcolor_tpu.utils import soakload
    # to force enough recycles inside a short soak, the growth cap scales
    # with duration unless explicitly pinned
    dflt_cap = "1500" if secs >= 300 else "600"
    growth_cap = float(os.environ.get("IDEEPCOLOR_RECYCLE_SOAK_CAP_MB",
                                      dflt_cap))
    env = dict(os.environ)
    env["IDEEPCOLOR_RECYCLE_POLL_S"] = "2"
    env["IDEEPCOLOR_RECYCLE_MIN_REQUESTS"] = "10"
    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.Popen(
        [sys.executable, "-m", "ideepcolor_tpu.apps.serve",
         "--port", "0", "--host", "127.0.0.1", "--warmup",
         "--rss-growth-cap-mb", str(growth_cap),
         "--max-bulk-backlog", "8"],
        cwd=here, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    box = {}

    def drain():
        for ln in proc.stdout:
            m = re.search(r"serving on http://[\d.]+:(\d+)", ln)
            if m:
                box.setdefault("port", int(m.group(1)))
            m = re.search(r"guard armed: cap (\d+)", ln)
            if m:
                box.setdefault("cap", int(m.group(1)))
            m = re.search(r"# boot stages: (\{.*\})", ln)
            if m:
                # keep the LAST one: the post-recycle generation's boot
                # decomposition (exec -> accept -> device -> ready)
                box["boot_stages"] = m.group(1)

    threading.Thread(target=drain, daemon=True).start()

    def health(port):
        try:
            cc = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            cc.request("GET", "/healthz")
            return json.loads(cc.getresponse().read())
        except (OSError, http.client.HTTPException):
            return None

    try:
        t0 = time.time()
        # the server's own first dispatch can wedge in the device-claim
        # queue like any fresh process (it deliberately doesn't arm the
        # nudge itself — see utils/unwedge.py); nudge it from out here
        # (the r5 pre-nudge run lost the whole soak to a 245 s boot wedge)
        from ideepcolor_tpu.utils.unwedge import guard as _unwedge
        _disarm = _unwedge(stall_s=100.0, label="soak server boot")
        try:
            # bounded both absolutely and by the budget: a wedged server
            # start must not eat the window reserved for the headline
            while ("port" not in box and time.time() - t0 < 900
                   and _remaining() > 480.0):
                if proc.poll() is not None:
                    raise RuntimeError("soak server died during startup")
                time.sleep(1)
        finally:
            _disarm()     # stray nudges must not contend with later configs
        if "port" not in box:
            raise RuntimeError("soak server startup timed out")
        port = box["port"]
        body = open(os.path.join(REFERENCE_DIR,
                                 "test_imgs/mortar_pestle.jpg"),
                    "rb").read()
        conns = [soakload.open_warm_session("127.0.0.1", port, body,
                                            ("click",), timeout=600)
                 for _ in range(4)]
        counters: dict = {}
        lat, errors = soakload.run_clients(
            "127.0.0.1", port, conns, body, secs,
            ("click", "fullres", "click", "netres"),
            size=256, timeout=600, retry_busy=True, counters=counters)
        # final health probe (VERDICT r4 task 4: soak10_rss_end_mb = -1
        # is no longer possible silently): prefer a steady-state reading,
        # fall back to a mid-boot one (/healthz now reports rss_mb while
        # booting too), and if nothing answers record a LOUD probe error.
        # BUDGET-gated: a recycle that fires near soak end can leave the
        # next generation booting for 100-370 s (claim handover) — this
        # wait must not starve the coverage pass the two-tier bench
        # exists to guarantee, so it's bounded by the remaining budget
        # (less the ~480 s the other families need) and bails if the
        # server process died
        t1 = time.time()
        wait_s = min(300.0, max(30.0, _remaining() - 480.0))
        h1 = None
        while time.time() - t1 < wait_s:
            if proc.poll() is not None:
                break
            h = health(port)
            if h is not None:
                h1 = h
                if h.get("status") != "booting":
                    break
            time.sleep(2)
        if h1 is None:
            waited = time.time() - t1
            extras["soak10_rss_probe_error"] = (
                f"no /healthz response within {waited:.0f}s of soak end "
                f"(budget-clamped wait {wait_s:.0f}s"
                + (", server process exited)" if proc.poll() is not None
                   else ")"))
        elif h1.get("status") == "booting":
            extras["soak10_rss_probe_note"] = \
                "rss read mid-boot (recycled gen still booting)"
        all_ms = sorted(x * 1e3 for v in lat.values() for x in v)
        q = lambda p: round(all_ms[int(p * (len(all_ms) - 1))], 1)  # noqa
        extras["soak10_secs"] = secs
        extras["soak10_requests"] = len(all_ms)
        extras["soak_recycles"] = (h1 or {}).get("recycle_gen", -1)
        extras["soak10_rss_cap_mb"] = box.get("cap", -1)
        extras["soak10_rss_end_mb"] = (h1 or {}).get("rss_mb", -1)
        if all_ms:
            extras["soak10_p50_ms"] = q(0.50)
            extras["soak10_p99_ms"] = q(0.99)
            # the worst straddler: a request queued in the kernel accept
            # backlog across an exec waits out the whole worker restart
            extras["soak10_max_ms"] = round(all_ms[-1], 1)
        for kind, v in lat.items():
            if v:
                v = sorted(v)
                extras[f"soak10_{kind}_p50_ms"] = round(
                    v[len(v) // 2] * 1e3, 1)
        # 404 on a click = a session lost across a recycle — must be 0
        extras["soak10_dropped_sessions"] = counters.get("404", 0)
        extras["soak_bulk_shed"] = counters.get("429", 0)
        extras["soak10_503_drain"] = counters.get("503", 0)
        extras["soak10_reconnects"] = counters.get("reconnects", 0)
        # per-kind reconnect attribution (VERDICT r3 task 8): which
        # client class injected transport noise into the numbers above
        for k, v in counters.items():
            if k.startswith("reconnects_"):
                extras[f"soak10_{k}"] = v
        extras["soak10_5xx"] = sum(1 for e in errors if 500 <= e < 599)
        if "boot_stages" in box:
            # the recycle straddler decomposition: exec + interpreter
            # restart -> accept open -> device ready -> serving
            extras["soak10_boot_stages"] = json.loads(box["boot_stages"])
    finally:
        proc.send_signal(2)
        try:
            proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=60)


def bench_backpressure(extras):
    """Bulk saturation against the admission cap: concurrent full-res
    clients way past capacity; the bulk tail must stay bounded because
    excess work is shed with 429 (not queued into multi-second p99s —
    r02 measured 2.3 s unbounded)."""
    import threading

    from ideepcolor_tpu.apps import serve as serve_mod
    from ideepcolor_tpu.utils import soakload

    srv = serve_mod.make_server(port=0, size=256, max_bulk_backlog=4)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        body = open(os.path.join(REFERENCE_DIR,
                                 "test_imgs/mortar_pestle.jpg"),
                    "rb").read()
        import http.client
        warm = http.client.HTTPConnection(host, port, timeout=600)
        warm.request("POST", "/colorize", body=body)
        warm.getresponse().read()
        conns = [soakload.open_warm_session(host, port, body, (),
                                            timeout=600)
                 for _ in range(12)]
        counters: dict = {}
        lat, _ = soakload.run_clients(
            host, port, conns, body,
            20.0 if _full_mode() else float(_q(12, 8)),
            ("fullres",),
            size=256, timeout=600, retry_busy=True, counters=counters)
        v = sorted(lat["fullres"])
        if v:
            extras["backpressure_fullres_p50_ms"] = round(
                v[len(v) // 2] * 1e3, 1)
            extras["backpressure_fullres_p99_ms"] = round(
                v[int(0.99 * (len(v) - 1))] * 1e3, 1)
        extras["backpressure_shed_429"] = counters.get("429", 0)
        extras["backpressure_served"] = len(v)
    finally:
        srv.shutdown()
        srv.server_close()


def bench_streaming(extras):
    """Config 5: 30fps stream with persistent hints + dist decode."""
    import jax
    from ideepcolor_tpu.engine.streaming import StreamingSession
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    sess = StreamingSession(params, size=256, depth=3, with_dist=False)
    hint_ab = np.zeros((256, 256, 2), np.float32)
    hint_mask = np.zeros((256, 256, 1), np.float32)
    hint_ab[100:104, 100:104] = [30, -30]
    hint_mask[100:104, 100:104] = 1
    sess.set_hints(hint_ab, hint_mask)
    rng = np.random.default_rng(3)
    # 8-bit gray frames (a real video source): dequant to L runs on device,
    # quartering the per-frame upload on the transfer-bound stream
    frames = [rng.integers(0, 256, (256, 256), dtype=np.uint8)
              for _ in range(8)]
    for f in frames:                      # warm/compile
        sess.submit(f)
    list(sess.drain())
    # 3 reps + spread (transport-bound; see drag_pipeline note)
    N = _q(60, 30)
    rates = []
    for _ in range(_q(3, 2)):
        t0 = time.perf_counter()
        got = 0
        for i in range(N):
            if sess.submit(frames[i % len(frames)]) is not None:
                got += 1
        got += sum(1 for _ in sess.drain())
        rates.append(got / (time.perf_counter() - t0))
    extras["streaming_fps"] = round(float(np.median(rates)), 1)
    extras["streaming_fps_spread"] = [round(min(rates), 1),
                                      round(max(rates), 1)]


# rough warm-cache cost estimates per config (seconds), used only to
# decide whether a config still fits the remaining budget; actuals land
# in extras["stage_secs"] each run for recalibration. (full-rep, quick-rep)
CONFIG_ESTIMATES_S = {
    "bench_throughput": (8, 5),
    "bench_drag_pipeline": (8, 5),
    "bench_dist_fused_click": (40, 25),
    "bench_trained_quality": (110, 70),
    "bench_http_serving": (60, 35),
    "bench_batched_serving": (15, 8),
    "bench_student": (40, 20),
    "bench_global_hints": (20, 12),
    "bench_batch_fullres": (25, 15),
    "bench_streaming": (20, 12),
    "bench_backpressure": (30, 22),
    "bench_serve_soak": (120, 75),
    "bench_soak_cpu_control": (60, 35),
}

# every family the bench measures — pre-registered as skipped at start so
# a watchdog exit still reports exactly what was never reached (VERDICT
# r4 task 1: 9 families vanished from the record without a trace)
ALL_FAMILIES = (("baseline_torch_cpu", "bench_recycle_soak",
                 "bench_click_latency")
                + tuple(CONFIG_ESTIMATES_S))


def _est(name: str) -> float:
    full, quick = CONFIG_ESTIMATES_S.get(name, (30, 20))
    return quick if QUICK else full


def run_configs(fns, state, needs_cm=(), estimates=None):
    """Run each config unless its estimated cost no longer fits the
    remaining budget (then its pre-registered {name}_skipped='budget'
    marker stays and we move on); exceptions never kill the run; actual
    per-stage seconds recorded. ``estimates`` (scalar seconds per name)
    overrides the tiered CONFIG_ESTIMATES_S table, for tests."""
    extras = state["extras"]
    stage = extras.setdefault("stage_secs", {})
    for fn in fns:
        name = fn.__name__
        cost = (estimates.get(name, 30) if estimates is not None
                else _est(name))
        if _remaining() < cost:
            extras[f"{name}_skipped"] = "budget"
            continue
        extras.pop(f"{name}_skipped", None)
        t0 = time.perf_counter()
        try:
            fn(state["cm"], extras) if fn in needs_cm else fn(extras)
        except Exception as e:  # keep the headline even if a config fails
            extras[f"{name}_error"] = str(e)[:120]
        stage[name] = round(time.perf_counter() - t0, 1)


def _build_full(state):
    extras = state["extras"]
    p50 = state.get("p50")
    if p50 is None:
        p50 = extras.get("dense_path_p50_ms", -1.0)
        extras.setdefault("headline_error",
                          "budget exhausted before headline click loop")
    baseline_ms = state.get("baseline_ms")
    if baseline_ms is None:
        baseline_ms = FALLBACK_BASELINE_MS
        extras["baseline_is_fallback"] = True
    return {
        "metric": "p50 click-to-frame latency @256 local-hints (SIGGRAPH "
                  "fwd + frame compose + readback; product-default bf16 "
                  "serving mode, f32 parity path in f32_table_click_*, "
                  "opt-in abq transport modes in abq_*)",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / p50, 2) if p50 > 0 else -1.0,
        "baseline_torch_cpu_ms": round(baseline_ms, 1),
        "device": state.get("device", "unknown"),
        **extras,
    }


def _emit_once(state) -> bool:
    """Emit results exactly once (main path and watchdog path race)."""
    with state["emit_lock"]:
        if state["emitted"]:
            return False
        state["emitted"] = True
    emit_results(_build_full(state), state["extras"])
    return True


def _arm_deadline_watchdog(state, deadline):
    """Hard backstop for the budget: if results haven't been emitted by
    deadline - EMIT_RESERVE_S — e.g. a config hung on a wedged tunnel
    dispatch — mark the run budget-exhausted, emit whatever has been
    measured, flush, and exit 0 so the driver still captures a parseable
    record (r2 AND r3 both lost theirs)."""
    import threading

    def watchdog():
        while True:
            if state["emitted"]:
                return
            rem = deadline - EMIT_RESERVE_S - time.time()
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        state["extras"]["bench_budget_exhausted"] = True
        print("# bench budget exhausted — emitting partial results",
              file=sys.stderr)
        if _emit_once(state):
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    return t


def main():
    global DEADLINE, QUICK
    import threading
    # stray exceptions in helper threads must never spray tracebacks over
    # the bench tail (VERDICT r1 weak #3) — one clean line each
    threading.excepthook = lambda a: print(
        f"# bench thread error: {a.exc_type.__name__}: "
        f"{str(a.exc_value)[:120]}", file=sys.stderr)
    DEADLINE = time.time() + _budget_secs()
    QUICK = not _full_mode()        # coverage tier under the driver budget
    extras = {}
    for name in ALL_FAMILIES:       # pre-register; popped when reached
        extras[f"{name}_skipped"] = "budget"
    state = {"extras": extras, "p50": None, "cm": None, "device": "unknown",
             "baseline_ms": None, "emitted": False,
             "emit_lock": threading.Lock()}
    _arm_deadline_watchdog(state, DEADLINE)
    stage = extras.setdefault("stage_secs", {})
    # the torch-CPU baseline FIRST: ~10 s of pure CPU before any TPU
    # process exists, so vs_baseline can never be the fallback constant
    # again (r4's watchdog exited before the tail ever measured it)
    extras.pop("baseline_torch_cpu_skipped", None)
    t0 = time.perf_counter()
    state["baseline_ms"] = measure_baseline_torch_cpu()
    stage["baseline_torch_cpu"] = round(time.perf_counter() - t0, 1)
    # the recycle soak runs next: its server subprocess must own the
    # chip alone, so it precedes this process's own device init
    extras.pop("bench_recycle_soak_skipped", None)
    t0 = time.perf_counter()
    try:
        bench_recycle_soak(extras)
    except Exception as e:
        extras["bench_recycle_soak_error"] = str(e)[:160]
    stage["bench_recycle_soak"] = round(time.perf_counter() - t0, 1)
    import jax
    # guard device enumeration + first dispatch against the post-kill wedge
    # budget-aware stall threshold: under the default 12-min budget a
    # 120 s wait before the first nudge ate a third of the run (observed
    # r4: soak-exit wedge + 120 s threshold + recovery ~= 4 min). A cold
    # first compile is ~20-40 s, so 60 s still avoids spurious nudges
    # while halving the worst-case recovery under budget; attended full
    # runs keep the conservative 2 min.
    disarm = _unwedge_guard(stall_s=120.0 if _full_mode() else 60.0)
    state["device"] = str(jax.devices()[0])
    import jax.numpy as jnp
    _sync(jnp.ones((), jnp.float32) + 1.0)
    disarm()
    extras.pop("bench_click_latency_skipped", None)
    t0 = time.perf_counter()
    try:
        p50, cm = bench_click_latency(extras)
        state["p50"], state["cm"] = p50, cm
    except Exception as e:
        # never exit without the JSON line: degrade to the dense-path
        # p50 if the table path failed mid-run, else report the failure
        extras["headline_error"] = str(e)[:160]
    stage["bench_click_latency"] = round(time.perf_counter() - t0, 1)
    # order = coverage insurance: the cheap families with no other
    # number run FIRST; the expensive dist-click program set (~100 s of
    # compile-cache loads on a slow tunnel) and the soaks run last, so a
    # day of bad claim-handover luck costs depth, not whole families
    # (the r5 pre-reorder run lost 9 families behind dist-click + soak)
    run_configs(
        (bench_throughput, bench_drag_pipeline, bench_trained_quality,
         bench_http_serving, bench_batched_serving, bench_student,
         bench_global_hints, bench_batch_fullres, bench_streaming,
         bench_backpressure, bench_dist_fused_click, bench_serve_soak,
         bench_soak_cpu_control),
        state, needs_cm=(bench_throughput, bench_drag_pipeline))
    # DEEPEN pass: every family has a number now; spend what's left
    # re-running the headline click loops at full reps (programs are
    # compiled in-process — this is pure dispatch time, ~60 s)
    if QUICK and state["p50"] is not None and _remaining() > 90:
        QUICK = False
        t0 = time.perf_counter()
        try:
            p50, cm = bench_click_latency(extras, cm=state["cm"])
            state["p50"], state["cm"] = p50, cm
        except Exception as e:
            extras["headline_deepen_error"] = str(e)[:160]
        stage["bench_click_latency_deep"] = round(
            time.perf_counter() - t0, 1)
    _emit_once(state)


# The ~15 most load-bearing extras for the compact headline line, in
# priority order (later ones are dropped first if the line outgrows the
# byte budget). Everything else lives in BENCH_FULL.json.
HEADLINE_KEYS = (
    "p95_ms", "abq_click_p50_ms", "abq_half_click_p50_ms",
    "rpc_floor_p50_ms", "compile_first_forward_s",
    "dist_click_fused_p50_ms", "win_click_host_siggraph_p50_ms",
    "win_click_host_p50_ms",
    "drag_pipeline_events_per_sec",
    "streaming_fps", "batch16_bf16_imgs_per_sec",
    "teacher_batch128_bf16_imgs_per_sec", "eval_auc_db",
    "eval_auc_stderr_db",
    "hint_deltaE_1", "hint_deltaE_counterfactual_1", "hint_radius_r90_px",
    "soak_recycles", "soak10_rss_end_mb", "soak10_dropped_sessions",
    "soak10_p99_ms", "soak_bulk_shed", "soak_rss_growth_mb",
    "soak_interactive_p99_ms", "headline_error", "bench_budget_exhausted",
)

# Driver tail-capture budget: the FINAL stdout line must parse as JSON and
# stay well under the ~2000-char capture that truncated BENCH_r02
# (VERDICT r2 weak #1).
HEADLINE_BYTE_BUDGET = 1500


def emit_results(full, extras):
    """Write the full result dict to BENCH_FULL.json and print it on an
    early stdout line; print a compact headline JSON (<= HEADLINE_BYTE_
    BUDGET bytes, self-checked) as the very LAST line for the driver."""
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL.json")
    # regression net (VERDICT r2 weak #3): before overwriting, compare
    # against the previous run's full dict with transport normalization
    # (scripts/bench_compare.py) and report verdicts on stderr
    try:
        if os.path.exists(full_path):
            import importlib.util
            spec = importlib.util.spec_from_file_location(
                "bench_compare", os.path.join(here, "scripts",
                                              "bench_compare.py"))
            bc = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(bc)
            with open(full_path) as f:
                rows, n_reg = bc.compare(json.load(f), full)
            for r in rows:
                if r["verdict"] not in ("ok",):
                    print(f"# vs-prev {r['metric']}: {r['old']:.2f} -> "
                          f"{r['new']:.2f} ({r['raw_pct']:+.1f}% raw) "
                          f"{r['verdict']}", file=sys.stderr)
            if n_reg:
                print(f"# vs-prev: {n_reg} metric(s) regressed beyond "
                      f"transport normalization", file=sys.stderr)
    except Exception as e:
        print(f"# vs-prev comparison failed: {e}", file=sys.stderr)
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"# BENCH_FULL.json write failed: {e}", file=sys.stderr)
    print("FULL: " + json.dumps(full))
    compact = {
        "metric": "p50 click-to-frame ms @256 local-hints, bf16",
        "value": full["value"],
        "unit": "ms",
        "vs_baseline": full["vs_baseline"],
        "baseline_torch_cpu_ms": full["baseline_torch_cpu_ms"],
        "device": full["device"],
    }
    for k in HEADLINE_KEYS:
        if k in extras:
            compact[k] = extras[k]
    n_errors = sum(1 for k in extras if k.endswith("_error"))
    if n_errors:
        compact["n_config_errors"] = n_errors
    n_skipped = sum(1 for k in extras if k.endswith("_skipped"))
    if n_skipped:
        compact["n_config_skipped"] = n_skipped
    line = json.dumps(compact)
    while len(line) > HEADLINE_BYTE_BUDGET and len(compact) > 6:
        compact.popitem()
        line = json.dumps(compact)
    # self-check the contract before printing: parses + under budget
    assert json.loads(line) == compact
    assert len(line) <= HEADLINE_BYTE_BUDGET, (len(line), line[:120])
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
