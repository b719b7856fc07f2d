"""Tracing / profiling instrumentation for the interactive path.

The reference has essentially no observability (an unused Timer and
session-time prints — SURVEY.md section 5). Here: a per-stage latency
recorder with p50/p95 summaries for the click path, and a thin wrapper over
``jax.profiler`` for device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Accumulates per-stage wall-clock samples; reports percentiles.

    ``maxlen`` bounds the per-stage window (long-running servers keep the
    most recent samples instead of growing without bound)."""

    def __init__(self, maxlen: int | None = None):
        if maxlen is None:
            self.samples: dict[str, list] = defaultdict(list)
        else:
            from collections import deque
            from functools import partial
            self.samples = defaultdict(partial(deque, maxlen=maxlen))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.sort(np.asarray(list(xs))) * 1000.0
            out[name] = {
                "n": len(a),
                "p50_ms": float(a[len(a) // 2]),
                "p95_ms": float(a[min(len(a) - 1, int(len(a) * 0.95))]),
                "mean_ms": float(a.mean()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'n':>6}{'p50 ms':>10}{'p95 ms':>10}"
                 f"{'mean ms':>10}"]
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:<28}{s['n']:>6}{s['p50_ms']:>10.2f}"
                         f"{s['p95_ms']:>10.2f}{s['mean_ms']:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: captures XLA device timelines.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side stages inside a device_trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_op_summary(log_dir: str, reps: int = 1) -> dict:
    """Parse a :func:`device_trace` capture into a per-HLO-op time
    summary (the fusion-audit view; works over the tunneled transport —
    the device lane is accurate even when host wall-clock spans are
    distorted).

    Returns {"total_ms_per_rep", "groups": {group: ms_per_rep},
    "top_ops": [(name, ms_per_rep), ...]} where ``reps`` divides the
    summed durations by the number of identical steps captured.
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "device:" in str(e.get("args", {}).get("name", ""))}
    agg: collections.Counter = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and not e["name"].startswith("jit_")):
            agg[e["name"]] += e.get("dur", 0.0)
    total = sum(agg.values())
    groups: collections.Counter = collections.Counter()
    for n, d in agg.items():
        # NOTE: plain `"conv" in n` would swallow XLA's `*_convert_*`
        # fusions (dtype casts) into the convolution bucket
        if ("conv" in n and "convert" not in n) or "custom-call" in n:
            g = "convolution"
        elif n.startswith(("copy", "slice", "dynamic")):
            g = "copy/slice"
        elif "fusion" in n:
            g = "fusion"
        else:
            g = "other"
        groups[g] += d
    to_ms = 1.0 / (1000.0 * max(reps, 1))
    return {
        "total_ms_per_rep": total * to_ms,
        "groups": {g: d * to_ms for g, d in groups.most_common()},
        "top_ops": [(n, d * to_ms) for n, d in agg.most_common(20)],
    }
