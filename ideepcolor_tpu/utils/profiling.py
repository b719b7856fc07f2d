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
