#!/usr/bin/env python
"""Round-over-round bench regression net.

BENCH_r01 -> r02 taught the lesson (VERDICT r2 weak #3): on the tunneled
chip most interactive metrics are TRANSPORT-bound, so raw round-over-
round deltas mostly measure transport state, not code. A -37% swing in
`drag_pipeline_events_per_sec` turned out to be run-to-run variance
(docs/BENCHMARKS.md "Round-over-round variance"). This tool encodes the
attribution discipline so the next swing is classified automatically:

- sync latencies (click p50s, suggest, global) are compared on their
  RPC-FLOOR RESIDUAL: metric - rpc_floor_p50_ms, the part code actually
  controls (the floor itself is reported separately as transport state);
- dispatch-rate metrics (drag events/s, streaming fps) scale ~1/floor,
  so they are compared after multiplying by the run's floor (events x
  floor ~= events' share of the dispatch ceiling), and additionally
  against their in-run `*_spread` when bench recorded one;
- device-bound rates (batch128/batch16 throughput) and quality metrics
  (eval/hint/bf16) are compared raw - transport does not touch them, so
  a swing there IS a code change.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--strict]
Prints one line per metric: raw delta, normalized delta, verdict.
--strict exits 1 if any REGRESSED verdict survives normalization.
"""
from __future__ import annotations

import argparse
import json
import sys

# metric -> (kind, regression_direction)
#   kind: 'sync_ms' (floor-residual), 'rate_dispatch' (floor-normalized),
#         'rate_device', 'quality_db', 'quality_raw'
#   direction: +1 = bigger is better, -1 = smaller is better
METRICS = {
    "value": ("sync_ms", -1),
    "p95_ms": ("sync_ms", -1),
    "f32_table_click_p50_ms": ("sync_ms", -1),
    "dense_path_p50_ms": ("sync_ms", -1),
    "dist_click_fused_p50_ms": ("sync_ms", -1),
    "global_hints_ms": ("sync_ms", -1),
    "auto_plus_fullres_ms": ("sync_ms", -1),
    "http_session_click_p50_ms": ("sync_ms", -1),
    "drag_pipeline_events_per_sec": ("rate_dispatch", +1),
    "streaming_fps": ("rate_dispatch", +1),
    "pipelined_imgs_per_sec": ("rate_dispatch", +1),
    "batch16_bf16_imgs_per_sec": ("rate_dispatch", +1),
    "teacher_batch128_bf16_imgs_per_sec": ("rate_device", +1),
    "student_w05_batch128_bf16_imgs_per_sec": ("rate_device", +1),
    "student_w025_batch128_bf16_imgs_per_sec": ("rate_device", +1),
    "eval_auc_db": ("quality_db", +1),
    "eval_psnr_0_hints_db": ("quality_db", +1),
    "eval_psnr_25_hints_db": ("quality_db", +1),
    "bf16_vs_f32_psnr_db": ("quality_db", +1),
    "hint_deltaE_1": ("quality_raw", -1),
    "hint_radius_r90_px": ("quality_raw", 0),   # informational
}

# a normalized swing smaller than this is reported as noise
THRESH = {"sync_ms": 0.20, "rate_dispatch": 0.12, "rate_device": 0.05,
          "quality_db": 0.0, "quality_raw": 0.0}
# quality metrics use absolute tolerances instead (dB / units)
ABS_TOL = {"quality_db": 0.15, "quality_raw": 0.5}
# sync_ms residuals near the RPC floor are sub-ms quantities whose ratio
# amplifies noise absurdly (ADVICE r3): a residual delta smaller than
# this is 'ok' regardless of its percentage, and when either residual is
# <= 0 (metric at/below the measured floor) normalization is skipped in
# favor of the raw comparison
SYNC_ABS_TOL_MS = 2.0


def _floor(d: dict) -> float:
    return float(d.get("rpc_floor_p50_ms", 0.0) or 0.0)


def _normalized(kind: str, v: float, d: dict) -> float:
    if kind == "sync_ms":
        return v - _floor(d)
    if kind == "rate_dispatch" and _floor(d) > 0:
        # share of the dispatch ceiling: rate * per-dispatch cost
        return v * _floor(d)
    return v


def _within_spread(name: str, old: dict, new: dict) -> bool:
    """True if each run's value lies inside the OTHER run's recorded
    in-run spread — the strongest 'this is run-to-run variance' signal."""
    so, sn = old.get(f"{name}_spread"), new.get(f"{name}_spread")
    vo, vn = old.get(name), new.get(name)
    ok = False
    if isinstance(so, (list, tuple)) and len(so) == 2 and vn is not None:
        lo, hi = sorted(float(x) for x in so)
        pad = 0.15 * (hi - lo) + 0.02 * hi   # spreads from 3 reps are wide
        ok = lo - pad <= float(vn) <= hi + pad
    if isinstance(sn, (list, tuple)) and len(sn) == 2 and vo is not None:
        lo, hi = sorted(float(x) for x in sn)
        pad = 0.15 * (hi - lo) + 0.02 * hi
        ok = ok or (lo - pad <= float(vo) <= hi + pad)
    return ok


def compare(old: dict, new: dict) -> tuple[list[dict], int]:
    rows, regressions = [], 0
    fo, fn = _floor(old), _floor(new)
    if fo and fn:
        rows.append({"metric": "rpc_floor_p50_ms (transport state)",
                     "old": fo, "new": fn,
                     "raw_pct": 100.0 * (fn - fo) / fo,
                     "verdict": "CONTEXT"})
    for name, (kind, direction) in METRICS.items():
        if name not in old or name not in new:
            continue
        vo, vn = float(old[name]), float(new[name])
        raw_pct = 100.0 * (vn - vo) / vo if vo else 0.0
        if fo > 0 and fn > 0:
            no, nn = _normalized(kind, vo, old), _normalized(kind, vn, new)
            if kind == "sync_ms" and (no <= 0 or nn <= 0):
                # at/below the measured floor: the residual ratio is
                # meaningless (sign flips on sub-ms noise) — fall back
                # to the raw comparison
                no, nn = vo, vn
        else:          # a run predates the floor field: compare raw only
            no, nn = vo, vn
        norm_pct = 100.0 * (nn - no) / no if no else 0.0
        if kind == "sync_ms" and abs(nn - no) < SYNC_ABS_TOL_MS:
            # sub-2ms residual delta: noise on this transport no matter
            # how large the percentage looks near the floor
            norm_pct = 0.0
        if kind in ABS_TOL:
            delta = (vn - vo) * (direction or 0)
            if direction == 0:
                verdict = "INFO"
            elif delta < -ABS_TOL[kind]:
                verdict, regressions = "REGRESSED", regressions + 1
            elif delta > ABS_TOL[kind]:
                verdict = "IMPROVED"
            else:
                verdict = "ok"
        else:
            signed = norm_pct * direction
            if _within_spread(name, old, new):
                verdict = "noise (within in-run spread)"
            elif signed < -100.0 * THRESH[kind]:
                verdict, regressions = "REGRESSED", regressions + 1
            elif signed > 100.0 * THRESH[kind]:
                verdict = "IMPROVED"
            else:
                verdict = "ok"
        rows.append({"metric": name, "kind": kind, "old": vo, "new": vn,
                     "raw_pct": raw_pct, "norm_pct": norm_pct,
                     "verdict": verdict})
    return rows, regressions


def _load(path: str) -> dict:
    """Accept either a raw metrics dict (BENCH_FULL.json) or a driver
    wrapper (BENCH_rNN.json: {cmd, rc, tail, parsed}) — unwrap `parsed`,
    falling back to the last parseable JSON line of `tail`."""
    with open(path) as f:
        d = json.load(f)
    if "metric" in d or "rpc_floor_p50_ms" in d:
        return d
    if isinstance(d.get("parsed"), dict):
        return d["parsed"]
    for ln in reversed(str(d.get("tail", "")).splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no metrics dict found (wrapper with "
                     f"parsed=null and no JSON line in tail)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old"), ap.add_argument("new")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any normalized regression remains")
    args = ap.parse_args(argv)
    old = _load(args.old)
    new = _load(args.new)
    rows, regressions = compare(old, new)
    w = max((len(r["metric"]) for r in rows), default=10)
    for r in rows:
        norm = (f" norm {r['norm_pct']:+6.1f}%"
                if "norm_pct" in r and r.get("kind") in
                ("sync_ms", "rate_dispatch") else "")
        print(f"{r['metric']:<{w}}  {r['old']:>9.2f} -> {r['new']:>9.2f}"
              f"  raw {r['raw_pct']:+6.1f}%{norm}  {r['verdict']}")
    if regressions:
        print(f"# {regressions} metric(s) REGRESSED beyond transport "
              f"normalization and in-run spread")
    return 1 if (args.strict and regressions) else 0


if __name__ == "__main__":
    sys.exit(main())
