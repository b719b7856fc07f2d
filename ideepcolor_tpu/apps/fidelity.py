"""One-command checkpoint/numerics fidelity acceptance (VERDICT r2 #9).

``python -m ideepcolor_tpu fidelity`` runs the complete fidelity
surface — the full-scale checkpoint gauntlet (exact caffemodel V1/V2 +
.pth wire formats through prep_net, oracle-checked at Xd=256), the
end-to-end golden frames (64 + 256), and the executed reference
notebooks — and prints ONE ``PASS``/``FAIL`` line per artifact.

Fixture mode runs offline against the exact-format synthetic
checkpoints. The day the real published weights are reachable, point
``IDEEPCOLOR_REAL_CAFFEMODEL`` / ``IDEEPCOLOR_REAL_GLOBAL_CAFFEMODEL`` /
``IDEEPCOLOR_REAL_PTH`` at them (fetch via
scripts/fetch_and_convert_models.sh) and rerun: the same load paths and
acceptance thresholds (<1e-3 mean ab vs oracle, <=1 uint8 LSB frames)
execute against the real files — acceptance is this one command.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

# artifact name -> (pytest target, what it proves)
ARTIFACTS = (
    ("caffemodel-wire-v1v2",
     "tests/test_checkpoint_gauntlet.py::"
     "test_full_scale_caffemodel_loads_exact_params",
     "every prototxt layer at true shapes, modern + legacy wire form"),
    ("caffemodel-main-256",
     "tests/test_checkpoint_gauntlet.py::"
     "test_caffemodel_main_256_forward_matches_oracle",
     "main net load + forward vs independent torch oracle"),
    ("caffemodel-dist-256",
     "tests/test_checkpoint_gauntlet.py::"
     "test_caffemodel_dist_256_forward_matches_oracle",
     "dist net (hypercolumn head, kern_us/pred_ab injection)"),
    ("caffemodel-global-256",
     "tests/test_checkpoint_gauntlet.py::"
     "test_caffemodel_global_256_forward_matches_oracle",
     "global-hints net (314-ch MLP, conv4 fusion)"),
    ("pth-modern",
     "tests/test_checkpoint_gauntlet.py::"
     "test_pth_modern_256_forward_matches_reference_torch",
     ".pth zipfile layout vs the reference's own torch model"),
    ("pth-legacy-pre04",
     "tests/test_checkpoint_gauntlet.py::"
     "test_pth_legacy_pre04_layout_loads_identically",
     "pre-0.4 state-dict layout (InstanceNorm patch path)"),
    ("goldens-64",
     "tests/test_goldens.py::test_goldens_match",
     "pinned end-to-end frames, every backend, Xd=64"),
    ("goldens-256",
     "tests/test_goldens.py::test_goldens_match_256",
     "pinned end-to-end frames at production Xd=256"),
    ("notebooks",
     "tests/test_notebooks.py::test_notebook_executes",
     "both reference notebooks executed end-to-end"),
)

REAL_ENVS = ("IDEEPCOLOR_REAL_CAFFEMODEL",
             "IDEEPCOLOR_REAL_GLOBAL_CAFFEMODEL", "IDEEPCOLOR_REAL_PTH")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", default="",
                    help="comma-separated artifact names (default: all)")
    ap.add_argument("--list", action="store_true",
                    help="list artifacts and exit")
    args = ap.parse_args(argv)
    if args.list:
        for name, _t, what in ARTIFACTS:
            print(f"{name:<22} {what}")
        return 0
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if not os.path.isdir(os.path.join(repo, "tests")):
        print("FAIL  (tests/ not found — fidelity runs from a source "
              "checkout)", file=sys.stderr)
        return 2
    real = {k: os.environ[k] for k in REAL_ENVS if os.environ.get(k)}
    mode = ("REAL checkpoints: " + ", ".join(
        f"{k}={v}" for k, v in real.items())) if real else \
        "fixture mode (exact-format synthetic checkpoints; set " \
        "IDEEPCOLOR_REAL_* to accept the published files)"
    print(f"# fidelity acceptance — {mode}")
    only = {s.strip() for s in args.only.split(",") if s.strip()}
    failed = 0
    for name, target, what in ARTIFACTS:
        if only and name not in only:
            continue
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", target, "-q",
             "--no-header", "-x"],
            cwd=repo, capture_output=True, text=True)
        dt = time.time() - t0
        ok = r.returncode == 0
        # pytest exit 5 = no tests collected -> a broken target is a FAIL
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name:<22} {dt:6.1f}s  ({what})")
        if not ok:
            failed += 1
            tail = (r.stdout or r.stderr).strip().splitlines()[-3:]
            for ln in tail:
                print(f"      {ln[:110]}")
    print(f"# fidelity: {'ALL PASS' if not failed else f'{failed} FAILED'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
