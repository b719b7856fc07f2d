"""Golden-output regression tests (SURVEY section 4a).

The published weights are unreachable here, so goldens pin the END-TO-END
numerics under seeded random weights instead: same seed + same scripted
hint session must reproduce the stored frames. Any unintended change to
colorspace math, hint rasterization, model wiring, normalization or the
output quantization shows up as a golden mismatch.

Regenerate intentionally with:  python tests/test_goldens.py regen

Regen history (each entry must say WHY — the CLAUDE.md golden rule):
- MAX_HINTS 64->256 (commit 7093ec6) regenerated the three caffe keys
  with a 1-LSB shift on ~0.02% of pixels: the bigger hint table changes
  the click program's XLA fusion layout, flipping sub-LSB rounding ties.
  Semantics unchanged (the table-vs-dense parity test still passes
  exactly); the shift should have been called out in that commit.
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
IMG = "/root/reference/test_imgs/mortar_pestle.jpg"

pytestmark = pytest.mark.skipif(not os.path.exists(IMG),
                                reason="test image unavailable")


def _session_outputs():
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ops.hints import put_point

    out = {}
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)                       # seeded random init (key 0)
    m.load_image(IMG)
    ab = np.zeros((2, 64, 64))
    mask = np.zeros((1, 64, 64))
    out["caffe_auto"] = m.net_forward(ab.copy(), mask.copy())
    put_point(ab, mask, [33, 40], 2, [23, -69])
    put_point(ab, mask, [25, 40], 2, [0, 0])
    out["caffe_hints"] = m.net_forward(ab, mask)
    out["caffe_fullres_crop"] = m.get_img_fullres()[100:140, 100:140]

    s = api.ColorizeImageJax(Xd=64)
    s.prep_net(path='')
    s.load_image(IMG)
    out["siggraph_hints"] = s.net_forward(ab, mask)

    g = api.ColorizeImageJaxCaffeGlobDist(Xd=64)
    g.prep_net(None)
    g.load_image(IMG)
    hist = np.zeros(313)
    hist[[40, 100, 200]] = [0.5, 0.3, 0.2]
    out["glob_hist"] = g.net_forward(ab * 0, mask * 0, hist)
    return out


def _session_outputs_256():
    """Production-shape (Xd=256) goldens: fusion/tiling decisions differ
    from the 64-px programs, so numeric drift that only manifests at the
    real serving resolution is pinned here (caffe-dist + siggraph-dist,
    the two heads the 64-px set doesn't cover). Dist maps are pinned via
    compact probes (a pixel pdf + per-bin means), not the 80 MB tensors."""
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ops.hints import put_point

    out = {}
    ab = np.zeros((2, 256, 256))
    mask = np.zeros((1, 256, 256))
    put_point(ab, mask, [130, 160], 3, [23, -69])
    put_point(ab, mask, [100, 160], 3, [-30, 40])

    d = api.ColorizeImageJaxCaffeDist(Xd=256)
    d.prep_net(None)
    d.load_image(IMG)
    out["caffe_dist_hints"] = d.net_forward(ab.copy(), mask.copy())
    out["caffe_dist_pdf_probe"] = (
        np.asarray(d.dist_ab)[:, 130, 160] * 1e4)
    out["caffe_dist_binmean_probe"] = (
        np.asarray(d.dist_ab).mean(axis=(1, 2)) * 1e4)
    out["caffe_dist_fullres_crop"] = d.get_img_fullres()[200:240, 200:240]

    s = api.ColorizeImageJaxDist(Xd=256)
    s.prep_net(path='')
    s.load_image(IMG)
    reg = s.net_forward(ab.copy(), mask.copy())
    out["siggraph_dist_reg_crop"] = np.asarray(reg)[:, 120:140, 150:170]
    lo = np.asarray(s._dev_dist)                       # (64, 64, 529)
    out["siggraph_dist_pdf_probe"] = lo[32, 40, :] * 1e4
    out["siggraph_dist_binmean_probe"] = lo.mean(axis=(0, 1)) * 1e4
    return out


def _assert_golden(path, make_outputs):
    if not os.path.exists(path):
        pytest.skip("goldens not generated yet")
    want = np.load(path)
    got = make_outputs()
    for k in want.files:
        g, w = got[k].astype(np.float64), want[k].astype(np.float64)
        assert g.shape == w.shape, k
        # identical math modulo last-bit float variation across BLAS/LLVM
        # versions: allow <=1 quantization step on <1% of elements
        diff = np.abs(g - w)
        assert diff.max() <= 1, (k, diff.max())
        assert (diff > 0.5).mean() < 0.01, (k, (diff > 0.5).mean())


def test_goldens_match():
    _assert_golden(os.path.join(GOLDEN_DIR, "session_goldens.npz"),
                   _session_outputs)


@pytest.mark.slow
def test_goldens_match_256():
    _assert_golden(os.path.join(GOLDEN_DIR, "session_goldens_256.npz"),
                   _session_outputs_256)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import conftest  # noqa: F401  (forces the CPU backend)
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, "session_goldens.npz"),
            **_session_outputs())
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, "session_goldens_256.npz"),
            **_session_outputs_256())
        print("goldens regenerated (64 + 256)")
