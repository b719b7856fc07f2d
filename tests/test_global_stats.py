import numpy as np

from ideepcolor_tpu.models import global_stats
from ideepcolor_tpu.data.color_bins import get_bins
import _np_colorspace as ref


def test_extract_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    rgb = rng.random((64, 64, 3)).astype(np.float32)
    out = global_stats.extract(rgb)
    glob = np.asarray(out["glob_ab_313"])

    # oracle: rgb2lab -> ab 4x4 avgpool -> nearest-bin one-hot -> mean
    lab = ref.rgb2lab(rgb.astype(np.float64))
    ab = lab[..., 1:]
    ab_rs = ab.reshape(16, 4, 16, 4, 2).mean(axis=(1, 3))
    centers = get_bins().pts_in_hull.astype(np.float64)
    d2 = ((ab_rs[..., None, :] - centers) ** 2).sum(-1)
    onehot = np.eye(313)[np.argmin(d2, axis=-1)]
    want = onehot.mean(axis=(0, 1))
    assert np.abs(glob - want).max() < 1e-6
    assert abs(glob.sum() - 1.0) < 1e-5

    s_want = ref.rgb2hsv(rgb.astype(np.float64))[..., 1].mean()
    assert abs(float(out["s_avg"]) - s_want) < 1e-5
    bgr = np.asarray(out["bgr_avg"])
    assert np.allclose(bgr, rgb.mean((0, 1))[::-1], atol=1e-6)


def test_extract_on_constant_image():
    rgb = np.full((32, 32, 3), 0.4, np.float32)
    out = global_stats.extract(rgb)
    glob = np.asarray(out["glob_ab_313"])
    # a gray image is entirely in one (near-neutral) bin
    assert (glob > 0).sum() == 1
    assert abs(float(out["s_avg"])) < 1e-6
