import numpy as np

from ideepcolor_tpu.ops import gamut
import _np_colorspace as ref


def _ref_snap_ab(input_l, input_rgb):
    """Independent numpy oracle for ref data/lab_gamut.py:28-52."""
    input_lab = ref.rgb2lab((np.asarray(input_rgb, np.float64) / 255.0)
                            [None, None, :]).flatten()
    conv_lab = input_lab.copy()
    for _ in range(20):
        conv_lab[0] = input_l
        old = conv_lab
        rgb = np.clip(ref.lab2rgb(conv_lab[None, None, :]).flatten(), 0, 1)
        conv_lab = ref.rgb2lab(rgb[None, None, :]).flatten()
        if np.sum(np.abs(conv_lab - old)) < 1:
            break
    return np.round(np.clip(ref.lab2rgb(conv_lab[None, None, :]).flatten(),
                            0, 1) * 255).astype(np.uint8)


def test_snap_ab_matches_reference_loop():
    rng = np.random.default_rng(3)
    for _ in range(25):
        l = float(rng.uniform(5, 95))
        rgb = rng.integers(0, 256, 3).astype(np.uint8)
        got = np.asarray(gamut.snap_ab(l, rgb.astype(np.float32)))
        want = _ref_snap_ab(l, rgb)
        # f32 vs f64 rounding can flip a quantized channel by 1
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1, (
            l, rgb, got, want)


def test_snap_ab_in_gamut_color_unchanged():
    # A color already consistent with its own L must stay put.
    rgb = np.array([120, 64, 30], np.float32)
    lab = ref.rgb2lab((rgb / 255.0)[None, None, :]).flatten()
    got = np.asarray(gamut.snap_ab(float(lab[0]), rgb))
    assert np.max(np.abs(got - rgb)) <= 1


def test_ab_gamut_mask_properties():
    masked_rgb, mask = gamut.ab_gamut_mask(50.0)
    masked_rgb, mask = np.asarray(masked_rgb), np.asarray(mask)
    assert masked_rgb.shape == (221, 221, 3) and mask.shape == (221, 221)
    # neutral gray (a=b=0) is always in gamut at L=50
    assert mask[110, 110]
    # extreme corners are out of gamut
    assert not mask[0, 0] and not mask[220, 220]
    assert np.all(masked_rgb[~mask] == 255)


def test_ab_gamut_mask_matches_numpy_roundtrip():
    l_in = 50.0
    r = np.arange(-110, 111, 1.0)
    a, b = np.meshgrid(r, r, indexing="ij")
    lab = np.stack([np.full_like(a, l_in), a, b], -1)
    rgb_u8 = (np.clip(ref.lab2rgb(lab), 0, 1) * 255).astype(np.uint8)
    lab_back = ref.rgb2lab(rgb_u8 / 255.0)
    want = np.linalg.norm(lab - lab_back, axis=-1) < 1.0
    _, got = gamut.ab_gamut_mask(l_in)
    got = np.asarray(got)
    # f32/f64 disagreement only possible in a thin shell near the threshold
    assert np.mean(got != want) < 5e-3
