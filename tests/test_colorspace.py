import numpy as np
import pytest

from ideepcolor_tpu.ops import colorspace as cs
import _np_colorspace as ref


RNG = np.random.default_rng(0)


def test_rgb_lab_known_values():
    # White, black, primary red (standard CIE values, D65 2-deg).
    lab = np.asarray(cs.rgb_to_lab(np.array([[1.0, 1.0, 1.0],
                                             [0.0, 0.0, 0.0],
                                             [1.0, 0.0, 0.0]])))
    # (the canonical rounded D65 white point leaves ~0.05 residual on a/b
    # for pure white — identical to skimage, which uses the same constants)
    assert np.allclose(lab[0], [100.0, 0.0, 0.0], atol=0.1)
    assert np.allclose(lab[1], [0.0, 0.0, 0.0], atol=1e-4)
    assert np.allclose(lab[2], [53.2408, 80.0925, 67.2032], atol=0.3)


def test_rgb_lab_matches_numpy_reference():
    rgb = RNG.random((64, 64, 3)).astype(np.float32)
    got = np.asarray(cs.rgb_to_lab(rgb))
    want = ref.rgb2lab(rgb.astype(np.float64))
    assert np.max(np.abs(got - want)) < 1e-3


def test_lab_rgb_matches_numpy_reference():
    lab = np.stack([RNG.uniform(0, 100, (50, 50)),
                    RNG.uniform(-110, 110, (50, 50)),
                    RNG.uniform(-110, 110, (50, 50))], -1).astype(np.float32)
    got = np.asarray(cs.lab_to_rgb(lab))
    want = ref.lab2rgb(lab.astype(np.float64))
    assert np.max(np.abs(got - want)) < 1e-4


def test_round_trip_in_gamut():
    rgb = RNG.random((32, 32, 3)).astype(np.float32)
    back = np.asarray(cs.lab_to_rgb(cs.rgb_to_lab(rgb)))
    assert np.max(np.abs(back - rgb)) < 1e-4


def test_hsv_matches_colorsys():
    rgb = RNG.random((16, 16, 3)).astype(np.float64)
    got = np.asarray(cs.rgb_to_hsv(rgb))
    want = ref.rgb2hsv(rgb)
    assert np.max(np.abs(got - want)) < 1e-5
    back = np.asarray(cs.hsv_to_rgb(got))
    assert np.max(np.abs(back - rgb)) < 1e-5


def test_lab2rgb_transpose_layout():
    l = RNG.uniform(0, 100, (1, 8, 8)).astype(np.float32)
    ab = RNG.uniform(-50, 50, (2, 8, 8)).astype(np.float32)
    out = np.asarray(cs.lab2rgb_transpose(l, ab))
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    lab = np.concatenate([l, ab], 0).transpose(1, 2, 0)
    want = (ref.lab2rgb(lab.astype(np.float64)) * 255).astype(np.uint8)
    assert np.mean(np.abs(out.astype(int) - want.astype(int))) < 0.01


def test_requantized_ab_matches_reference_convention():
    """output_ab is re-derived from the quantized uint8 frame
    (ref data/colorize_image.py:196-198)."""
    from ideepcolor_tpu.engine.pipeline import requantized_ab
    import jax.numpy as jnp
    rgb_u8 = (RNG.random((16, 16, 3)) * 255).astype(np.uint8)
    got = np.asarray(requantized_ab(jnp.asarray(rgb_u8)))
    want = ref.rgb2lab(rgb_u8.astype(np.float64) / 255.0)[..., 1:]
    assert np.max(np.abs(got - want)) < 1e-3
