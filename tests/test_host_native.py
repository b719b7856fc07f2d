"""Native C++ host-ops: build, load, and verify against the same oracles
as the device ops."""
import numpy as np
import pytest

from ideepcolor_tpu.ops import host
import _np_colorspace as ref

RNG = np.random.default_rng(13)

native = pytest.mark.skipif(not host.available(),
                            reason="g++ build unavailable")


@native
def test_native_builds_and_threads():
    lib = host.get_lib()
    assert lib is not None
    assert lib.num_threads() >= 1


@native
def test_native_rgb2lab_matches_oracle():
    rgb = RNG.random((50, 40, 3)).astype(np.float32)
    got = host.rgb2lab(rgb)
    want = ref.rgb2lab(rgb.astype(np.float64))
    assert np.max(np.abs(got - want)) < 1e-3


@native
def test_native_lab2rgb_roundtrip_and_u8():
    rgb = RNG.random((30, 30, 3)).astype(np.float32)
    lab = host.rgb2lab(rgb)
    back = host.lab2rgb(lab)
    assert np.max(np.abs(back - rgb)) < 1e-4
    u8 = host.lab2rgb_u8(lab)
    want = (np.clip(ref.lab2rgb(lab.astype(np.float64)), 0, 1)
            * 255).astype(np.uint8)
    assert np.max(np.abs(u8.astype(int) - want.astype(int))) <= 1


@native
def test_native_rasterize_matches_device_op():
    import jax.numpy as jnp
    from ideepcolor_tpu.ops import hints
    boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 12, 16, 18]; vals[0] = [25.0, -35.0]
    boxes[1] = [14, 14, 20, 20]; vals[1] = [-10.0, 60.0]
    ab_n, mask_n = host.rasterize_hints(boxes, vals, 2, 64)
    ab_d, mask_d = hints.rasterize_hints(jnp.asarray(boxes),
                                         jnp.asarray(vals), jnp.int32(2),
                                         size=64)
    assert np.array_equal(ab_n, np.asarray(ab_d))
    assert np.array_equal(mask_n, np.asarray(mask_d))


@native
def test_native_zoom_matches_scipy():
    from scipy.ndimage import zoom as szoom
    x = RNG.random((20, 17, 2)).astype(np.float32)
    got = host.zoom_bilinear(x, (63, 41))
    want = szoom(x, (63 / 20, 41 / 17, 1), order=1)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-4


def test_numpy_fallbacks_match_native():
    """The pure-numpy fallbacks must agree with the C++ kernels."""
    if not host.available():
        pytest.skip("native lib unavailable")
    rgb = RNG.random((20, 20, 3)).astype(np.float32)
    assert np.max(np.abs(host._np_rgb2lab(rgb) - host.rgb2lab(rgb))) < 1e-3
    lab = host.rgb2lab(rgb)
    assert np.max(np.abs(host._np_lab2rgb(lab) - host.lab2rgb(lab))) < 1e-4


@native
def test_zoom2_banded_matches_dense_gemm():
    """The banded separable zoom must reproduce rh @ X @ rw.T for the
    real cubic/linear interpolation matrices (<=4-tap rows) AND for a
    dense (unbanded) matrix, within f32 rounding."""
    from ideepcolor_tpu.ops.resize import (cubic_resize_matrix_np,
                                           linear_resize_matrix_np)
    S = 64
    a = RNG.uniform(-110, 110, (S, S)).astype(np.float32)
    b = RNG.uniform(-110, 110, (S, S)).astype(np.float32)
    for mk in (cubic_resize_matrix_np, linear_resize_matrix_np):
        rh = mk(S, 100, 128).astype(np.float32)
        rw = mk(S, 90, 128).astype(np.float32)
        oa, ob = host.zoom2_matrices(a, b, rh, rw)
        da, db = rh @ a @ rw.T, rh @ b @ rw.T
        assert oa.shape == da.shape == (128, 128)
        assert np.max(np.abs(oa - da)) < 2e-3   # ~f32 ulp at |ab|<=110
        assert np.max(np.abs(ob - db)) < 2e-3
    # dense random matrices (no zero band at all): falls back to the
    # full row and still matches
    rh = RNG.standard_normal((17, S)).astype(np.float32) / S
    rw = RNG.standard_normal((23, S)).astype(np.float32) / S
    oa, ob = host.zoom2_matrices(a, b, rh, rw)
    assert np.max(np.abs(oa - rh @ a @ rw.T)) < 2e-3
    assert np.max(np.abs(ob - rh @ b @ rw.T)) < 2e-3
