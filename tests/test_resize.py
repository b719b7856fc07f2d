import numpy as np
from scipy.ndimage import zoom as scipy_zoom

from ideepcolor_tpu.ops import resize

RNG = np.random.default_rng(1)


def test_zoom_bilinear_matches_scipy_upsample():
    x = RNG.random((2, 37, 53)).astype(np.float32)
    out = np.asarray(resize.zoom_to(x, (111, 222), order=1))
    want = scipy_zoom(x, (1, 111 / 37, 222 / 53), order=1)
    assert out.shape == want.shape
    assert np.max(np.abs(out - want)) < 1e-4


def test_zoom_bilinear_matches_scipy_downsample():
    x = RNG.random((2, 100, 80)).astype(np.float32)
    out = np.asarray(resize.zoom_to(x, (31, 17), order=1))
    want = scipy_zoom(x, (1, 31 / 100, 17 / 80), order=1)
    assert np.max(np.abs(out - want)) < 1e-4


def test_zoom_nearest_matches_scipy():
    x = RNG.random((1, 20, 20)).astype(np.float32)
    out = np.asarray(resize.zoom_to(x, (57, 43), order=0))
    want = scipy_zoom(x, (1, 57 / 20, 43 / 20), order=0)
    assert np.array_equal(out, want)


def test_out_size_matches_scipy():
    for n, f in [(37, 3.0), (256, 1837 / 256), (100, 0.31)]:
        want = scipy_zoom(np.zeros((n,)), f, order=0).shape[0]
        assert resize.scipy_zoom_out_size(n, f) == want


def test_upsample_nearest_matches_torch():
    import torch
    x = RNG.random((1, 7, 9, 5)).astype(np.float32)
    out = np.asarray(resize.upsample_nearest(x, 4))
    t = torch.nn.Upsample(scale_factor=4, mode="nearest")(
        torch.tensor(x.transpose(0, 3, 1, 2)))
    want = t.numpy().transpose(0, 2, 3, 1)
    assert np.array_equal(out, want)


def test_bilinear_up2_fixed_matches_torch_deconv():
    import torch
    c = 6
    x = RNG.random((1, 10, 12, c)).astype(np.float32)
    out = np.asarray(resize.bilinear_up2_fixed(x))
    assert out.shape == (1, 20, 24, c)
    deconv = torch.nn.ConvTranspose2d(c, c, 4, stride=2, padding=1,
                                      groups=c, bias=False)
    k = np.array([[.25, .5, .25, 0], [.5, 1., .5, 0],
                  [.25, .5, .25, 0], [0, 0, 0, 0]], np.float32)
    with torch.no_grad():
        deconv.weight.copy_(torch.tensor(
            np.tile(k[None, None], (c, 1, 1, 1))))
    want = deconv(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    want = want.transpose(0, 2, 3, 1)
    assert np.max(np.abs(out - want)) < 1e-5


def test_resize_half_pixel_matches_cv2_linear():
    """cv2.INTER_LINEAR is half-pixel bilinear without antialias; the
    device equivalent must match closely (used for Xd-input resize)."""
    import cv2
    x = (RNG.random((40, 56, 3)) * 255).astype(np.float32)
    got = np.asarray(resize.resize_half_pixel(x, (96, 128)))
    want = cv2.resize(x, (128, 96), interpolation=cv2.INTER_LINEAR)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 0.51   # cv2 uses fixed-point interp


def test_cubic_resize_matrix_matches_cv2_inter_cubic():
    """cubic_resize_matrix_np reproduces cv2.INTER_CUBIC (half-pixel
    centers, A=-0.75, replicated borders) through the same
    zoom_with_matrices program the GUI window frame uses
    (ref ui/gui_draw.py:281 resizes ab with INTER_CUBIC)."""
    import cv2
    import jax.numpy as jnp
    for (h, w, H, W) in [(64, 64, 100, 120), (256, 256, 172, 100),
                         (37, 53, 212, 96), (8, 8, 33, 17)]:
        x = RNG.uniform(-110, 110, (h, w, 2)).astype(np.float32)
        rh = jnp.asarray(resize.cubic_resize_matrix_np(h, H))
        rw = jnp.asarray(resize.cubic_resize_matrix_np(w, W))
        got = np.asarray(resize.zoom_with_matrices(x, rh, rw))
        want = cv2.resize(x, (W, H), interpolation=cv2.INTER_CUBIC)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 5e-3   # f32 accumulation order


def test_cubic_resize_matrix_padding_and_identity():
    m = resize.cubic_resize_matrix_np(64, 100, n_rows=128)
    assert m.shape == (128, 64)
    assert np.all(m[100:] == 0)
    # weights are a partition of unity on every live row
    assert np.allclose(m[:100].sum(1), 1.0, atol=1e-6)
    # same-size resize is exactly identity (t == 0 -> center tap 1.0)
    ident = resize.cubic_resize_matrix_np(48, 48)
    assert np.allclose(ident, np.eye(48), atol=1e-7)
