import numpy as np

import jax.numpy as jnp

from ideepcolor_tpu.ops import resize
from ideepcolor_tpu.ops.pallas import colorspace_kernel as ck
from ideepcolor_tpu.ops import colorspace as cs

RNG = np.random.default_rng(9)


def test_matmul_resize_matches_gather_resize():
    x = RNG.random((32, 24, 2)).astype(np.float32)
    out_m = np.asarray(resize.zoom_to_matmul(x, (113, 97)))
    out_g = np.asarray(resize.zoom_to(x, (113, 97), order=1,
                                      h_axis=0, w_axis=1))
    assert out_m.shape == (113, 97, 2)
    assert np.max(np.abs(out_m - out_g)) < 1e-4


def test_matmul_resize_batched():
    x = RNG.random((3, 16, 16, 2)).astype(np.float32)
    out = np.asarray(resize.zoom_to_matmul(x, (64, 48)))
    assert out.shape == (3, 64, 48, 2)
    one = np.asarray(resize.zoom_to_matmul(x[1], (64, 48)))
    assert np.allclose(out[1], one, atol=1e-5)


def test_pallas_compose_matches_jnp():
    H, W = 100, 128
    l = RNG.uniform(0, 100, (H, W, 1)).astype(np.float32)
    ab = RNG.uniform(-80, 80, (H, W, 2)).astype(np.float32)
    got = np.asarray(ck.compose_frame_u8(jnp.asarray(l), jnp.asarray(ab),
                                         tile=32))
    want = np.asarray(cs.lab_to_rgb_u8(jnp.concatenate([l, ab], -1)))
    assert got.shape == want.shape == (H, W, 3)
    assert got.dtype == np.uint8
    # interpret/compiled paths may differ by 1 ulp at clip boundaries
    assert np.mean(got.astype(int) != want.astype(int)) < 1e-3
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_pallas_compose_tiny_image():
    l = RNG.uniform(0, 100, (5, 7, 1)).astype(np.float32)
    ab = RNG.uniform(-40, 40, (5, 7, 2)).astype(np.float32)
    got = np.asarray(ck.compose_frame_u8(jnp.asarray(l), jnp.asarray(ab)))
    want = np.asarray(cs.lab_to_rgb_u8(jnp.concatenate([l, ab], -1)))
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_pallas_rasterizer_matches_jnp():
    from ideepcolor_tpu.ops.pallas import hints_kernel as hk
    from ideepcolor_tpu.ops import hints
    rng = np.random.default_rng(21)
    boxes = np.zeros((hints.MAX_HINTS, 4), np.int32)
    vals = np.zeros((hints.MAX_HINTS, 2), np.float32)
    n = 9
    for i in range(n):
        y, x = rng.integers(0, 250, 2)
        w = rng.integers(0, 7)
        boxes[i] = [y - w, x - w, y + w, x + w]
        vals[i] = rng.uniform(-90, 90, 2)
    ab_p, m_p = hk.rasterize_hints_pallas(
        jnp.asarray(boxes), jnp.asarray(vals), jnp.int32(n), size=256)
    ab_j, m_j = hints.rasterize_hints(
        jnp.asarray(boxes), jnp.asarray(vals), jnp.int32(n), size=256)
    assert np.array_equal(np.asarray(m_p), np.asarray(m_j))
    assert np.array_equal(np.asarray(ab_p), np.asarray(ab_j))


def test_pallas_rasterizer_empty_and_overlap():
    from ideepcolor_tpu.ops.pallas import hints_kernel as hk
    boxes = np.zeros((64, 4), np.int32)
    vals = np.zeros((64, 2), np.float32)
    ab, m = hk.rasterize_hints_pallas(jnp.asarray(boxes), jnp.asarray(vals),
                                      jnp.int32(0), size=64, tile=32)
    assert np.asarray(m).sum() == 0
    boxes[0] = [10, 10, 20, 20]; vals[0] = [5, -5]
    boxes[1] = [15, 15, 25, 25]; vals[1] = [-30, 40]
    ab, m = hk.rasterize_hints_pallas(jnp.asarray(boxes), jnp.asarray(vals),
                                      jnp.int32(2), size=64, tile=32)
    ab = np.asarray(ab)
    assert np.allclose(ab[12, 12], [5, -5])
    assert np.allclose(ab[18, 18], [-30, 40])     # later hint wins
