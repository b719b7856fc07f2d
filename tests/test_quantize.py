import numpy as np
import pytest

from ideepcolor_tpu.data import color_bins
from ideepcolor_tpu.ops import quantize

RNG = np.random.default_rng(2)


def test_builtin_bins_match_reference_npy():
    import os
    ref_dir = "/root/reference/data/color_bins"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference data not available")
    bins = color_bins.get_bins()
    assert np.array_equal(bins.pts_grid, np.load(f"{ref_dir}/pts_grid.npy"))
    assert np.array_equal(bins.in_hull, np.load(f"{ref_dir}/in_hull.npy"))
    assert np.array_equal(bins.pts_in_hull,
                          np.load(f"{ref_dir}/pts_in_hull.npy"))


def test_bins_shapes():
    bins = color_bins.get_bins()
    assert bins.pts_grid.shape == (529, 2)
    assert bins.in_hull.shape == (529,) and bins.in_hull.sum() == 313
    assert bins.pts_in_hull.shape == (313, 2)
    assert np.array_equal(bins.pts_grid[bins.in_hull], bins.pts_in_hull)


def _sklearn_encode(pts, centers, nn, sigma):
    """Independent oracle reproducing NNEncode.encode_points_mtx_nd."""
    from sklearn.neighbors import NearestNeighbors
    nbrs = NearestNeighbors(n_neighbors=nn).fit(centers)
    dists, inds = nbrs.kneighbors(pts)
    wts = np.exp(-dists**2 / (2 * sigma**2))
    wts = wts / wts.sum(axis=1, keepdims=True)
    enc = np.zeros((pts.shape[0], centers.shape[0]))
    enc[np.arange(pts.shape[0])[:, None], inds] = wts
    return enc


def test_soft_encode_nn1_matches_sklearn():
    bins = color_bins.get_bins()
    pts = RNG.uniform(-100, 100, (500, 2)).astype(np.float32)
    got = np.asarray(quantize.soft_encode(pts, nn=1))
    want = _sklearn_encode(pts, bins.pts_in_hull.astype(np.float64), 1, 5.0)
    assert got.shape == want.shape
    # ties at exact midpoints are measure-zero for random floats
    assert np.array_equal(got, want)


def test_soft_encode_nn5_matches_sklearn():
    bins = color_bins.get_bins()
    pts = RNG.uniform(-100, 100, (200, 2)).astype(np.float32)
    got = np.asarray(quantize.soft_encode(pts, nn=5, sigma=5.0))
    want = _sklearn_encode(pts, bins.pts_in_hull.astype(np.float64), 5, 5.0)
    assert np.max(np.abs(got - want)) < 1e-5


def test_encode_decode_roundtrip():
    bins = color_bins.get_bins()
    # exact bin centers decode back to themselves with nn=1
    pts = bins.pts_in_hull.astype(np.float32)
    dec = np.asarray(quantize.decode(quantize.soft_encode(pts, nn=1)))
    assert np.max(np.abs(dec - pts)) < 1e-4


def test_annealed_mean_limits():
    bins = color_bins.get_bins()
    logits = RNG.normal(size=(4, 4, 313)).astype(np.float32) * 3
    # give every pixel an unambiguous winner so the T->inf limit is exact
    win = RNG.integers(0, 313, (4, 4))
    logits[np.arange(4)[:, None], np.arange(4)[None, :], win] += 10.0
    # T -> large: argmax bin center
    hard = np.asarray(quantize.annealed_mean(logits, 200.0))
    want = bins.pts_in_hull[np.argmax(logits, -1)]
    assert np.max(np.abs(hard - want)) < 0.5
    # T = 1: plain softmax expectation
    soft = np.asarray(quantize.annealed_mean(logits, 1.0))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    assert np.max(np.abs(soft - p @ bins.pts_in_hull)) < 1e-3


def test_scatter_to_grid():
    bins = color_bins.get_bins()
    d = RNG.random((313, 4, 4)).astype(np.float32)
    grid = np.asarray(quantize.scatter_to_grid(d, bins.in_hull))
    assert grid.shape == (23, 23, 4, 4)
    full = grid.reshape(529, 4, 4)
    assert np.array_equal(full[bins.in_hull], d)
    assert np.all(full[~bins.in_hull] == 0)


def test_pts_grid_torch_ordering():
    # matches the torch backend's in-code grid (ref colorize_image.py:213)
    want = np.array(np.meshgrid(np.arange(-110, 120, 10),
                                np.arange(-110, 120, 10))).reshape(2, 529).T
    assert np.array_equal(quantize.make_pts_grid(), want)
