import numpy as np
import pytest
import jax

from ideepcolor_tpu.data import color_bins
from ideepcolor_tpu.ops import kmeans


def test_sample_bins_statistics():
    pdf = np.zeros(313, np.float32)
    pdf[[10, 50, 200]] = [0.5, 0.3, 0.2]
    counts = np.asarray(kmeans.sample_bins(pdf, jax.random.key(0), N=25000))
    assert counts.sum() == 25000
    assert abs(counts[10] / 25000 - 0.5) < 0.02
    assert abs(counts[50] / 25000 - 0.3) < 0.02
    assert abs(counts[200] / 25000 - 0.2) < 0.02
    assert counts[[0, 1, 2, 300]].sum() == 0


def test_weighted_kmeans_separated_clusters():
    pts = np.array([[-80.0, -80.0], [-78.0, -78.0],
                    [60.0, 70.0], [62.0, 72.0],
                    [0.0, 0.0]], np.float32)
    w = np.array([500.0, 500.0, 300.0, 300.0, 100.0], np.float32)
    centers, frac = kmeans.weighted_kmeans(pts, w, jax.random.key(1), K=3)
    centers, frac = np.asarray(centers), np.asarray(frac)
    # sorted by occupancy: the (-79,-79) cluster first, then (61,71), then 0
    assert np.allclose(centers[0], [-79, -79], atol=1.0)
    assert np.allclose(centers[1], [61, 71], atol=1.0)
    assert np.allclose(centers[2], [0, 0], atol=1.0)
    assert np.allclose(frac, [1000 / 1700, 600 / 1700, 100 / 1700], atol=1e-5)
    assert frac[0] >= frac[1] >= frac[2]


@pytest.mark.slow
def test_ab_recommendations_close_to_sklearn():
    """End-to-end suggestion chain vs the reference's sklearn pipeline
    (ref data/colorize_image.py:511-543) on the same distribution."""
    bins = color_bins.get_bins()
    rng = np.random.default_rng(5)
    # peaked two-mode distribution over bins
    dist = np.full(313, 1e-6, np.float32)
    dist[40] = 0.45; dist[41] = 0.1; dist[250] = 0.35; dist[251] = 0.1
    dist /= dist.sum()

    got_centers, got_conf = kmeans.ab_recommendations(
        dist, bins.pts_in_hull.astype(np.float32), jax.random.key(2), K=5)
    got_centers = np.asarray(got_centers)

    from sklearn.cluster import KMeans
    cmf = np.cumsum(dist); cmf /= cmf[-1]
    u = rng.uniform(size=25000)
    inds = np.digitize(u, cmf)
    pts = bins.pts_in_hull[inds]
    km = KMeans(n_clusters=5, n_init=10, random_state=0).fit(pts)
    cnt = np.histogram(km.labels_, np.arange(6))[0]
    order = np.argsort(cnt)[::-1]
    want_centers = km.cluster_centers_[order]

    # top-2 clusters (the two modes) must agree well
    for k in range(2):
        assert np.min(np.linalg.norm(want_centers[k] - got_centers[:3],
                                     axis=1)) < 6.0
    # confidences sum to 1
    assert abs(float(np.asarray(got_conf).sum()) - 1.0) < 1e-5


def test_pipeline_suggest_at_peaked_dist():
    """engine.pipeline.suggest_at: gather + sample + kmeans at a pixel."""
    from ideepcolor_tpu.engine import pipeline as P
    import jax.numpy as jnp
    bins = color_bins.get_bins()
    H = W = 8
    dist = np.full((H, W, 313), 1e-9, np.float32)
    dist[3, 4, 120] = 1.0                      # delta at one bin
    dist /= dist.sum(-1, keepdims=True)
    centers, conf = P.suggest_at(
        jnp.asarray(dist), jnp.int32(3), jnp.int32(4),
        jnp.asarray(bins.pts_in_hull, np.float32), jax.random.key(0), K=3)
    centers, conf = np.asarray(centers), np.asarray(conf)
    assert np.allclose(centers[0], bins.pts_in_hull[120], atol=0.5)
    assert conf[0] > 0.99
