"""Integration tests of the ColorizeImageBase-compatible facade: the
scripted notebook sessions (ref DemoInteractiveColorization.ipynb) and the
getter contract, run headless with randomly initialized weights."""
import os

import numpy as np
import pytest

from ideepcolor_tpu import api
from ideepcolor_tpu.ops.hints import put_point

IMG = "/root/reference/test_imgs/mortar_pestle.jpg"

pytestmark = pytest.mark.skipif(not os.path.exists(IMG),
                                reason="test image unavailable")


def _rand_image(seed=0, h=300, w=400):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def caffe_model():
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    m.load_image(IMG)
    return m


def test_zero_hint_session(caffe_model):
    m = caffe_model
    mask = np.zeros((1, 64, 64))
    input_ab = np.zeros((2, 64, 64))
    out = m.net_forward(input_ab, mask)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    full = m.get_img_fullres()
    assert full.shape == m.img_rgb_fullres.shape and full.dtype == np.uint8
    gray = m.get_img_gray_fullres()
    assert gray.shape == full.shape


def test_put_point_session(caffe_model):
    m = caffe_model
    input_ab = np.zeros((2, 64, 64))
    mask = np.zeros((1, 64, 64))
    put_point(input_ab, mask, [33, 40], 2, [23, -69])
    out1 = m.net_forward(input_ab, mask)
    assert out1 is not None and out1.shape == (64, 64, 3)
    # adding a hint changes the result
    out0 = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert not np.array_equal(out0, out1)
    # all reference getters function and produce full-res-consistent shapes
    assert m.get_input_img().shape == (64, 64, 3)
    assert m.get_input_img_fullres().shape == m.img_rgb_fullres.shape
    assert m.get_img_mask().shape == (64, 64, 3)
    assert m.get_img_mask_fullres().shape == m.img_rgb_fullres.shape
    assert m.get_sup_img().shape == (64, 64, 3)
    assert m.get_sup_fullres().shape == m.img_rgb_fullres.shape
    psnr = m.get_result_PSNR()
    assert np.isfinite(psnr)


def test_forward_without_image_or_net():
    m = api.ColorizeImageJaxCaffe(Xd=64)
    assert m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64))) == -1
    m2 = api.ColorizeImageJaxCaffe(Xd=64)
    m2.prep_net(None)
    assert m2.net_forward(np.zeros((2, 64, 64)),
                          np.zeros((1, 64, 64))) == -1


def test_load_image_large_input_capped(tmp_path):
    import cv2
    p = str(tmp_path / "big.png")
    cv2.imwrite(p, _rand_image(h=260, w=130)[:, :, ::-1])
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.Xfullres_max = 128
    m.prep_net(None)
    m.load_image(p)
    # full-res capped to Xfullres_max on the longer side
    # (ref data/colorize_image.py:161-170)
    assert max(m.img_rgb_fullres.shape[:2]) == 128
    assert m.img_rgb.shape == (64, 64, 3)
    m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert m.get_img_fullres().shape == m.img_rgb_fullres.shape


@pytest.mark.slow
def test_caffe_dist_suggestions():
    m = api.ColorizeImageJaxCaffeDist(Xd=64)
    m.prep_net(None, S=0.2)
    assert float(m.params["scale_S.scale"]) == pytest.approx(0.2)
    m.set_image(_rand_image(1, 64, 64))
    out = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert out.shape == (64, 64, 3)
    assert m.dist_ab.shape == (313, 64, 64)
    assert m.dist_ab_full.shape == (529, 64, 64)
    assert m.dist_ab_grid.shape == (23, 23, 64, 64)
    # distributions are normalized per pixel
    assert np.allclose(m.dist_ab.sum(0), 1.0, atol=1e-4)
    centers, conf = m.get_ab_reccs(10, 12, K=5, N=5000, return_conf=True)
    assert centers.shape == (5, 2) and conf.shape == (5,)
    assert conf[0] >= conf[-1] >= 0
    m.compute_entropy()
    assert m.dist_entropy.shape == (64, 64)


@pytest.mark.slow
def test_torch_dist_backend():
    m = api.ColorizeImageJaxDist(Xd=64, maskcent=True)
    m.prep_net(path='')
    m.set_image(_rand_image(2, 64, 64))
    ret = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    # reference dist backend returns the raw double-scaled regression
    assert ret.shape == (2, 64, 64)
    assert np.abs(ret).max() <= 110 * 110
    assert m.dist_ab.shape == (529, 64, 64)
    centers = m.get_ab_reccs(5, 5, K=3, N=2000)
    assert centers.shape == (3, 2)


def test_glob_dist_backend():
    m = api.ColorizeImageJaxCaffeGlobDist(Xd=64)
    m.prep_net(None)
    m.set_image(_rand_image(3, 64, 64))
    out_auto = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    rng = np.random.default_rng(4)
    hist = rng.dirichlet(np.ones(313))
    out_hist = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)),
                             hist)
    assert out_auto.shape == out_hist.shape == (64, 64, 3)
    assert not np.array_equal(out_auto, out_hist)


def test_siggraph_backend_roundtrip():
    m = api.ColorizeImageJax(Xd=64)
    m.prep_net(path='')
    m.set_image(_rand_image(5, 64, 64))
    out = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert m.output_ab.shape == (2, 64, 64)


def test_reference_alias_names():
    assert api.ColorizeImageTorch is api.ColorizeImageJax
    assert api.ColorizeImageCaffe is api.ColorizeImageJaxCaffe
    assert api.ColorizeImageCaffeDist is api.ColorizeImageJaxCaffeDist


def test_global_histogram_transfer_end_to_end():
    """The DemoGlobalHistogramTransfer flow: extract a reference image's
    histogram with global_stats, feed it to the global net."""
    from ideepcolor_tpu.models import global_stats
    ref_dir = "/root/reference/test_imgs/global_ref_bird"
    files = sorted(os.listdir(ref_dir)) if os.path.isdir(ref_dir) else []
    if not files:
        pytest.skip("no reference images")
    import cv2
    im = cv2.cvtColor(cv2.imread(os.path.join(ref_dir, files[0]), 1),
                      cv2.COLOR_BGR2RGB)
    im = cv2.resize(im, (64, 64))
    stats = global_stats.extract(im.astype(np.float32) / 255.0)
    glob = np.asarray(stats["glob_ab_313"])
    assert abs(glob.sum() - 1) < 1e-4

    m = api.ColorizeImageJaxCaffeGlobDist(Xd=64)
    m.prep_net(None)
    m.load_image(IMG)
    out = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)), glob)
    assert out.shape == (64, 64, 3)


def test_table_path_matches_dense_path():
    """net_forward_table (device-side rasterize, 1.8KB upload) must produce
    the same frame as the dense net_forward path."""
    import jax.numpy as jnp
    from ideepcolor_tpu.ops import hints as oh
    rng = np.random.default_rng(6)
    for cls in (api.ColorizeImageJax, api.ColorizeImageJaxCaffe):
        m = cls(Xd=64)
        if cls is api.ColorizeImageJax:
            m.prep_net(path='')
        else:
            m.prep_net(None)
        m.set_image(_rand_image(7, 64, 64))
        boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
        vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
        boxes[0] = [20, 20, 24, 24]; vals[0] = [35.0, -25.0]
        boxes[1] = [40, 10, 42, 12]; vals[1] = [-15.0, 55.0]
        out_tbl = m.net_forward_table(boxes, vals, 2)
        assert out_tbl.shape == (64, 64, 3)
        # dense reference path with identical rasterization
        ab = np.zeros((2, 64, 64), np.float32)
        mask = np.zeros((1, 64, 64), np.float32)
        for (y1, x1, y2, x2), v in zip(boxes[:2], vals[:2]):
            ab[:, y1:y2 + 1, x1:x2 + 1] = v[:, None, None]
            mask[:, y1:y2 + 1, x1:x2 + 1] = 1
        out_dense = m.net_forward(ab, mask)
        assert np.array_equal(out_tbl, out_dense), cls.__name__
        # hint mirrors were rebuilt for the getters
        assert m.input_mask.sum() == mask.sum()


def test_table_path_unavailable_on_dist_backend():
    m = api.ColorizeImageJaxDist(Xd=64)
    m.prep_net(path='')
    m.set_image(_rand_image(8, 64, 64))
    boxes = np.zeros((64, 4), np.int32)
    vals = np.zeros((64, 2), np.float32)
    assert m.net_forward_table(boxes, vals, 0) == -1


def test_net_forward_validates_shapes(caffe_model):
    with pytest.raises(ValueError, match="channel-first"):
        caffe_model.net_forward(np.zeros((64, 64, 2)), np.zeros((1, 64, 64)))
    with pytest.raises(ValueError, match="input_mask"):
        caffe_model.net_forward(np.zeros((2, 64, 64)), np.zeros((64, 64)))


def test_net_forward_fullres_matches_two_step(caffe_model):
    m = caffe_model
    ab = np.zeros((2, 64, 64)); mask = np.zeros((1, 64, 64))
    ab[:, 30:33, 30:33] = np.array([40.0, -20.0])[:, None, None]
    mask[:, 30:33, 30:33] = 1
    full = m.net_forward_fullres(ab, mask)
    out256 = m.output_rgb          # net-res frame materializes lazily
    want256 = m.net_forward(ab, mask)
    want_full = m.get_img_fullres()
    assert np.array_equal(out256, want256)
    assert np.array_equal(full, want_full)

    s = api.ColorizeImageJax(Xd=64)
    s.prep_net(path='')
    s.set_image(_rand_image(9, 64, 64))
    f = s.net_forward_fullres(ab, mask)
    assert s.get_img_forward().shape == (64, 64, 3)
    assert f.shape == (64, 64, 3)

    # dist backends don't expose the single-output click program
    d = api.ColorizeImageJaxDist(Xd=64)
    d.prep_net(path='')
    d.set_image(_rand_image(10, 64, 64))
    assert d.net_forward_fullres(ab, mask) == -1


def test_net_forward_fullres_async_is_self_contained(caffe_model):
    """The async form returns a closure that (a) yields the same frame
    as the sync call and (b) survives the model's per-image state being
    clobbered by a later load (a serving caller blocks on it after
    releasing its device lock, by which time another request may have
    loaded a new image)."""
    m = caffe_model
    ab = np.zeros((2, 64, 64)); mask = np.zeros((1, 64, 64))
    ab[:, 10:13, 40:43] = np.array([25.0, 30.0])[:, None, None]
    mask[:, 10:13, 40:43] = 1
    img_a = _rand_image(21, 90, 120)
    m.load_image_array(img_a)
    want = m.net_forward_fullres(ab, mask)
    m.load_image_array(img_a)
    finish = m.net_forward_fullres_async(ab, mask)
    assert callable(finish)
    # clobber per-image state (different resolution too) before reading
    m.load_image_array(_rand_image(22, 70, 60))
    m.net_forward(ab, mask)
    got = finish()
    assert np.array_equal(got, want)

    # fullres getter's async form matches its sync form
    m.load_image_array(img_a)
    m.net_forward(ab, mask)
    want_full = m.get_img_fullres()
    fin2 = m.get_img_fullres_async()
    m.load_image_array(_rand_image(23, 50, 80))
    m.net_forward(ab, mask)
    assert np.array_equal(fin2(), want_full)

    # sentinel parity: unset image -> -1, not a closure
    d = api.ColorizeImageJax(Xd=64)
    d.prep_net(path='')
    assert d.net_forward_fullres_async(ab, mask) == -1


@pytest.mark.slow
def test_alternate_resolution_xd128():
    """No hidden Xd=256 hardcoding: full API pass at Xd=128 (both model
    families, dist suggestion chain at Xd/4, full-res getters)."""
    rng = np.random.default_rng(11)
    img = (rng.random((200, 160, 3)) * 255).astype(np.uint8)
    import cv2

    m = api.ColorizeImageJaxCaffe(Xd=128)
    m.prep_net(None)
    m.set_image(cv2.resize(img, (128, 128)))
    out = m.net_forward(np.zeros((2, 128, 128)), np.zeros((1, 128, 128)))
    assert out.shape == (128, 128, 3)
    assert m.get_img_fullres().shape == (128, 128, 3)

    d = api.ColorizeImageJaxDist(Xd=128)
    d.prep_net(path='')
    d.set_image(cv2.resize(img, (128, 128)))
    d.net_forward(np.zeros((2, 128, 128)), np.zeros((1, 128, 128)))
    assert d.dist_ab.shape == (529, 128, 128)
    c = d.get_ab_reccs(100, 30, K=4, N=2000)
    assert c.shape == (4, 2)
    d.compute_entropy()
    assert d.dist_entropy.shape == (128, 128)


def test_sequential_images_different_resolutions():
    """Loading a new image with a different full-res shape must refresh
    all device-side state (bucketed matrices, L planes)."""
    import cv2
    rng = np.random.default_rng(13)
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    ab = np.zeros((2, 64, 64)); mask = np.zeros((1, 64, 64))
    for h, w in ((150, 200), (310, 170), (64, 64)):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        m.set_image(cv2.resize(img, (64, 64))) if (h, w) == (64, 64) else None
        if (h, w) != (64, 64):
            # go through load_image for full-res handling
            import tempfile, os
            fd, p = tempfile.mkstemp(suffix=".png")
            os.close(fd)
            cv2.imwrite(p, img[:, :, ::-1])
            m.load_image(p)
            os.unlink(p)
        out = m.net_forward(ab, mask)
        assert out.shape == (64, 64, 3)
        full = m.get_img_fullres()
        assert full.shape == m.img_rgb_fullres.shape
        assert m.get_input_img_fullres().shape == full.shape


def test_table_win_click_matches_separate_paths():
    """The fused click+window program must match net_forward_table plus a
    separate bucketed window fusion."""
    import jax.numpy as jnp
    from ideepcolor_tpu.engine import pipeline as P
    from ideepcolor_tpu.ops import hints as oh
    from ideepcolor_tpu.ops.resize import linear_resize_matrix_np
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    m.set_image(_rand_image(15, 64, 64))
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [20, 20, 24, 24]; vals[0] = [35.0, -25.0]

    win_h, win_w = 100, 120
    hb, wb = 128, 128
    rng = np.random.default_rng(16)
    l_win = rng.uniform(0, 100, (win_h, win_w)).astype(np.float32)
    l_pad = np.zeros((hb, wb, 1), np.float32)
    l_pad[:win_h, :win_w, 0] = l_win
    rh = jnp.asarray(linear_resize_matrix_np(64, win_h, hb))
    rw = jnp.asarray(linear_resize_matrix_np(64, win_w, wb))

    win = m.net_forward_table_win(boxes, vals, 1,
                                  jnp.asarray(l_pad), rh, rw)
    # net-res frame stays device-resident; output_rgb materializes lazily
    frame = m.output_rgb
    frame_ref = m.net_forward_table(boxes, vals, 1)
    assert np.array_equal(frame, frame_ref)
    want_win = np.asarray(P.fullres_fuse_bucketed(
        jnp.asarray(l_pad), m._dev_output_ab, rh, rw))
    assert np.array_equal(win, want_win)
    assert win.shape == (hb, wb, 3)


@pytest.mark.slow
def test_prep_net_bfloat16_serving_mode():
    """dtype='bfloat16' casts the weights for the fast MXU serving mode;
    frames stay within a few uint8 LSB of the f32 path."""
    import jax.numpy as jnp
    ab = np.zeros((2, 64, 64)); mask = np.zeros((1, 64, 64))
    ab[:, 30:33, 30:33] = np.array([40.0, -20.0])[:, None, None]
    mask[:, 30:33, 30:33] = 1
    img = _rand_image(31, 64, 64)

    outs = {}
    for dt in (None, "bfloat16"):
        m = api.ColorizeImageJax(Xd=64)
        m.prep_net(path='', dtype=dt)
        m.set_image(img)
        outs[dt] = m.net_forward(ab, mask)
    assert outs["bfloat16"].dtype == np.uint8
    diff = np.abs(outs[None].astype(int) - outs["bfloat16"].astype(int))
    assert diff.mean() < 3.0

    d = api.ColorizeImageJaxDist(Xd=64)
    d.prep_net(path='', dtype="bfloat16")
    d.set_image(img)
    assert d.net_forward(ab, mask).shape == (2, 64, 64)

    c = api.ColorizeImageJaxCaffeDist(Xd=64)
    c.prep_net(None, dtype="bfloat16")
    assert c.params["bw_conv1_1.weight"].dtype == jnp.bfloat16
    # the injected softmax temperature stays f32
    assert c.params["scale_S.scale"].dtype == jnp.float32
    c.set_image(img)
    out = c.net_forward(ab, mask)
    assert not np.isscalar(out)


@pytest.mark.slow
def test_net_forward_fullres_sentinel_on_multi_output_backends():
    """Backends whose click programs don't fit the (rgb, ab) contract must
    return -1 from net_forward_fullres, not crash (serving checks
    isinstance(result, int)). The glob backend has its OWN fused
    histogram-aware fullres and must return a frame consistent with
    net_forward + get_img_fullres."""
    ab = np.zeros((2, 64, 64)); mask = np.zeros((1, 64, 64))
    m = api.ColorizeImageJaxCaffeDist(Xd=64)
    m.prep_net(None)
    m.set_image(_rand_image(19, 64, 64))
    assert m.net_forward_fullres(ab, mask) == -1

    g = api.ColorizeImageJaxCaffeGlobDist(Xd=64)
    g.prep_net(None)
    g.set_image(_rand_image(19, 64, 64))
    hist = np.zeros(313); hist[[3, 80]] = 0.5
    full = g.net_forward_fullres(ab, mask, hist)
    assert not np.isscalar(full)
    g2 = api.ColorizeImageJaxCaffeGlobDist(Xd=64)
    g2.prep_net(None)
    g2.set_image(_rand_image(19, 64, 64))
    g2.net_forward(ab, mask, hist)
    np.testing.assert_array_equal(full, g2.get_img_fullres())


@pytest.mark.parametrize("cls", ["ColorizeImageJaxDist",
                                 "ColorizeImageJaxCaffeDist"])
@pytest.mark.slow
def test_predict_dist_table_matches_dense(cls):
    """The GUI's fast suggestion forward (hint table, no readback) must
    produce the same distribution as the dense net_forward path."""
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    m = getattr(api, cls)(Xd=64)
    m.prep_net(None)
    m.load_image(IMG)
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 12, 14, 16]; vals[0] = [35.0, -52.0]
    boxes[1] = [40, 40, 43, 43]; vals[1] = [-18.0, 61.0]
    assert m.predict_dist_table(boxes, vals, 2) == 0
    dist_fast = np.asarray(m._dev_dist).copy()
    reccs_fast = m.get_ab_reccs(h=20, w=20, K=5)
    ab_np, mask_np = host.rasterize_hints(boxes, vals, 2, 64)
    m.net_forward(ab_np.transpose(2, 0, 1), mask_np.transpose(2, 0, 1))
    np.testing.assert_allclose(dist_fast, np.asarray(m._dev_dist),
                               rtol=0, atol=1e-6)
    assert reccs_fast.shape == (5, 2)


def test_predict_dist_table_without_image():
    m = api.ColorizeImageJaxDist(Xd=64)
    m.prep_net(None)
    assert m.predict_dist_table(np.zeros((64, 4), np.int32),
                                np.zeros((64, 2), np.float32), 0) == -1


@pytest.mark.slow
def test_suggest_table_matches_unfused_chain():
    """The ONE-dispatch serving suggest (suggest_table) must reproduce
    the unfused chain: predict_dist_table -> get_ab_reccs -> host-L
    palette conversion (conf exactly, colors within 1 uint8 LSB — the
    pixel L comes from the device plane instead of the host converter).
    Covers both dist backends (map_div 4 and 1)."""
    from ideepcolor_tpu.api.colorize import lab2rgb_transpose
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ops import hints as oh
    for cls in (api.ColorizeImageJaxDist, api.ColorizeImageJaxCaffeDist):
        m1 = cls(Xd=64)
        m2 = cls(Xd=64)
        if cls is api.ColorizeImageJaxDist:
            m1.prep_net(path='')
            m2.prep_net(path='')
        else:
            m1.prep_net(None)
            m2.prep_net(None)
        img = _rand_image(31, 64, 64)
        m1.set_image(img)
        m2.set_image(img)
        boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
        vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
        boxes[0] = [20, 20, 23, 23]
        vals[0] = [35.0, -25.0]
        h = w = 33
        K = 5
        # unfused serve chain (the pre-fusion serving flow)
        assert m1.predict_dist_table(boxes, vals, 1) == 0
        centers, conf1 = m1.get_ab_reccs(h, w, K=K, return_conf=True)
        L = float(host.rgb2lab(
            img[h, w][None, None].astype(np.float32) / 255.0)[0, 0, 0])
        lab = np.concatenate(
            [np.full((K, 1), L, np.float32),
             np.asarray(centers, np.float32)], axis=1).T[:, :, None]
        colors1 = lab2rgb_transpose(lab[:1], lab[1:]).reshape(K, 3)
        # fused path (same rng seed -> same CMF sample -> same centers)
        colors2, conf2 = m2.suggest_table(boxes, vals, 1, h, w, K=K)
        assert colors2.shape == (K, 3) and conf2.shape == (K,)
        assert np.allclose(conf1, conf2, atol=1e-5)
        assert np.max(np.abs(colors1.astype(int)
                             - colors2.astype(int))) <= 1
        # the distribution map stays device-resident for later use
        centers3 = m2.get_ab_reccs(h, w, K=K)
        assert np.asarray(centers3).shape == (K, 2)
        if cls is api.ColorizeImageJaxCaffeDist:
            # the scattered 529-grid cache must reflect the fused
            # forward (suggest_table as FIRST dist call must not leave
            # it unset, and it must not serve a stale earlier map)
            assert np.allclose(m1.dist_ab_full, m2.dist_ab_full,
                               atol=1e-5)
    # sentinel parity
    fresh = api.ColorizeImageJaxDist(Xd=64)
    fresh.prep_net(path='')
    assert fresh.suggest_table(boxes, vals, 1, h, w, K=K) == -1


@pytest.mark.slow
def test_suggest_program_cache_validated_and_bounded():
    """Each distinct (K, N) suggest program is a FULL dist-forward
    compile, and serve exposes k to clients — so out-of-range values
    must raise (serve maps to HTTP 400), the cache must stay bounded
    under a k sweep, and the AOT-compiled path (built outside a
    server's device lock) must agree with the jit path."""
    import pytest
    from ideepcolor_tpu.ops import hints as oh
    m = api.ColorizeImageJaxDist(Xd=64)
    m.prep_net(path='')
    for bad_k in (0, -3, m.MAX_SUGGEST_K + 1, 10**6):
        with pytest.raises(ValueError):
            m.ensure_suggest_program(K=bad_k)
    for bad_n in (0, 999, m.MAX_SUGGEST_N + 1):
        with pytest.raises(ValueError):
            m.ensure_suggest_program(K=5, N=bad_n)
    # bounded under a sweep (program BUILD only — nothing compiles
    # until dispatch, so this is cheap)
    for k in range(1, m._SUGGEST_CACHE_MAX + 5):
        m.ensure_suggest_program(K=k)
    assert len(m._suggest_tbl_cache) == m._SUGGEST_CACHE_MAX

    # AOT path: compile_now populates the entry without any dispatch,
    # and the compiled executable returns the same palette as the jit
    m.set_image(_rand_image(7, 64, 64))
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 10, 13, 13]
    vals[0] = [20.0, 30.0]
    entry = m.ensure_suggest_program(K=4, compile_now=True)
    colors_aot, conf_aot = m.suggest_table(boxes, vals, 1, 22, 22, K=4)
    m2 = api.ColorizeImageJaxDist(Xd=64)
    m2.prep_net(path='')
    m2.set_image(_rand_image(7, 64, 64))
    m2.ensure_suggest_program(K=4)       # jit-only entry
    colors_jit, conf_jit = m2.suggest_table(boxes, vals, 1, 22, 22, K=4)
    if entry.get("compiled") is not None:      # AOT supported here
        assert np.array_equal(colors_aot, colors_jit)
        assert np.allclose(conf_aot, conf_jit, atol=1e-6)


def test_table_win_host_compose_matches_device():
    """net_forward_table_win_host (net-frame readback + native host
    window compose) must match the device-window program within 1 uint8
    LSB (f32 device matmul vs host BLAS rounding), and byte-match on the
    overwhelming majority of pixels."""
    import jax.numpy as jnp
    from ideepcolor_tpu.ops import hints as oh
    from ideepcolor_tpu.ops.resize import cubic_resize_matrix_np
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    m.set_image(_rand_image(15, 64, 64))
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [20, 20, 24, 24]; vals[0] = [35.0, -25.0]

    win_h, win_w = 100, 120
    hb, wb = 128, 128
    rng = np.random.default_rng(16)
    l_pad = np.zeros((hb, wb, 1), np.float32)
    l_pad[:win_h, :win_w, 0] = rng.uniform(0, 100, (win_h, win_w))
    rh = cubic_resize_matrix_np(64, win_h, hb)
    rw = cubic_resize_matrix_np(64, win_w, wb)

    dev = m.net_forward_table_win(boxes, vals, 1, jnp.asarray(l_pad),
                                  jnp.asarray(rh), jnp.asarray(rw))
    host = m.net_forward_table_win_host(boxes, vals, 1, l_pad, rh, rw)
    assert host.shape == dev.shape and host.dtype == np.uint8
    diff = np.abs(host.astype(int) - np.asarray(dev).astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02
    # and the net frame matches the plain table click exactly
    frame_ref = m.net_forward_table(boxes, vals, 1)
    assert np.array_equal(m.output_rgb, frame_ref)


@pytest.mark.slow
def test_table_suggest_host_matches_win_suggest():
    """The host-window dist click must return the same palette as the
    fused device-window variant (same program inputs/rng handling) and a
    window frame within 1 LSB of the device compose."""
    import jax.numpy as jnp
    from ideepcolor_tpu.ops import hints as oh
    from ideepcolor_tpu.ops.resize import cubic_resize_matrix_np
    img = _rand_image(23, 64, 64)
    m = api.ColorizeImageJaxCaffe(Xd=64)
    m.prep_net(None)
    m.set_image(img)
    d = api.ColorizeImageJaxCaffeDist(Xd=64)
    d.prep_net(None)
    d.set_image(img)
    boxes = np.zeros((oh.MAX_HINTS, 4), np.int32)
    vals = np.zeros((oh.MAX_HINTS, 2), np.float32)
    boxes[0] = [30, 30, 34, 34]; vals[0] = [20.0, 20.0]
    d.predict_dist_table(boxes, vals, 0)
    m.net_forward_table(boxes, vals, 1)      # previous frame for row 0

    hb = wb = 128
    l_pad = np.zeros((hb, wb, 1), np.float32)
    l_pad[:100, :120, 0] = 55.0
    rh = cubic_resize_matrix_np(64, 100, hb)
    rw = cubic_resize_matrix_np(64, 120, wb)

    import copy
    d2 = copy.copy(d)
    d2._rng_key = d._rng_key          # identical sampling key sequence
    dev = m.net_forward_table_win_suggest(
        boxes, vals, 1, jnp.asarray(l_pad), jnp.asarray(rh),
        jnp.asarray(rw), d, 30, 30, K=5)
    assert not (np.isscalar(dev) and dev == -1)
    win_dev, colors_dev = dev
    # reset the previous-frame state the first call consumed
    m.net_forward_table(boxes, vals, 1)
    host = m.net_forward_table_suggest_host(
        boxes, vals, 1, l_pad, rh, rw, d2, 30, 30, K=5)
    assert not (np.isscalar(host) and host == -1)
    win_host, colors_host = host
    diff = np.abs(win_host.astype(int) - np.asarray(win_dev).astype(int))
    assert diff.max() <= 1
    assert colors_host.shape == colors_dev.shape == (6, 3)
    # same rng key + same device chain; the host variant's palette rides
    # the packed frame row as uint8, so rows agree to the 1/255 step
    assert np.allclose(colors_host, colors_dev, atol=1.01 / 255)


# ---- abq transport click (r5): u8-ab payload + host compose ----

def _abq_cm(Xd=64):
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    m = api.ColorizeImageJax(Xd=Xd)
    m.prep_net(path='')
    rng = np.random.default_rng(11)
    m.set_image((rng.random((Xd, Xd, 3)) * 255).astype(np.uint8))
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)
    boxes[0] = [10, 10, 14, 14]
    vals[0] = [30.0, -40.0]
    return m, boxes, vals


def test_table_click_abq_matches_device_frame():
    """Full-res abq: the host-composed frame differs from the device
    compose only by the ab quantization step (<= a few uint8 LSB even
    under random weights), and output_ab stays the requantized-from-
    frame quirk."""
    m, boxes, vals = _abq_cm()
    dev = m.net_forward_table(boxes, vals, 1)
    dev_ab = m.output_ab.copy()
    out = m.net_forward_table_abq(boxes, vals, 1)
    assert out.shape == dev.shape and out.dtype == np.uint8
    d = np.abs(dev.astype(int) - out.astype(int))
    assert d.max() <= 4, d.max()
    mse = float(np.mean(d.astype(np.float64) ** 2))
    assert 20 * np.log10(255 / np.sqrt(max(mse, 1e-9))) > 45
    # requantized output_ab: derived from the (host) frame, so it stays
    # within the uint8-requantization granularity of the device path's
    assert np.abs(m.output_ab - dev_ab).max() < 2.5
    # the lazy device mirror feeds full-res fusion without error
    full_abq = m.get_img_fullres()
    m.net_forward_table(boxes, vals, 1)
    full_dev = m.get_img_fullres()
    assert np.abs(full_abq.astype(int) - full_dev.astype(int)).max() <= 6


def test_table_click_abq_half_mechanics_and_smooth_roundtrip():
    """half=True returns a frame at NET res composed from the 2x
    chroma-subsampled payload. Random-weight predictions are
    high-frequency (worst case), so numeric quality is asserted on the
    compose helper with a smooth field instead — the real-weights delta
    is recorded per bench run (abq_half_*)."""
    m, boxes, vals = _abq_cm()
    out = m.net_forward_table_abq(boxes, vals, 1, half=True)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    out2 = m.net_forward_table_abq(boxes, vals, 1, half=True)
    assert np.array_equal(out, out2)          # deterministic

    from ideepcolor_tpu.api.colorize import compose_net_abq_host
    from ideepcolor_tpu.engine.pipeline import AB_CLIP, AB_Q_SCALE
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    a = 40 * np.sin(yy / 17.0)                # smooth chroma field
    b = 30 * np.cos(xx / 13.0)
    l = np.full((64, 64), 60.0, np.float32)

    def q(x):
        return np.round((np.clip(x, -AB_CLIP, AB_CLIP) + AB_CLIP)
                        * AB_Q_SCALE).astype(np.uint8)

    full = compose_net_abq_host(l, np.stack([q(a), q(b)], -1))
    ah = a.reshape(32, 2, 32, 2).mean((1, 3))
    bh = b.reshape(32, 2, 32, 2).mean((1, 3))
    half = compose_net_abq_host(l, np.stack([q(ah), q(bh)], -1),
                                half=True)
    d = np.abs(full.astype(int) - half.astype(int))
    mse = float(np.mean(d.astype(np.float64) ** 2))
    assert 20 * np.log10(255 / np.sqrt(max(mse, 1e-9))) > 40, d.max()


def test_win_host_click_modes_agree(monkeypatch):
    """The win-host click's default abq branch must track the rgb-mode
    window within the quantization tolerance, and IDEEPCOLOR_NET_CLICK=
    rgb must restore the exact legacy path."""
    from ideepcolor_tpu.api.colorize import compose_window_host
    from ideepcolor_tpu.ops.resize import cubic_resize_matrix_np
    m, boxes, vals = _abq_cm()
    hb = wb = 128
    l_pad = np.zeros((hb, wb, 1), np.float32)
    l_pad[:100, :120, 0] = 55.0
    rh = cubic_resize_matrix_np(64, 100, hb)
    rw = cubic_resize_matrix_np(64, 120, wb)

    monkeypatch.setenv("IDEEPCOLOR_NET_CLICK", "rgb")
    win_rgb = m.net_forward_table_win_host(boxes, vals, 1, l_pad, rh, rw)
    ref = compose_window_host(m.net_forward_table(boxes, vals, 1),
                              l_pad, rh, rw)
    assert np.array_equal(win_rgb, ref)       # exact legacy path

    monkeypatch.setenv("IDEEPCOLOR_NET_CLICK", "abq")
    win_abq = m.net_forward_table_win_host(boxes, vals, 1, l_pad, rh, rw)
    assert win_abq.shape == win_rgb.shape
    d = np.abs(win_abq.astype(int) - win_rgb.astype(int))
    assert d.max() <= 8, d.max()              # zoomed quantization step


def test_abq_sentinels():
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    m = api.ColorizeImageJax(Xd=64)
    assert m.net_forward_table_abq(
        np.zeros((MAX_HINTS, 4), np.int32),
        np.zeros((MAX_HINTS, 2), np.float32), 0) == -1   # no net/img


def test_abq_host_l_cache_invalidates_on_new_image():
    """The abq compose's cached L plane must follow image loads (the
    'stale state closed over by a click path' bug class, CLAUDE.md
    invariants): clicking after set_image must compose with the NEW
    image's L."""
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    m = api.ColorizeImageJax(Xd=64)
    m.prep_net(path='')
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    vals = np.zeros((MAX_HINTS, 2), np.float32)

    dark = np.full((64, 64, 3), 20, np.uint8)
    light = np.full((64, 64, 3), 235, np.uint8)
    m.set_image(dark)
    f_dark = m.net_forward_table_abq(boxes, vals, 0).copy()
    assert m._host_l_net().mean() < 30
    m.set_image(light)
    f_light = m.net_forward_table_abq(boxes, vals, 0)
    assert m._host_l_net().mean() > 80          # cache followed the image
    assert f_light.mean() > f_dark.mean() + 100  # frame uses the new L
