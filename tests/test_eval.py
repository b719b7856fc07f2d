"""Evaluation harness: fixed-count hint reveal + PSNR-vs-hints CLI."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ideepcolor_tpu.train import hints_sim


def test_reveal_hints_fixed_count_monotone_and_values():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(np.full((2, 32, 32, 2), 17.0, np.float32))
    key = jax.random.key(1)
    ab0, m0 = hints_sim.reveal_hints_fixed(key, gt, jnp.int32(0))
    assert float(np.asarray(m0).sum()) == 0.0
    assert float(np.abs(np.asarray(ab0)).sum()) == 0.0
    ab1, m1 = hints_sim.reveal_hints_fixed(key, gt, jnp.int32(1))
    ab8, m8 = hints_sim.reveal_hints_fixed(key, gt, jnp.int32(8))
    a1, a8 = np.asarray(m1), np.asarray(m8)
    assert a1.sum() > 0
    # same key: more hints strictly grow the revealed area (supersets)
    assert np.all(a8 >= a1) and a8.sum() > a1.sum()
    # constant gt -> revealed values are exactly the constant
    ab8 = np.asarray(ab8)
    assert np.allclose(ab8[a8[..., 0] == 1], 17.0, atol=1e-5)
    assert np.all(ab8[a8[..., 0] == 0] == 0)
    # patch half=2 -> the single-hint mask is a (<=5)^2 square
    assert 1 <= a1.sum() / 2 <= 25  # per image


def test_reveal_hints_fixed_traced_count_single_program():
    gt = jnp.zeros((1, 16, 16, 2))
    sizes = {hints_sim.reveal_hints_fixed._cache_size()
             if hasattr(hints_sim.reveal_hints_fixed, "_cache_size")
             else 0}
    for k in (0, 2, 5):
        hints_sim.reveal_hints_fixed(jax.random.key(0), gt, jnp.int32(k))
    # count is traced: the sweep shares one executable
    if hasattr(hints_sim.reveal_hints_fixed, "_cache_size"):
        assert hints_sim.reveal_hints_fixed._cache_size() - min(sizes) <= 1


def test_evaluate_curve_and_determinism():
    from ideepcolor_tpu.apps import eval as eval_cli
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    rng = np.random.default_rng(2)
    images = rng.random((3, 32, 32, 3)).astype(np.float32)
    c1 = eval_cli.evaluate(params, images, [0, 4], batch=2, seed=5)
    c2 = eval_cli.evaluate(params, images, [0, 4], batch=2, seed=5)
    assert c1 == c2
    assert set(c1) == {0, 4}
    assert all(np.isfinite(v) and 3 < v < 60 for v in c1.values())


def test_eval_cli_smoke(tmp_path):
    import shutil
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        shutil.copy(src, data / f"im{i}.jpg")
    from ideepcolor_tpu.apps import eval as eval_cli
    out = tmp_path / "curve.json"
    rc = eval_cli.main([str(data), "--hints", "0,3", "--size", "32",
                        "--batch", "2", "--out", str(out)])
    assert rc == 0
    import json
    curve = json.load(open(out))
    assert curve["n_images"] == 2
    assert set(curve["psnr_by_hints"]) == {"0", "3"}
    assert all(np.isfinite(v) for v in curve["psnr_by_hints"].values())


def test_sample_hints_unchanged_after_refactor():
    """The training sampler still meets its contract post-refactor
    (shared _reveal_batch core)."""
    key = jax.random.key(0)
    gt = jnp.asarray(np.random.default_rng(0)
                     .uniform(-80, 80, (4, 32, 32, 2)).astype(np.float32))
    ab, mask = hints_sim.sample_hints(key, gt)
    ab, mask = np.asarray(ab), np.asarray(mask)
    assert ab.shape == (4, 32, 32, 2) and mask.shape == (4, 32, 32, 1)
    assert np.all(ab[mask[..., 0] == 0] == 0)


def test_sample_hints_full_reveal():
    """The published recipe's 1% full-ground-truth reveal (SIGGRAPH'17
    §3.2): with p_full=1 every sample reveals gt exactly (mask all-ones,
    ab == gt); with p_full=0 behavior is bit-identical to the sparse
    sampler (the pre-r4 path)."""
    key = jax.random.key(7)
    gt = jnp.asarray(np.random.default_rng(1)
                     .uniform(-80, 80, (4, 32, 32, 2)).astype(np.float32))
    ab_full, mask_full = hints_sim.sample_hints(key, gt, p_full=1.0)
    np.testing.assert_array_equal(np.asarray(mask_full), 1.0)
    np.testing.assert_allclose(np.asarray(ab_full), np.asarray(gt),
                               rtol=0, atol=1e-6)
    ab0, mask0 = hints_sim.sample_hints(key, gt, p_full=0.0)
    ab_d, mask_d = hints_sim.sample_hints(key, gt)   # default p_full=.01
    # the sparse branch inside the default path reuses the same slots:
    # wherever the default sample did NOT full-reveal, it matches p_full=0
    sparse_rows = ~np.all(np.asarray(mask_d) == 1.0, axis=(1, 2, 3))
    np.testing.assert_array_equal(np.asarray(ab_d)[sparse_rows],
                                  np.asarray(ab0)[sparse_rows])
    np.testing.assert_array_equal(np.asarray(mask_d)[sparse_rows],
                                  np.asarray(mask0)[sparse_rows])


def test_eval_validates_counts_and_half():
    from ideepcolor_tpu.apps import eval as eval_cli
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="hint count"):
        eval_cli.evaluate(params, imgs, [0, 50], batch=2)
    with pytest.raises(ValueError, match="half"):
        hints_sim.reveal_hints_fixed(jax.random.key(0),
                                     jnp.zeros((1, 16, 16, 2)),
                                     jnp.int32(1), half=5)


def test_evaluate_streaming_chunks_match_array(tmp_path):
    """Streaming chunk iterator == in-memory array (same seeds/keys)."""
    from ideepcolor_tpu.apps import eval as eval_cli
    from ideepcolor_tpu.models import siggraph
    from PIL import Image
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    rng = np.random.default_rng(7)
    for i in range(3):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)
                        ).save(tmp_path / f"i{i}.png")
    arr = eval_cli.load_eval_images(str(tmp_path), 32)
    assert arr.shape == (3, 32, 32, 3)
    c_arr = eval_cli.evaluate(params, arr, [0, 2], batch=2, seed=3)
    chunks = eval_cli.iter_image_chunks(str(tmp_path), 32, batch=2)
    c_stream = eval_cli.evaluate(params, chunks, [0, 2], batch=2, seed=3)
    assert c_arr == c_stream


def test_curve_auc():
    from ideepcolor_tpu.apps.eval import curve_auc
    assert curve_auc({0: 20.0, 10: 30.0}) == pytest.approx(25.0)
    assert curve_auc({0: 20.0, 5: 25.0, 10: 30.0}) == pytest.approx(25.0)
    assert curve_auc({3: 20.0}) is None


def test_save_grid_chunks_match_single_batch(tmp_path):
    """save_colorization_grid renders in padded chunks (compile-service
    1 GB argument limit, CLAUDE.md); at count=0 (no hint randomness) the
    rendered tiles must be identical whatever the chunking."""
    from PIL import Image

    from ideepcolor_tpu.apps.eval import save_colorization_grid
    from ideepcolor_tpu.models import siggraph
    rng = np.random.default_rng(3)
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    images = rng.random((5, 32, 32, 3)).astype(np.float32)
    p1 = save_colorization_grid(params, images, (0,),
                                str(tmp_path / "a.png"), batch=2)
    p2 = save_colorization_grid(params, images, (0,),
                                str(tmp_path / "b.png"), batch=8)
    a = np.asarray(Image.open(p1))
    b = np.asarray(Image.open(p2))
    assert a.shape == b.shape
    assert np.array_equal(a, b)


# ---- hint fidelity (VERDICT r3: the paper's interaction contract) ----

def _teacher_params():
    from ideepcolor_tpu.api.colorize import _load_checkpoint
    from ideepcolor_tpu.models import siggraph
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "teacher.npz")
    if not os.path.exists(path):
        pytest.skip("bundled teacher weights absent")
    return siggraph.params_from_state_dict(_load_checkpoint(path))


def _color_images(size=96, n=2):
    from ideepcolor_tpu.apps.eval import load_eval_images
    ref = os.environ.get("IDEEPCOLOR_REFERENCE", "/root/reference")
    paths = [os.path.join(ref, "test_imgs", p)
             for p in ("mortar_pestle.jpg", "parrot.jpg")][:n]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference test images absent")
    return load_eval_images(paths, size)


@pytest.mark.slow
def test_hint_fidelity_counterfactual_adopted_and_keys():
    """With the trained weights, a saturated counterfactual hint must pull
    the local output color to the USER's color: adherence ΔE with the
    hint far below the zero-hint baseline at the same pixels."""
    from ideepcolor_tpu.apps.eval import hint_fidelity
    params = _teacher_params()
    imgs = _color_images()
    fid = hint_fidelity(params, imgs, batch=len(imgs), counts=(1,),
                        rotations=(0.0, 180.0))
    for k in ("deltaE_h1_rot0", "deltaE_h1_rot0_nohint",
              "deltaE_h1_rot180", "deltaE_h1_rot180_nohint",
              "radius_r50_px", "radius_r90_px"):
        assert k in fid and np.isfinite(fid[k])
    # counterfactual: the prior is far from the target; the hint must
    # close most of that gap (paper's "user wins" contract)
    assert fid["deltaE_h1_rot180_nohint"] > 5.0
    assert fid["deltaE_h1_rot180"] < 0.5 * fid["deltaE_h1_rot180_nohint"]
    # one click influences a finite neighborhood: r90 positive and well
    # below the whole image diagonal (i.e. the hint is local, not global)
    assert 0 < fid["radius_r50_px"] <= fid["radius_r90_px"]
    assert fid["radius_r90_px"] < 96 * 1.42


@pytest.mark.slow
def test_hint_fidelity_deterministic_and_count_swept():
    from ideepcolor_tpu.apps.eval import hint_fidelity
    params = _teacher_params()
    imgs = _color_images(size=64, n=1)
    a = hint_fidelity(params, imgs, batch=1, counts=(1, 5),
                      rotations=(180.0,), seed=3)
    b = hint_fidelity(params, imgs, batch=1, counts=(1, 5),
                      rotations=(180.0,), seed=3)
    assert a == b
    assert "deltaE_h5_rot180" in a


def test_per_image_auc_and_spread():
    """per-image AUCs average to curve_auc of the mean curve, and the
    spread summary carries honest n/stderr (VERDICT r4 task 6)."""
    import numpy as np
    from ideepcolor_tpu.apps.eval import (auc_spread, curve_auc,
                                          per_image_auc)
    per = {0: np.array([10.0, 20.0, 30.0]),
           5: np.array([12.0, 22.0, 29.0]),
           25: np.array([14.0, 24.0, 31.0])}
    curve = {k: float(v.mean()) for k, v in per.items()}
    aucs = per_image_auc(per)
    assert aucs.shape == (3,)
    assert abs(float(aucs.mean()) - curve_auc(curve)) < 1e-9
    s = auc_spread(aucs)
    assert s["n_images"] == 3
    assert s["auc_min_db"] <= s["auc_max_db"]
    assert s["auc_stderr_db"] > 0
    assert auc_spread(aucs[:1])["auc_stderr_db"] is None


def test_evaluate_return_per_image_matches_curve():
    from ideepcolor_tpu.apps.eval import evaluate
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0), width=0.25)
    rng = np.random.default_rng(3)
    imgs = rng.random((4, 32, 32, 3)).astype(np.float32)
    curve, per = evaluate(params, imgs, (0, 2), batch=2,
                          return_per_image=True)
    for k, v in per.items():
        assert v.shape == (4,)
        assert abs(float(v.mean()) - curve[k]) < 1e-4
    # padded tail dropped: odd image count, same batch
    c3, p3 = evaluate(params, imgs[:3], (0,), batch=2,
                      return_per_image=True)
    assert p3[0].shape == (3,)
