"""App-level tests: CLI arg parsing/backend construction and the two
notebook demo sessions (headless)."""
import os

import numpy as np
import pytest

from ideepcolor_tpu.apps import demos, ideepcolor as app

IMG = "/root/reference/test_imgs/mortar_pestle.jpg"
REF_DIR = "/root/reference/test_imgs/global_ref_bird"


def test_parse_args_defaults():
    args = app.parse_args([])
    assert args.backend == 'siggraph' and args.load_size == 256
    args = app.parse_args(['--backend', 'caffe', '--no_dist',
                           '--load_size', '64'])
    assert args.backend == 'caffe' and args.no_dist and args.load_size == 64


def test_build_models_siggraph():
    args = app.parse_args(['--load_size', '64', '--no_dist'])
    assert args.dtype == 'bfloat16'        # fast MXU mode, as in serve
    color_model, dist_model = app.build_models(args)
    assert color_model.net_set and dist_model is None
    import jax.numpy as jnp
    leaf = next(iter(color_model.params.values()))
    assert leaf.dtype == jnp.bfloat16

    args = app.parse_args(['--load_size', '64', '--no_dist',
                           '--dtype', 'float32'])
    color_model, _ = app.build_models(args)
    leaf = next(iter(color_model.params.values()))
    assert leaf.dtype == jnp.float32       # bit-parity mode


def test_build_models_caffe_with_dist():
    args = app.parse_args(['--backend', 'caffe', '--load_size', '64'])
    color_model, dist_model = app.build_models(args)
    assert color_model.net_set and dist_model.net_set
    assert float(dist_model.params["scale_S.scale"]) == pytest.approx(0.2)


@pytest.mark.skipif(not os.path.exists(IMG), reason="no test image")
def test_demo_local_hints_session():
    res = demos.demo_local_hints(IMG, Xd=64)
    for key in ("auto", "gray", "hint1", "hint1_input", "hint1_mask",
                "hint2"):
        assert res[key].dtype == np.uint8
        assert res[key].shape == res["auto"].shape
    assert not np.array_equal(res["auto"], res["hint1"])


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="no reference images")
def test_demo_global_histogram_session():
    ref = os.path.join(REF_DIR, sorted(os.listdir(REF_DIR))[0])
    res = demos.demo_global_histogram(IMG, ref, Xd=64)
    assert abs(res["glob_dist"].sum() - 1) < 1e-4
    assert not np.array_equal(res["auto"], res["with_ref"])


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """End-to-end training CLI: 3 steps on the reference test images."""
    import shutil
    data = tmp_path / "data"
    data.mkdir()
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    for i in range(3):
        shutil.copy(src, data / f"im{i}.jpg")
    from ideepcolor_tpu.apps import train as train_cli
    rc = train_cli.main([str(data), "--steps", "3", "--batch", "2",
                         "--size", "32", "--ckpt",
                         str(tmp_path / "ck"), "--ckpt-every", "3",
                         "--log-every", "1",
                         "--export", str(tmp_path / "weights.npz")])
    assert rc == 0
    # checkpoint was written and is loadable
    from ideepcolor_tpu.train import step as tstep
    st = tstep.load_train_state(str(tmp_path / "ck_3"),
                                tstep.TrainConfig())
    assert int(st["step"]) == 3
    # the train -> serve loop closes: both the exported params and the raw
    # TRAIN-state checkpoint dir load through prep_net and forward
    from ideepcolor_tpu import api
    for w in (str(tmp_path / "weights.npz"), str(tmp_path / "ck_3")):
        m = api.ColorizeImageJax(Xd=32)
        m.prep_net(path=w)
        m.set_image(np.full((32, 32, 3), 128, np.uint8))
        out = m.net_forward(np.zeros((2, 32, 32)), np.zeros((1, 32, 32)))
        assert not np.isscalar(out) and out.shape == (32, 32, 3)


@pytest.mark.slow
def test_train_cli_resume_total_steps(tmp_path):
    """--steps is the TOTAL target under --resume: resuming a step-2
    checkpoint with --steps 3 runs exactly 1 more step (so the lr
    schedule, indexed by the restored optimizer count and built with
    total_steps=--steps, stays aligned with the loop), not 3 more."""
    import shutil
    data = tmp_path / "data"
    data.mkdir()
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    for i in range(2):
        shutil.copy(src, data / f"im{i}.jpg")
    from ideepcolor_tpu.apps import train as train_cli
    base = [str(data), "--batch", "2", "--size", "32",
            "--ckpt", str(tmp_path / "ck"), "--log-every", "1",
            "--lr-schedule", "cosine", "--warmup-steps", "1"]
    rc = train_cli.main(base + ["--steps", "2", "--ckpt-every", "2"])
    assert rc == 0
    rc = train_cli.main(base + ["--steps", "3", "--ckpt-every", "1",
                                "--resume", str(tmp_path / "ck_2")])
    assert rc == 0
    from ideepcolor_tpu.train import step as tstep
    st = tstep.load_train_state(
        str(tmp_path / "ck_3"),
        tstep.TrainConfig(schedule="cosine", warmup_steps=1,
                          total_steps=3))
    assert int(st["step"]) == 3
    # and no step-5 checkpoint: the resume did NOT run --steps more steps
    assert not os.path.exists(str(tmp_path / "ck_5"))


@pytest.mark.slow
def test_train_cli_init_from_finetune(tmp_path):
    """--init-from: params-only checkpoint seeds training with a fresh
    optimizer (the fine-tune workflow, e.g. re-training the bundled
    teacher at a new --size). At --steps 0 the exported params must be
    EXACTLY the init source (proves the load/convert path); a 2-step run
    from the same init must train and export changed params."""
    import shutil
    data = tmp_path / "data"
    data.mkdir()
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    for i in range(2):
        shutil.copy(src, data / f"im{i}.jpg")
    from ideepcolor_tpu.models import siggraph
    init = siggraph.init_params(__import__("jax").random.key(3))
    np.savez(tmp_path / "init.npz",
             **{k: np.asarray(v) for k, v in init.items()})
    from ideepcolor_tpu.apps import train as train_cli
    base = [str(data), "--batch", "2", "--size", "32",
            "--ckpt", str(tmp_path / "ck"), "--log-every", "1",
            "--init-from", str(tmp_path / "init.npz")]
    rc = train_cli.main(base + ["--steps", "0",
                                "--export", str(tmp_path / "pass.npz")])
    assert rc == 0
    passed = dict(np.load(tmp_path / "pass.npz"))
    assert all(np.array_equal(passed[k], np.asarray(init[k]))
               for k in passed)
    rc = train_cli.main(base + ["--steps", "2",
                                "--export", str(tmp_path / "ft.npz")])
    assert rc == 0
    ft = dict(np.load(tmp_path / "ft.npz"))
    assert not np.array_equal(ft["model1.0.weight"],
                              np.asarray(init["model1.0.weight"]))
    # conflicting flags are a clean error, not a silent ignore
    with pytest.raises(SystemExit, match="mutually"):
        train_cli.main(base + ["--steps", "1",
                               "--resume", str(tmp_path / "nowhere")])
    # width-mismatched student init is a loud error, not a silent
    # full-width "student"
    from ideepcolor_tpu.train import distill
    with pytest.raises(ValueError, match="width-tier"):
        distill.init_student(
            __import__("jax").random.key(0),
            distill.DistillConfig(width=0.25), params=init)


@pytest.mark.slow
def test_train_cli_distill_smoke(tmp_path):
    """Distillation CLI: teacher ckpt -> student ckpt -> serve closes."""
    import shutil
    data = tmp_path / "data"
    data.mkdir()
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    for i in range(3):
        shutil.copy(src, data / f"im{i}.jpg")
    # teacher checkpoint: a (narrow, fast) "teacher" saved as npz
    from ideepcolor_tpu.models import siggraph
    teacher = siggraph.init_params(__import__("jax").random.key(0),
                                   width=0.5)
    np.savez(tmp_path / "teacher.npz",
             **{k: np.asarray(v) for k, v in teacher.items()})
    from ideepcolor_tpu.apps import train as train_cli
    rc = train_cli.main([str(data), "--steps", "3", "--batch", "2",
                         "--size", "32", "--ckpt", str(tmp_path / "sk"),
                         "--ckpt-every", "3", "--log-every", "1",
                         "--distill-from", str(tmp_path / "teacher.npz"),
                         "--width", "0.25",
                         "--export", str(tmp_path / "student.npz")])
    assert rc == 0
    from ideepcolor_tpu import api
    m = api.ColorizeImageJax(Xd=32)
    m.prep_net(path=str(tmp_path / "student.npz"))
    assert m.params["model1.0.weight"].shape == (3, 3, 4, 16)
    m.set_image(np.full((32, 32, 3), 128, np.uint8))
    out = m.net_forward(np.zeros((2, 32, 32)), np.zeros((1, 32, 32)))
    assert not np.isscalar(out) and out.shape == (32, 32, 3)
    # resume from the student checkpoint
    from ideepcolor_tpu.train import distill
    st = distill.load_student_state(
        str(tmp_path / "sk_3"), distill.DistillConfig(width=0.25))
    assert int(st["step"]) == 3


def test_image_folder_loader(tmp_path):
    import shutil
    src = "/root/reference/test_imgs/mortar_pestle.jpg"
    if not os.path.exists(src):
        pytest.skip("no images")
    shutil.copy(src, tmp_path / "a.jpg")
    from ideepcolor_tpu.train.data import ImageFolderLoader
    loader = ImageFolderLoader(str(tmp_path), batch_size=2, size=64,
                               workers=1, prefetch=1)
    b = next(loader)
    loader.close()
    assert b["l"].shape == (2, 64, 64, 1) and b["ab"].shape == (2, 64, 64, 2)
    assert 0 <= b["l"].min() and b["l"].max() <= 100
    assert np.abs(b["ab"]).max() <= 128


def test_gui_module_import_gated():
    """Without PyQt5 the GUI module must raise an informative ImportError;
    the CLI must degrade gracefully (exit code 1, headless hint printed)."""
    try:
        import PyQt5  # noqa: F401
        pytest.skip("PyQt5 present; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="headless API"):
        from ideepcolor_tpu.ui import qt_gui  # noqa: F401
    rc = app.main(['--load_size', '64', '--no_dist'])
    assert rc == 1
