"""End-to-end tests of scripts/convert_checkpoint.py with synthetic
checkpoints in both source formats (run in-process: a subprocess per
invocation would re-pay torch+jax startup, ~2 min each)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "convert_checkpoint.py")


class _Result:
    def __init__(self, rc):
        self.returncode = rc
        self.stderr = ""


def _run(args):
    spec = importlib.util.spec_from_file_location("convert_cli", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return _Result(mod.main(args))


@pytest.mark.slow
def test_convert_torch_pth(tmp_path):
    import torch
    import importlib.util
    ref = "/root/reference/models/pytorch/model.py"
    if not os.path.exists(ref):
        pytest.skip("reference model def unavailable")
    spec = importlib.util.spec_from_file_location("rsg", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    net = mod.SIGGRAPHGenerator(dist=False)
    src = str(tmp_path / "pytorch.pth")
    torch.save(net.state_dict(), src)
    dst = str(tmp_path / "siggraph.npz")
    r = _run([src, dst])
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(dst)

    # converted weights load through the API and run
    from ideepcolor_tpu import api
    m = api.ColorizeImageJax(Xd=32)
    m.prep_net(path=dst)
    rng = np.random.default_rng(0)
    m.set_image((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    out = m.net_forward(np.zeros((2, 32, 32)), np.zeros((1, 32, 32)))
    assert out.shape == (32, 32, 3)


@pytest.mark.slow
def test_convert_caffemodel(tmp_path):
    from ideepcolor_tpu.models import caffe_net, caffemodel_io as cio
    ref_params = caffe_net.init_params(jax.random.key(1), "main")
    layers = {}
    for name, cin, cout, k, _d, kind in caffe_net._convs_for("main"):
        w = np.asarray(ref_params[f"{name}.weight"])
        blob = (w[::-1, ::-1].transpose(2, 3, 0, 1) if kind == "deconv"
                else w.transpose(3, 2, 0, 1))
        layers[name] = [np.ascontiguousarray(blob),
                        np.asarray(ref_params[f"{name}.bias"])]
    for name in caffe_net._bns_for("main"):
        layers[name] = [np.asarray(ref_params[f"{name}.mean"]),
                        np.asarray(ref_params[f"{name}.var"]),
                        np.array([1.0], np.float32)]
    src = str(tmp_path / "model.caffemodel")
    open(src, "wb").write(cio.encode_caffemodel(layers))
    dst = str(tmp_path / "caffe_main.npz")
    r = _run([src, dst, "--variant", "main"])
    assert r.returncode == 0, r.stderr[-500:]
    loaded = dict(np.load(dst))
    assert np.allclose(loaded["conv1_2.weight"],
                       np.asarray(ref_params["conv1_2.weight"]), atol=1e-6)


@pytest.mark.slow
def test_convert_torch_pth_to_orbax_and_load(tmp_path):
    import torch
    import importlib.util
    ref = "/root/reference/models/pytorch/model.py"
    if not os.path.exists(ref):
        pytest.skip("reference model def unavailable")
    spec = importlib.util.spec_from_file_location("rsg2", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(1)
    net = mod.SIGGRAPHGenerator(dist=False)
    src = str(tmp_path / "w.pth")
    torch.save(net.state_dict(), src)
    dst = str(tmp_path / "orbax_ckpt")
    r = _run([src, dst, "--orbax"])
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.isdir(dst)

    from ideepcolor_tpu import api
    m = api.ColorizeImageJax(Xd=32)
    m.prep_net(path=dst)              # orbax directory loads directly
    rng = np.random.default_rng(1)
    m.set_image((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    out = m.net_forward(np.zeros((2, 32, 32)), np.zeros((1, 32, 32)))
    assert out.shape == (32, 32, 3)


@pytest.mark.slow
def test_export_pth_runs_under_reference_oracle(tmp_path):
    """EXPORT direction: our params -> .pth -> the reference's own
    SIGGRAPHGenerator (strict=True) must compute the same function —
    checkpoints trained here are portable back to the reference stack."""
    import torch
    ref_py = "/root/reference/models/pytorch/model.py"
    if not os.path.exists(ref_py):
        pytest.skip("reference model def unavailable")
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(7))
    # randomized BN running stats so a mean/var mixup can't hide behind
    # the identity-stat init
    rng = np.random.default_rng(7)
    for k in list(params):
        if k.endswith("running_mean"):
            params[k] = rng.uniform(-0.5, 0.5, params[k].shape).astype(
                np.float32)
        elif k.endswith("running_var"):
            params[k] = rng.uniform(0.5, 2.0, params[k].shape).astype(
                np.float32)
    src = str(tmp_path / "ours.npz")
    np.savez(src, **{k: np.asarray(v) for k, v in params.items()})
    dst = str(tmp_path / "exported.pth")
    r = _run([src, dst])
    assert r.returncode == 0, r.stderr[-500:]

    spec = importlib.util.spec_from_file_location("rsg3", ref_py)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.SIGGRAPHGenerator(dist=False)
    net.load_state_dict(torch.load(dst, weights_only=True), strict=True)
    net.eval()

    rng = np.random.default_rng(8)
    A = rng.uniform(-50, 50, (1, 64, 64, 1)).astype(np.float32)
    B = rng.uniform(-110, 110, (1, 64, 64, 2)).astype(np.float32)
    mask = (rng.random((1, 64, 64, 1)) > 0.9).astype(np.float32)
    B *= mask
    with torch.no_grad():
        want = net.forward(A[0].transpose(2, 0, 1),
                           B[0].transpose(2, 0, 1),
                           mask[0].transpose(2, 0, 1), maskcent=0)
    want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(siggraph.apply(
        {k: np.asarray(v) for k, v in params.items()}, A, B, mask, 0.0))
    assert np.max(np.abs(got - want)) < 2e-4, np.max(np.abs(got - want))


@pytest.mark.slow
def test_export_pth_rejects_caffe_params_cleanly(tmp_path):
    """Exporting a caffe_net-keyed checkpoint (the converter's own
    .caffemodel output format) must exit with a diagnostic, not a
    KeyError traceback; --orbax with a .pth OUT is a clean conflict."""
    from ideepcolor_tpu.models import caffe_net
    params = caffe_net.init_params(jax.random.key(0), "main")
    src = str(tmp_path / "caffe_main.npz")
    np.savez(src, **{k: np.asarray(v) for k, v in params.items()})
    with pytest.raises(SystemExit, match="SIGGRAPH-family"):
        _run([src, str(tmp_path / "out.pth")])
    from ideepcolor_tpu.models import siggraph
    ok = str(tmp_path / "ok.npz")
    np.savez(ok, **{k: np.asarray(v) for k, v in
                    siggraph.init_params(jax.random.key(1),
                                         width=0.25).items()})
    with pytest.raises(SystemExit, match="orbax"):
        _run([ok, str(tmp_path / "out.pth"), "--orbax"])


@pytest.mark.slow
def test_corpus_manifest_gates_staleness(tmp_path, monkeypatch):
    """The corpus build writes a manifest LAST; manifest_is_current must
    reject a partial build (no manifest), a stale script version, and a
    corpus whose holdout files vanished — the staleness class bench.py's
    eval leg gates on (a silently reused partial corpus would skip or
    mis-report eval_auc_db)."""
    import json
    spec = importlib.util.spec_from_file_location(
        "corpus_script", os.path.join(REPO, "scripts",
                                      "build_offline_corpus.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "corpus")
    # partial build: directories exist but no manifest
    os.makedirs(f"{out}/holdout", exist_ok=True)
    assert not mod.manifest_is_current(out)
    monkeypatch.setattr(sys, "argv", ["build_offline_corpus.py", out])
    assert mod.main() == 0
    assert mod.manifest_is_current(out)
    # stale script version
    with open(f"{out}/manifest.json") as f:
        m = json.load(f)
    m["version"] = "0" * 12
    with open(f"{out}/manifest.json", "w") as f:
        json.dump(m, f)
    assert not mod.manifest_is_current(out)
    # missing holdout file
    monkeypatch.setattr(sys, "argv", ["build_offline_corpus.py", out])
    assert mod.main() == 0
    assert mod.manifest_is_current(out)
    victim = os.listdir(f"{out}/holdout")[0]
    os.remove(f"{out}/holdout/{victim}")
    assert not mod.manifest_is_current(out)
