"""Round-trip tests for the native .caffemodel protobuf reader."""
import numpy as np
import pytest

import jax

from ideepcolor_tpu.models import caffe_net, caffemodel_io as cio


def test_wire_roundtrip_simple():
    rng = np.random.default_rng(0)
    layers = {
        "conv1_2": [rng.normal(size=(64, 64, 3, 3)).astype(np.float32),
                    rng.normal(size=(64,)).astype(np.float32)],
        "conv1_2norm": [rng.normal(size=(64,)).astype(np.float32),
                        rng.random(64).astype(np.float32) + 0.5,
                        np.array([2.0], np.float32)],
    }
    buf = cio.encode_caffemodel(layers)
    parsed = cio.parse_caffemodel(buf)
    assert set(parsed) == set(layers)
    for name in layers:
        for a, b in zip(layers[name], parsed[name]):
            assert np.array_equal(a, b.reshape(a.shape))


@pytest.mark.slow
def test_convert_full_main_variant_executes():
    """Encode a full random 'main' caffemodel, convert, and check the
    converted params produce the same output as directly-assigned ones."""
    rng = np.random.default_rng(1)
    ref_params = caffe_net.init_params(jax.random.key(5), "main")

    # re-encode our params into caffemodel blob layout
    layers = {}
    for name, cin, cout, k, _d, kind in caffe_net._convs_for("main"):
        w = np.asarray(ref_params[f"{name}.weight"])
        if kind == "deconv":
            # our storage is flipped HWIO; caffemodel stores (I,O,kh,kw)
            blob = w[::-1, ::-1].transpose(2, 3, 0, 1)
        else:
            blob = w.transpose(3, 2, 0, 1)
        layers[name] = [np.ascontiguousarray(blob),
                        np.asarray(ref_params[f"{name}.bias"])]
    for name in caffe_net._bns_for("main"):
        s = 3.0
        layers[name] = [np.asarray(ref_params[f"{name}.mean"]) * s,
                        np.asarray(ref_params[f"{name}.var"]) * s,
                        np.array([s], np.float32)]
    layers["pred_ab"] = [np.array([float(ref_params["pred_ab.scale"])],
                                  np.float32)]
    # structural layers that must be skipped
    layers["conv1_2norm_ss"] = [np.ones((64, 1, 1, 1), np.float32)]

    buf = cio.encode_caffemodel(layers)
    params = cio.convert_to_params(cio.parse_caffemodel(buf), "main")

    for k in ref_params:
        assert np.allclose(np.asarray(params[k]), np.asarray(ref_params[k]),
                           atol=1e-6), k

    blob_in = rng.uniform(-50, 50, (1, 32, 32, 4)).astype(np.float32)
    out_ref = np.asarray(caffe_net.apply_main(ref_params, blob_in))
    out_conv = np.asarray(caffe_net.apply_main(params, blob_in))
    assert np.array_equal(out_ref, out_conv)


def test_v1_layers_field_also_parsed():
    """Old checkpoints use V1LayerParameter (field 2, name=4, blobs=6)."""
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    blob = cio.encode_blob(arr)
    layer = (cio._len_field(4, b"old_layer") + cio._len_field(6, blob))
    buf = cio._len_field(2, layer)
    parsed = cio.parse_caffemodel(buf)
    assert "old_layer" in parsed
    assert np.array_equal(parsed["old_layer"][0], arr)


def test_legacy_blob_dims():
    """Blobs without BlobShape use num/channels/height/width varints."""
    arr = np.arange(24, dtype=np.float32).reshape(1, 2, 3, 4)
    blob = (cio._tag(1, 0) + cio._varint(1) + cio._tag(2, 0) + cio._varint(2)
            + cio._tag(3, 0) + cio._varint(3) + cio._tag(4, 0)
            + cio._varint(4)
            + cio._len_field(5, arr.ravel().tobytes()))
    layer = cio._len_field(1, b"legacy") + cio._len_field(2, b"Convolution") \
        + cio._len_field(7, blob)
    parsed = cio.parse_caffemodel(cio._len_field(100, layer))
    assert parsed["legacy"][0].shape == (1, 2, 3, 4)
    assert np.array_equal(parsed["legacy"][0], arr)


@pytest.mark.slow
def test_prep_net_loads_raw_caffemodel(tmp_path):
    """The API accepts a raw .caffemodel directly (native parsing)."""
    import numpy as np
    from ideepcolor_tpu import api
    ref_params = caffe_net.init_params(jax.random.key(9), "main")
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
    layers["pred_ab"] = [np.array([100.0], np.float32)]
    p = str(tmp_path / "model.caffemodel")
    open(p, "wb").write(cio.encode_caffemodel(layers))

    m = api.ColorizeImageJaxCaffe(Xd=32)
    m.prep_net(0, "deploy.prototxt", p)
    for k in ref_params:
        assert np.allclose(np.asarray(m.params[k]),
                           np.asarray(ref_params[k]), atol=1e-6), k
    rng = np.random.default_rng(0)
    m.set_image((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    out = m.net_forward(np.zeros((2, 32, 32)), np.zeros((1, 32, 32)))
    assert out.shape == (32, 32, 3)
