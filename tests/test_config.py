import numpy as np
import pytest

from ideepcolor_tpu.config import ColorizeConfig, make_backend


def test_validate():
    ColorizeConfig().validate()
    with pytest.raises(AssertionError):
        ColorizeConfig(backend="tf").validate()
    with pytest.raises(AssertionError):
        ColorizeConfig(Xd=100).validate()


def test_make_backend_siggraph():
    m = make_backend(ColorizeConfig(Xd=64))
    assert m.net_set and m.Xd == 64


def test_make_backend_caffe_dist_temp():
    m = make_backend(ColorizeConfig(backend="caffe", variant="dist",
                                    Xd=64, temp_suggest=0.3))
    assert float(m.params["scale_S.scale"]) == pytest.approx(0.3)


def test_make_backend_bf16_serving():
    import jax.numpy as jnp
    m = make_backend(ColorizeConfig(Xd=64, serve_dtype="bfloat16"))
    assert m.params["model1.0.weight"].dtype == jnp.bfloat16
    rng = np.random.default_rng(0)
    m.set_image((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    out = m.net_forward(np.zeros((2, 64, 64)), np.zeros((1, 64, 64)))
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
