"""Framework configuration.

The reference's only configuration is 11 argparse flags + the prototxt
files themselves (ref ideepcolor.py:13-46). Here one dataclass captures
every runtime knob — net variant, resolution, temperatures, suggestion
parameters, serving precision — and the CLI (apps/ideepcolor.py) simply
fills it.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ColorizeConfig:
    # model selection
    backend: str = "siggraph"          # 'siggraph' | 'caffe'
    variant: str = "main"              # caffe graph: 'main'|'dist'|'global'
    dist: bool = False                 # distribution head (siggraph)
    maskcent: bool = False             # subtract 0.5 from the hint mask
    checkpoint: str = ""               # .pth / .npz / orbax dir

    # resolution (ref Xd=256, full-res cap 10000,
    # data/colorize_image.py:40)
    Xd: int = 256
    Xfullres_max: int = 10000

    # distribution temperatures (ref deploy_nopred.prototxt:806-850 and
    # prep_net S=.2, data/colorize_image.py:482-485). Suggestion-sampling
    # K/N are per-call arguments of get_ab_reccs, like the reference.
    temp_suggest: float = 0.2          # scale_S — suggestion softmax
    temp_point: float = 2.6            # scale_T — annealed-mean estimate

    # execution
    serve_dtype: str = "float32"       # 'float32' | 'bfloat16' (MXU mode)

    def validate(self) -> "ColorizeConfig":
        assert self.backend in ("siggraph", "caffe"), self.backend
        assert self.variant in ("main", "dist", "global"), self.variant
        assert self.serve_dtype in ("float32", "bfloat16")
        assert self.Xd % 8 == 0, "Xd must be divisible by 8 (3 subsamples)"
        return self


def make_backend(cfg: ColorizeConfig):
    """Instantiate the API backend described by a config."""
    from . import api
    cfg.validate()
    dtype = None if cfg.serve_dtype == "float32" else cfg.serve_dtype
    if cfg.backend == "siggraph":
        cls = api.ColorizeImageJaxDist if cfg.dist else api.ColorizeImageJax
        m = cls(Xd=cfg.Xd, maskcent=cfg.maskcent)
        m.prep_net(path=cfg.checkpoint, dtype=dtype)
    else:
        cls = {"main": api.ColorizeImageJaxCaffe,
               "dist": api.ColorizeImageJaxCaffeDist,
               "global": api.ColorizeImageJaxCaffeGlobDist}[cfg.variant]
        m = cls(Xd=cfg.Xd)
        if cfg.variant == "dist":
            m.prep_net(None, caffemodel_path=cfg.checkpoint,
                       S=cfg.temp_suggest, dtype=dtype)
            import jax.numpy as jnp
            m.params["scale_T.scale"] = jnp.asarray(cfg.temp_point,
                                                    jnp.float32)
        else:
            m.prep_net(None, caffemodel_path=cfg.checkpoint, dtype=dtype)
    m.Xfullres_max = cfg.Xfullres_max
    return m


def bundled_weights(name: str = "teacher") -> str:
    """Path of a committed demo checkpoint (``weights/<name>.npz`` at the
    repo root — trained on-chip, see weights/README.md) or '' when
    absent. CLI entry points use these as defaults so the out-of-box
    GUI/server actually colorizes instead of running random init."""
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", f"{name}.npz")
    return p if os.path.exists(p) else ""


def enable_persistent_compile_cache(
        path: str = "/root/.cache/ideepcolor_tpu_jax_cache") -> None:
    """Point jax at a persistent compilation cache (saves 15-25 s per
    program on tunneled-TPU reruns). Call BEFORE the first jax dispatch;
    no-op if the env vars are already set. bench.py and the test suite
    set the same cache; the app entry points call this."""
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
