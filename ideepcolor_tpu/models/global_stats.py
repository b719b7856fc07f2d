"""Global color-statistics extractor (histogram transfer conditioning).

Replaces the reference's weightless Caffe graph ``global_stats.prototxt``
(ref: models/global_model/global_stats.prototxt, 243 lines), which routed
C++ pooling layers through Python colorspace/encode layers
(ref: caffe_files/caffe_traininglayers.py). Here the whole extraction is one
jitted device function.

Pipeline (ref global_stats.prototxt:10-244):
  rgb (256x256 uint8-scale) -> Lab -> ab 4x4 avg-pool -> NN soft-encode to
  313 bins (NN=1, sigma=5 — a hard one-hot at NN=1) -> global avg-pool ->
  ``glob_ab_313`` histogram; plus HSV mean saturation and BGR channel means.
  The ColorGlobalDropoutLayer keep-flags are always 1 at inference
  (param_str keep_ratio = 1), so the 'drop' outputs reduce to
  (values, flag=1); we return the raw statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import colorspace as cs
from ..ops.quantize import soft_encode


@jax.jit
def extract(rgb: jax.Array) -> dict[str, jax.Array]:
    """rgb: (H, W, 3) float in [0, 1], H/W divisible by 4.

    Returns dict with:
      glob_ab_313: (313,) global soft-encoded ab histogram (the
                   ``gt_glob_ab_313_drop[:-1]`` blob the notebook feeds to
                   the global net, ref DemoGlobalHistogramTransfer cell 9),
      s_avg:       () mean HSV saturation,
      bgr_avg:     (3,) channel means in BGR order (parity with the
                   reference's BGR blob layout).
    """
    lab = cs.rgb_to_lab(rgb)
    ab = lab[..., 1:]
    h, w = ab.shape[0], ab.shape[1]
    # 4x4 average pool, stride 4 (ref global_stats.prototxt:101-111).
    ab_rs = jnp.mean(
        ab.reshape(h // 4, 4, w // 4, 4, 2), axis=(1, 3))
    enc = soft_encode(ab_rs, nn=1)                   # (h/4, w/4, 313)
    glob = jnp.mean(enc, axis=(0, 1))

    hsv = cs.rgb_to_hsv(rgb)
    s_avg = jnp.mean(hsv[..., 1])
    bgr_avg = jnp.mean(rgb, axis=(0, 1))[::-1]
    return {"glob_ab_313": glob, "s_avg": s_avg, "bgr_avg": bgr_avg}
