"""Headless demo sessions — the two reference notebooks as functions.

Replicates DemoInteractiveColorization.ipynb (zero-hint + iterative
put_point local hints) and DemoGlobalHistogramTransfer.ipynb (histogram
extraction + conditioned colorization) against the TPU backends. Each
returns the produced images so tests/docs can assert on them; run as
``python -m ideepcolor_tpu.apps.demos [img] [out_dir]`` to write PNGs.
"""

from __future__ import annotations

import os

import numpy as np

from .. import api
from ..models import global_stats
from ..ops.hints import put_point


def demo_local_hints(img_path: str, weights: str = '', Xd: int = 256,
                     backend: str = 'caffe'):
    """The local-hints notebook session (DemoInteractiveColorization):
    zero-hint auto colorization, then two user points."""
    if backend == 'caffe':
        model = api.ColorizeImageJaxCaffe(Xd=Xd)
        model.prep_net(0, caffemodel_path=weights)
    else:
        model = api.ColorizeImageJax(Xd=Xd)
        model.prep_net(path=weights)
    model.load_image(img_path)

    results = {}
    input_ab = np.zeros((2, Xd, Xd))
    mask = np.zeros((1, Xd, Xd))
    model.net_forward(input_ab, mask)
    results['auto'] = model.get_img_fullres()
    results['gray'] = model.get_img_gray_fullres()

    # a blue point in the middle (notebook cell 7 values, scaled to Xd)
    sc = Xd / 256.0
    put_point(input_ab, mask, [int(135 * sc), int(160 * sc)],
              max(1, int(3 * sc)), [23, -69])
    model.net_forward(input_ab, mask)
    results['hint1'] = model.get_img_fullres()
    results['hint1_input'] = model.get_input_img_fullres()
    results['hint1_mask'] = model.get_img_mask_fullres()

    # a gray point (notebook cell 9)
    put_point(input_ab, mask, [int(100 * sc), int(160 * sc)],
              max(1, int(3 * sc)), [0, 0])
    model.net_forward(input_ab, mask)
    results['hint2'] = model.get_img_fullres()
    return results


def demo_global_histogram(img_path: str, ref_path: str, weights: str = '',
                          Xd: int = 256):
    """The histogram-transfer notebook session
    (DemoGlobalHistogramTransfer): colorize with and without a reference
    image's global ab histogram."""
    import cv2
    cid = api.ColorizeImageJaxCaffeGlobDist(Xd=Xd)
    cid.prep_net(0, caffemodel_path=weights)
    cid.load_image(img_path)

    input_ab = np.zeros((2, Xd, Xd))
    input_mask = np.zeros((1, Xd, Xd))

    cid.net_forward(input_ab, input_mask)
    auto = cid.get_img_fullres()

    ref = cv2.cvtColor(cv2.imread(ref_path, 1), cv2.COLOR_BGR2RGB)
    ref_rs = cv2.resize(ref, (Xd, Xd))
    glob_dist = np.asarray(global_stats.extract(
        ref_rs.astype(np.float32) / 255.0)["glob_ab_313"])

    cid.net_forward(input_ab, input_mask, glob_dist)
    withref = cid.get_img_fullres()
    return {"auto": auto, "with_ref": withref, "glob_dist": glob_dist,
            "gray": cid.get_img_gray_fullres()}


def main(argv=None):
    from ..config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import sys
    argv = argv if argv is not None else sys.argv[1:]
    img = argv[0] if argv else '/root/reference/test_imgs/mortar_pestle.jpg'
    out = argv[1] if len(argv) > 1 else './demo_out'
    os.makedirs(out, exist_ok=True)
    import cv2
    res = demo_local_hints(img)
    for k, v in res.items():
        cv2.imwrite(os.path.join(out, f'local_{k}.png'), v[:, :, ::-1])
    print(f'wrote {len(res)} local-hints results to {out}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
