"""Minimal caffe-API shim for reference-style code (repo-root drop-in).

The reference's global-histogram notebook drives a weightless Caffe graph
through the raw blob interface (ref DemoGlobalHistogramTransfer.ipynb
cells 1-9: ``caffe.Net(global_stats.prototxt, ...)``, blob stuffing,
``net.forward()``, reading ``gt_glob_ab_313_drop``). This shim emulates
exactly that surface on top of :mod:`ideepcolor_tpu.models.global_stats`,
so the notebook's code runs verbatim without Caffe.

Only the statistics graph is emulated; colorization itself goes through
``data.colorize_image`` (the reference's own API boundary). Anything else
raises with a pointer to the native path.
"""

from __future__ import annotations

import numpy as np

TEST = 1
TRAIN = 0


def set_mode_cpu():
    pass


def set_mode_gpu():
    pass


def set_device(gpu_id):
    pass


class _Blob:
    def __init__(self, shape):
        self.data = np.zeros(shape, np.float32)


class Net:
    """Blob-interface emulation of the reference's global_stats graph
    (ref models/global_model/global_stats.prototxt)."""

    def __init__(self, prototxt_path, *args, **kwargs):
        if "global_stats" not in str(prototxt_path):
            raise NotImplementedError(
                "this shim only emulates the global_stats graph; use "
                "ideepcolor_tpu.api / models.caffe_net for colorization")
        self._size = 256
        self.blobs = {
            "img_bgr": _Blob((1, 3, self._size, self._size)),
            "gt_glob_ab_313_drop": _Blob((1, 314, 1, 1)),
            "s_avg_drop": _Blob((1, 2, 1, 1)),
            "b_avg_drop": _Blob((1, 2, 1, 1)),
            "g_avg_drop": _Blob((1, 2, 1, 1)),
            "r_avg_drop": _Blob((1, 2, 1, 1)),
        }

    def forward(self):
        from ideepcolor_tpu.models import global_stats
        bgr = self.blobs["img_bgr"].data[0]          # (3, H, W) BGR
        rgb = bgr[::-1].transpose(1, 2, 0)
        if rgb.max() > 1.5:                          # uint8-scale input
            rgb = rgb / 255.0
        stats = global_stats.extract(np.ascontiguousarray(
            rgb.astype(np.float32)))
        glob = np.asarray(stats["glob_ab_313"])
        self.blobs["gt_glob_ab_313_drop"].data[0, :-1, 0, 0] = glob
        self.blobs["gt_glob_ab_313_drop"].data[0, -1, 0, 0] = 1.0
        self.blobs["s_avg_drop"].data[0, :, 0, 0] = [
            float(stats["s_avg"]), 1.0]
        bgr_avg = np.asarray(stats["bgr_avg"])
        for i, name in enumerate(("b_avg_drop", "g_avg_drop",
                                  "r_avg_drop")):
            self.blobs[name].data[0, :, 0, 0] = [float(bgr_avg[i]), 1.0]
        return {}


class io:
    """caffe.io.load_image / resize_image equivalents (float RGB [0,1])."""

    @staticmethod
    def load_image(path):
        import cv2
        im = cv2.cvtColor(cv2.imread(str(path), 1), cv2.COLOR_BGR2RGB)
        return im.astype(np.float64) / 255.0

    @staticmethod
    def resize_image(im, new_dims, interp_order=1):
        import cv2
        interp = cv2.INTER_LINEAR if interp_order == 1 else cv2.INTER_NEAREST
        return cv2.resize(im.astype(np.float32),
                          (int(new_dims[1]), int(new_dims[0])),
                          interpolation=interp).astype(np.float64)
