"""Drop-in module for reference-style code: re-exports the TPU backends
under the reference's import path and class names
(ref usage: `from data import colorize_image as CI` in ideepcolor.py:10
and both demo notebooks)."""

from ideepcolor_tpu.api.colorize import (  # noqa: F401
    ColorizeImageBase,
    ColorizeImageCaffe,
    ColorizeImageCaffeDist,
    ColorizeImageCaffeGlobDist,
    ColorizeImageTorch,
    ColorizeImageTorchDist,
    lab2rgb_transpose,
    rgb2lab_transpose,
)
from ideepcolor_tpu.utils.session import create_temp_directory  # noqa: F401
