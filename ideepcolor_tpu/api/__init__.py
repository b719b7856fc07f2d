from .colorize import (  # noqa: F401
    ColorizeImageBase,
    ColorizeImageJax,
    ColorizeImageJaxDist,
    ColorizeImageJaxCaffe,
    ColorizeImageJaxCaffeDist,
    ColorizeImageJaxCaffeGlobDist,
    # Drop-in aliases matching the reference backend names
    ColorizeImageTorch,
    ColorizeImageTorchDist,
    ColorizeImageCaffe,
    ColorizeImageCaffeDist,
    ColorizeImageCaffeGlobDist,
    lab2rgb_transpose,
    rgb2lab_transpose,
)
