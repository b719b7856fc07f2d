from . import colorspace, quantize, gamut, hints, resize, kmeans  # noqa: F401
