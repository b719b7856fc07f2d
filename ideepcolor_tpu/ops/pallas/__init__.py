from . import colorspace_kernel  # noqa: F401
