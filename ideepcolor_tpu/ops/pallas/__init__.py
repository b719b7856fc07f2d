from . import colorspace_kernel, hints_kernel  # noqa: F401
