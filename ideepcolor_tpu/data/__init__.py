from . import color_bins  # noqa: F401
