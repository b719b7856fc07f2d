from . import ndarray, profiling, session, visualize  # noqa: F401
