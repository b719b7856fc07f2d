from . import losses, hints_sim, step  # noqa: F401
