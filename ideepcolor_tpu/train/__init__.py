from . import distill, losses, hints_sim, step  # noqa: F401
