"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this executes at
conftest collection time. Benchmarks (bench.py) run on the real TPU chip,
outside pytest.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the parity tests jit big U-Nets at HIGHEST
# precision; caching cuts repeat suite runs from minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/ideepcolor_tpu_test_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config knob does work. Without this, 'CPU' tests silently run over the
# TPU tunnel (~26 ms RPC per dispatch).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
