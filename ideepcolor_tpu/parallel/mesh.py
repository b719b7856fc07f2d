"""Device mesh + sharding utilities.

The reference is strictly single-process / single-device / batch-1 (no
NCCL/MPI/Gloo anywhere in its tree — SURVEY.md section 2.4); parallel scaling
is therefore new, TPU-native capability, scoped to what the workload can use:

  * data parallelism over batch for the batched/streaming/training configs
    (ICI all-reduce of gradients, inserted by XLA from sharding annotations);
  * tensor parallelism on the 529-way classification head (the only layer
    wide enough to benefit) as a demonstration of model sharding.

One 256x256 U-Net forward fits on a fraction of one v5e chip, so inference
latency never needs multi-chip; throughput does.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first n devices.

    model_parallel must divide n_devices; default 1 = pure DP.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % model_parallel:
        raise ValueError(f"{model_parallel=} must divide {n=}")
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(dcn_parallel: int | None = None,
                     model_parallel: int = 1) -> Mesh:
    """(dcn, data, model) mesh for multi-host scale-out.

    The outermost ``dcn`` axis maps across hosts/slices (the slow DCN
    links); ``data``/``model`` stay within a slice's ICI. Batch
    parallelism over (dcn, data) needs no cross-image communication, so
    DCN only ever carries the gradient all-reduce in training — the
    layout XLA wants for hierarchical collectives (reduce-scatter over
    ICI, then the small cross-host sum over DCN).

    On a real multi-process run the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` (contiguous per-host
    granules). Single-process (incl. the virtual CPU test mesh): the
    process-local device list is reshaped, with ``dcn_parallel``
    emulating the host count.
    """
    devs = jax.devices()
    mp = model_parallel
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        n_hosts = dcn_parallel or jax.process_count()
        if len(devs) % n_hosts or (len(devs) // n_hosts) % mp:
            raise ValueError(
                f"dcn={n_hosts} x {model_parallel=} must divide "
                f"{len(devs)} devices")
        n_local = len(devs) // n_hosts
        grid = mesh_utils.create_hybrid_device_mesh(
            (1, n_local // mp, mp), (n_hosts, 1, 1), devices=devs)
    else:
        dcn = dcn_parallel or 1
        n = len(devs)
        if n % (dcn * mp):
            raise ValueError(f"{dcn=} x {model_parallel=} must divide {n=}")
        grid = np.array(devs).reshape(dcn, n // (dcn * mp), mp)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis — and over the
    dcn (cross-host) axis too when the mesh has one, so one annotation
    serves both single-slice and multi-host meshes."""
    axes = tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameters wide enough to shard over the model axis: the 512-channel
# dilated trunk convs (the FLOP-dominant layers). Out-channel axis of HWIO
# weights + matching biases; XLA propagates the activation sharding and
# inserts the collectives.
_TP_PARAM_RULES = {}
for _blk in ("model5", "model6", "model7"):
    for _i in (0, 2, 4):
        _TP_PARAM_RULES[f"{_blk}.{_i}.weight"] = P(None, None, None,
                                                   MODEL_AXIS)
        _TP_PARAM_RULES[f"{_blk}.{_i}.bias"] = P(MODEL_AXIS)


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """Per-parameter NamedShardings: TP rules where they apply, replicated
    elsewhere."""
    return {
        k: NamedSharding(mesh, _TP_PARAM_RULES.get(k, P()))
        for k in params
    }


def shard_params(params: dict, mesh: Mesh) -> dict:
    shardings = param_shardings(params, mesh)
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}
