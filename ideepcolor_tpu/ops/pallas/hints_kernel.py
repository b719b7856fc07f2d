"""Pallas TPU kernel: hint-table rasterization with scalar prefetch.

The jnp rasterizer (ops/hints.py) materializes a (MAX_HINTS, S, S) boolean
membership tensor (~4 MB of VPU traffic at 256^2 x 64 slots). This kernel
streams (TILE, W) slabs through VMEM instead: the hint table rides the
scalar-prefetch path (SMEM, available before the body runs), and each slab
replays the live hints in order with predicated overwrites — the same
last-hint-wins semantics, O(S^2) memory, one pass.

Measured on v5e: bit-exact vs the jnp path; XLA's broadcast version is
marginally faster at 256^2 (1.2 vs 1.7 ms incl. readback), so the jnp
path remains the default — this kernel is the validated scalar-prefetch
template for heavier table-driven scatter work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hints import MAX_HINTS


def _raster_kernel(boxes_ref, values_ref, count_ref, ab_ref, mask_ref):
    i = pl.program_id(0)
    tile = ab_ref.shape[0]
    w = ab_ref.shape[1]
    y0 = i * tile

    ys = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 0) + y0
    xs = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)

    def body(k, carry):
        a, b, m = carry
        inside = ((ys >= boxes_ref[k, 0]) & (ys <= boxes_ref[k, 2])
                  & (xs >= boxes_ref[k, 1]) & (xs <= boxes_ref[k, 3])
                  & (k < count_ref[0]))
        a = jnp.where(inside, values_ref[k, 0], a)
        b = jnp.where(inside, values_ref[k, 1], b)
        m = jnp.where(inside, 1.0, m)
        return a, b, m

    zero = jnp.zeros((tile, w), jnp.float32)
    a, b, m = jax.lax.fori_loop(0, MAX_HINTS, body, (zero, zero, zero))
    ab_ref[:, :, 0] = a
    ab_ref[:, :, 1] = b
    mask_ref[:, :, 0] = m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("size", "tile"))
def rasterize_hints_pallas(boxes: jax.Array, values: jax.Array,
                           count: jax.Array, size: int = 256,
                           tile: int = 64):
    """Same contract as ops.hints.rasterize_hints, Pallas implementation.

    boxes (M,4) int32 [y1,x1,y2,x2] inclusive; values (M,2) f32; count ()
    int32 -> (ab (size,size,2), mask (size,size,1)).
    """
    grid = (pl.cdiv(size, tile),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # boxes, values, count in SMEM
        grid=grid,
        in_specs=[],
        out_specs=(
            pl.BlockSpec((tile, size, 2), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, size, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    ab, mask = pl.pallas_call(
        _raster_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((size, size, 2), jnp.float32),
            jax.ShapeDtypeStruct((size, size, 1), jnp.float32),
        ),
        interpret=not _on_tpu(),
    )(boxes.astype(jnp.int32), values.astype(jnp.float32),
      count.reshape(1).astype(jnp.int32))
    return ab, mask
