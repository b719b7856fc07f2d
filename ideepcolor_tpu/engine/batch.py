"""Batched engines: full-res fusion throughput and DP-sharded batch
colorization.

Covers the BASELINE.json scale configs the reference cannot express (it is
strictly batch-1 single-device — SURVEY.md section 2.4):
  * config 4 — "Full-res fusion: 2048px inputs, batched 32-image
    ab-upsample + L-fusion throughput": one jitted program per batch,
    upsample as MXU matmuls + fused lab2rgb (engine.pipeline.fullres_fuse
    semantics, batched).
  * batched hint-conditioned forwards for serving, sharded over the mesh's
    'data' axis — XLA partitions the conv U-Net per image with zero
    cross-device traffic (embarrassingly parallel over batch).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from ..models import siggraph
from ..ops import colorspace as cs
from ..ops.resize import zoom_to_matmul
from ..parallel import mesh as pmesh


@partial(jax.jit, static_argnames=("out_hw",))
def batch_fullres_fuse(l_full: jax.Array, ab_small: jax.Array,
                       out_hw: tuple[int, int]) -> jax.Array:
    """(N,H,W,1) full-res L + (N,h,w,2) predicted ab -> (N,H,W,3) uint8.

    The batched form of the reference's get_img_fullres chain
    (ref data/colorize_image.py:123-131), as one device program. The batch
    loops via lax.map: each image is an independent matmul-resize + fused
    lab2rgb, and mapping keeps the live intermediate one image wide
    (a 32 x 2048^2 batched einsum would hold >1 GB of f32 intermediates
    and stresses the compiler for zero throughput gain — the per-image
    work already saturates the chip).
    """
    def one(args):
        l, ab = args
        ab_up = zoom_to_matmul(ab, out_hw)
        return cs.lab_to_rgb_u8(jnp.concatenate([l, ab_up], axis=-1))

    return jax.lax.map(one, (l_full, ab_small))


@jax.jit
def batch_forward_frames(params, l_mc: jax.Array, hint_ab: jax.Array,
                         hint_mask: jax.Array, maskcent: jax.Array
                         ) -> tuple[jax.Array, jax.Array]:
    """Batched hint-conditioned colorization: (N,Xd,Xd,*) inputs ->
    (uint8 frames (N,Xd,Xd,3), predicted ab). One program; shard the batch
    axis over the 'data' mesh axis for multi-chip throughput."""
    ab = siggraph.apply(params, l_mc, hint_ab, hint_mask, maskcent,
                        dist=False, precision_name="default")
    l_raw = l_mc + 50.0
    rgb = cs.lab_to_rgb_u8(jnp.concatenate([l_raw, ab], axis=-1))
    return rgb, ab


@jax.jit
def batch_forward_frames_table(params, l_mc: jax.Array, boxes: jax.Array,
                               values: jax.Array, counts: jax.Array,
                               maskcent: jax.Array
                               ) -> tuple[jax.Array, jax.Array]:
    """Batched colorization fed by per-image hint TABLES: (N,M,4) int32
    boxes + (N,M,2) values + (N,) live counts instead of dense planes.

    The memory-stable serving form on transports that retain upload bytes
    (CLAUDE.md: host RSS grows ~= bytes uploaded): per-image hint uploads
    shrink from ~768 KB dense (ab, mask) planes to ~1.5 KB of table, with
    rasterization riding inside the program (vmapped
    ops.hints.rasterize_hints) — the batched form of the GUI's table-click
    path."""
    from ..ops.hints import rasterize_hints
    size = l_mc.shape[1]
    hint_ab, hint_mask = jax.vmap(
        lambda b, v, c: rasterize_hints(b, v, c, size=size))(
        boxes, values, counts)
    return batch_forward_frames(params, l_mc, hint_ab, hint_mask, maskcent)


def frame_delta_stats(a, b):
    """(max |delta| in uint8 LSBs, fraction of exactly-equal pixels)
    between two uint8 frame stacks. Sharded-vs-unsharded audits use this
    instead of array_equal: DP-splitting the batch changes each device's
    LOCAL conv batch size, and XLA's conv codegen is batch-size-dependent
    at the float LSB, which can flip isolated uint8 pixels by 1 — the
    accepted sharding-equivalence contract is max 1 LSB on <0.1% of
    pixels (same framing as the TP reduction-split note in
    __graft_entry__.dryrun_multichip)."""
    import numpy as np
    d = np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16))
    return int(d.max()), float((d == 0).all(axis=-1).mean())


def mesh_batch_align(mesh) -> int:
    """Batch-axis alignment of a mesh: the product of every axis the
    leading (batch) dimension shards over (`parallel.mesh.batch_sharding`
    uses dcn x data)."""
    return (mesh.shape.get(pmesh.DCN_AXIS, 1)
            * mesh.shape.get(pmesh.DATA_AXIS, 1))


def _pad_batch(n: int, align: int, *arrays):
    """Pad each array's leading axis from n up to the next multiple of
    ``align`` by repeating its row 0 (shape-stable; padded rows are
    DISCARDED by the caller, so their content only has to be valid, not
    meaningful — hint counts in padded rows ride along as copies of row
    0, which is always a legal table). Returns (n_padded, arrays)."""
    pad = (-n) % align
    if pad == 0:
        return n, arrays
    out = []
    for a in arrays:
        fill = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
        out.append(jnp.concatenate([a, fill], axis=0))
    return n + pad, tuple(out)


def colorize_batch_table(params, images_rgb, boxes, values, counts,
                         maskcent: float = 0.0, mesh=None):
    """Table-hint form of :func:`colorize_batch`: uint8 RGB images +
    per-image hint tables in, colorized uint8 frames out.

    With ``mesh``, batches whose length does not divide the mesh's batch
    alignment are padded (row-0 replicas) before sharding and the padded
    frames are dropped on return — callers may pass any n >= 1.
    """
    import numpy as np
    imgs = jnp.asarray(np.asarray(images_rgb))
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    boxes = jnp.asarray(boxes, jnp.int32)
    values = jnp.asarray(values, jnp.float32)
    counts = jnp.asarray(counts, jnp.int32)
    l_mc = _prep_l_mc(imgs)
    mc = jnp.float32(maskcent)
    if mesh is not None:
        n = int(l_mc.shape[0])
        _, (l_mc, boxes, values, counts) = _pad_batch(
            n, mesh_batch_align(mesh), l_mc, boxes, values, counts)
        fn, place = make_sharded_table_forward(mesh)
        with mesh:
            l_mc, boxes, values, counts = place(l_mc, boxes, values,
                                                counts)
            rgb, _ab = fn(params, l_mc, boxes, values, counts, mc)
        return np.asarray(rgb)[:n]
    rgb, _ab = batch_forward_frames_table(params, l_mc, boxes, values,
                                          counts, mc)
    return np.asarray(rgb)


def colorize_batch(params, images_rgb, hint_ab=None, hint_mask=None,
                   maskcent: float = 0.0, mesh=None):
    """Convenience batched serving: uint8 RGB images in, colorized uint8
    frames out.

    images_rgb: (N, S, S, 3) uint8 or float [0,1]; optional dense hints
    (N, S, S, 2)/(N, S, S, 1). With ``mesh``, the batch shards over its
    'data' axis. The grayscale L is extracted on device; hints default to
    zero (automatic colorization).
    """
    import numpy as np
    from ..ops import colorspace as cs

    imgs = jnp.asarray(np.asarray(images_rgb))
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    n, s = imgs.shape[0], imgs.shape[1]
    if hint_ab is None:
        hint_ab = jnp.zeros((n, s, s, 2), jnp.float32)
    if hint_mask is None:
        hint_mask = jnp.zeros((n, s, s, 1), jnp.float32)
    hint_ab = jnp.asarray(hint_ab, jnp.float32)
    hint_mask = jnp.asarray(hint_mask, jnp.float32)

    l_mc = _prep_l_mc(imgs)
    mc = jnp.float32(maskcent)
    if mesh is not None:
        _, (l_mc, hint_ab, hint_mask) = _pad_batch(
            n, mesh_batch_align(mesh), l_mc, hint_ab, hint_mask)
        fn, place = make_sharded_batch_forward(mesh)
        with mesh:
            l_mc, hint_ab, hint_mask = place(l_mc, hint_ab, hint_mask)
            rgb, _ab = fn(params, l_mc, hint_ab, hint_mask, mc)
        return np.asarray(rgb)[:n]
    rgb, _ab = batch_forward_frames(params, l_mc, hint_ab, hint_mask, mc)
    return np.asarray(rgb)


# module-level jits: per-call wrappers would retrace/recompile the full
# U-Net on EVERY request (15-25 s per compile on a tunneled chip)
@jax.jit
def _prep_l_mc(x):
    return cs.rgb_to_lab(x)[..., :1] - 50.0


@functools.lru_cache(maxsize=8)
def _sharded_forward_for(mesh):
    batch_s = pmesh.batch_sharding(mesh)
    return jax.jit(batch_forward_frames,
                   out_shardings=(batch_s, batch_s)), batch_s


@functools.lru_cache(maxsize=8)
def _sharded_table_forward_for(mesh):
    batch_s = pmesh.batch_sharding(mesh)
    return jax.jit(batch_forward_frames_table,
                   out_shardings=(batch_s, batch_s)), batch_s


def make_sharded_table_forward(mesh):
    """DP-sharded table-hint batched forward (cached per mesh)."""
    fn, batch_s = _sharded_table_forward_for(mesh)

    def place_batch(*arrays):
        return tuple(jax.device_put(a, batch_s) for a in arrays)

    return fn, place_batch


@partial(jax.jit, static_argnames=("K", "N"))
def batch_suggest_table(params, l_mc, boxes, values, counts, hs, ws,
                        centers_tbl, key, maskcent, K: int = 9,
                        N: int = 25000):
    """Batched serving suggest: per-image hint tables + click coordinates
    -> K-color suggestion palettes, ONE program over the whole batch.

    The batched form of the fused /suggest chain
    (engine.pipeline.make_table_suggest_program): vmapped device hint
    rasterize, ONE dist forward over the batch (the SIGGRAPH 529-way
    head at H/4, ref models/pytorch/model.py:131,160), then a vmapped
    CMF-sample + weighted k-means + Lab->RGB palette per image. Each
    image draws an independent PRNG stream via fold_in(key, index).
    Returns (colors_u8 (B,K,3), conf (B,K)); batch axis shards over the
    mesh's data axis — per-image suggestion work is embarrassingly
    parallel, so XLA partitions it with zero cross-device traffic.
    """
    from ..ops import kmeans as km
    from ..ops.hints import rasterize_hints
    size = l_mc.shape[1]
    hint_ab, hint_mask = jax.vmap(
        lambda b, v, c: rasterize_hints(b, v, c, size=size))(
        boxes, values, counts)
    _reg, dist_map = siggraph.apply(
        params, l_mc, hint_ab, hint_mask, maskcent, dist=True,
        precision_name="default", dist_lowres=True)

    def one(l_img, dm, h, w, i):
        pdf = dm[h // 4, w // 4, :]
        centers, conf = km.ab_recommendations(
            pdf, centers_tbl, jax.random.fold_in(key, i), K=K, N=N)
        lum = jnp.full((K, 1), l_img[h, w, 0] + 50.0, jnp.float32)
        colors = cs.lab_to_rgb_u8(
            jnp.concatenate([lum, centers], axis=1)[:, None, :])[:, 0, :]
        return colors, conf

    idx = jnp.arange(l_mc.shape[0], dtype=jnp.int32)
    return jax.vmap(one)(l_mc, dist_map, hs, ws, idx)


@functools.lru_cache(maxsize=8)
def _sharded_suggest_for(mesh):
    batch_s = pmesh.batch_sharding(mesh)
    return jax.jit(batch_suggest_table, static_argnames=("K", "N"),
                   out_shardings=(batch_s, batch_s)), batch_s


def suggest_batch_table(params, images_rgb, boxes, values, counts, hs, ws,
                        K: int = 9, N: int = 25000, maskcent: float = 0.0,
                        mesh=None, seed: int = 0):
    """Public batched /suggest: uint8 RGB images + hint tables + click
    points in, (colors_u8 (n,K,3), conf (n,K)) out. With ``mesh`` the
    batch shards over its data axis, padded (row-0 replicas, results
    dropped) when n does not divide the mesh batch alignment."""
    import numpy as np
    from ..ops.quantize import make_pts_grid
    imgs = jnp.asarray(np.asarray(images_rgb))
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    boxes = jnp.asarray(boxes, jnp.int32)
    values = jnp.asarray(values, jnp.float32)
    counts = jnp.asarray(counts, jnp.int32)
    hs = jnp.asarray(hs, jnp.int32)
    ws = jnp.asarray(ws, jnp.int32)
    l_mc = _prep_l_mc(imgs)
    centers_tbl = jnp.asarray(make_pts_grid(), jnp.float32)
    key = jax.random.key(seed)
    mc = jnp.float32(maskcent)
    if mesh is not None:
        n = int(l_mc.shape[0])
        _, (l_mc, boxes, values, counts, hs, ws) = _pad_batch(
            n, mesh_batch_align(mesh), l_mc, boxes, values, counts, hs, ws)
        fn, batch_s = _sharded_suggest_for(mesh)
        with mesh:
            l_mc, boxes, values, counts, hs, ws = (
                jax.device_put(a, batch_s)
                for a in (l_mc, boxes, values, counts, hs, ws))
            colors, conf = fn(params, l_mc, boxes, values, counts, hs, ws,
                              centers_tbl, key, mc, K=K, N=N)
        return np.asarray(colors)[:n], np.asarray(conf)[:n]
    colors, conf = batch_suggest_table(params, l_mc, boxes, values, counts,
                                       hs, ws, centers_tbl, key, mc,
                                       K=K, N=N)
    return np.asarray(colors), np.asarray(conf)


@jax.jit
def batch_forward_frames_global(params, l_mc, hints3, glob):
    """Batched GLOBAL-HISTOGRAM conditioned forward (the one serving
    variant with its own input signature — ref
    models/global_model/deploy_nodist.prototxt:7-18): mean-centered NHWC
    L planes + dense 3-ch hint planes + per-image (N, 314) histogram
    blobs (313 bins + on/off flag) -> (uint8 frames, predicted ab).

    Every input including the histogram shards over the 'data' mesh
    axis; the 1x1-conv histogram MLP and its conv4 trunk broadcast are
    per-image, so XLA partitions with zero cross-device traffic."""
    from ..models import caffe_net
    blob = jnp.concatenate([l_mc, hints3], axis=-1)
    ab = caffe_net.apply_global(params, blob, glob)
    l_raw = l_mc + 50.0
    rgb = cs.lab_to_rgb_u8(jnp.concatenate([l_raw, ab], axis=-1))
    return rgb, ab


@functools.lru_cache(maxsize=8)
def _sharded_global_forward_for(mesh):
    batch_s = pmesh.batch_sharding(mesh)
    return jax.jit(batch_forward_frames_global,
                   out_shardings=(batch_s, batch_s)), batch_s


def colorize_batch_global(params, images_rgb, glob_dists, hints3=None,
                          mesh=None):
    """Public batched global-histogram serving: uint8 RGB images +
    (N, 314) histogram blobs (rows may be all-zero = unconditioned, the
    glob_dist=-1 sentinel) in, colorized uint8 frames out. With ``mesh``
    the batch (histograms included) shards over its data axis, padded
    with row-0 replicas when n does not divide the alignment."""
    import numpy as np
    imgs = jnp.asarray(np.asarray(images_rgb))
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    n, s = int(imgs.shape[0]), int(imgs.shape[1])
    glob = jnp.asarray(glob_dists, jnp.float32)
    if hints3 is None:
        hints3 = jnp.zeros((n, s, s, 3), jnp.float32)
    hints3 = jnp.asarray(hints3, jnp.float32)
    l_mc = _prep_l_mc(imgs)
    if mesh is not None:
        _, (l_mc, hints3, glob) = _pad_batch(
            n, mesh_batch_align(mesh), l_mc, hints3, glob)
        fn, batch_s = _sharded_global_forward_for(mesh)
        with mesh:
            l_mc, hints3, glob = (jax.device_put(a, batch_s)
                                  for a in (l_mc, hints3, glob))
            rgb, _ab = fn(params, l_mc, hints3, glob)
        return np.asarray(rgb)[:n]
    rgb, _ab = batch_forward_frames_global(params, l_mc, hints3, glob)
    return np.asarray(rgb)


@jax.jit
def batch_stream_window_u8(params, gray_u8, boxes, values, count,
                           maskcent):
    """A WINDOW of video frames through the streaming step in one
    program: (T, S, S, 1) uint8 gray frames + ONE shared hint table
    (engine.streaming._stream_step_u8_table semantics: device
    rasterize, linear u8 -> L dequant) -> (T, S, S, 3) uint8 frames.

    The frame axis shards over the 'data' mesh axis (hint table and
    params replicated): a mesh chews T frames per dispatch, turning the
    single-chip pipelined stream into multi-chip streaming throughput
    while each frame's numerics stay those of the per-frame step."""
    from ..ops.hints import rasterize_hints
    size = gray_u8.shape[1]
    ab, mask = rasterize_hints(boxes, values, count, size=size)
    t = gray_u8.shape[0]
    hint_ab = jnp.broadcast_to(ab[None], (t,) + ab.shape)
    hint_mask = jnp.broadcast_to(mask[None], (t,) + mask.shape)
    l_raw = gray_u8.astype(jnp.float32) * (100.0 / 255.0)
    ab_pred = siggraph.apply(params, l_raw - 50.0, hint_ab, hint_mask,
                             maskcent, dist=False,
                             precision_name="default")
    return cs.lab_to_rgb_u8(jnp.concatenate([l_raw, ab_pred], axis=-1))


@functools.lru_cache(maxsize=8)
def _sharded_stream_window_for(mesh):
    batch_s = pmesh.batch_sharding(mesh)
    return jax.jit(batch_stream_window_u8,
                   out_shardings=batch_s), batch_s


def stream_window_u8(params, frames_u8, boxes, values, count,
                     maskcent: float = 0.0, mesh=None):
    """Public multi-frame streaming step: (T, S, S, 1) uint8 gray frames
    + one tracked-hint table in, (T, S, S, 3) uint8 colorized frames
    out. With ``mesh`` the frame window shards over its data axis
    (padded with frame-0 replicas, padding dropped on return)."""
    import numpy as np
    frames = jnp.asarray(np.asarray(frames_u8), jnp.uint8)
    boxes = jnp.asarray(boxes, jnp.int32)
    values = jnp.asarray(values, jnp.float32)
    count = jnp.asarray(count, jnp.int32)
    mc = jnp.float32(maskcent)
    if mesh is not None:
        t = int(frames.shape[0])
        _, (frames,) = _pad_batch(t, mesh_batch_align(mesh), frames)
        fn, batch_s = _sharded_stream_window_for(mesh)
        with mesh:
            frames = jax.device_put(frames, batch_s)
            rgb = fn(params, frames, boxes, values, count, mc)
        return np.asarray(rgb)[:t]
    return np.asarray(batch_stream_window_u8(params, frames, boxes,
                                             values, count, mc))


def make_sharded_batch_forward(mesh):
    """DP-sharded batched forward over a mesh: inputs sharded on 'data',
    params replicated. Returns (fn, place_batch) helpers. The jitted
    forward is cached per mesh so repeated serving calls reuse one
    compiled program."""
    fn, batch_s = _sharded_forward_for(mesh)

    def place_batch(*arrays):
        return tuple(jax.device_put(a, batch_s) for a in arrays)

    return fn, place_batch
