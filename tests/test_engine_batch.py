import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ideepcolor_tpu.engine import batch as eb, streaming
from ideepcolor_tpu.models import siggraph
from ideepcolor_tpu.parallel import mesh as pmesh

RNG = np.random.default_rng(11)


def test_batch_fullres_fuse_matches_single():
    from ideepcolor_tpu.engine import pipeline as P
    l = RNG.uniform(0, 100, (3, 64, 80, 1)).astype(np.float32)
    ab = RNG.uniform(-60, 60, (3, 16, 16, 2)).astype(np.float32)
    out = np.asarray(eb.batch_fullres_fuse(jnp.asarray(l), jnp.asarray(ab),
                                           (64, 80)))
    assert out.shape == (3, 64, 80, 3) and out.dtype == np.uint8
    one = np.asarray(P.fullres_fuse(jnp.asarray(l[1]), jnp.asarray(ab[1]),
                                    (64, 80)))
    assert np.mean(out[1].astype(int) != one.astype(int)) < 1e-3


@pytest.mark.slow
def test_sharded_batch_forward_matches_unsharded():
    params = siggraph.init_params(jax.random.key(0))
    mesh = pmesh.make_mesh(8, model_parallel=1)
    fn, place = eb.make_sharded_batch_forward(mesh)
    n = 8
    l_mc = RNG.uniform(-50, 50, (n, 32, 32, 1)).astype(np.float32)
    hab = np.zeros((n, 32, 32, 2), np.float32)
    hm = np.zeros((n, 32, 32, 1), np.float32)
    with mesh:
        li, hi, mi = place(l_mc, hab, hm)
        rgb_s, ab_s = fn(params, li, hi, mi, jnp.float32(0.0))
    rgb_u, ab_u = eb.batch_forward_frames(params, l_mc, hab, hm,
                                          jnp.float32(0.0))
    assert rgb_s.shape == (n, 32, 32, 3)
    assert np.asarray(ab_s).shape == (n, 32, 32, 2)
    # sharded and unsharded agree (bitwise may differ in reductions; use tol)
    assert np.max(np.abs(np.asarray(ab_s) - np.asarray(ab_u))) < 1e-3


def test_streaming_session_pipelines_and_matches_direct():
    params = siggraph.init_params(jax.random.key(1))
    sess = streaming.StreamingSession(params, size=32, depth=2)
    hint_ab = np.zeros((32, 32, 2), np.float32)
    hint_mask = np.zeros((32, 32, 1), np.float32)
    hint_ab[10:12, 10:12] = [30.0, -40.0]
    hint_mask[10:12, 10:12] = 1.0
    sess.set_hints(hint_ab, hint_mask)

    frames = [RNG.uniform(0, 100, (32, 32)).astype(np.float32)
              for _ in range(5)]
    outs = []
    for f in frames:
        r = sess.submit(f)
        if r is not None:
            outs.append(r)
    outs.extend(sess.drain())
    assert len(outs) == 5
    assert sess.frames_in == sess.frames_out == 5
    rgb0, dist0 = outs[0]
    assert rgb0.shape == (32, 32, 3) and rgb0.dtype == np.uint8
    # the suggestion distribution stays at H/4 on device (x4 nearest
    # lookups are index mappings)
    assert dist0.shape == (8, 8, 529)

    # direct (unpipelined) computation of frame 0 matches
    l = jnp.asarray(frames[0], jnp.float32)[None, ..., None]
    rgb_d, _ = streaming._stream_step(
        params, l, jnp.asarray(hint_ab)[None], jnp.asarray(hint_mask)[None],
        jnp.float32(0.0))
    assert np.array_equal(rgb0, np.asarray(rgb_d))   # already squeezed


def test_streaming_hint_swap_changes_output():
    params = siggraph.init_params(jax.random.key(2))
    sess = streaming.StreamingSession(params, size=32, depth=1,
                                      with_dist=False)
    frame = RNG.uniform(0, 100, (32, 32)).astype(np.float32)
    sess.submit(frame)
    out1, _ = sess.submit(frame)
    hint_ab = np.full((32, 32, 2), 50.0, np.float32)
    hint_mask = np.ones((32, 32, 1), np.float32)
    sess.set_hints(hint_ab, hint_mask)
    sess.submit(frame)
    out2, _ = sess.submit(frame)
    assert not np.array_equal(out1, out2)


def test_colorize_batch_convenience():
    params = siggraph.init_params(jax.random.key(3))
    imgs = (RNG.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    out = eb.colorize_batch(params, imgs)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8
    # with a mesh
    mesh = pmesh.make_mesh(4, model_parallel=1)
    out_m = eb.colorize_batch(params, imgs, mesh=mesh)
    assert np.mean(out_m.astype(int) != out.astype(int)) < 0.01


def test_streaming_uint8_frames_match_float_path():
    """uint8 gray submission dequantizes on device and must equal the
    float path fed the same dequantized L values."""
    import jax
    from ideepcolor_tpu.engine import streaming
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(0))
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    hint_ab = np.zeros((32, 32, 2), np.float32)
    hint_mask = np.zeros((32, 32, 1), np.float32)
    hint_ab[10:12, 10:12] = [30, -30]; hint_mask[10:12, 10:12] = 1

    s8 = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    s8.set_hints(hint_ab, hint_mask)
    sf = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    sf.set_hints(hint_ab, hint_mask)
    s8.submit(g)
    sf.submit(g.astype(np.float32) * (100.0 / 255.0))
    (rgb8, _), = s8.drain()
    (rgbf, _), = sf.drain()
    assert rgb8.dtype == np.uint8
    assert np.array_equal(rgb8, rgbf)


@pytest.mark.slow
def test_colorize_batch_table_uneven_mesh_pads_and_matches():
    """An n that does NOT divide the mesh batch alignment pads with row-0
    replicas, shards, and returns exactly n frames equal to the unsharded
    program (the --mesh serving contract for arbitrary bulk batches)."""
    params = siggraph.init_params(jax.random.key(4), width=0.25)
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    mesh = pmesh.make_mesh(4, model_parallel=1)
    assert eb.mesh_batch_align(mesh) == 4
    n = 7                                     # 7 % 4 != 0
    imgs = (RNG.random((n, 32, 32, 3)) * 255).astype(np.uint8)
    boxes = np.zeros((n, MAX_HINTS, 4), np.int32)
    values = np.zeros((n, MAX_HINTS, 2), np.float32)
    counts = np.ones((n,), np.int32)
    for i in range(n):
        boxes[i, 0] = [2 * i, 4, 2 * i + 3, 8]
        values[i, 0] = [30.0 - 5 * i, -10.0 + 4 * i]
    out_m = eb.colorize_batch_table(params, imgs, boxes, values, counts,
                                    mesh=mesh)
    out_u = eb.colorize_batch_table(params, imgs, boxes, values, counts)
    assert out_m.shape == (n, 32, 32, 3)
    max_lsb, frac_exact = eb.frame_delta_stats(out_m, out_u)
    assert max_lsb <= 1 and frac_exact >= 0.999, (max_lsb, frac_exact)
    # dense-plane form pads too
    out_dm = eb.colorize_batch(params, imgs, mesh=mesh)
    out_du = eb.colorize_batch(params, imgs)
    assert out_dm.shape == (n, 32, 32, 3)
    max_lsb, frac_exact = eb.frame_delta_stats(out_dm, out_du)
    assert max_lsb <= 1 and frac_exact >= 0.999, (max_lsb, frac_exact)


@pytest.mark.slow
def test_suggest_batch_table_sharded_matches_unsharded():
    """Batched fused /suggest (dist forward + CMF + k-means + palette):
    sharded-over-mesh equals the unsharded program, per-image PRNG streams
    are index-stable, confidences are a valid distribution slice."""
    params = siggraph.init_params(jax.random.key(5), width=0.25)
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    mesh = pmesh.make_mesh(4, model_parallel=1)
    n = 5                                     # uneven on purpose
    imgs = (RNG.random((n, 32, 32, 3)) * 255).astype(np.uint8)
    boxes = np.zeros((n, MAX_HINTS, 4), np.int32)
    values = np.zeros((n, MAX_HINTS, 2), np.float32)
    counts = np.ones((n,), np.int32)
    boxes[:, 0] = [8, 8, 12, 12]
    values[:, 0] = [20.0, -25.0]
    hs = np.asarray([4, 8, 12, 16, 20], np.int32)
    ws = np.asarray([20, 16, 12, 8, 4], np.int32)
    c_m, f_m = eb.suggest_batch_table(params, imgs, boxes, values, counts,
                                      hs, ws, K=4, N=2000, mesh=mesh)
    c_u, f_u = eb.suggest_batch_table(params, imgs, boxes, values, counts,
                                      hs, ws, K=4, N=2000)
    assert c_m.shape == (n, 4, 3) and c_m.dtype == np.uint8
    assert f_m.shape == (n, 4)
    assert np.array_equal(c_m, c_u)
    assert np.allclose(f_m, f_u)
    assert np.isfinite(f_m).all() and (f_m >= 0).all()
    # different images at different click points produce distinct palettes
    assert not np.array_equal(c_m[0], c_m[n - 1])


def test_batch_table_matches_dense_planes():
    """batch_forward_frames_table (on-device rasterize from ~1.5 KB
    tables) is bit-identical to the dense-plane form for the same hints."""
    import jax
    import jax.numpy as jnp
    from ideepcolor_tpu.engine.batch import (batch_forward_frames,
                                             batch_forward_frames_table)
    from ideepcolor_tpu.models import siggraph
    from ideepcolor_tpu.ops.hints import MAX_HINTS, rasterize_hints

    params = siggraph.init_params(jax.random.key(0), width=0.25)
    rng = np.random.default_rng(9)
    N, S = 3, 64
    l_mc = jnp.asarray(rng.uniform(-50, 50, (N, S, S, 1)), jnp.float32)
    boxes = np.zeros((N, MAX_HINTS, 4), np.int32)
    values = np.zeros((N, MAX_HINTS, 2), np.float32)
    counts = np.asarray([0, 1, 3], np.int32)
    boxes[1, 0] = [10, 10, 14, 14]; values[1, 0] = [40, -30]
    for j in range(3):
        boxes[2, j] = [5 + 12 * j, 30, 9 + 12 * j, 34]
        values[2, j] = [-20.0 * j, 15.0 * j]
    rgb_t, ab_t = batch_forward_frames_table(
        params, l_mc, jnp.asarray(boxes), jnp.asarray(values),
        jnp.asarray(counts), jnp.float32(0.0))
    dense = [rasterize_hints(jnp.asarray(boxes[i]), jnp.asarray(values[i]),
                             jnp.asarray(counts[i]), size=S)
             for i in range(N)]
    hab = jnp.stack([d[0] for d in dense])
    hm = jnp.stack([d[1] for d in dense])
    rgb_d, ab_d = batch_forward_frames(params, l_mc, hab, hm,
                                       jnp.float32(0.0))
    assert np.array_equal(np.asarray(rgb_t), np.asarray(rgb_d))
    assert np.array_equal(np.asarray(ab_t), np.asarray(ab_d))
    # the hinted images differ from the hint-less one
    assert not np.array_equal(np.asarray(rgb_t[0]), np.asarray(rgb_t[1]))
