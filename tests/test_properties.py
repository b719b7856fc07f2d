"""Property-based tests (hypothesis) over the core ops.

The oracle tests elsewhere pin exact parity on fixed cases; these
randomize VALUES under fixed shapes (each jitted op compiles once) and
assert the algebraic properties the rest of the framework relies on:
colorspace round trips, encoder normalization, device/host rasterizer
agreement, resize-matrix partition of unity, gamut-snap idempotence.

Seeds come in as hypothesis integers and expand through numpy RNG —
cheap to generate, fully reproducible from the failing seed.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

SEED = st.integers(0, 2**31 - 1)
FAST = settings(max_examples=20, deadline=None)


# ---------------------------------------------------------------- colorspace
@FAST
@given(SEED)
def test_rgb_lab_roundtrip(seed):
    from ideepcolor_tpu.ops import colorspace as cs
    rng = np.random.default_rng(seed)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    back = np.asarray(cs.lab_to_rgb(cs.rgb_to_lab(jnp.asarray(rgb))))
    assert np.allclose(back, rgb, atol=2e-3), np.abs(back - rgb).max()


@FAST
@given(SEED)
def test_lab_to_rgb_u8_is_rounded_float_path(seed):
    from ideepcolor_tpu.ops import colorspace as cs
    rng = np.random.default_rng(seed)
    lab = np.stack([rng.uniform(0, 100, (8, 8)),
                    rng.uniform(-110, 110, (8, 8)),
                    rng.uniform(-110, 110, (8, 8))], -1).astype(np.float32)
    u8 = np.asarray(cs.lab_to_rgb_u8(jnp.asarray(lab)))
    f = np.asarray(cs.lab_to_rgb(jnp.asarray(lab)))
    want = np.rint(np.clip(f, 0, 1) * 255).astype(np.uint8)
    # f32 values that land exactly mid-step may round either way
    assert np.abs(u8.astype(int) - want.astype(int)).max() <= 1


@FAST
@given(SEED)
def test_rgb_hsv_roundtrip(seed):
    from ideepcolor_tpu.ops import colorspace as cs
    rng = np.random.default_rng(seed)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    back = np.asarray(cs.hsv_to_rgb(cs.rgb_to_hsv(jnp.asarray(rgb))))
    assert np.allclose(back, rgb, atol=1e-4), np.abs(back - rgb).max()


@FAST
@given(SEED)
def test_device_host_rgb2lab_agree(seed):
    from ideepcolor_tpu.ops import colorspace as cs
    from ideepcolor_tpu.ops import host
    rng = np.random.default_rng(seed)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    dev = np.asarray(cs.rgb_to_lab(jnp.asarray(rgb)))
    hst = host.rgb2lab(rgb)
    assert np.allclose(dev, hst, atol=5e-3), np.abs(dev - hst).max()


# ------------------------------------------------------------------ quantize
@FAST
@given(SEED, st.sampled_from([1, 5, 10]))
def test_soft_encode_is_normalized(seed, nn):
    from ideepcolor_tpu.ops import quantize
    rng = np.random.default_rng(seed)
    ab = rng.uniform(-110, 110, (16, 2)).astype(np.float32)
    enc = np.asarray(quantize.soft_encode(jnp.asarray(ab), nn=nn))
    assert (enc >= 0).all()
    assert np.allclose(enc.sum(-1), 1.0, atol=1e-5)
    assert (np.count_nonzero(enc, axis=-1) <= nn).all()


@FAST
@given(SEED)
def test_soft_encode_decode_near_identity_in_hull(seed):
    from ideepcolor_tpu.data.color_bins import get_bins
    from ideepcolor_tpu.ops import quantize
    rng = np.random.default_rng(seed)
    pts = get_bins().pts_in_hull          # (313, 2), step-10 grid
    ab = (pts[rng.integers(0, len(pts), 16)]
          + rng.uniform(-3, 3, (16, 2))).astype(np.float32)
    dec = np.asarray(quantize.decode(
        quantize.soft_encode(jnp.asarray(ab), nn=5)))
    # RBF over sigma=5 neighbors: reconstruction within the bin spacing
    assert np.abs(dec - ab).max() < 10.0


@FAST
@given(SEED)
def test_annealed_mean_T1_is_softmax_expectation(seed):
    from ideepcolor_tpu.ops import quantize
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 3, (6, 313)).astype(np.float32)
    got = np.asarray(quantize.annealed_mean(jnp.asarray(logits), T=1.0))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.asarray(quantize.decode(jnp.asarray(p)))
    assert np.allclose(got, want, atol=1e-3)


@FAST
@given(SEED)
def test_scatter_to_grid_preserves_mass_and_placement(seed):
    from ideepcolor_tpu.data.color_bins import get_bins
    from ideepcolor_tpu.ops import quantize
    rng = np.random.default_rng(seed)
    d = rng.random(313).astype(np.float32)
    d /= d.sum()
    in_hull = get_bins().in_hull          # (529,) bool
    grid = np.asarray(quantize.scatter_to_grid(
        jnp.asarray(d), jnp.asarray(in_hull))).reshape(-1)
    assert np.isclose(grid.sum(), d.sum(), atol=1e-6)
    assert np.allclose(grid[np.asarray(in_hull)], d, atol=1e-7)
    assert np.all(grid[~np.asarray(in_hull)] == 0)


@FAST
@given(SEED)
def test_entropy_sign_convention(seed):
    from ideepcolor_tpu.ops import quantize
    rng = np.random.default_rng(seed)
    p = rng.random((313, 4)).astype(np.float32) + 1e-3
    p /= p.sum(0, keepdims=True)
    ent = np.asarray(quantize.entropy(jnp.asarray(p), axis=0))
    # reference convention: sum p log p (negated only at plot time)
    assert (ent <= 1e-6).all()


# --------------------------------------------------------------------- hints
@FAST
@given(SEED, st.integers(0, 12))
def test_rasterize_hints_device_matches_host(seed, count):
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ops.hints import MAX_HINTS, rasterize_hints
    rng = np.random.default_rng(seed)
    size = 64
    boxes = np.zeros((MAX_HINTS, 4), np.int32)
    values = np.zeros((MAX_HINTS, 2), np.float32)
    for i in range(count):
        y1, x1 = rng.integers(0, size, 2)
        boxes[i] = [y1, x1, y1 + rng.integers(0, 8), x1 + rng.integers(0, 8)]
        values[i] = rng.uniform(-110, 110, 2)
    # garbage in the dead slots must not leak through the count gate
    boxes[count:] = rng.integers(0, size, (MAX_HINTS - count, 4))
    values[count:] = rng.uniform(-110, 110, (MAX_HINTS - count, 2))
    ab_d, m_d = rasterize_hints(jnp.asarray(boxes), jnp.asarray(values),
                                jnp.int32(count), size=size)
    ab_h, m_h = host.rasterize_hints(boxes, values, count, size)
    assert np.array_equal(np.asarray(m_d), m_h)
    assert np.allclose(np.asarray(ab_d), ab_h, atol=1e-6)


# -------------------------------------------------------------------- resize
@FAST
@given(st.integers(2, 64), st.integers(2, 96))
def test_resize_matrices_partition_of_unity(n_in, n_out):
    from ideepcolor_tpu.ops.resize import (cubic_resize_matrix_np,
                                           linear_resize_matrix_np,
                                           nearest_resize_matrix_np)
    lin = linear_resize_matrix_np(n_in, n_out)
    assert np.allclose(lin.sum(1), 1.0, atol=1e-5)
    cub = cubic_resize_matrix_np(n_in, n_out)
    assert np.allclose(cub.sum(1), 1.0, atol=1e-5)
    near = nearest_resize_matrix_np(n_in, n_out)
    assert np.allclose(near.sum(1), 1.0)
    assert ((near == 0) | (near == 1)).all()


@FAST
@given(SEED, st.integers(3, 24), st.integers(3, 40))
def test_zoom_with_matrices_matches_host_bilinear(seed, n_in, n_out):
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ops.resize import (linear_resize_matrix_np,
                                           zoom_with_matrices)
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 50, (n_in, n_in, 2)).astype(np.float32)
    rh = jnp.asarray(linear_resize_matrix_np(n_in, n_out))
    rw = jnp.asarray(linear_resize_matrix_np(n_in, n_out))
    dev = np.asarray(zoom_with_matrices(jnp.asarray(x), rh, rw))
    hst = host.zoom_bilinear(x, (n_out, n_out))
    assert np.allclose(dev, hst, atol=1e-2), np.abs(dev - hst).max()


# --------------------------------------------------------------------- gamut
@FAST
@given(SEED)
def test_snap_ab_in_range_and_idempotent(seed):
    from ideepcolor_tpu.ops.gamut import snap_ab
    rng = np.random.default_rng(seed)
    L = rng.uniform(5, 95)
    rgb = rng.uniform(0, 255, (6, 3)).astype(np.float32)
    snapped = np.asarray(snap_ab(jnp.float32(L), jnp.asarray(rgb)))
    assert (snapped >= 0).all() and (snapped <= 255).all()
    again = np.asarray(snap_ab(jnp.float32(L), jnp.asarray(snapped)))
    # the <1 Lab-delta stopping criterion bounds the re-snap movement
    assert np.abs(again - snapped).max() <= 3.0


# ------------------------------------------------------- hint-list semantics
@FAST
@given(SEED, st.integers(0, 20))
def test_points_json_table_matches_dense_put_points(seed, n):
    """points_json_to_table + device rasterize must equal put_points_json's
    sequential dense writes for any valid hint list (same clamping, and
    later-hints-win == sequential overwrite)."""
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ops.hints import (points_json_to_table,
                                          put_points_json)
    rng = np.random.default_rng(seed)
    size = 64
    hints = [{"y": int(rng.integers(0, size)),
              "x": int(rng.integers(0, size)),
              "ab": [float(rng.uniform(-110, 110)),
                     float(rng.uniform(-110, 110))],
              "radius": int(rng.integers(0, size // 2))}
             for _ in range(n)]
    ab_d = np.zeros((2, size, size), np.float32)
    m_d = np.zeros((1, size, size), np.float32)
    put_points_json(ab_d, m_d, hints, size)
    boxes, values, count = points_json_to_table(hints, size)
    ab_t, m_t = host.rasterize_hints(boxes, values, count, size)
    assert np.array_equal(m_t.transpose(2, 0, 1), m_d)
    assert np.array_equal(ab_t.transpose(2, 0, 1), ab_d)


@FAST
@given(SEED, st.integers(1, 25))
def test_uicontrol_random_ops_table_matches_dense(seed, n_ops):
    """Random add/move/erase sequences: the fast hint_table path must
    rasterize to EXACTLY the dense get_input parity path's mask, and
    used_colors stays most-recent-first unique."""
    from ideepcolor_tpu.ops import host
    from ideepcolor_tpu.ui.control import UIControl
    rng = np.random.default_rng(seed)
    c = UIControl(win_size=64, load_size=64)
    c.setImageSize((64, 64))
    for _ in range(n_ops):
        op = rng.choice(["add", "move", "erase"])
        pnt = (int(rng.integers(2, 62)), int(rng.integers(2, 62)))
        color = tuple(int(v) for v in rng.integers(0, 256, 3))
        width = int(rng.integers(1, 4))
        if op == "add":
            c.addPoint(pnt, color, color, width)
        elif op == "move" and c.userEdit is not None:
            c.movePoint(pnt, color, color, width)
        elif op == "erase":
            c.erasePoint(pnt)
    im, mask_dense = c.get_input()
    boxes, vals, count = c.hint_table()
    _ab, mask_tbl = host.rasterize_hints(boxes, vals, count, c.load_size)
    assert np.array_equal(mask_tbl[..., 0] > 0, mask_dense[..., 0] > 0)
    uc = c.used_colors()
    if uc is not None:
        # unique rows
        assert len({tuple(r) for r in np.round(uc, 6)}) == len(uc)
    else:
        assert not c.userEdits


# ------------------------------------------------------------ batch serving
@FAST
@given(SEED)
@pytest.mark.slow
def test_batch_table_forward_rows_match_batch_of_one(seed):
    """Batched table serving must colorize each row exactly as a
    batch-of-1 dispatch of the same image+hints (no cross-batch state)."""
    from ideepcolor_tpu.engine.batch import batch_forward_frames_table
    from ideepcolor_tpu.models import siggraph
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    rng = np.random.default_rng(seed)
    params = siggraph.init_params(jax.random.key(1), width=0.25)
    N, S = 3, 64
    l_mc = jnp.asarray(rng.uniform(-50, 50, (N, S, S, 1))
                       .astype(np.float32))
    boxes = np.zeros((N, MAX_HINTS, 4), np.int32)
    values = np.zeros((N, MAX_HINTS, 2), np.float32)
    counts = rng.integers(0, 4, N).astype(np.int32)
    for i in range(N):
        for j in range(counts[i]):
            y, x = rng.integers(2, S - 3, 2)
            boxes[i, j] = [y, x, y + 2, x + 2]
            values[i, j] = rng.uniform(-80, 80, 2)
    rgb_b, ab_b = batch_forward_frames_table(
        params, l_mc, jnp.asarray(boxes), jnp.asarray(values),
        jnp.asarray(counts), jnp.float32(0.0))
    for i in range(N):
        rgb_1, ab_1 = batch_forward_frames_table(
            params, l_mc[i:i + 1], jnp.asarray(boxes[i:i + 1]),
            jnp.asarray(values[i:i + 1]), jnp.asarray(counts[i:i + 1]),
            jnp.float32(0.0))
        # different batch shapes may tile convs differently -> allow a
        # numerics-level delta, not a semantic one
        assert np.abs(np.asarray(ab_b)[i] - np.asarray(ab_1)[0]).max() < 0.1
        assert np.abs(np.asarray(rgb_b)[i].astype(int)
                      - np.asarray(rgb_1)[0].astype(int)).max() <= 1


# ---------------------------------------------------------- caffemodel wire
@FAST
@given(SEED, st.booleans())
def test_caffemodel_wire_roundtrip(seed, v1):
    """encode_netparameter -> parse_caffemodel is an exact roundtrip for
    random layer graphs in BOTH wire forms (modern LayerParameter and
    legacy V1LayerParameter), including parameterless layers readers
    must skip."""
    from ideepcolor_tpu.models.caffemodel_io import (encode_netparameter,
                                                     parse_caffemodel)
    rng = np.random.default_rng(seed)
    specs = []
    want = {}
    for i in range(rng.integers(1, 8)):
        name = f"layer_{i}_{rng.integers(1e6)}"
        if rng.random() < 0.3:
            specs.append({"name": name, "type": "ReLU", "blobs": []})
            continue
        blobs = []
        for _ in range(rng.integers(1, 4)):
            shape = tuple(int(s) for s in
                          rng.integers(1, 5, rng.integers(1, 5)))
            blobs.append(rng.normal(0, 1, shape).astype(np.float32))
        specs.append({"name": name, "type": "Convolution",
                      "bottom": ["x"], "top": [name], "blobs": blobs})
        want[name] = blobs
    buf = encode_netparameter(specs, net_name="prop", v1=v1)
    got = parse_caffemodel(buf)
    for name, blobs in want.items():
        assert name in got, name
        assert len(got[name]) == len(blobs)
        for g, w in zip(got[name], blobs):
            if v1:
                # the legacy wire stores every blob as 4-d
                # num/channels/height/width — rank-padding with leading
                # 1s is the format's semantics, not reader loss
                assert g.shape == (1,) * (4 - w.ndim) + w.shape
            else:
                assert g.shape == w.shape
            assert np.array_equal(g.reshape(w.shape), w)


# ------------------------------------------------------------ torch export
@FAST
@given(SEED, st.sampled_from([1.0, 0.5]))
@pytest.mark.slow
def test_torch_state_dict_roundtrip_identity(seed, width):
    """to_torch_state_dict is a true inverse of from_torch_state_dict for
    any parameter values at any width tier (the .pth export direction of
    scripts/convert_checkpoint.py)."""
    from ideepcolor_tpu.models import siggraph
    params = siggraph.init_params(jax.random.key(seed), width=width)
    sd = siggraph.to_torch_state_dict(params)
    back = siggraph.from_torch_state_dict(
        {k: v for k, v in sd.items() if "num_batches_tracked" not in k})
    assert set(back) == set(params)
    for k in params:
        assert np.array_equal(np.asarray(back[k]), np.asarray(params[k])), k


@settings(max_examples=60, deadline=None)
@given(SEED, st.sampled_from(["truncate", "flip", "random"]))
def test_caffemodel_parser_survives_corrupt_input(seed, mode):
    """The from-scratch protobuf reader must fail CLEANLY on corrupt
    bytes: bounded exceptions, no hangs, no shape-driven allocation
    (reshape is guarded by an element-count check), no crashes. Real
    .caffemodel files arrive over networks and get truncated."""
    from ideepcolor_tpu.models.caffemodel_io import (encode_netparameter,
                                                     parse_caffemodel)
    rng = np.random.default_rng(seed)
    base = encode_netparameter(
        [{"name": "conv", "type": "Convolution", "bottom": ["x"],
          "top": ["y"],
          "blobs": [rng.normal(0, 1, (4, 3, 3, 3)).astype(np.float32),
                    rng.normal(0, 1, (4,)).astype(np.float32)]}],
        net_name="fuzz")
    if mode == "truncate":
        corrupt = base[:rng.integers(0, len(base))]
    elif mode == "flip":
        corrupt = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            corrupt[rng.integers(0, len(corrupt))] = rng.integers(0, 256)
        corrupt = bytes(corrupt)
    else:
        corrupt = rng.integers(0, 256, rng.integers(0, 4096),
                               dtype=np.uint8).tobytes()
    try:
        out = parse_caffemodel(corrupt)
    except (ValueError, IndexError, KeyError, OverflowError):
        return                                   # clean, bounded failure
    assert isinstance(out, dict)
    for blobs in out.values():
        for b in blobs:
            assert b.nbytes <= 4 * len(corrupt) + 64  # no phantom data
