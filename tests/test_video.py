"""Video colorization CLI tests (frame-dir and avi paths, hints, sRGB L*)."""
import json
import os

import cv2
import numpy as np
import pytest

from ideepcolor_tpu.apps import video

RNG = np.random.default_rng(17)


@pytest.fixture
def frames_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(6):
        img = (RNG.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"f{i:03d}.png"), img)
    return str(d)


def test_video_cli_frames_to_pngs(frames_dir, tmp_path):
    out = str(tmp_path / "out")
    rc = video.main([frames_dir, "--out", out, "--size", "32",
                     "--depth", "2"])
    assert rc == 0
    names = sorted(os.listdir(out))
    assert len(names) == 6
    f = cv2.imread(os.path.join(out, names[0]))
    assert f.shape == (32, 32, 3)


def test_video_cli_hints_change_output(frames_dir, tmp_path):
    out_a = str(tmp_path / "a"); out_b = str(tmp_path / "b")
    hints = tmp_path / "hints.json"
    hints.write_text(json.dumps(
        [{"y": 16, "x": 16, "ab": [40.0, -50.0], "radius": 2}]))
    video.main([frames_dir, "--out", out_a, "--size", "32"])
    video.main([frames_dir, "--out", out_b, "--size", "32",
                "--hints", str(hints)])
    a = cv2.imread(os.path.join(out_a, "frame_000000.png"))
    b = cv2.imread(os.path.join(out_b, "frame_000000.png"))
    assert not np.array_equal(a, b)


def test_video_cli_avi_output(frames_dir, tmp_path):
    out = str(tmp_path / "o.avi")
    rc = video.main([frames_dir, "--out", out, "--size", "32",
                     "--limit", "4"])
    assert rc == 0
    # MJPG always ships with opencv builds; if the writer ever fails the
    # app falls back to a PNG directory of the same stem
    if os.path.exists(out):
        cap = cv2.VideoCapture(out)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 4
    else:
        assert len(os.listdir(str(tmp_path / "o"))) == 4


def test_srgb_stream_variant_matches_reference_tone_curve():
    """submit(srgb=True) must equal feeding the true L* of the gray
    frame through the float path."""
    import jax
    from ideepcolor_tpu.engine import streaming
    from ideepcolor_tpu.models import siggraph
    from _np_colorspace import rgb2lab as rgb2lab_np
    params = siggraph.init_params(jax.random.key(0))
    g = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    rgb = np.repeat((g.astype(np.float32) / 255.0)[..., None], 3, axis=-1)
    l_true = rgb2lab_np(rgb)[..., 0].astype(np.float32)

    s1 = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    s2 = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    s1.submit(g, srgb=True)
    s2.submit(l_true)
    (r1, _), = s1.drain()
    (r2, _), = s2.drain()
    diff = np.abs(r1.astype(int) - r2.astype(int))
    assert diff.max() <= 1          # device vs numpy L* within rounding


def test_streaming_table_hints_match_dense():
    """set_hint_table (device rasterize, ~3 KB upload) must produce the
    same frames as set_hints fed the host-rasterized dense planes of the
    SAME hint list (ops.hints table/dense agreement contract)."""
    import jax
    from ideepcolor_tpu.engine import streaming
    from ideepcolor_tpu.models import siggraph
    from ideepcolor_tpu.ops.hints import points_json_to_table, \
        put_points_json
    params = siggraph.init_params(jax.random.key(0))
    hints = [{"y": 10, "x": 20, "ab": [35.0, -40.0], "radius": 2},
             {"y": 24, "x": 6, "ab": [-20.0, 55.0], "radius": 1}]
    g = RNG.integers(0, 256, (32, 32), dtype=np.uint8)

    st = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    boxes, values, count = points_json_to_table(hints, 32)
    st.set_hint_table(boxes[:count], values[:count])
    sd = streaming.StreamingSession(params, size=32, depth=1,
                                    with_dist=False)
    ab = np.zeros((2, 32, 32), np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    put_points_json(ab, mask, hints, 32)
    sd.set_hints(ab.transpose(1, 2, 0), mask.transpose(1, 2, 0))

    st.submit(g, srgb=True)
    sd.submit(g, srgb=True)
    (rgb_t, _), = st.drain()
    (rgb_d, _), = sd.drain()
    assert np.array_equal(rgb_t, rgb_d)
    # float-L frames are the dense path's domain: loud error, not silence
    with pytest.raises(ValueError):
        st.submit(g.astype(np.float32))
    # switching back to dense hints clears the table
    sd.set_hint_table(boxes[:count], values[:count])
    sd.set_hints(ab.transpose(1, 2, 0), mask.transpose(1, 2, 0))
    assert sd._table is None


def test_hint_tracker_follows_translating_content():
    """A hint placed on a bright square must track the square as it
    translates: after N frames the tracked position moves with the
    content while the static hint would stay behind."""
    size = 64
    sq = 8
    frames = []
    for i in range(6):
        f = np.zeros((size, size), np.uint8)
        y, x = 10, 8 + 6 * i                     # square slides right
        f[y:y + sq, x:x + sq] = 230
        frames.append(f)
    start = {"y": 14, "x": 12, "ab": [40.0, 0.0], "radius": 2}
    tr = video.HintTracker([start], size)
    for f in frames:
        boxes, values, count = tr.step(f)
    assert count == 1
    # content moved +30 px in x; Farneback on a clean translation should
    # recover most of it (the box is inclusive [y-p, x-p, y+p, x+p])
    final_x = tr.hints[0]["x"]
    assert final_x > 12 + 15, f"tracker barely moved: x={final_x}"
    assert abs(tr.hints[0]["y"] - 14) <= 6


def test_video_cli_track_hints_runs(frames_dir, tmp_path):
    out = str(tmp_path / "out_tracked")
    hints = tmp_path / "hints.json"
    hints.write_text(json.dumps(
        [{"y": 16, "x": 16, "ab": [40.0, -50.0], "radius": 2}]))
    rc = video.main([frames_dir, "--out", out, "--size", "32",
                     "--hints", str(hints), "--track-hints"])
    assert rc == 0
    assert len(os.listdir(out)) == 6
