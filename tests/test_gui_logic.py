"""Headless tests of the REAL GUI logic (ui/qt_gui.py) under a fake Qt.

Covers the click -> snap -> hint -> fused forward -> window frame flow,
erase, palette color set, suggestions, reset and session save — the
largest product surface the unit suite otherwise can't reach (no PyQt5
in this image).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _fake_qt

IMG = "/root/reference/test_imgs/mortar_pestle.jpg"


@pytest.fixture(autouse=True)
def _device_compose_mode(monkeypatch):
    """This module pins BYTE-identical cross-path invariants (fused vs
    unfused programs, click vs dense replay) that are defined on the
    device compose chain; pin the rgb click mode so an abq override in
    the environment can't blur them (the opt-in abq modes compose on
    host within ~2 LSB). Mode equivalence itself is covered by
    test_api.test_win_host_click_modes_agree."""
    monkeypatch.setenv("IDEEPCOLOR_NET_CLICK", "rgb")

pytestmark = pytest.mark.skipif(not os.path.exists(IMG),
                                reason="test image unavailable")


@pytest.fixture(scope="module")
def gui():
    try:
        import PyQt5  # noqa: F401
        pytest.skip("real PyQt5 present; fake-Qt harness not applicable")
    except ImportError:
        pass
    _fake_qt.install()
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ui import qt_gui

    model = api.ColorizeImageJaxCaffe(Xd=64)
    model.prep_net(None)
    dist = api.ColorizeImageJaxCaffeDist(Xd=64)
    dist.prep_net(None)
    draw = qt_gui.GUIDraw(model, dist_model=dist, load_size=64,
                          win_size=256)
    draw.init_result(IMG)
    return qt_gui, draw


def test_image_loaded_and_initial_result(gui):
    qt_gui, draw = gui
    assert draw.image_loaded
    assert draw.result is not None
    assert draw.result.shape == (draw.win_h, draw.win_w, 3)
    assert draw.result.dtype == np.uint8


def test_click_adds_hint_and_updates_frame(gui):
    qt_gui, draw = gui
    before = draw.result.copy()
    ev = _fake_qt._Event(128, 128, _fake_qt.Qt.LeftButton)
    draw.user_color = (200, 40, 40)
    draw.mousePressEvent(ev)
    assert len(draw.uiControl.userEdits) == 1
    assert not np.array_equal(before, draw.result)
    # hint mirrors populated for save_result
    assert draw.im_mask0.sum() > 0


def test_drag_moves_point(gui):
    qt_gui, draw = gui
    ev = _fake_qt._Event(140, 140)
    draw.mouseMoveEvent(ev)
    assert len(draw.uiControl.userEdits) == 1
    assert draw.uiControl.userEdits[0].pnt == (140, 140)


def test_drag_burst_pipelines_and_converges(gui):
    """A drag burst goes through the async session (one submit per motion
    event, newest-frame fetch) and the painted frame is byte-identical to
    a synchronous recompute of the final edit state."""
    qt_gui, draw = gui
    for x in (144, 148, 152, 148, 144, 140):   # ends where it started
        draw.mouseMoveEvent(_fake_qt._Event(x, 140))
    sess = draw._async
    assert sess is not None and draw.async_drag
    assert sess.frames_submitted >= 5
    assert sess.pending == 0          # fake QTimer fetches synchronously
    async_frame = draw.result.copy()
    draw.compute_result()             # sync path, same final state
    np.testing.assert_array_equal(async_frame, draw.result)


def test_suggestions_and_gamut_signals(gui):
    qt_gui, draw = gui
    got = {}
    draw.update_gamut.connect(lambda L: got.setdefault("L", L))
    draw.suggest_colors.connect(lambda c: got.setdefault("colors", c))
    draw.change_color(_fake_qt.QPoint(128, 128))
    assert 0 <= got["L"] <= 100
    assert got["colors"].shape[1] == 3 and got["colors"].shape[0] == 10


def test_set_color_from_palette(gui):
    qt_gui, draw = gui
    before = draw.result.copy()
    draw.pos = _fake_qt.QPoint(140, 140)
    draw.set_color((30, 180, 60))
    assert not np.array_equal(before, draw.result)


def test_erase_removes_point(gui):
    qt_gui, draw = gui
    ev = _fake_qt._Event(140, 140, _fake_qt.Qt.RightButton)
    draw.mousePressEvent(ev)
    assert len(draw.uiControl.userEdits) == 0


def test_wheel_changes_brush(gui):
    qt_gui, draw = gui
    b0 = draw.brushWidth
    draw.ui_mode = 'none'
    draw.wheelEvent(_fake_qt._Event(0, 0, delta=120))
    assert draw.brushWidth != b0


def test_save_result_writes_reference_format(gui, tmp_path):
    import shutil
    qt_gui, draw = gui
    # add a point so mirrors are non-trivial
    draw.mousePressEvent(_fake_qt._Event(100, 100, _fake_qt.Qt.LeftButton))
    local = tmp_path / "img.jpg"
    shutil.copy(IMG, local)
    draw.image_file = str(local)
    draw.save_result()
    dirs = [d for d in os.listdir(tmp_path) if d.startswith("img_")]
    assert len(dirs) == 1
    inside = os.listdir(tmp_path / dirs[0])
    for f in ("im_l.npy", "im_ab.npy", "im_mask.npy", "ours.png",
              "ours_fullres.png", "input_fullres.png", "input.png",
              "input_ab.png", "input_mask.png"):
        assert f in inside, f
    assert draw.timer.samples          # click latency was recorded


def test_reset_clears_everything(gui):
    qt_gui, draw = gui
    draw.reset()
    assert len(draw.uiControl.userEdits) == 0


@pytest.mark.slow
def test_full_window_signal_wiring(gui):
    """GUIDesign wiring: a pad click must flow into the gamut widget and
    the suggestion palette; a palette pick must recolor (ref
    ui/gui_design.py:81-100 signal graph)."""
    qt_gui, _draw = gui
    from ideepcolor_tpu import api
    model = api.ColorizeImageJaxCaffe(Xd=64)
    model.prep_net(None)
    dist = api.ColorizeImageJaxCaffeDist(Xd=64)
    dist.prep_net(None)
    win = qt_gui.GUIDesign(model, dist_model=dist, img_file=IMG,
                           load_size=64, win_size=256)
    draw = win.drawWidget
    draw.mousePressEvent(_fake_qt._Event(128, 128, _fake_qt.Qt.LeftButton))
    # gamut widget received the clicked pixel's L and built its mask
    assert win.gamutWidget.mask is not None
    assert win.gamutWidget.mask.shape == (221, 221)
    # suggestion palette received K=9+current colors
    assert win.customPalette.colors is not None
    assert win.customPalette.colors.shape == (10, 3)
    # picking a gamut color recolors through the signal chain
    before = draw.result.copy()
    win.gamutWidget.update_ui(_fake_qt.QPoint(110, 150))
    assert not np.array_equal(before, draw.result)
    # result pane got the frame
    assert win.visWidget.result is not None
    # hotkey reset clears edits
    class _K:
        def key(self):
            return _fake_qt.Qt.Key_R
    win.keyPressEvent(_K())
    assert len(draw.uiControl.userEdits) == 0


def test_window_frame_is_inter_cubic_parity(gui):
    """The fused device window frame must equal the reference's host
    recipe: cv2.INTER_CUBIC ab resize + window-L fusion + lab2rgb
    (ref ui/gui_draw.py:280-284). +/-1 uint8 for f32 accumulation order."""
    import cv2
    from ideepcolor_tpu.api.colorize import lab2rgb_transpose
    draw = gui[1]
    draw.compute_result()
    ab = draw.model.output_ab.transpose(1, 2, 0).astype(np.float32)
    ab_win = cv2.resize(ab, (draw.win_w, draw.win_h),
                        interpolation=cv2.INTER_CUBIC)
    want = lab2rgb_transpose(draw.l_win[None], ab_win.transpose(2, 0, 1))
    diff = np.abs(draw.result.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_more_edits_than_table_slots_fall_back_to_dense(gui):
    """With more edits than the 64-slot hint table, the GUI must
    rasterize ALL of them via the dense parity path instead of silently
    dropping the overflow (ref draws every edit, ui/ui_control.py:177)."""
    from ideepcolor_tpu.ops.hints import MAX_HINTS
    draw = gui[1]
    draw.uiControl.reset()
    # deterministic >=6 px spacing so addPoint's is_same dedup never merges
    per_row = max((draw.win_w - 20) // 6, 1)
    for i in range(MAX_HINTS + 6):
        x = 10 + 6 * (i % per_row)
        y = 10 + 6 * (i // per_row)
        draw.uiControl.addPoint((x, y), (200, 30, 30), (200, 30, 30), 2)
    assert len(draw.uiControl.userEdits) > MAX_HINTS
    draw.compute_result()
    # the mask mirror must cover every edit the dense rasterizer draws
    im, mask = draw.uiControl.get_input()
    want = (mask[..., 0] > 0)
    got = draw.im_mask0[0] > 0
    assert np.array_equal(got, want)
    assert want.sum() > 0
    draw.uiControl.reset()
    draw.compute_result()


def test_reset_reinitializes_brush_color(gui):
    qt_gui, draw = gui
    draw.user_color = (10, 200, 30)
    draw.reset()
    assert draw.user_color == (128, 128, 128)   # ref gui_draw init_color


def test_gamut_hover_does_not_pick(gui):
    """Color picks in the gamut happen only while the button is held
    (ref ui/gui_gamut.py:78-86)."""
    qt_gui, draw = gui
    g = qt_gui.GUIGamut(gamut_size=110)
    g.set_gamut(50.0)
    picked = []
    g.update_color.connect(picked.append)
    inside = None
    ys, xs = np.nonzero(g.mask)
    inside = (int(xs[0]), int(ys[0]))
    import _fake_qt as fq
    g.mouseMoveEvent(fq._Event(*inside))          # hover: no pick
    assert picked == []
    g.mousePressEvent(fq._Event(*inside, fq.Qt.LeftButton))
    assert len(picked) == 1
    g.mouseMoveEvent(fq._Event(*inside))          # drag while held: picks
    assert len(picked) == 2
    g.mouseReleaseEvent(fq._Event(*inside))
    g.mouseMoveEvent(fq._Event(*inside))          # after release: no pick
    assert len(picked) == 2


def test_palette_caps_drags_and_marks_selection(gui):
    qt_gui, _ = gui
    import _fake_qt as fq
    p = qt_gui.GUIPalette(grid_sz=(3, 1))
    p.set_colors(np.tile(np.linspace(0, 1, 8)[:, None], (1, 3)))
    assert len(p.colors) == 3                     # capped to capacity
    picked = []
    p.update_color.connect(picked.append)
    p.mousePressEvent(fq._Event(8, 8, fq.Qt.LeftButton))
    assert len(picked) == 1 and p.id == 0
    p.mouseMoveEvent(fq._Event(8 + 26, 8))        # drag to the next swatch
    assert len(picked) == 2 and p.id == 1
    p.mouseReleaseEvent(fq._Event(0, 0))
    p.mouseMoveEvent(fq._Event(8, 8))             # hover after release
    assert len(picked) == 2


def test_palette_pick_moves_gamut_cursor(gui):
    """Palette picks also update the gamut cursor
    (ref ui/gui_design.py:96,100)."""
    qt_gui, draw = gui
    import _fake_qt as fq
    win = qt_gui.GUIDesign(draw.model, dist_model=draw.dist_model,
                           img_file=None, load_size=64, win_size=256)
    win.drawWidget.read_image(IMG)
    win.drawWidget.reset()
    # a palette pick presupposes a selected point (as in the reference)
    win.drawWidget.mousePressEvent(fq._Event(128, 128, fq.Qt.LeftButton))
    win.gamutWidget.pos = None
    win.customPalette.set_colors(np.array([[0.8, 0.2, 0.2]]))
    win.customPalette.mousePressEvent(fq._Event(8, 8, fq.Qt.LeftButton))
    assert win.gamutWidget.pos is not None        # cursor moved


def test_session_dump_replays_to_identical_frame(tmp_path):
    """Closes the reference's session-dump contract loop (ref
    ui/gui_draw.py:222-244): a session saved through the REAL GUI logic
    path replays headlessly (utils.session.replay_session) through a
    fresh ColorizeImageJaxCaffe to the same net-res frame, and the dumped
    planes round-trip exactly."""
    import shutil
    import _fake_qt as fq
    _fake_qt.install()
    from ideepcolor_tpu import api
    from ideepcolor_tpu.ui import qt_gui
    from ideepcolor_tpu.utils import session

    img = tmp_path / "mortar_pestle.jpg"
    shutil.copy(IMG, img)

    model = api.ColorizeImageJaxCaffe(Xd=64)
    model.prep_net(None)                        # seeded random init (key 0)
    draw = qt_gui.GUIDraw(model, dist_model=None, load_size=64,
                          win_size=256)
    draw.init_result(str(img))
    draw.user_color = (200, 40, 40)
    draw.mousePressEvent(fq._Event(100, 120, fq.Qt.LeftButton))
    draw.user_color = (40, 180, 90)
    draw.mousePressEvent(fq._Event(180, 60, fq.Qt.LeftButton))
    draw.save_result()

    dumps = [d for d in tmp_path.iterdir()
             if d.is_dir() and d.name.startswith("mortar_pestle_")]
    assert len(dumps) == 1
    dump = str(dumps[0])

    # dump contents follow the reference format
    s = session.load_session(dump)
    assert s["im_l"].shape == (1, 64, 64)
    assert s["im_ab"].shape == (2, 64, 64)
    assert s["im_mask"].shape == (1, 64, 64)
    assert np.array_equal(s["im_ab"], draw.im_ab0)
    assert np.array_equal(s["im_mask"], draw.im_mask0)
    assert s["im_mask"].sum() > 0
    for png in ("ours.png", "ours_fullres.png", "input_fullres.png",
                "input.png", "input_ab.png", "input_mask.png"):
        assert (dumps[0] / png).exists(), png

    # replay through a FRESH model (same seeded weights)
    fresh = api.ColorizeImageJaxCaffe(Xd=64)
    fresh.prep_net(None)
    fresh.load_image(str(img))
    replayed = session.replay_session(dump, fresh)
    original = np.asarray(draw.model.get_img_forward())
    assert replayed.shape == original.shape
    # table-path click program and dense replay program are the same math
    # in different XLA programs: byte-identical frames expected
    assert np.array_equal(replayed, original)


def test_fused_click_suggest_matches_unfused(gui):
    """Dist-session clicks take the fused click+suggest program (one
    dispatch). Palette rows must match the unfused reference recipe run
    with the same rng key; row 0 is the PREVIOUS frame's pixel
    (reference order: suggestions precede the recompute); the frame must
    equal a plain recompute of the same edit state."""
    qt_gui, draw = gui
    draw.uiControl.reset()
    draw.compute_result()
    draw.predict_color()
    dist = draw.dist_model
    key0 = dist._rng_key
    x, y = draw.scale_point(_fake_qt.QPoint(130, 140))
    prev_pix = draw.model.get_img_forward()[y, x] / 255.0

    captured = []
    draw.suggest_colors.connect(captured.append)
    draw.user_color = (180, 60, 50)
    assert draw._can_fuse_suggest()
    draw.mousePressEvent(_fake_qt._Event(130, 140, _fake_qt.Qt.LeftButton))
    # fused program was built (host-window variant by default; the
    # device-window cache when IDEEPCOLOR_WIN_COMPOSE=device)
    assert (getattr(draw.model, "_click_sugh_cache", None)
            or getattr(draw.model, "_click_sug_cache", None))
    assert captured
    fused = np.asarray(captured[-1])
    assert fused.shape == (10, 3)
    fused_frame = draw.result.copy()

    # row 0: previous frame's pixel (pre-click)
    np.testing.assert_allclose(fused[0], prev_pix, atol=2 / 255)
    # rows 1..8 match the unfused chain replayed with the same key
    # (row 9 is the 0.5 custom swatch in both)
    dist._rng_key = key0
    want = draw.suggest_color(h=y, w=x, K=9)
    np.testing.assert_allclose(fused[1:9], want[1:9], atol=2 / 255)
    assert np.all(fused[9] == 0.5)
    # frame: identical to a plain recompute of the same state
    draw.compute_result()
    np.testing.assert_array_equal(fused_frame, draw.result)
