"""ColorizeImageBase-compatible API facade over the TPU engine.

This is the stability boundary of the reference (its GUI and both notebooks
only touch this surface — ref: data/colorize_image.py:39-198): numpy
channel-first arrays in, uint8 RGB images out, with the same method names,
argument conventions and state fields. Behind the facade, every compute
stage is a fused XLA program from :mod:`ideepcolor_tpu.engine.pipeline`.

Backend classes:
  ColorizeImageJax           — SIGGRAPH U-Net (reference torch backend,
                               ref data/colorize_image.py:201-276)
  ColorizeImageJaxDist       — + 529-bin distribution head (ref :279-372)
  ColorizeImageJaxCaffe      — Caffe main graph (ref :375-442)
  ColorizeImageJaxCaffeDist  — Caffe dist graph + suggestions (ref :466-561)
  ColorizeImageJaxCaffeGlobDist — Caffe global-histogram graph (ref :445-463)

Aliases named after the reference backends (ColorizeImageTorch, ...) are
exported so reference-style code runs unchanged.

Weight loading: ``prep_net(path=...)`` accepts a torch ``.pth`` state dict
(the published checkpoints' format) or an ``.npz`` of converted params.
Without a path the net initializes randomly — useful for integration tests
and benchmarking; the published weights are not redistributable here.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..data.color_bins import get_bins
from ..engine import pipeline as P
from ..models import caffe_net, siggraph
from ..ops import quantize
from ..ops.quantize import make_pts_grid


def lab2rgb_transpose(img_l, img_ab) -> np.ndarray:
    """(1,H,W) L + (2,H,W) ab -> (H,W,3) uint8 (ref colorize_image.py:20)."""
    return np.asarray(P.compose_rgb_u8(
        jnp.asarray(img_l, jnp.float32).transpose(1, 2, 0),
        jnp.asarray(img_ab, jnp.float32).transpose(1, 2, 0)))


def rgb2lab_transpose(img_rgb) -> np.ndarray:
    """(H,W,3) RGB -> (3,H,W) Lab (ref colorize_image.py:31). Accepts uint8
    or float in [0,1]."""
    rgb = _to_float01(img_rgb)
    return np.asarray(P.rgb_to_lab_dev(jnp.asarray(rgb))).transpose(2, 0, 1)


def compose_window_host(net_rgb_u8, l_win_pad, rh, rw) -> np.ndarray:
    """Window-size display frame composed ON HOST from the net-res frame.

    Same math as the device chain (requantized-uint8 ab ->
    zoom_with_matrices -> truncating lab2rgb u8, engine/pipeline
    make_table_click_win_program) via the native host runtime
    (ops.host / native/hostops.cpp) + BLAS matmuls — mirroring the
    reference's own CPU window compose (ref ui/gui_draw.py:280-284).
    Exists because over the tunnel transport the window frame's readback
    bytes (~786 KB at 512 px) dominate the click; the host path reads
    back only the ~196 KB net frame the GUI needs anyway.

    net_rgb_u8 (S,S,3) uint8; l_win_pad (Hb,Wb,1) float L plane;
    rh (Hb,S) / rw (Wb,S) float32 data-resize matrices -> (Hb,Wb,3) u8.
    """
    from ..ops import host
    # planar end-to-end: requantized ab extracted straight to planes
    # (no interleaved Lab intermediate or de-interleave copies), banded
    # separable zoom (native, ~60x fewer MACs than the dense GEMM chain
    # — the matrices have <=4 nonzeros/row), fused planar lab2rgb
    a0, b0 = host.rgb2lab_u8_ab(net_rgb_u8)
    a, b = host.zoom2_matrices(a0, b0, rh, rw)
    return host.lab2rgb_u8_planar(
        np.asarray(l_win_pad, np.float32)[..., 0], a, b)


def net_click_mode() -> str:
    """Net-click transport mode (IDEEPCOLOR_NET_CLICK).

    ``rgb`` (default): device-composed frame readback — the bit-parity
    path the golden tests pin. ``abq``: the device returns u8-quantized
    ab (2/3 of the RGB bytes; ≤2 LSB / ~56 dB vs the device compose on
    trained weights) and the frame composes on host. ``abq_half``
    additionally 2x-chroma-subsamples the payload (1/6 of the bytes,
    ~52 dB).

    abq is OPT-IN, not the default, because it was measured a WASH on
    this rig: the ~5 ms transport saving (196→131 KB at ~12 MB/s) is
    offset by ~5 ms of single-core host compose+extract (r5 on-chip:
    rgb 37.4 ms p50, abq 39.6, abq_half 36.7). It exists for
    deployments where the trade differs — multi-core serving hosts
    (compose parallelizes; the extract can run off the latency path) or
    links below ~5 MB/s where the byte saving dominates.
    """
    import os
    mode = os.environ.get("IDEEPCOLOR_NET_CLICK", "rgb")
    return mode if mode in ("abq", "abq_half", "rgb") else "rgb"


_ABQ_ZOOM_CACHE: dict = {}


def compose_net_abq_host(l_net_hw, abq, half=False) -> np.ndarray:
    """Net-res display frame composed ON HOST from the quantized-ab
    click payload (engine/pipeline make_table_click_abq_program).

    Dequantizes the u8 ab planes, cubic-upsamples them 2x when the
    payload was chroma-subsampled (half=True; native banded zoom), and
    runs the native LUT Lab->RGB — the same host twins the window
    compose uses. l_net_hw: (S,S) float L plane (the API caches one
    L-only readback per image, _host_l_net); abq: (S,S,2) or
    (S/2,S/2,2) uint8.
    """
    from ..engine.pipeline import AB_CLIP, AB_Q_SCALE
    from ..ops import host
    a = abq[..., 0].astype(np.float32) * (1.0 / AB_Q_SCALE) - AB_CLIP
    b = abq[..., 1].astype(np.float32) * (1.0 / AB_Q_SCALE) - AB_CLIP
    if half:
        from ..ops.resize import cubic_resize_matrix_np
        src, dst = abq.shape[0], l_net_hw.shape[0]
        key = (src, dst)
        mats = _ABQ_ZOOM_CACHE.get(key)
        if mats is None:
            if len(_ABQ_ZOOM_CACHE) >= 8:     # bounded (serve-long-lived)
                _ABQ_ZOOM_CACHE.pop(next(iter(_ABQ_ZOOM_CACHE)))
            m = cubic_resize_matrix_np(src, dst, dst)
            # the zoom kernel treats both matrices read-only, so one
            # shared array serves as both the row and column resampler
            mats = _ABQ_ZOOM_CACHE[key] = (m, m)
        a, b = host.zoom2_matrices(a, b, mats[0], mats[1])
    return host.lab2rgb_u8_planar(np.asarray(l_net_hw, np.float32), a, b)


def _to_float01(img) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected (H,W,3) RGB image, got {img.shape}")
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def _cast_params(params: dict, dtype) -> dict:
    """Optional serving-precision cast (e.g. 'bfloat16', the fast MXU
    mode; int8 was measured slower than bf16 on v5e — docs/ROADMAP.md)."""
    if dtype is None:
        return params
    dt = jnp.dtype(dtype)
    return {k: v.astype(dt) for k, v in params.items()}


def _load_checkpoint(path: str) -> dict | None:
    if not path:
        return None
    import os
    if os.path.isdir(path):                 # orbax checkpoint directory
        from ..utils.session import load_params_orbax
        flat = {k: np.asarray(v) for k, v in load_params_orbax(path).items()}
        if any(k.startswith("params/") for k in flat):
            # a full TRAIN-state checkpoint (train.step.save_train_state):
            # use its params and drop optimizer moments/step
            return {k.split("/", 1)[1]: v for k, v in flat.items()
                    if k.startswith("params/")}
        return flat
    if path.endswith(".npz"):
        # f16 is a STORAGE format (halves checkpoint size); compute stays
        # f32 unless the caller casts explicitly via dtype=
        return {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
                for k, v in np.load(path).items()}
    if path.endswith((".pth", ".pt")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if hasattr(sd, "_metadata"):
            del sd._metadata
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()
                if "num_batches_tracked" not in k}
    raise ValueError(f"unsupported checkpoint format: {path}")


class ColorizeImageBase:
    """Image state + hint normalization + full-res reconstruction.

    Mirrors ref data/colorize_image.py:39-198. State fields keep the
    reference's channel-first numpy conventions; device-side mirrors are
    held privately for the fused getters.
    """

    def __init__(self, Xd: int = 256, Xfullres_max: int = 10000):
        self.Xd = Xd
        self.img_l_set = False
        self.net_set = False
        self.Xfullres_max = Xfullres_max
        self.img_just_set = False
        self._output_rgb_np = None
        self._dev_output_rgb = None
        self._lab_fullres_np = None
        self._fullres_hw = None

    def _dev_pts(self):
        """Device-cached pts_in_hull grid for the suggestion programs.

        The grid never changes after prep; re-uploading the 4 KB array
        on every suggest costs an extra RPC and accumulates staging RSS
        on the tunnel transport (CLAUDE.md upload-leak note)."""
        p = getattr(self, "_dev_pts_in_hull", None)
        if p is None:
            p = self._dev_pts_in_hull = jnp.asarray(self.pts_in_hull,
                                                    jnp.float32)
        return p

    # Full-res Lab numpy mirrors materialize lazily: the device holds the
    # bucket-padded Lab planes (all the fused getters need), and the
    # ~HxWx3 f32 readback only happens if host code actually reads them.
    @property
    def img_lab_fullres(self):
        if self._lab_fullres_np is None:
            if self._fullres_hw is None:
                raise RuntimeError(
                    "no image loaded (call load_image/set_image first)")
            H, W = self._fullres_hw
            self._lab_fullres_np = np.asarray(
                self._dev_lab_fullres_pad)[:H, :W].transpose(2, 0, 1)
        return self._lab_fullres_np

    @property
    def img_l_fullres(self):
        return self.img_lab_fullres[[0]]

    @property
    def img_ab_fullres(self):
        return self.img_lab_fullres[1:]

    # ``output_rgb`` materializes lazily: click programs assign the device
    # array (async host copy starts immediately), and the ~196 KB tunnel
    # readback only happens if something actually reads the net-res frame
    # (the GUI's fused click+window path never does — it displays the
    # window frame and saves one RPC round trip per click).
    @property
    def output_rgb(self):
        if self._output_rgb_np is None and self._dev_output_rgb is not None:
            self._output_rgb_np = np.asarray(self._dev_output_rgb)
        return self._output_rgb_np

    @output_rgb.setter
    def output_rgb(self, value):
        if value is None or isinstance(value, np.ndarray):
            self._output_rgb_np = value
            self._dev_output_rgb = None
        else:                                  # device array: defer readback
            try:
                value.copy_to_host_async()
            except Exception:
                pass
            self._dev_output_rgb = value
            self._output_rgb_np = None

    # ----- image prep -----
    def load_image(self, input_path: str):
        import cv2
        im = cv2.cvtColor(cv2.imread(input_path, 1), cv2.COLOR_BGR2RGB)
        self.load_image_array(im)

    def load_image_array(self, im_rgb: np.ndarray):
        """``load_image`` from an in-memory uint8 RGB array of any size
        (the serving path: decoded request bytes instead of a file)."""
        im = np.asarray(im_rgb)
        self.img_rgb_fullres = im.copy()
        self._set_img_lab_fullres_()
        import cv2
        im = cv2.resize(im, (self.Xd, self.Xd))
        self.img_rgb = im.copy()
        self.img_l_set = True
        self._set_img_lab_()
        self._set_img_lab_mc_()

    def set_image(self, input_image: np.ndarray):
        # the reference contract: set_image receives an ALREADY net-sized
        # image (the GUI hands it the load_size resize, ref ui/gui_draw.py
        # :110-113 + data/colorize_image.py:68-77). Mis-sized input makes
        # the reference silently produce garbage; fail loudly instead
        # (use load_image_array for arbitrary-size arrays).
        shape = np.asarray(input_image).shape
        if shape != (self.Xd, self.Xd, 3):
            raise ValueError(
                f"set_image expects a net-sized ({self.Xd},{self.Xd},3) "
                f"image, got {shape}; use load_image_array for "
                f"arbitrary sizes")
        self.img_rgb_fullres = np.asarray(input_image).copy()
        self._set_img_lab_fullres_()
        self.img_l_set = True
        self.img_rgb = np.asarray(input_image)
        self._set_img_lab_()
        self._set_img_lab_mc_()

    def prep_net(self):
        raise NotImplementedError("implemented by backends")

    # ----- forward -----
    def net_forward(self, input_ab, input_mask):
        """ab (2,Xd,Xd) non-normalized hints; mask (1,Xd,Xd) in {0,1}."""
        if not self.img_l_set:
            print('I need to have an image!')
            return -1
        if not self.net_set:
            print('I need to have a net!')
            return -1
        input_ab = np.asarray(input_ab, np.float32)
        input_mask = np.asarray(input_mask, np.float32)
        # shape validation (the reference silently misbehaves on
        # transposed/mis-sized inputs; fail loudly instead)
        if input_ab.shape != (2, self.Xd, self.Xd):
            raise ValueError(
                f"input_ab must be (2,{self.Xd},{self.Xd}) channel-first, "
                f"got {input_ab.shape}")
        if input_mask.shape != (1, self.Xd, self.Xd):
            raise ValueError(
                f"input_mask must be (1,{self.Xd},{self.Xd}), got "
                f"{input_mask.shape}")
        self.input_ab = input_ab
        self.input_ab_mc = (self.input_ab - self.ab_mean) / self.ab_norm
        self.input_mask = input_mask
        self.input_mask_mult = self.input_mask * self.mask_mult
        return 0

    def _hints3(self):
        """One (H,W,3) device array = normalized ab hints + multiplied mask
        (a single transfer feeding the fused click programs). Cached by
        content: repeated forwards with unchanged hints (e.g. the global-
        histogram notebook sweeping histograms over zero hints) reuse the
        device buffer instead of re-uploading ~768 KB per call."""
        key = (hash(self.input_ab_mc.tobytes()),
               hash(self.input_mask_mult.tobytes()))
        cached = getattr(self, "_h3_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        h3 = jnp.asarray(np.concatenate(
            [self.input_ab_mc, self.input_mask_mult], 0).transpose(1, 2, 0))
        self._h3_cache = (key, h3)
        return h3

    def net_forward_table(self, boxes, values, count):
        """Fast interactive path: hint table in, frame out.

        boxes (MAX_HINTS,4) int32 [y1,x1,y2,x2]; values (MAX_HINTS,2) ab;
        count live hints (see ui.control.UIControl.hint_table). Uploads
        ~6 KB/click (256 slots) and rasterizes on device inside the fused
        program;
        numpy hint mirrors for the getters are rebuilt with the native
        host rasterizer. Backends without a table program return -1.
        """
        if not self.img_l_set or not self.net_set:
            return -1
        click = getattr(self, "_click_tbl", None)
        if click is None:
            return -1
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        rgb, out_ab = click(self._dev_l_net, self._dev_l_mc, self.params,
                            jnp.asarray(boxes, jnp.int32),
                            jnp.asarray(values, jnp.float32),
                            jnp.int32(count))
        self._dev_output_ab = out_ab
        self.output_rgb = np.asarray(rgb)
        self._set_out_ab_()
        return self.output_rgb

    def net_forward_table_abq(self, boxes, values, count, half=False):
        """Transport-lean table click: the device returns ONLY the
        u8-quantized ab prediction ((S,S,2), 2/3 of the RGB frame's
        bytes; (S/2,S/2,2) = 1/6 with half=True chroma subsampling) and
        the frame composes ON HOST via the native LUT (one L-plane
        readback per image, cached — _host_l_net). The frame differs
        from the device compose by the ab quantization step (~1 uint8
        LSB; half mode adds chroma smoothing) — bench records the exact
        per-run delta as abq_*. Requantized output_ab derives natively
        from the composed frame; its device mirror uploads lazily only
        if a full-res consumer reads it — NOTE that upload is ~S²·8
        bytes per click on this leaky transport, so full-res-per-click
        workloads should stay on the rgb mode (serve does this
        automatically for fullres session clicks).
        """
        if not self.img_l_set or not self.net_set:
            return -1
        click = getattr(self, "_click_tbl_abq_half" if half
                        else "_click_tbl_abq", None)
        if click is None:
            return -1
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        abq = np.asarray(click(self._dev_l_mc, self.params,
                               jnp.asarray(boxes, jnp.int32),
                               jnp.asarray(values, jnp.float32),
                               jnp.int32(count)))
        rgb = compose_net_abq_host(self._host_l_net(), abq, half=half)
        self.output_rgb = rgb
        a, b = host.rgb2lab_u8_ab(rgb)
        self._set_out_ab_host_(a, b)
        return self.output_rgb

    def net_forward_table_win(self, boxes, values, count,
                              l_win_pad, rh, rw):
        """Table click that also returns the window-size display frame in
        the SAME dispatch (saves one round trip per GUI click).

        l_win_pad (Hb, Wb, 1) device array of window L padded to a bucket;
        rh (Hb, Xd) / rw (Wb, Xd) data interpolation matrices. Returns the
        padded window frame (the GUI crops to (win_h, win_w)); the net-res
        frame stays device-resident in ``output_rgb`` (lazy readback).
        """
        if not self.img_l_set or not self.net_set:
            return -1
        click = getattr(self, "_click_tbl_win", None)
        if click is None:
            return -1
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        rgb, out_ab, win = click(
            self._dev_l_net, self._dev_l_mc, l_win_pad, rh, rw,
            self.params, jnp.asarray(boxes, jnp.int32),
            jnp.asarray(values, jnp.float32), jnp.int32(count))
        self._dev_output_ab = out_ab
        # the net-res frame stays device-resident (output_rgb materializes
        # lazily on first read); only the window frame pays the readback —
        # one RPC round trip per click instead of two
        self.output_rgb = rgb
        self._set_out_ab_()
        return np.asarray(win)

    def net_forward_table_win_suggest(self, boxes, values, count,
                                      l_win_pad, rh, rw, dist_model,
                                      h, w, K=9, N=25000):
        """Dist-session GUI click: ONE dispatch returns the window frame
        AND the (K+1, 3) suggestion palette for the click pixel.

        Fuses what the reference runs as three host passes per click
        (suggestion sampling + forward + window compose, ref
        ui/gui_draw.py:179-193,260-270): the per-image distribution map
        of ``dist_model`` (device-resident from its last predict) feeds
        the CMF-sample + k-means + Lab->RGB palette chain inside the
        same XLA program as the forward. Returns (win_padded, colors)
        or -1 when the fused path isn't available (no table program, no
        dist map yet, or no previous frame for the palette's current-
        color row).
        """
        if not self.img_l_set or not self.net_set:
            return -1
        fwd = getattr(self, "_fwd_tbl", None)
        dist_dev = getattr(dist_model, "_dev_dist", None)
        if fwd is None or dist_dev is None:
            return -1
        prev = self._dev_output_rgb
        if prev is None:
            if self._output_rgb_np is None:
                return -1
            prev = jnp.asarray(self._output_rgb_np)
        div = getattr(dist_model, "dist_map_div", 1)
        cache = getattr(self, "_click_sug_cache", None)
        if cache is None:
            cache = self._click_sug_cache = {}
        prog = cache.get((K, N, div))
        if prog is None:
            prog = cache[(K, N, div)] = (
                P.make_table_click_win_suggest_program(
                    fwd, self.Xd, K=K, N=N, map_div=div))
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        dist_model._rng_key, sub = jax.random.split(dist_model._rng_key)
        rgb, out_ab, win, colors = prog(
            self._dev_l_net, self._dev_l_mc, l_win_pad, rh, rw,
            self.params, jnp.asarray(boxes, jnp.int32),
            jnp.asarray(values, jnp.float32), jnp.int32(count),
            dist_dev, jnp.int32(h), jnp.int32(w),
            dist_model._dev_pts(), prev, sub)
        self._dev_output_ab = out_ab
        self.output_rgb = rgb          # device-resident, lazy readback
        self._set_out_ab_()
        return np.asarray(win), np.asarray(colors)

    def net_forward_table_win_host(self, boxes, values, count,
                                   l_win_pad_np, rh_np, rw_np):
        """Table click with the window frame composed ON HOST.

        Transport-shaped twin of :meth:`net_forward_table_win`: over the
        tunneled chip, readback bandwidth (~7-14 MB/s) dominates the
        click, and the 512-px window frame costs ~4x the net-res frame's
        bytes. In the DEFAULT ``rgb`` click mode (net_click_mode) it
        reads the device-composed net frame (~196 KB, the bit-parity
        path) and reproduces the device window chain on host
        (requantized-uint8 ab -> data-matrix zoom -> truncating lab2rgb,
        the reference's own host compose, ref ui/gui_draw.py:280-284);
        in the opt-in ``abq`` modes the readback shrinks further to the
        u8-quantized ab payload and BOTH frames compose on host.
        All args are HOST arrays here. Returns the padded window frame.
        """
        mode = net_click_mode()
        if mode != "rgb" and getattr(self, "_click_tbl_abq", None) \
                is not None:
            out = self.net_forward_table_abq(boxes, values, count,
                                             half=(mode == "abq_half"))
            if isinstance(out, int):
                return -1
            from ..ops import host
            # the window composes from the SAME requantized-ab planes
            # the net frame produced (extracted natively in the abq
            # path) — identical to compose_window_host's own extraction
            a, b = self._out_ab_np
            aw, bw = host.zoom2_matrices(a, b, rh_np, rw_np)
            return host.lab2rgb_u8_planar(
                np.asarray(l_win_pad_np, np.float32)[..., 0], aw, bw)
        out = self.net_forward_table(boxes, values, count)
        if isinstance(out, int):
            return -1
        return compose_window_host(out, l_win_pad_np, rh_np, rw_np)

    def net_forward_table_suggest_host(self, boxes, values, count,
                                       l_win_pad_np, rh_np, rw_np,
                                       dist_model, h, w, K=9, N=25000):
        """Dist-session GUI click, host-window variant: ONE device
        dispatch returns the net frame + suggestion palette; the window
        frame is composed on host from the net frame (see
        net_forward_table_win_host for why this wins on the tunnel).
        Returns (win_padded, colors) or -1 (same conditions as the
        device-window variant)."""
        if not self.img_l_set or not self.net_set:
            return -1
        fwd = getattr(self, "_fwd_tbl", None)
        dist_dev = getattr(dist_model, "_dev_dist", None)
        if fwd is None or dist_dev is None:
            return -1
        prev = self._dev_output_rgb
        if prev is None:
            if self._output_rgb_np is None:
                return -1
            prev = jnp.asarray(self._output_rgb_np)
        div = getattr(dist_model, "dist_map_div", 1)
        cache = getattr(self, "_click_sugh_cache", None)
        if cache is None:
            cache = self._click_sugh_cache = {}
        prog = cache.get((K, N, div))
        if prog is None:
            prog = cache[(K, N, div)] = (
                P.make_table_click_suggest_program(
                    fwd, self.Xd, K=K, N=N, map_div=div))
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        dist_model._rng_key, sub = jax.random.split(dist_model._rng_key)
        packed, out_ab = prog(
            self._dev_l_net, self._dev_l_mc, self.params,
            jnp.asarray(boxes, jnp.int32),
            jnp.asarray(values, jnp.float32), jnp.int32(count),
            dist_dev, jnp.int32(h), jnp.int32(w),
            dist_model._dev_pts(), prev, sub)
        self._dev_output_ab = out_ab
        try:                  # overlap the device->host copy with device
            packed.copy_to_host_async()    # execution tail + host python
        except AttributeError:
            pass
        packed_np = np.asarray(packed)     # the ONLY readback (one RPC):
        rgb_np = packed_np[:self.Xd]       # frame rows + palette row
        colors = packed_np[self.Xd, :K + 1].astype(np.float32) / 255.0
        self.output_rgb = rgb_np
        self._set_out_ab_()
        win = compose_window_host(rgb_np, l_win_pad_np, rh_np, rw_np)
        return win, colors

    def net_forward_fullres(self, input_ab, input_mask):
        """Forward + full-res reconstruction in ONE device dispatch.

        Returns the full-resolution uint8 image. Equivalent to
        ``net_forward`` followed by ``get_img_fullres`` (the standard
        notebook pattern) but pays a single round trip: the fused program
        runs the model, composes the net-res frame, requantizes ab and
        performs the matmul-upsample + L-fusion in the same XLA program.
        The net-res frame stays device-resident in ``output_rgb`` (lazy
        readback via ``get_img_forward``).
        """
        finish = self.net_forward_fullres_async(input_ab, input_mask)
        return finish if finish == -1 else finish()

    def net_forward_fullres_async(self, input_ab, input_mask):
        """Dispatch forward + full-res fusion, start the device->host
        copy, and return a zero-arg function that blocks for the frame.

        The readback of the full-res frame (MBs over a 7-14 MB/s tunnel)
        often dominates the job; a serving caller can dispatch under its
        device lock and block OUTSIDE it, so interactive clicks overlap
        the copy. The closure is self-contained (device arrays captured),
        so later model-state mutations (another ``load_image_array``)
        cannot corrupt an in-flight readback. Returns -1 on the usual
        sentinel failures (unset image/net)."""
        if not self.img_l_set or not self.net_set:
            return -1
        if ColorizeImageBase.net_forward(self, input_ab, input_mask) == -1:
            return -1
        out = self._dispatch_click()
        if out is None:
            return -1
        rgb, out_ab = out
        H, W = self._fullres_hw
        full = P.fullres_fuse_bucketed(
            self._dev_l_fullres_pad, out_ab, self._dev_rh, self._dev_rw)
        self._dev_output_ab = out_ab
        self.output_rgb = rgb
        self._set_out_ab_()
        # async copy on the FULL padded array (a sliced view would not
        # reuse it — see the streaming-readback invariant in CLAUDE.md)
        full.copy_to_host_async()
        return lambda: np.asarray(full)[:H, :W]

    def _dispatch_click(self):
        """Dispatch the backend's dense click program (no readback);
        None when the backend has no single-output click program."""
        return None

    # ----- quality probe -----
    def get_result_PSNR(self, result=-1, return_SE_map=False):
        if np.array(result).flatten()[0] == -1:
            cur_result = self.get_img_forward()
        else:
            cur_result = np.asarray(result).copy()
        SE_map = (1. * self.img_rgb - cur_result) ** 2
        cur_MSE = np.mean(SE_map)
        cur_PSNR = 20 * np.log10(255. / np.sqrt(cur_MSE))
        return (cur_PSNR, SE_map) if return_SE_map else cur_PSNR

    # ----- getters (each one fused device program + single readback) -----
    def get_img_forward(self):
        return self.output_rgb

    def get_img_gray(self):
        z = np.zeros((2, self.Xd, self.Xd), np.float32)
        return lab2rgb_transpose(self.img_l, z)

    def get_img_gray_fullres(self):
        # bucketed: composes from the device-resident padded L plane (no
        # full Lab readback, no per-resolution recompile)
        H, W = self._fullres_hw
        l_pad = self._dev_l_fullres_pad
        out = np.asarray(P.compose_rgb_u8(
            l_pad, jnp.zeros(l_pad.shape[:2] + (2,), jnp.float32)))
        return out[:H, :W]

    def get_img_fullres(self):
        return self._fullres_from_ab(self._dev_output_ab)

    def get_img_fullres_async(self):
        """Dispatch the full-res fusion, start the device->host copy and
        return a zero-arg function that blocks for the frame (see
        ``net_forward_fullres_async`` for why callers want this)."""
        H, W = self._fullres_hw
        full = P.fullres_fuse_bucketed(
            self._dev_l_fullres_pad, self._dev_output_ab,
            self._dev_rh, self._dev_rw)
        full.copy_to_host_async()
        return lambda: np.asarray(full)[:H, :W]

    def get_input_img_fullres(self):
        return self._fullres_from_ab(
            jnp.asarray(self.input_ab.transpose(1, 2, 0)))

    def _fullres_from_ab(self, ab_dev):
        """Bucketed full-res fusion: one compiled program per
        (bucket, Xd) pair serves every image resolution (the interpolation
        matrices are data); the padded frame is cropped host-side."""
        H, W = self._fullres_hw
        out = np.asarray(P.fullres_fuse_bucketed(
            self._dev_l_fullres_pad, ab_dev, self._dev_rh, self._dev_rw))
        return out[:H, :W]

    def get_input_img(self):
        return lab2rgb_transpose(self.img_l, self.input_ab)

    def get_img_mask(self):
        return lab2rgb_transpose(100. * (1 - self.input_mask),
                                 np.zeros((2, self.Xd, self.Xd), np.float32))

    def get_img_mask_fullres(self):
        H, W = self._fullres_hw
        out = np.asarray(P.mask_fullres_bucketed(
            jnp.asarray(self.input_mask.transpose(1, 2, 0)),
            self._dev_rh0, self._dev_rw0))
        return out[:H, :W]

    def get_sup_img(self):
        return lab2rgb_transpose(50 * self.input_mask, self.input_ab)

    def get_sup_fullres(self):
        H, W = self._fullres_hw
        planes = jnp.asarray(
            np.concatenate([self.input_mask, self.input_ab], 0)
            .transpose(1, 2, 0))
        out = np.asarray(P.sup_fullres_bucketed(planes, self._dev_rh0,
                                                self._dev_rw0))
        return out[:H, :W]

    # ----- private -----
    def _set_img_lab_fullres_(self):
        X, Y = self.img_rgb_fullres.shape[:2]
        if X > self.Xfullres_max or Y > self.Xfullres_max:
            zf = self.Xfullres_max / max(X, Y)
            out_hw = (int(round(X * zf)), int(round(Y * zf)))
            self.img_rgb_fullres = np.asarray(P.zoom_planes(
                jnp.asarray(self.img_rgb_fullres, jnp.float32), out_hw,
                order=1)).astype(self.img_rgb_fullres.dtype)

        # rgb->lab runs on the BUCKET-padded frame so loading a new image
        # resolution reuses one compiled program per bucket instead of
        # compiling per exact size (the pad is black: Lab (0,0,0), exactly
        # the zero padding the bucketed fusion programs expect). uint8
        # sources upload as uint8 (4x fewer bytes) and dequantize on
        # device; the Lab planes stay device-resident and the numpy
        # mirrors (img_lab_fullres & co) materialize lazily.
        from ..ops.resize import (linear_resize_matrix_np,
                                  nearest_resize_matrix_np)
        src = self.img_rgb_fullres
        H, W = src.shape[:2]
        Hb, Wb = P.bucket_size(H), P.bucket_size(W)
        if src.dtype == np.uint8:
            rgb_pad = np.zeros((Hb, Wb, 3), np.uint8)
            rgb_pad[:H, :W] = src
            lab_pad = P.rgb_to_lab_dev_u8(jnp.asarray(rgb_pad))
        else:
            rgb_pad = np.zeros((Hb, Wb, 3), np.float32)
            rgb_pad[:H, :W] = _to_float01(src)
            lab_pad = P.rgb_to_lab_dev(jnp.asarray(rgb_pad))
        self._fullres_hw = (H, W)
        self._dev_lab_fullres_pad = lab_pad
        self._lab_fullres_np = None
        # padded L plane stays device-resident for the fused getters
        self._dev_l_fullres_pad = lab_pad[..., :1]
        self._dev_rh = jnp.asarray(
            linear_resize_matrix_np(self.Xd, H, Hb))
        self._dev_rw = jnp.asarray(
            linear_resize_matrix_np(self.Xd, W, Wb))
        self._dev_rh0 = jnp.asarray(
            nearest_resize_matrix_np(self.Xd, H, Hb))
        self._dev_rw0 = jnp.asarray(
            nearest_resize_matrix_np(self.Xd, W, Wb))

    # Net-res Lab numpy mirrors are LAZY, like the full-res ones: image
    # load keeps everything device-resident (uint8 sources upload as uint8,
    # 4x fewer bytes; no synchronous readback at all), and the (3,Xd,Xd)
    # numpy views materialize only if host code actually reads them
    # (save_result, get_img_gray). The serving path never does — load +
    # forward costs a single round trip.
    def _set_img_lab_(self):
        src = np.asarray(self.img_rgb)
        if src.dtype == np.uint8:
            lab_dev = P.rgb_to_lab_dev_u8(jnp.asarray(src))
        else:
            lab_dev = P.rgb_to_lab_dev(jnp.asarray(_to_float01(src)))
        self._dev_lab_net = lab_dev                      # (Xd, Xd, 3)
        self._dev_l_net = lab_dev[..., :1]               # (Xd, Xd, 1)
        self._img_lab_np = None
        self._host_l_net_np = None

    def _set_img_lab_mc_(self):
        # the forward programs only need the mean-centered L plane; it is
        # derived on device in one fused dispatch (no mirror readback)
        self._dev_l_mc = P.center_plane(
            self._dev_lab_net, jnp.float32(self.l_mean),
            jnp.float32(self.l_norm))                    # (Xd, Xd, 1)
        self.img_l_set = True
        self._img_lab_mc_np = None

    _set_img_l_ = _set_img_lab_mc_

    @property
    def img_lab(self):
        if getattr(self, "_img_lab_np", None) is None:
            self._img_lab_np = np.asarray(
                self._dev_lab_net).transpose(2, 0, 1)
        return self._img_lab_np

    @property
    def img_l(self):
        return self.img_lab[[0]]

    def _host_l_net(self):
        """(Xd, Xd) float L plane for host composes. Reads back ONLY the
        L channel once per image (~Xd²·4 bytes; a third of the full-Lab
        mirror img_l would materialize) and caches it for the session's
        clicks. Reuses the full mirror if something else already paid
        for it."""
        if getattr(self, "_img_lab_np", None) is not None:
            return self._img_lab_np[0]
        if getattr(self, "_host_l_net_np", None) is None:
            self._host_l_net_np = np.asarray(self._dev_l_net)[..., 0]
        return self._host_l_net_np

    @property
    def img_ab(self):
        return self.img_lab[1:]

    @property
    def img_lab_mc(self):
        if getattr(self, "_img_lab_mc_np", None) is None:
            norm = np.array([self.l_norm, self.ab_norm, self.ab_norm])
            mean = np.array([self.l_mean, self.ab_mean, self.ab_mean])
            self._img_lab_mc_np = (self.img_lab / norm[:, None, None]
                                   - (mean / norm)[:, None, None])
        return self._img_lab_mc_np

    @property
    def img_l_mc(self):
        return self.img_lab_mc[[0]]

    @property
    def img_ab_mc(self):
        return self.img_lab_mc[[1, 2]]

    # _dev_output_ab is a property so the HOST-composed click path
    # (net_forward_table_abq) can park its requantized ab as a numpy
    # plane and pay the ~512 KB device upload only if a full-res
    # consumer actually reads the device mirror
    @property
    def _dev_output_ab(self):
        val = getattr(self, "_dev_out_ab_val", None)
        if val is None:
            pend = getattr(self, "_out_ab_host_pending", None)
            if pend is not None:
                val = self._dev_out_ab_val = jnp.asarray(pend)
        return val

    @_dev_output_ab.setter
    def _dev_output_ab(self, v):
        self._dev_out_ab_val = v
        self._out_ab_host_pending = None

    def _set_out_ab_(self):
        # parity with ref colorize_image.py:196-198: output_ab is re-derived
        # from the QUANTIZED uint8 output image, not the raw prediction
        # (the fused click program computes it on device; numpy mirrors
        # materialize lazily to avoid extra tunnel readbacks).
        self._out_ab_np = None
        self._out_lab_np = None
        if self._dev_output_ab is None:
            self._dev_output_ab = jnp.asarray(
                rgb2lab_transpose(self.output_rgb)[1:]
                .transpose(1, 2, 0).astype(np.float32))

    def _set_out_ab_host_(self, a, b):
        """Host twin of _set_out_ab_ for the abq click: requantized ab
        comes from the native LUT over the host-composed frame; the
        device mirror uploads lazily (see _dev_output_ab)."""
        self._out_lab_np = None
        self._out_ab_np = np.stack([a, b])
        self._dev_out_ab_val = None
        self._out_ab_host_pending = np.stack([a, b], -1)

    @property
    def output_ab(self):
        if getattr(self, "_out_ab_np", None) is None:
            self._out_ab_np = np.asarray(
                self._dev_output_ab).transpose(2, 0, 1)
        return self._out_ab_np

    @property
    def output_lab(self):
        if getattr(self, "_out_lab_np", None) is None:
            self._out_lab_np = rgb2lab_transpose(self.output_rgb)
        return self._out_lab_np


class ColorizeImageJax(ColorizeImageBase):
    """SIGGRAPH U-Net backend (reference torch backend semantics:
    l_norm=ab_norm=1, l_mean=50, mask_mult=1, optional maskcent)."""

    def __init__(self, Xd=256, maskcent=False):
        super().__init__(Xd)
        self.l_norm = 1.
        self.ab_norm = 1.
        self.l_mean = 50.
        self.ab_mean = 0.
        self.mask_mult = 1.
        self.mask_cent = .5 if maskcent else 0
        self.pts_in_hull = make_pts_grid()               # 529x2 full grid

    def prep_net(self, gpu_id=None, path='', dist=False, dtype=None,
                 width=1.0):
        """dtype: optional serving precision for the weights (e.g.
        'bfloat16' — the fast MXU mode (frame delta vs f32 is tiny —
        ~56 dB PSNR, worst pixels within a few uint8 LSB; bench records
        the exact per-run delta); int8 was
        measured slower than bf16 on v5e, see docs/ROADMAP.md).
        width: channel multiplier for a random-init reduced-FLOP student
        (train/distill.py); checkpoints carry their width implicitly."""
        sd = _load_checkpoint(path)
        self.params = (siggraph.init_params(jax.random.key(0), width=width)
                       if sd is None
                       else siggraph.params_from_state_dict(sd))
        self.params = _cast_params(self.params, dtype)
        self.dist = dist
        if not dist:
            # hints travel as one (H,W,3) array = ab_mc + mask (a single
            # host->device transfer per click instead of two)
            self._click = P.make_click_program(
                lambda params, A, h3, mc: siggraph.apply(
                    params, A, h3[None, ..., :2], h3[None, ..., 2:], mc,
                    dist=False))
            mc = self.mask_cent

            def fwd_tbl(params, l_mc, ab, mask):
                # torch conventions: ab_mean=0, ab_norm=1, mask_mult=1 ->
                # raw table values feed the net directly
                return siggraph.apply(params, l_mc[None], ab, mask, mc,
                                      dist=False)

            self._fwd_tbl = fwd_tbl
            self._click_tbl = P.make_table_click_program(fwd_tbl, self.Xd)
            self._click_tbl_win = P.make_table_click_win_program(
                fwd_tbl, self.Xd)
            self._click_tbl_abq = P.make_table_click_abq_program(
                fwd_tbl, self.Xd)
            self._click_tbl_abq_half = P.make_table_click_abq_program(
                fwd_tbl, self.Xd, half=True)
        self.net_set = True

    def net_forward(self, input_ab, input_mask):
        if super().net_forward(input_ab, input_mask) == -1:
            return -1
        A = self._dev_l_mc[None]
        if self.dist:
            # Reference dist backend returns the raw (double-110-scaled)
            # regression array and does NOT compose an RGB frame
            # (ref data/colorize_image.py:297-320). The distribution is
            # kept at Xd/4 on device (nearest-x4 lookups are index
            # mappings; see models/siggraph.py dist_lowres).
            h3 = self._hints3()        # content-cached single upload
            B, M = h3[None, ..., :2], h3[None, ..., 2:]
            reg2, dist_cl = siggraph.apply(self.params, A, B, M,
                                           self.mask_cent, dist=True,
                                           dist_lowres=True)
            self._dev_dist = dist_cl[0]                  # (Xd/4, Xd/4, 529)
            return np.asarray(reg2[0]).transpose(2, 0, 1)
        rgb, out_ab = self._dispatch_click()
        self._dev_output_ab = out_ab
        self.output_rgb = np.asarray(rgb)
        self._set_out_ab_()
        return self.output_rgb

    def _dispatch_click(self):
        if self.dist:
            return None
        return self._click(self._dev_l_net, self.params,
                           self._dev_l_mc[None], self._hints3(),
                           self.mask_cent)


class ColorizeImageJaxDist(ColorizeImageJax):
    """SIGGRAPH backend with the 529-bin distribution head
    (ref data/colorize_image.py:279-372)."""

    dist_map_div = 4      # device map kept at Xd/4 (nearest-x4 semantics)

    def __init__(self, Xd=256, maskcent=False):
        super().__init__(Xd, maskcent)
        self.dist_ab_set = False
        self.pts_grid = make_pts_grid()
        self.in_hull = np.ones(529, dtype=bool)
        self.AB = 529
        self.A = self.B = 23
        self._rng_key = jax.random.key(0)

    def prep_net(self, gpu_id=None, path='', dist=True, S=.2, dtype=None):
        super().prep_net(gpu_id, path, dist=True, dtype=dtype)
        from ..ops.hints import rasterize_hints
        mc = self.mask_cent
        Xd = self.Xd

        @jax.jit
        def dist_tbl(l_mc, params, boxes, values, count):
            ab, mask = rasterize_hints(boxes, values, count, size=Xd)
            _reg2, dist_cl = siggraph.apply(params, l_mc[None], ab[None],
                                            mask[None], mc, dist=True,
                                            dist_lowres=True)
            return dist_cl[0]

        self._dist_tbl = dist_tbl

        def dist_fwd(params, l_mc, ab, mask):
            _reg2, dist_cl = siggraph.apply(params, l_mc[None], ab[None],
                                            mask[None], mc, dist=True,
                                            dist_lowres=True)
            return dist_cl[0]

        self._dist_fwd_tbl = dist_fwd
        self._suggest_tbl_cache = {}

    def predict_dist_table(self, boxes, values, count):
        """GUI fast path for the per-image suggestion forward: hint table
        in (~1.8 KB upload, device rasterize), distribution map set
        device-side, NOTHING read back (the reference's predict_color
        discards the regression return, ref ui/gui_draw.py:250-258 — the
        dense ``net_forward`` still returns it for API parity)."""
        if not (self.img_l_set and self.net_set):
            return -1
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        self._dev_dist = self._dist_tbl(
            self._dev_l_mc, self.params, jnp.asarray(boxes, jnp.int32),
            jnp.asarray(values, jnp.float32), jnp.int32(count))
        self.dist_ab_set = True
        self._dist_np = None
        return 0

    # Bounds for client-controllable suggestion parameters: each distinct
    # (K, N) compiles a FULL fused dist-forward program (~15-25 s cold on
    # TPU), so the values must be validated and the program cache bounded
    # — an unchecked ?k= sweep would otherwise force unbounded compiles.
    MAX_SUGGEST_K = 25
    MAX_SUGGEST_N = 100_000
    _SUGGEST_CACHE_MAX = 8

    def ensure_suggest_program(self, K=9, N=25000, compile_now=False):
        """Validated, bounded access to the fused suggest-program cache.

        Raises ValueError on out-of-range K/N (serve maps it to HTTP
        400). The cache holds at most ``_SUGGEST_CACHE_MAX`` programs
        (FIFO eviction). With ``compile_now=True`` the program is traced
        and XLA-compiled from shape structs immediately — no dispatch —
        so a server can compile a novel (K, N) OUTSIDE its device lock
        instead of stalling interactive traffic behind a full-model
        compile. Returns the cache entry dict."""
        K, N = int(K), int(N)
        if not 1 <= K <= self.MAX_SUGGEST_K:
            raise ValueError(
                f"k must be in [1, {self.MAX_SUGGEST_K}], got {K}")
        if not 1000 <= N <= self.MAX_SUGGEST_N:
            raise ValueError(
                f"N must be in [1000, {self.MAX_SUGGEST_N}], got {N}")
        entry = self._suggest_tbl_cache.get((K, N))
        if entry is None:
            while len(self._suggest_tbl_cache) >= self._SUGGEST_CACHE_MAX:
                self._suggest_tbl_cache.pop(
                    next(iter(self._suggest_tbl_cache)))
            entry = self._suggest_tbl_cache[(K, N)] = {
                "jit": P.make_table_suggest_program(
                    self._dist_fwd_tbl, self.Xd, K=K, N=N,
                    map_div=self.dist_map_div)}
        if compile_now and "compiled" not in entry:
            entry["compiled"] = self._aot_compile_suggest(entry["jit"])
        return entry

    def _aot_compile_suggest(self, prog):
        """AOT-compile a suggest program from ShapeDtypeStructs (trace +
        compile only, no device dispatch). Returns the compiled callable,
        or None when AOT isn't available — it is an optimization, never a
        correctness dependency (suggest_table falls back to the jit)."""
        from ..ops.hints import MAX_HINTS
        S = jax.ShapeDtypeStruct
        f32, i32 = jnp.float32, jnp.int32
        sds = lambda v: S(v.shape, v.dtype)          # noqa: E731
        plane = S((self.Xd, self.Xd, 1), f32)
        try:
            args = (plane, plane,
                    jax.tree.map(sds, self.params),
                    S((MAX_HINTS, 4), i32), S((MAX_HINTS, 2), f32),
                    S((), i32), S((), i32), S((), i32),
                    sds(self._dev_pts()), jax.random.key(0))
            return prog.lower(*args).compile()
        except Exception:
            return None

    def suggest_table(self, boxes, values, count, h, w, K=9, N=25000):
        """ONE-dispatch serving suggest: hint-table dist forward + CMF
        sampling + k-means + uint8 palette at pixel (h, w).

        Returns ``(colors_u8 (K,3), conf (K,))`` with a single sync
        round trip — the unfused chain (``predict_dist_table`` then
        ``get_ab_reccs`` then the host Lab->RGB of the centers) pays two
        to three. The distribution map stays device-resident for later
        ``get_ab_reccs`` / ``compute_entropy``. -1 on unset image/net
        (reference sentinel convention)."""
        if not (self.img_l_set and self.net_set):
            return -1
        entry = self.ensure_suggest_program(K, N)
        prog = entry.get("compiled") or entry["jit"]
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        self._rng_key, sub = jax.random.split(self._rng_key)
        args = (self._dev_l_net, self._dev_l_mc, self.params,
                jnp.asarray(boxes, jnp.int32),
                jnp.asarray(values, jnp.float32), jnp.int32(count),
                jnp.int32(h), jnp.int32(w),
                self._dev_pts(), sub)
        try:
            dist_map, colors, conf = prog(*args)
        except TypeError:
            # AOT executable signature mismatch (e.g. weak-type drift):
            # drop it and take the always-correct jit path
            if prog is entry["jit"]:
                raise
            entry.pop("compiled", None)
            dist_map, colors, conf = entry["jit"](*args)
        self._dev_dist = dist_map
        self.dist_ab_set = True
        self._dist_np = None
        # the caffe-dist alias of this method also caches a scattered
        # 529-grid view — invalidate it too (stale reads / AttributeError
        # when suggest_table is the first dist call otherwise)
        self._dist_full_np = None
        return np.asarray(colors), np.asarray(conf)

    def net_forward(self, input_ab, input_mask):
        out = super().net_forward(input_ab, input_mask)
        if np.isscalar(out) and out == -1:   # precondition failure only —
            return -1                        # never test the float output
        self.dist_ab_set = True
        self._dist_np = None          # numpy mirrors are lazy (134MB readback)
        return out

    @property
    def dist_ab(self):
        if self._dist_np is None:
            lo = np.asarray(self._dev_dist).transpose(2, 0, 1)
            # materialize the reference's x4-nearest-upsampled view
            self._dist_np = lo.repeat(4, axis=1).repeat(4, axis=2)
        return self._dist_np

    @property
    def dist_ab_full(self):
        return self.dist_ab

    @property
    def dist_ab_grid(self):
        return self.dist_ab_full.reshape((self.A, self.B, self.Xd, self.Xd))

    def get_ab_reccs(self, h, w, K=5, N=25000, return_conf=False):
        if not self.dist_ab_set:
            print('Need to set prediction first')
            return 0
        self._rng_key, sub = jax.random.split(self._rng_key)
        # the device map is at Xd/4; nearest-x4 lookup == (h//4, w//4)
        centers, conf = P.suggest_at(
            self._dev_dist, jnp.int32(h // 4), jnp.int32(w // 4),
            self._dev_pts(), sub, K=K, N=N)
        centers, conf = np.asarray(centers), np.asarray(conf)
        return (centers, conf) if return_conf else centers

    def compute_entropy(self):
        lo = np.asarray(P.dist_entropy(self._dev_dist))
        self.dist_entropy = lo.repeat(4, axis=0).repeat(4, axis=1)

    def plot_dist_grid(self, h, w):
        import matplotlib.pyplot as plt
        plt.figure()
        plt.imshow(self.dist_ab_grid[:, :, h, w],
                   extent=[-110, 110, 110, -110], interpolation='nearest')
        plt.colorbar()
        plt.ylabel('a')
        plt.xlabel('b')

    def plot_dist_entropy(self):
        import matplotlib.pyplot as plt
        plt.figure()
        plt.imshow(-self.dist_entropy, interpolation='nearest')
        plt.colorbar()


class ColorizeImageJaxCaffe(ColorizeImageBase):
    """Caffe main-graph backend (mask_mult=110, ref :375-442)."""

    variant = "main"

    def __init__(self, Xd=256):
        super().__init__(Xd)
        self.l_norm = 1.
        self.ab_norm = 1.
        self.l_mean = 50.
        self.ab_mean = 0.
        self.mask_mult = 110.
        self.pred_ab_layer = 'pred_ab'
        self.pts_in_hull = get_bins().pts_in_hull

    def prep_net(self, gpu_id=None, prototxt_path='', caffemodel_path='',
                 dtype=None):
        """prototxt_path is accepted for reference-call parity and unused
        (graph structure is built in); caffemodel_path may be a raw
        ``.caffemodel`` (parsed natively, models/caffemodel_io) or a
        converted ``.npz``. dtype: optional serving precision (e.g.
        'bfloat16', the fast MXU mode)."""
        if caffemodel_path and caffemodel_path.endswith(".caffemodel"):
            from ..models.caffemodel_io import load_caffemodel
            self.params = load_caffemodel(caffemodel_path, self.variant)
        else:
            sd = _load_checkpoint(caffemodel_path)
            if sd is None:
                self.params = caffe_net.init_params(jax.random.key(0),
                                                    self.variant)
            else:
                self.params = {k: jnp.asarray(v) for k, v in sd.items()}
        self.params = _cast_params(self.params, dtype)
        self._make_click()
        self.net_set = True

    def _make_click(self):
        mm = self.mask_mult

        def fwd(params, l_mc, h3):
            # h3 = (H,W,3) [ab_mc, mask*mask_mult] — mask already scaled
            blob = jnp.concatenate([l_mc, h3], -1)[None]
            return caffe_net.apply_main(params, blob)

        self._click = P.make_click_program(fwd)

        def fwd_tbl(params, l_mc, ab, mask):
            blob = jnp.concatenate([l_mc[None], ab, mask * mm], -1)
            return caffe_net.apply_main(params, blob)

        self._fwd_tbl = fwd_tbl
        self._click_tbl = P.make_table_click_program(fwd_tbl, self.Xd)
        self._click_tbl_win = P.make_table_click_win_program(
            fwd_tbl, self.Xd)
        self._click_tbl_abq = P.make_table_click_abq_program(
            fwd_tbl, self.Xd)
        self._click_tbl_abq_half = P.make_table_click_abq_program(
            fwd_tbl, self.Xd, half=True)

    def net_forward(self, input_ab, input_mask):
        if super().net_forward(input_ab, input_mask) == -1:
            return -1
        rgb, out_ab = self._dispatch_click()
        self._dev_output_ab = out_ab
        self.output_rgb = np.asarray(rgb)
        self._set_out_ab_()
        return self.output_rgb

    def _dispatch_click(self):
        return self._click(self._dev_l_net, self.params, self._dev_l_mc,
                           self._hints3())


class ColorizeImageJaxCaffeGlobDist(ColorizeImageJaxCaffe):
    """Caffe global-histogram backend (ref :445-463)."""

    variant = "global"

    def __init__(self, Xd=256):
        super().__init__(Xd)
        self.glob_mask_mult = 1.
        self.glob_layer = 'glob_ab_313_mask'

    def _glob_array(self, glob_dist) -> np.ndarray:
        """(1, 314) histogram blob: 313 bins + the on/off mask channel;
        glob_dist=-1 means 'no histogram' and zeroes the whole blob
        (ref data/colorize_image.py:452-459)."""
        if np.array(glob_dist).flatten()[0] == -1:
            return np.zeros((1, 314), np.float32)
        return np.concatenate(
            [np.asarray(glob_dist, np.float32).ravel(),
             [self.glob_mask_mult]]).astype(np.float32)[None]

    def net_forward(self, input_ab, input_mask, glob_dist=-1):
        if super(ColorizeImageJaxCaffe, self).net_forward(
                input_ab, input_mask) == -1:
            return -1
        rgb, out_ab = self._click(
            self._dev_l_net, self.params, self._dev_l_mc, self._hints3(),
            jnp.asarray(self._glob_array(glob_dist)))
        self._dev_output_ab = out_ab
        self.output_rgb = np.asarray(rgb)
        self._set_out_ab_()
        return self.output_rgb

    def net_forward_fullres(self, input_ab, input_mask, glob_dist=-1):
        """Histogram-conditioned forward + full-res reconstruction with a
        single synchronization point (VERDICT r1 item 8: the glob path
        used to pay two full round trips — net_forward's frame readback,
        then get_img_fullres). Both programs dispatch asynchronously and
        only the full-res frame is read back; the net-res frame stays
        device-resident in ``output_rgb`` (lazy)."""
        finish = self.net_forward_fullres_async(input_ab, input_mask,
                                                glob_dist)
        return finish if finish == -1 else finish()

    def net_forward_fullres_async(self, input_ab, input_mask,
                                  glob_dist=-1):
        """Glob variant of the base ``net_forward_fullres_async``:
        dispatch + async copy under a caller's lock, block outside it."""
        if not self.img_l_set or not self.net_set:
            return -1
        if ColorizeImageBase.net_forward(self, input_ab, input_mask) == -1:
            return -1
        rgb, out_ab = self._click(
            self._dev_l_net, self.params, self._dev_l_mc, self._hints3(),
            jnp.asarray(self._glob_array(glob_dist)))
        H, W = self._fullres_hw
        full = P.fullres_fuse_bucketed(
            self._dev_l_fullres_pad, out_ab, self._dev_rh, self._dev_rw)
        self._dev_output_ab = out_ab
        self.output_rgb = rgb
        self._set_out_ab_()
        full.copy_to_host_async()
        return lambda: np.asarray(full)[:H, :W]

    def _make_click(self):
        mm = self.mask_mult

        def fwd(params, l_mc, h3, glob):
            blob = jnp.concatenate([l_mc, h3], -1)[None]
            return caffe_net.apply_global(params, blob, glob)

        self._click = P.make_click_program(fwd)

    def _dispatch_click(self):
        # the glob click program needs the histogram argument; the base
        # fused forward+fullres path can't drive it -> sentinel -1
        return None


class ColorizeImageJaxCaffeDist(ColorizeImageJaxCaffe):
    """Caffe dist-graph backend with suggestions (ref :466-561)."""

    variant = "dist"
    dist_map_div = 1      # full-res (Xd, Xd, 313) device map

    def __init__(self, Xd=256):
        super().__init__(Xd)
        self.dist_ab_set = False
        bins = get_bins()
        self.pts_grid = bins.pts_grid
        self.in_hull = bins.in_hull
        self.AB = 529
        self.A = self.B = 23
        self._rng_key = jax.random.key(0)

    def prep_net(self, gpu_id=None, prototxt_path='', caffemodel_path='',
                 S=.2, dtype=None):
        super().prep_net(gpu_id, prototxt_path, caffemodel_path,
                         dtype=dtype)
        self.S = S
        self.params["scale_S.scale"] = jnp.asarray(S, jnp.float32)
        from ..ops.hints import rasterize_hints
        mm = self.mask_mult
        Xd = self.Xd

        @jax.jit
        def dist_tbl(l_mc, params, boxes, values, count):
            ab, mask = rasterize_hints(boxes, values, count, size=Xd)
            blob = jnp.concatenate([l_mc[None], ab[None], mask[None] * mm],
                                   -1)
            _pred, dist_S = caffe_net.apply_dist(params, blob)
            return dist_S[0]

        self._dist_tbl = dist_tbl

        def dist_fwd(params, l_mc, ab, mask):
            blob = jnp.concatenate([l_mc[None], ab[None], mask[None] * mm],
                                   -1)
            _pred, dist_S = caffe_net.apply_dist(params, blob)
            return dist_S[0]

        self._dist_fwd_tbl = dist_fwd
        self._suggest_tbl_cache = {}

    def predict_dist_table(self, boxes, values, count):
        """Same fast suggestion-forward contract as
        ColorizeImageJaxDist.predict_dist_table (caffe conventions:
        mask x110 inside the program)."""
        if not (self.img_l_set and self.net_set):
            return -1
        from ..ops import host
        ab_np, mask_np = host.rasterize_hints(
            np.asarray(boxes), np.asarray(values), int(count), self.Xd)
        if ColorizeImageBase.net_forward(
                self, ab_np.transpose(2, 0, 1),
                mask_np.transpose(2, 0, 1)) == -1:
            return -1
        self._dev_dist = self._dist_tbl(
            self._dev_l_mc, self.params, jnp.asarray(boxes, jnp.int32),
            jnp.asarray(values, jnp.float32), jnp.int32(count))
        self.dist_ab_set = True
        self._dist_np = None
        self._dist_full_np = None
        return 0

    def _make_click(self):
        mm = self.mask_mult

        @jax.jit
        def click(l_net, params, l_mc, h3):
            blob = jnp.concatenate([l_mc, h3], -1)[None]
            pred_ab, dist_S = caffe_net.apply_dist(params, blob)
            rgb = P.compose_rgb_u8(l_net, pred_ab[0])
            return rgb, P.requantized_ab(rgb), dist_S[0]

        self._click = click

    def _dispatch_click(self):
        # the dist click program returns 3 outputs; the base fused
        # forward+fullres path expects (rgb, ab) -> sentinel -1
        return None

    def net_forward(self, input_ab, input_mask):
        if ColorizeImageBase.net_forward(self, input_ab, input_mask) == -1:
            return -1
        rgb, out_ab, dist_S = self._click(
            self._dev_l_net, self.params, self._dev_l_mc, self._hints3())
        self._dev_dist = dist_S                          # (Xd, Xd, 313)
        self._dev_output_ab = out_ab
        self.output_rgb = np.asarray(rgb)
        self._set_out_ab_()
        self.dist_ab_set = True
        self._dist_np = None
        self._dist_full_np = None
        return self.output_rgb

    @property
    def dist_ab(self):
        if self._dist_np is None:
            self._dist_np = np.asarray(self._dev_dist).transpose(2, 0, 1)
        return self._dist_np

    @property
    def dist_ab_full(self):
        if self._dist_full_np is None:
            # scatter the 313 in-hull bins into the full 529 grid
            # (ref data/colorize_image.py:499-506)
            self._dist_full_np = np.asarray(quantize.scatter_to_grid(
                jnp.asarray(self.dist_ab), self.in_hull)).reshape(
                    529, self.Xd, self.Xd)
        return self._dist_full_np

    @property
    def dist_ab_grid(self):
        return self.dist_ab_full.reshape((self.A, self.B, self.Xd, self.Xd))

    def get_ab_reccs(self, h, w, K=5, N=25000, return_conf=False):
        if not self.dist_ab_set:
            print('Need to set prediction first')
            return 0
        self._rng_key, sub = jax.random.split(self._rng_key)
        centers, conf = P.suggest_at(
            self._dev_dist, jnp.int32(h), jnp.int32(w),
            self._dev_pts(), sub, K=K, N=N)
        centers, conf = np.asarray(centers), np.asarray(conf)
        return (centers, conf) if return_conf else centers

    def compute_entropy(self):
        self.dist_entropy = np.asarray(P.dist_entropy(self._dev_dist))

    plot_dist_grid = ColorizeImageJaxDist.plot_dist_grid
    plot_dist_entropy = ColorizeImageJaxDist.plot_dist_entropy
    # same fused serving-suggest contract; the program is generic over
    # the dist forward and map resolution (dist_map_div below)
    suggest_table = ColorizeImageJaxDist.suggest_table
    MAX_SUGGEST_K = ColorizeImageJaxDist.MAX_SUGGEST_K
    MAX_SUGGEST_N = ColorizeImageJaxDist.MAX_SUGGEST_N
    _SUGGEST_CACHE_MAX = ColorizeImageJaxDist._SUGGEST_CACHE_MAX
    ensure_suggest_program = ColorizeImageJaxDist.ensure_suggest_program
    _aot_compile_suggest = ColorizeImageJaxDist._aot_compile_suggest


# Drop-in aliases: reference-style code instantiates these names
# (ref ideepcolor.py:60-74, notebooks cell 1).
ColorizeImageTorch = ColorizeImageJax
ColorizeImageTorchDist = ColorizeImageJaxDist
ColorizeImageCaffe = ColorizeImageJaxCaffe
ColorizeImageCaffeDist = ColorizeImageJaxCaffeDist
ColorizeImageCaffeGlobDist = ColorizeImageJaxCaffeGlobDist
