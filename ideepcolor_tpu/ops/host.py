"""ctypes bindings to the native host-ops library (native/hostops.cpp).

The native library is the framework's CPU runtime — the role Caffe's C++
engine and the cv2/skimage C internals play for the reference (SURVEY.md
section 2.4). It is built on demand with g++ (-O3 -march=native -fopenmp)
and loaded via ctypes; every entry point has a numpy fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
# the source ships INSIDE the package (pyproject package-data), so
# installed wheels carry the native runtime too
_SRC = os.path.join(os.path.dirname(_HERE), "native", "hostops.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libhostops.so")

_lib = None
_build_failed = False


def _build() -> bool:
    global _LIB
    for out in (_LIB, os.path.join(
            os.path.expanduser("~/.cache/ideepcolor_tpu"),
            "libhostops.so")):
        # second candidate: site-packages may be read-only for the
        # running user; fall back to a per-user cache dir
        try:
            os.makedirs(os.path.dirname(out), exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", _SRC, "-o", out]
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            _LIB = out
            return True
        except Exception:
            continue
    return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed, _LIB
    if _lib is not None or _build_failed:
        return _lib
    # prefer an existing up-to-date build (package dir, then user cache)
    cache = os.path.join(os.path.expanduser("~/.cache/ideepcolor_tpu"),
                         "libhostops.so")
    for cand in (_LIB, cache):
        if os.path.exists(cand) and (
                not os.path.exists(_SRC)
                or os.path.getmtime(_SRC) <= os.path.getmtime(cand)):
            _LIB = cand
            break
    else:
        if not (os.path.exists(_SRC) and _build()):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _build_failed = True
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rgb2lab_f32.argtypes = [f32p, f32p, ctypes.c_int64]
    lib.rgb2lab_u8f.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.lab2rgb_f32.argtypes = [f32p, f32p, ctypes.c_int64]
    lib.lab2rgb_u8.argtypes = [f32p, u8p, ctypes.c_int64]
    lib.lab2rgb_u8_planar.argtypes = [f32p, f32p, f32p, u8p,
                                      ctypes.c_int64]
    lib.rasterize_hints.argtypes = [i32p, f32p, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_int32,
                                    f32p, f32p]
    lib.zoom_bilinear_f32.argtypes = [f32p] + [ctypes.c_int32] * 3 + \
        [f32p] + [ctypes.c_int32] * 2
    lib.zoom2_banded_f32.argtypes = [f32p, ctypes.c_int32, f32p,
                                     ctypes.c_int32, f32p, f32p,
                                     ctypes.c_int32, f32p, f32p]
    lib.rgb2lab_u8_ab_planar.argtypes = [u8p, f32p, f32p, ctypes.c_int64]
    lib.num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


# numpy fallbacks (same published CIE constants as native/hostops.cpp)
_M = np.array([[0.412456439089692, 0.357576077643909, 0.180437483266399],
               [0.212672851405623, 0.715152155287818, 0.072174993306560],
               [0.019333895582329, 0.119192025881303, 0.950304078536368]])
_MINV = np.linalg.inv(_M)
_WHITE = np.array([0.95047, 1.0, 1.08883])
_KAPPA = 24389.0 / 27.0


def _np_rgb2lab(rgb: np.ndarray) -> np.ndarray:
    x = rgb.astype(np.float64)
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    t = (lin @ _M.T) / _WHITE
    f = np.where(t > 216.0 / 24389.0, np.cbrt(t),
                 (_KAPPA * t + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)],
                    -1).astype(np.float32)


def _np_lab2rgb(lab: np.ndarray) -> np.ndarray:
    L, a, b = (lab.astype(np.float64)[..., i] for i in range(3))
    fy = (L + 16) / 116
    f = np.stack([fy + a / 500, fy, fy - b / 200], -1)
    xyz = np.where(f > 6 / 29, f ** 3, (116 * f - 16) / _KAPPA) * _WHITE
    lin = xyz @ _MINV.T
    srgb = np.where(lin <= 0.0031308, lin * 12.92,
                    1.055 * np.maximum(lin, 0) ** (1 / 2.4) - 0.055)
    return np.clip(srgb, 0, 1).astype(np.float32)


def rgb2lab(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) sRGB [0,1] -> Lab, native path with numpy fallback."""
    lib = get_lib()
    rgb = _f32(rgb)
    if lib is None:
        return _np_rgb2lab(rgb)
    out = np.empty_like(rgb)
    lib.rgb2lab_f32(rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    rgb.size // 3)
    return out


def rgb2lab_u8(rgb_u8: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 sRGB -> Lab float32. Exact (uint8-domain LUT
    linearization) and ~4x faster than the float path on one core."""
    lib = get_lib()
    if lib is None:
        return _np_rgb2lab(rgb_u8.astype(np.float32) / 255.0)
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out = np.empty(rgb_u8.shape, np.float32)
    lib.rgb2lab_u8f(rgb_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    rgb_u8.size // 3)
    return out


def lab2rgb(lab: np.ndarray) -> np.ndarray:
    lib = get_lib()
    lab = _f32(lab)
    if lib is None:
        return _np_lab2rgb(lab)
    out = np.empty_like(lab)
    lib.lab2rgb_f32(lab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    lab.size // 3)
    return out


def lab2rgb_u8(lab: np.ndarray) -> np.ndarray:
    """Fused Lab -> truncated uint8 RGB (reference output semantics)."""
    lib = get_lib()
    lab = _f32(lab)
    if lib is None:
        return (np.clip(lab2rgb(lab), 0, 1) * 255).astype(np.uint8)
    out = np.empty(lab.shape, np.uint8)
    lib.lab2rgb_u8(lab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   lab.size // 3)
    return out


def lab2rgb_u8_planar(l: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Planar l/a/b (H,W) planes -> uint8 RGB (H,W,3) with the reference
    truncation semantics; fused path that takes GEMM outputs directly
    (no interleaved Lab array materialized)."""
    shape = a.shape
    l = _f32(l).reshape(shape)
    a = _f32(a)
    b = _f32(b)
    lib = get_lib()
    if lib is None:
        lab = np.stack([l, a, b], -1)
        return (np.clip(_np_lab2rgb(lab), 0, 1) * 255).astype(np.uint8)
    out = np.empty((*shape, 3), np.uint8)
    lib.lab2rgb_u8_planar(
        l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        l.size)
    return out


def rasterize_hints(boxes: np.ndarray, values: np.ndarray, count: int,
                    size: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side hint rasterization (same contract as ops.hints)."""
    lib = get_lib()
    boxes = np.ascontiguousarray(boxes[:count], np.int32)
    values = _f32(values[:count])
    if lib is None:
        ab = np.zeros((size, size, 2), np.float32)
        mask = np.zeros((size, size), np.float32)
        for (y1, x1, y2, x2), v in zip(boxes, values):
            ab[max(y1, 0):y2 + 1, max(x1, 0):x2 + 1] = v
            mask[max(y1, 0):y2 + 1, max(x1, 0):x2 + 1] = 1.0
        return ab, mask[..., None]
    ab = np.empty((size, size, 2), np.float32)
    mask = np.empty((size, size), np.float32)
    lib.rasterize_hints(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count, size, size,
        ab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return ab, mask[..., None]


def rgb2lab_u8_ab(rgb_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(H,W,3) uint8 sRGB -> planar (a, b) float32 planes, L skipped —
    the window compose's requantized-ab extraction without the
    interleaved Lab intermediate or its de-interleave copies."""
    lib = get_lib()
    if lib is None:
        lab = _np_rgb2lab(rgb_u8.astype(np.float32) / 255.0)
        return (np.ascontiguousarray(lab[..., 1]),
                np.ascontiguousarray(lab[..., 2]))
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    hw = rgb_u8.shape[:-1]
    a = np.empty(hw, np.float32)
    b = np.empty(hw, np.float32)
    lib.rgb2lab_u8_ab_planar(
        rgb_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb_u8.size // 3)
    return a, b


def zoom2_matrices(a: np.ndarray, b: np.ndarray, rh: np.ndarray,
                   rw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two (S,S) planes -> (H,W) via ``rh @ X @ rw.T`` exploiting the
    interpolation matrices' row bands (<=4 nonzeros/row for cubic/
    linear, ops/resize.py) — ~60x fewer MACs than the dense per-channel
    GEMM chain it replaces in the host window compose. Dense-BLAS
    fallback without the native lib; both stay within f32 rounding of
    each other (the kernel uses double accumulators over the band)."""
    lib = get_lib()
    a, b = _f32(a), _f32(b)
    rh, rw = _f32(rh), _f32(rw)
    if lib is None:
        return rh @ a @ rw.T, rh @ b @ rw.T
    H, W, S = rh.shape[0], rw.shape[0], a.shape[0]
    oa = np.empty((H, W), np.float32)
    ob = np.empty((H, W), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.zoom2_banded_f32(
        rh.ctypes.data_as(f32p), H, rw.ctypes.data_as(f32p), W,
        a.ctypes.data_as(f32p), b.ctypes.data_as(f32p), S,
        oa.ctypes.data_as(f32p), ob.ctypes.data_as(f32p))
    return oa, ob


def zoom_bilinear(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(h,w,c) -> (H,W,c) align-corners bilinear (scipy zoom order=1)."""
    lib = get_lib()
    x = _f32(x)
    h, w, c = x.shape
    if lib is None:
        from scipy.ndimage import zoom
        return zoom(x, (out_hw[0] / h, out_hw[1] / w, 1), order=1
                    ).astype(np.float32)
    out = np.empty((out_hw[0], out_hw[1], c), np.float32)
    lib.zoom_bilinear_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_hw[0], out_hw[1])
    return out
