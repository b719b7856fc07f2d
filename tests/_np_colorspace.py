"""Independent pure-numpy CIE colorspace reference for testing.

Implements the standard sRGB (IEC 61966-2-1) <-> CIE Lab (D65, 2-deg)
formulas directly from their definitions, written independently of the
framework's JAX implementation, to serve as a test oracle (skimage is not
installed in this image; these are the same published constants it uses).
"""
import numpy as np

M = np.array([
    [0.412456439089692, 0.357576077643909, 0.180437483266399],
    [0.212672851405623, 0.715152155287818, 0.072174993306560],
    [0.019333895582329, 0.119192025881303, 0.950304078536368],
])
MINV = np.linalg.inv(M)
WHITE = np.array([0.95047, 1.0, 1.08883])
EPS = 216.0 / 24389.0
KAPPA = 24389.0 / 27.0


def srgb_to_linear(x):
    x = np.asarray(x, np.float64)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = np.asarray(x, np.float64)
    return np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.maximum(x, 0) ** (1 / 2.4) - 0.055)


def rgb2lab(rgb):
    xyz = srgb_to_linear(rgb) @ M.T
    t = xyz / WHITE
    f = np.where(t > EPS, np.cbrt(t), (KAPPA * t + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)], -1)


def lab2rgb(lab):
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200
    f = np.stack([fx, fy, fz], -1)
    xyz = np.where(f > 6 / 29, f ** 3, (116 * f - 16) / KAPPA) * WHITE
    return np.clip(linear_to_srgb(xyz @ MINV.T), 0, 1)


def rgb2hsv(rgb):
    import colorsys
    flat = rgb.reshape(-1, 3)
    out = np.array([colorsys.rgb_to_hsv(*px) for px in flat])
    return out.reshape(rgb.shape)
