"""Color/spectrum math: sRGB transfer, luminance, blackbody, heatmap.

ref: src/base/spectrum/ (xyz.zig, srgb.zig, mapping.zig). Works on
[..., 3] arrays, jnp or numpy via the array namespace of the input.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# CIE 1931 Y weights for linear sRGB primaries (ref srgb.zig luminance)
LUMINANCE_WEIGHTS = (0.212671, 0.715160, 0.072169)


def luminance(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return LUMINANCE_WEIGHTS[0] * r + LUMINANCE_WEIGHTS[1] * g + LUMINANCE_WEIGHTS[2] * b


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb_np(c: np.ndarray) -> np.ndarray:
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, 12.92 * c, 1.055 * np.power(c, 1.0 / 2.4) - 0.055)


def srgb_to_linear_np(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float64)
    return np.where(c <= 0.04045, c / 12.92, np.power((c + 0.055) / 1.055, 2.4)).astype(np.float32)


# XYZ <-> linear sRGB (D65)
_XYZ_TO_SRGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    np.float32,
)

_SRGB_TO_XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    np.float32,
)


def xyz_to_srgb(xyz):
    return xyz @ jnp.asarray(_XYZ_TO_SRGB).T


def srgb_to_xyz(rgb):
    return rgb @ jnp.asarray(_SRGB_TO_XYZ).T


def blackbody(temperature: float) -> np.ndarray:
    """Normalized linear-sRGB color of a blackbody at the given Kelvin.

    Planck's law sampled over the visible range with the CIE standard
    observer (host-side helper; ref spectrum/mapping.zig blackbody).
    """
    from .cie import CIE_WAVELENGTHS, CIE_X, CIE_Y, CIE_Z

    wl = CIE_WAVELENGTHS * 1e-9
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    # spectral radiance (arbitrary scale)
    rad = (2.0 * h * c * c) / (wl**5 * (np.exp(h * c / (wl * kb * temperature)) - 1.0))
    x = float(np.trapezoid(rad * CIE_X, CIE_WAVELENGTHS))
    y = float(np.trapezoid(rad * CIE_Y, CIE_WAVELENGTHS))
    z = float(np.trapezoid(rad * CIE_Z, CIE_WAVELENGTHS))
    xyz = np.array([x, y, z], np.float32)
    if y > 0:
        xyz /= y
    rgb = _XYZ_TO_SRGB @ xyz
    return np.maximum(rgb, 0.0)
