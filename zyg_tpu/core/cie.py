"""CIE 1931 standard observer, via the multi-lobe Gaussian analytic fits of
Wyman, Sloan & Shirley 2013 ("Simple Analytic Approximations to the CIE XYZ
Color Matching Functions"), sampled 360..830nm.

Used for blackbody colors and spectral (dispersive) rendering; the reference
carries full tables (ref: src/base/spectrum/xyz.zig) — the analytic fit is
accurate to ~1% which is far below Monte-Carlo noise floors.
"""

from __future__ import annotations

import numpy as np


def _g(x, mu, s1, s2):
    t = (x - mu) * np.where(x < mu, 1.0 / s1, 1.0 / s2)
    return np.exp(-0.5 * t * t)


def xyz_fit(wl):
    """wl in nm -> (x_bar, y_bar, z_bar)."""
    wl = np.asarray(wl, np.float64)
    x = 1.056 * _g(wl, 599.8, 37.9, 31.0) + 0.362 * _g(wl, 442.0, 16.0, 26.7) - 0.065 * _g(wl, 501.1, 20.4, 26.2)
    y = 0.821 * _g(wl, 568.8, 46.9, 40.5) + 0.286 * _g(wl, 530.9, 16.3, 31.1)
    z = 1.217 * _g(wl, 437.0, 11.8, 36.0) + 0.681 * _g(wl, 459.0, 26.0, 13.8)
    return x, y, z


CIE_WAVELENGTHS = np.arange(360.0, 831.0, 1.0)
CIE_X, CIE_Y, CIE_Z = xyz_fit(CIE_WAVELENGTHS)
