"""Sensor: framebuffer accumulation + tonemapping.

ref: src/core/rendering/sensor/. The reference splats filtered samples with
per-tile atomics; here accumulation is pure-functional — radius-0 (box)
accumulation is a reshape-add, filtered splats become scatter-adds, and
multi-chip merging is a psum over the device mesh (see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Clamp:
    """Per-class radiance clamp (ref sensor.zig Clamp)."""

    emission: float = np.inf
    direct: float = np.inf
    indirect: float = np.inf


@dataclass
class SensorSettings:
    clamp: Clamp
    filter_radius: float = 0.0  # 0 = box
    filter_name: str = "Blackman"
    alpha_transparency: bool = False
    tonemapper: str = "Linear"
    exposure: float = 0.0
    look: str = "Substitute"  # AgX ASC-CDL look (ref agx.zig Look)


class Framebuffer(NamedTuple):
    """Weighted accumulation buffer, row-major [H*W]."""

    value: jax.Array  # [H*W, 3]
    weight: jax.Array  # [H*W]

    @staticmethod
    def zeros(num_pixels: int) -> "Framebuffer":
        return Framebuffer(
            value=jnp.zeros((num_pixels, 3), jnp.float32),
            weight=jnp.zeros((num_pixels,), jnp.float32),
        )

    def add_box(self, radiance) -> "Framebuffer":
        """One full-frame pass in pixel order: box filter radius 0."""
        return Framebuffer(self.value + radiance, self.weight + 1.0)

    def splat(self, pixel_ids, radiance, weights) -> "Framebuffer":
        """Scatter-add for filtered/light-traced samples."""
        value = self.value.at[pixel_ids].add(radiance * weights[..., None])
        weight = self.weight.at[pixel_ids].add(weights)
        return Framebuffer(value, weight)

    def resolve(self) -> jax.Array:
        w = jnp.where(self.weight > 0.0, self.weight, 1.0)
        return self.value / w[..., None]


def clamp_radiance(radiance, max_value: float):
    """ref buffer clamping: clamp each channel."""
    if not np.isfinite(max_value):
        return radiance
    return jnp.minimum(radiance, max_value)


# ---------------------------------------------------------------------------
# Reconstruction filters (ref: rendering/sensor/sensor.zig:27-58 builds LUTs
# of these; we evaluate analytically — ALU is free on the VPU)
# ---------------------------------------------------------------------------


def blackman(x, r):
    """Blackman window over [-r, r]."""
    a = jnp.pi * (x / r)
    w = 0.42 + 0.5 * jnp.cos(a) + 0.08 * jnp.cos(2.0 * a)
    return jnp.where(jnp.abs(x) <= r, w, 0.0)


def mitchell(x, b: float = 1.0 / 3.0, c: float = 1.0 / 3.0):
    """Mitchell-Netravali cubic over [-2, 2]."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (
        (12.0 - 9.0 * b - 6.0 * c) * ax3
        + (-18.0 + 12.0 * b + 6.0 * c) * ax2
        + (6.0 - 2.0 * b)
    ) / 6.0
    outer = (
        (-b - 6.0 * c) * ax3
        + (6.0 * b + 30.0 * c) * ax2
        + (-12.0 * b - 48.0 * c) * ax
        + (8.0 * b + 24.0 * c)
    ) / 6.0
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def filter_eval(name: str, x, radius: float):
    if name == "Mitchell":
        return mitchell(x * (2.0 / radius))
    return blackman(x, radius)


def splat_filtered(
    fb: "Framebuffer",
    radiance,  # [N,3]
    pixel_xy,  # int[N,2]
    pixel_uv,  # float[N,2] sample offset in [0,1)^2 within the pixel
    width: int,
    height: int,
    filter_name: str,
    radius: int,
) -> "Framebuffer":
    """Scatter-add a filtered sample to its (2r+1)^2 neighborhood.

    Replaces the reference's atomic tile splats (sensor.zig addSample radius
    1/2 unrolled paths) with a pure-functional scatter."""
    px = pixel_xy[..., 0]
    py = pixel_xy[..., 1]
    sx = pixel_uv[..., 0] - 0.5
    sy = pixel_uv[..., 1] - 0.5
    value, weight = fb.value, fb.weight
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            wx = filter_eval(filter_name, sx - dx, float(radius))
            wy = filter_eval(filter_name, sy - dy, float(radius))
            w = wx * wy
            tx = jnp.clip(px + dx, 0, width - 1)
            ty = jnp.clip(py + dy, 0, height - 1)
            ids = ty * width + tx
            value = value.at[ids].add(w[..., None] * radiance)
            weight = weight.at[ids].add(w)
    return Framebuffer(value, weight)


# ---------------------------------------------------------------------------
# Tonemappers (ref: rendering/sensor/tonemapper.zig, agx.zig)
# ---------------------------------------------------------------------------


def tonemap_linear(c):
    return c


def tonemap_aces(c):
    """ACES fitted (Hill/Narkowicz-style fit used by the reference)."""
    # sRGB => ACEScg-ish RRT+ODT fit
    a = c * (c + 0.0245786) - 0.000090537
    b = c * (0.983729 * c + 0.4329510) + 0.238081
    return jnp.clip(a / b, 0.0, 1.0)


def tonemap_pbr_neutral(c):
    """Khronos PBR Neutral."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.min(c, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    c = c - offset
    peak = jnp.max(c, axis=-1, keepdims=True)
    need = peak >= start_compression
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    scaled = c * (new_peak / jnp.maximum(peak, 1e-8))
    g = 1.0 - 1.0 / (desaturation * (peak - new_peak) + 1.0)
    compressed = (1.0 - g) * scaled + g * new_peak
    return jnp.where(need, compressed, c)


_AGX_INSET = np.array(
    [
        [0.856627153315983, 0.137318972929847, 0.11189821299995],
        [0.0951212405381588, 0.761241990602591, 0.0767994186031903],
        [0.0482516061458583, 0.101439036467562, 0.811302368396859],
    ],
    np.float32,
)

_AGX_OUTSET = np.array(
    [
        [1.1271005818144368, -0.1413297634984383, -0.14132976349843826],
        [-0.11060664309660323, 1.157823702216272, -0.11060664309660294],
        [-0.016493938717834573, -0.016493938717834257, 1.2519364065950405],
    ],
    np.float32,
)


# ASC CDL parameters per AgX look (ref agx.zig:38-69): (slope, power, sat).
# The reference CLI maps the bare "AgX" tonemapper key to Substitute
# (cli/take_loader.zig:267); Default/Golden/Punchy select the other looks.
AGX_LOOKS = {
    "Default": ((1.0, 1.0, 1.0), 1.0, 1.0),
    "Substitute": ((1.0, 1.0, 1.0), 1.1, 1.05),
    "Golden": ((1.0, 0.9, 0.5), 0.8, 0.8),
    "Punchy": ((1.0, 1.0, 1.0), 1.35, 1.4),
}


def _agx_look(v, look: str):
    """ASC CDL grade in AgX space (ref agx.zig:38 `look`)."""
    slope, power, sat = AGX_LOOKS.get(look, AGX_LOOKS["Default"])
    luma = (
        0.2126 * v[..., 0:1] + 0.7152 * v[..., 1:2] + 0.072 * v[..., 2:3]
    )
    p = jnp.power(jnp.maximum(v * jnp.asarray(slope, v.dtype), 0.0), power)
    return luma + sat * (p - luma)


def tonemap_agx(c, look: str = "Substitute"):
    """AgX (Benjamin Wrensch / Troy Sobotka approximation; ref agx.zig).

    Pipeline matches the reference: inset -> log2 encode -> sigmoid ->
    look (ASC CDL) -> outset -> 2.2-exponent EOTF back to linear Rec.709
    (ref agx.zig:80 `eotf`)."""
    min_ev, max_ev = -12.47393, 4.026069
    # the stored matrices are column-stochastic (columns sum to 1): apply
    # as c @ M so neutral axis maps to neutral (a .T here tints whites)
    c = c @ jnp.asarray(_AGX_INSET)
    c = jnp.clip(jnp.log2(jnp.maximum(c, 1e-10)), min_ev, max_ev)
    x = (c - min_ev) / (max_ev - min_ev)
    # 6th-order sigmoid approximation
    x2 = x * x
    x4 = x2 * x2
    v = (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )
    v = _agx_look(jnp.maximum(v, 0.0), look)
    v = v @ jnp.asarray(_AGX_OUTSET)
    return jnp.clip(jnp.power(jnp.clip(v, 0.0, 1.0), 2.2), 0.0, 1.0)


TONEMAPPERS = {
    "Linear": tonemap_linear,
    "ACES": tonemap_aces,
    "AgX": tonemap_agx,
    "PbrNeutral": tonemap_pbr_neutral,
}


def tonemap(c, name: str = "Linear", exposure: float = 0.0, look: str | None = None):
    f = TONEMAPPERS.get(name, tonemap_linear)
    scaled = c * (2.0**exposure)
    if name == "AgX":
        return f(scaled, look if look is not None else "Substitute")
    return f(scaled)
