"""Texture engine: flat device arena + bilinear/nearest sampling.

ref: src/core/texture/ — the reference has typed images + stochastic
filtering; here all textures are packed into one float32 RGBA-interleaved
arena (TPU gathers like flat arrays, and one arena = one HBM allocation):

    data   [total_texels, 4]   (unused channels are 0)
    desc   offset/width/height int32 per texture

sRGB decode and unorm conversion happen at pack time (host). Sampling is
vectorized bilinear; per-texture clamp/repeat address modes follow the
reference's sampler_mode.zig Address (parsed from the texture node's
"sampler" key).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TextureArena(NamedTuple):
    data: jax.Array  # [T, 4] float32
    offset: jax.Array  # [K] int32
    width: jax.Array  # [K] int32
    height: jax.Array  # [K] int32
    # per-texture uv address mode (ref sampler_mode.zig Address):
    # bit0 = clamp u, bit1 = clamp v; 0 = repeat both (the default)
    address: jax.Array = None  # int32[K]
    # per-texture coordinate set (ref sampler_mode.zig TexCoord):
    # 0 = UV0 (the mesh uv), 1 = Triplanar, 2 = ObjectPos — non-UV0 modes
    # read the caller's alternate (object-space) uv
    texcoord: jax.Array = None  # int32[K]
    # STATIC dict {(tid, kind, params): True} of analytically-evaluated
    # procedural textures (ref procedural_checker/noise.zig shade-time
    # eval; scene/procedural.py eval_analytic). Keys ride the pytree
    # treedef so jit specializes; the arena keeps a low-res bake of the
    # same node as fallback data (alias-table builds, sample_nearest).
    procedurals: dict = None

    @property
    def count(self) -> int:
        return self.offset.shape[0]


class TextureBuilder:
    def __init__(self):
        self._images: list[np.ndarray] = []
        self._address: list[int] = []
        self._texcoord: list[int] = []
        self._procedurals: dict = {}

    def add_procedural_meta(self, tid: int, spec: tuple):
        """Mark texture tid for analytic shade-time evaluation
        (spec from procedural.analytic_spec)."""
        self._procedurals[(tid,) + tuple(spec)] = True

    @staticmethod
    def _convert(image: np.ndarray, srgb: bool) -> np.ndarray:
        """[H,W,C] uint8/uint16/float32 -> packed [H,W,4] float32."""
        img = np.asarray(image)
        if img.ndim == 2:
            img = img[..., None]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        elif img.dtype == np.uint16:
            img = img.astype(np.float32) / 65535.0
        else:
            img = img.astype(np.float32)
        if srgb:
            from ..core.spectrum import srgb_to_linear_np

            img = img.copy()
            img[..., : min(img.shape[-1], 3)] = srgb_to_linear_np(
                img[..., : min(img.shape[-1], 3)]
            )
        h, w, c = img.shape
        rgba = np.zeros((h, w, 4), np.float32)
        rgba[..., :c] = img
        if c == 1:
            rgba[..., 1] = rgba[..., 2] = rgba[..., 0]
            rgba[..., 3] = 1.0
        return rgba

    def add(self, image: np.ndarray, srgb: bool = False, clamp_u: bool = False, clamp_v: bool = False, texcoord: int = 0) -> int:
        """image: [H,W,C] uint8/uint16/float32 -> texture id."""
        self._images.append(self._convert(image, srgb))
        self._address.append((1 if clamp_u else 0) | (2 if clamp_v else 0))
        self._texcoord.append(int(texcoord))
        return len(self._images) - 1

    def replace(self, tex_id: int, image: np.ndarray, srgb: bool = False) -> None:
        """Swap a slot's pixels in place (C-API live image updates)."""
        self._images[tex_id] = self._convert(image, srgb)

    def build(self) -> TextureArena | None:
        if not self._images:
            return None
        offsets = []
        off = 0
        for img in self._images:
            offsets.append(off)
            off += img.shape[0] * img.shape[1]
        data = np.concatenate([i.reshape(-1, 4) for i in self._images], axis=0)
        return TextureArena(
            data=jnp.asarray(data),
            offset=jnp.asarray(offsets, jnp.int32),
            width=jnp.asarray([i.shape[1] for i in self._images], jnp.int32),
            height=jnp.asarray([i.shape[0] for i in self._images], jnp.int32),
            address=jnp.asarray(self._address, jnp.int32),
            texcoord=jnp.asarray(self._texcoord, jnp.int32),
            procedurals=self._procedurals or None,
        )


def _select_uv(arena: TextureArena, tid, uv, uv_alt):
    """Per-texture coordinate-set selection (ref texture_sampler.zig:
    Triplanar/ObjectPos read rs.triplanarSt instead of rs.uv)."""
    if uv_alt is None or arena.texcoord is None:
        return uv
    tc = arena.texcoord[tid]
    return jnp.where((tc > 0)[..., None], uv_alt, uv)


def _analytic_override(arena: TextureArena, tex_id, uv, out, footprint):
    """Replace lanes whose texture is an analytic procedural with its
    shade-time evaluation (static loop over arena.procedurals keys)."""
    if not arena.procedurals:
        return out
    from . import procedural as prcd

    for key in arena.procedurals.keys():
        tid_p, kind = key[0], key[1]
        params = key[2]
        val = prcd.eval_analytic(kind, params, uv, footprint)
        out = jnp.where((tex_id == tid_p)[..., None], val, out)
    return out


def sample_bilinear(arena: TextureArena, tex_id, uv, uv_alt=None, footprint=None):
    """Bilinear sample with wrap addressing. tex_id int32[N], uv [N,2].
    Returns [N,4]; tex_id < 0 returns ones (callers select)."""
    tid = jnp.maximum(tex_id, 0)
    uv = _select_uv(arena, tid, uv, uv_alt)
    w = arena.width[tid]
    h = arena.height[tid]
    off = arena.offset[tid]
    fw = w.astype(jnp.float32)
    fh = h.astype(jnp.float32)
    x = uv[..., 0] * fw - 0.5
    y = uv[..., 1] * fh - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = x - x0.astype(jnp.float32)
    ty = y - y0.astype(jnp.float32)

    if arena.address is not None:
        adr = arena.address[tid]
        clamp_u = (adr & 1) != 0
        clamp_v = (adr & 2) != 0
    else:
        clamp_u = clamp_v = None

    def texel(xi, yi):
        # per-texture address mode (ref sampler_mode.zig Address.coord)
        if clamp_u is not None:
            xi = jnp.where(clamp_u, jnp.clip(xi, 0, w - 1), jnp.mod(xi, w))
            yi = jnp.where(clamp_v, jnp.clip(yi, 0, h - 1), jnp.mod(yi, h))
        else:
            xi = jnp.mod(xi, w)
            yi = jnp.mod(yi, h)
        return arena.data[off + yi * w + xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * tx[..., None]
    bot = c01 + (c11 - c01) * tx[..., None]
    out = top + (bot - top) * ty[..., None]
    return _analytic_override(arena, tex_id, uv, out, footprint)


def sample_nearest(arena: TextureArena, tex_id, uv):
    tid = jnp.maximum(tex_id, 0)
    w = arena.width[tid]
    h = arena.height[tid]
    off = arena.offset[tid]
    xi = jnp.mod((uv[..., 0] * w.astype(jnp.float32)).astype(jnp.int32), w)
    yi = jnp.mod((uv[..., 1] * h.astype(jnp.float32)).astype(jnp.int32), h)
    return arena.data[off + yi * w + xi]


def sample_stochastic(arena: TextureArena, tex_id, uv, xi, uv_alt=None, footprint=None):
    """One-texel stochastic bilinear sample (ref texture.zig: the
    reference's DEFAULT sampler is LinearStochastic).

    Jittering the sample point by xi in [0,1)^2 and reading the NEAREST
    texel picks texel x0+1 with probability tx — exactly the bilinear
    weight — so E[sample] equals sample_bilinear at 1/4 the gathers.
    tex_id int32[N], uv [N,2], xi [N,2]. Returns [N,4]."""
    tid = jnp.maximum(tex_id, 0)
    uv = _select_uv(arena, tid, uv, uv_alt)
    w = arena.width[tid]
    h = arena.height[tid]
    off = arena.offset[tid]
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5 + xi[..., 0]
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5 + xi[..., 1]
    xi_ = jnp.floor(x).astype(jnp.int32)
    yi_ = jnp.floor(y).astype(jnp.int32)
    if arena.address is not None:
        adr = arena.address[tid]
        xi_ = jnp.where((adr & 1) != 0, jnp.clip(xi_, 0, w - 1), jnp.mod(xi_, w))
        yi_ = jnp.where((adr & 2) != 0, jnp.clip(yi_, 0, h - 1), jnp.mod(yi_, h))
    else:
        xi_ = jnp.mod(xi_, w)
        yi_ = jnp.mod(yi_, h)
    out = arena.data[off + yi_ * w + xi_]
    return _analytic_override(arena, tex_id, uv, out, footprint)
