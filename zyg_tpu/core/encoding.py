"""Compact attribute encodings: octahedral normals, unorm/snorm packing.

ref: src/base/math/vector.zig octEncode/octDecode + base encoding helpers
(unorm16/snorm16), used by the reference's vertex buffers
(core/scene/shape/triangle/vertex_buffer.zig) to store normals/tangents
compressed. Here the mesh arena stores the three per-vertex shading
normals of a triangle as 3 uint32 words (oct + snorm16x2) instead of 9
floats — one third the HBM footprint; the decode is a handful of VPU ops
on already-gathered words.

All functions are jax-traceable and numpy-compatible (device decode /
host encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def oct_encode(n):
    """Unit vector [...,3] -> octahedral uv [...,2] in [-1,1]
    (ref vector.zig octEncode)."""
    xp = jnp if isinstance(n, jax.Array) else np
    an = xp.abs(n)
    denom = xp.maximum(an[..., 0] + an[..., 1] + an[..., 2], 1e-20)
    u = n[..., 0] / denom
    v = n[..., 1] / denom
    # lower hemisphere folds over the diagonal
    neg = n[..., 2] < 0.0
    fu = (1.0 - xp.abs(v)) * xp.where(u >= 0.0, 1.0, -1.0)
    fv = (1.0 - xp.abs(u)) * xp.where(v >= 0.0, 1.0, -1.0)
    return xp.stack(
        [xp.where(neg, fu, u), xp.where(neg, fv, v)], axis=-1
    )


def oct_decode(e):
    """Octahedral uv [...,2] -> unit vector [...,3]."""
    xp = jnp if isinstance(e, jax.Array) else np
    u, v = e[..., 0], e[..., 1]
    z = 1.0 - xp.abs(u) - xp.abs(v)
    t = xp.maximum(-z, 0.0)
    x = u - xp.where(u >= 0.0, t, -t)
    y = v - xp.where(v >= 0.0, t, -t)
    n = xp.stack([x, y, z], axis=-1)
    return n / xp.maximum(
        xp.sqrt(xp.sum(n * n, axis=-1, keepdims=True)), 1e-20
    )


def snorm16x2_pack(e) -> np.ndarray:
    """Host: [...,2] in [-1,1] -> uint32 (lo = x, hi = y), snorm16."""
    q = np.clip(np.round(np.asarray(e, np.float32) * 32767.0), -32767, 32767)
    q = q.astype(np.int32) & 0xFFFF
    return (q[..., 0] | (q[..., 1] << 16)).astype(np.uint32)


def snorm16x2_unpack(w):
    """Device/host: uint32 -> [...,2] floats in [-1,1]."""
    xp = jnp if isinstance(w, jax.Array) else np
    w = w.astype(xp.int32)
    lo = (w << 16) >> 16  # sign-extend low half
    hi = w >> 16
    return xp.stack([lo, hi], axis=-1).astype(xp.float32) / 32767.0


def oct_normal_pack(n) -> np.ndarray:
    """Host: unit normals [...,3] -> uint32 oct-snorm16x2 words."""
    return snorm16x2_pack(oct_encode(np.asarray(n, np.float32)))


def oct_normal_unpack(w):
    """Device: uint32 words -> unit normals [...,3]."""
    return oct_decode(snorm16x2_unpack(w))


def unorm16_pack(x) -> np.ndarray:
    """Host: [...,] in [0,1] -> uint16 (ref encoding unorm16)."""
    return np.clip(
        np.round(np.asarray(x, np.float32) * 65535.0), 0, 65535
    ).astype(np.uint16)


def unorm16_unpack(q):
    xp = jnp if isinstance(q, jax.Array) else np
    return q.astype(xp.float32) / 65535.0
