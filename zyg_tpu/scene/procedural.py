"""Procedural textures, baked to the texture arena at scene compile.

ref: src/core/texture/procedural*.zig + noise/{perlin,worley}.zig — the
reference evaluates procedural node graphs analytically per shading point.
The TPU build evaluates the SAME node graphs (Checker, Noise with
gradient/cellular fbm, Mix/Mul/Max/ChannelMix/DetailNormal) on the host
over a uv grid at scene compile and packs the result into the flat texture
arena: at render time every texture is one bilinear sample, so procedural
variety costs nothing per ray. Band-limited by the bake resolution
(default 1024^2) — the documented tradeoff vs the reference's
infinite-detail analytic evaluation (same approach as the baked sun-sky).
"""

from __future__ import annotations

import numpy as np

BAKE_RES = 1024

PROCEDURAL_KEYS = (
    "Checker", "Noise", "Mix", "Mul", "Max", "ChannelMix", "DetailNormal",
)


def is_procedural(value) -> bool:
    return isinstance(value, dict) and any(k in value for k in PROCEDURAL_KEYS)


# ---------------------------------------------------------------------------
# noise primitives (original implementations of the classic algorithms)
# ---------------------------------------------------------------------------


def _hash2(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Integer lattice hash -> uint32."""
    h = (ix.astype(np.uint32) * np.uint32(0x8DA6B343)) ^ (
        iy.astype(np.uint32) * np.uint32(0xD8163841)
    )
    h ^= h >> np.uint32(13)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(16)
    return h


def perlin2d(x: np.ndarray, y: np.ndarray, period=(0.0, 0.0)) -> np.ndarray:
    """Gradient (Perlin) noise in [-1, 1]; optional integer period wrap."""
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0

    def grad_dot(cx, cy, ox, oy):
        ix = (x0 + cx).astype(np.int64)
        iy = (y0 + cy).astype(np.int64)
        if period[0] > 0:
            ix = np.mod(ix, int(period[0]))
        if period[1] > 0:
            iy = np.mod(iy, int(period[1]))
        h = _hash2(ix, iy)
        ang = (h.astype(np.float64) / 2**32) * (2.0 * np.pi)
        return np.cos(ang) * (fx - ox) + np.sin(ang) * (fy - oy)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v = fade(fx), fade(fy)
    n00 = grad_dot(0, 0, 0.0, 0.0)
    n10 = grad_dot(1, 0, 1.0, 0.0)
    n01 = grad_dot(0, 1, 0.0, 1.0)
    n11 = grad_dot(1, 1, 1.0, 1.0)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    # sqrt(2) normalization puts 2D gradient noise into ~[-1,1]
    return np.float32(np.sqrt(2.0)) * (nx0 + v * (nx1 - nx0)).astype(np.float32)


def worley2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Cellular (Worley) F1 distance in [0, ~1]."""
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0
    best = np.full(x.shape, 1e9, np.float32)
    for cy in (-1, 0, 1):
        for cx in (-1, 0, 1):
            ix = (x0 + cx).astype(np.int64)
            iy = (y0 + cy).astype(np.int64)
            h = _hash2(ix, iy)
            jx = (h & np.uint32(0xFFFF)).astype(np.float32) / 65535.0
            jy = (h >> np.uint32(16)).astype(np.float32) / 65535.0
            dx = cx + jx - fx
            dy = cy + jy - fy
            best = np.minimum(best, dx * dx + dy * dy)
    return np.sqrt(best).astype(np.float32)


def noise_eval(params: dict, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """fbm noise per ref procedural_noise.zig evaluate1 (uv mode)."""
    cellular = params.get("class", "") == "Cellular"
    levels = int(params.get("levels", 1))
    att = float(params.get("attenuation", 0.0))
    ratio = float(params.get("ratio", 0.5))
    transition = float(params.get("transition", 0.5))
    scale = params.get("scale", [1.0, 1.0, 1.0])
    sx, sy = float(scale[0]), float(scale[1] if len(scale) > 1 else scale[0])
    period = params.get("period", [0.0, 0.0, 0.0])
    px, py = float(period[0]), float(period[1] if len(period) > 1 else period[0])

    value = np.zeros(u.shape, np.float32)
    weight = 0.0
    amplitude = 1.0
    for _ in range(max(levels, 1)):
        lw = amplitude**att
        if cellular:
            local = worley2d(u * sx, v * sy)
        else:
            local = perlin2d(u * sx, v * sy, (px, py))
        value += lw * local
        weight += lw
        amplitude *= 0.5
        sx *= 2.0
        sy *= 2.0
        px *= 2.0
        py *= 2.0
    value /= max(weight, 1e-9)

    unsigned = value if cellular else (
        np.abs(value) if params.get("absolute", False) else (value + 1.0) * 0.5
    )
    a = ratio - transition
    b = ratio + transition
    out = np.clip((unsigned - a) / max(b - a, 1e-9), 0.0, 1.0)
    if params.get("invert", False):
        out = 1.0 - out
    return out.astype(np.float32)


def checker_eval(params: dict, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """XOR checker (ref procedural_checker.zig, point-sampled at bake res —
    the bilinear arena sample supplies the filtering)."""
    scale = float(params.get("scale", 1.0))
    colors = params.get("colors", [[0.0] * 3, [1.0] * 3])
    ca = np.asarray(colors[0], np.float32).reshape(1, 1, -1)
    cb = np.asarray(colors[1], np.float32).reshape(1, 1, -1)
    t = (
        (np.floor(u * scale).astype(np.int64) ^ np.floor(v * scale).astype(np.int64)) & 1
    ).astype(np.float32)[..., None]
    return ca + t * (cb - ca)


# ---------------------------------------------------------------------------
# node-graph bake
# ---------------------------------------------------------------------------


def _eval_operand(v, u, vgrid, load_image, channels=3):
    """Operand of a procedural node: scalar, color, nested procedural, or
    {"file": ...} image resampled onto the bake grid."""
    if isinstance(v, (int, float)):
        return np.full(u.shape + (channels,), float(v), np.float32)
    if isinstance(v, (list, tuple)):
        arr = np.asarray(v, np.float32)
        return np.broadcast_to(arr, u.shape + (arr.shape[0],)).astype(np.float32)
    if is_procedural(v):
        return bake(v, u, vgrid, load_image)
    if isinstance(v, dict) and "file" in v and load_image is not None:
        img = load_image(v["file"])
        if img is None:
            return np.zeros(u.shape + (channels,), np.float32)
        h, w = img.shape[:2]
        xi = np.clip((u * w).astype(np.int64), 0, w - 1)
        yi = np.clip((vgrid * h).astype(np.int64), 0, h - 1)
        out = img[yi, xi]
        return out[..., :channels] if out.ndim == 3 else out[..., None]
    return np.zeros(u.shape + (channels,), np.float32)


def bake(value: dict, u=None, vgrid=None, load_image=None, res: int = BAKE_RES) -> np.ndarray:
    """Bake one procedural texture JSON node to [res, res, 3] float32."""
    if u is None:
        ys, xs = np.mgrid[0:res, 0:res]
        u = (xs.astype(np.float32) + 0.5) / res
        vgrid = (ys.astype(np.float32) + 0.5) / res

    if "Checker" in value:
        return checker_eval(value["Checker"], u, vgrid)
    if "Noise" in value:
        n = noise_eval(value["Noise"], u, vgrid)
        return np.repeat(n[..., None], 3, axis=-1)
    if "Mix" in value:
        node = value["Mix"]
        a = _eval_operand(node.get("a", 0.0), u, vgrid, load_image)
        b = _eval_operand(node.get("b", 1.0), u, vgrid, load_image)
        t = _eval_operand(node.get("weight", 0.5), u, vgrid, load_image, channels=1)
        return (a + t * (b - a)).astype(np.float32)
    if "Mul" in value:
        node = value["Mul"]
        a = _eval_operand(node.get("a", 1.0), u, vgrid, load_image)
        b = _eval_operand(node.get("b", 1.0), u, vgrid, load_image)
        return (a * b).astype(np.float32)
    if "Max" in value:
        node = value["Max"]
        a = _eval_operand(node.get("a", 0.0), u, vgrid, load_image)
        b = _eval_operand(node.get("b", 0.0), u, vgrid, load_image)
        return np.maximum(a, b).astype(np.float32)
    if "ChannelMix" in value:
        node = value["ChannelMix"]
        src = _eval_operand(node.get("source", 0.0), u, vgrid, load_image)
        ch = np.asarray(node.get("channels", np.eye(3)), np.float32)[:3, :3]
        return np.einsum("...c,kc->...k", src[..., :3], ch).astype(np.float32)
    if "DetailNormal" in value:
        node = value["DetailNormal"]
        base = _eval_operand(node.get("base", [0.5, 0.5, 1.0]), u, vgrid, load_image)
        detail = _eval_operand(node.get("detail", [0.5, 0.5, 1.0]), u, vgrid, load_image)
        # whiteout blend of tangent-space normals
        bn = base * 2.0 - 1.0
        dn = detail * 2.0 - 1.0
        n = np.stack(
            [bn[..., 0] + dn[..., 0], bn[..., 1] + dn[..., 1],
             np.maximum(bn[..., 2], 1e-3) * np.maximum(dn[..., 2], 1e-3)],
            axis=-1,
        )
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        return ((n + 1.0) * 0.5).astype(np.float32)
    raise ValueError(f"not a procedural texture node: {list(value.keys())}")


# ---------------------------------------------------------------------------
# DEVICE-side analytic shade-time evaluation (ref context.zig:139-199
# screenspaceDifferentials feeding texture/procedural_noise.zig /
# procedural_checker.zig: the reference evaluates procedurals analytically
# per shading point with differential-based filtering; the bake above is
# now only the fallback for graphs with image operands).
#
# Filtering model: an isotropic footprint width `foot` in uv units (the
# integrator's pixel-cone proxy for the reference's screen-space
# differentials). Checker box-filters EXACTLY (separable square-wave
# integral); fbm noise fades octaves whose lattice frequency exceeds the
# footprint's Nyquist rate toward their statistical mean — the classic
# band-limited fbm.
# ---------------------------------------------------------------------------


def analytic_spec(value):
    """('checker'|'noise', hashable-params) for nodes the device evaluates
    analytically at shade time; None for graphs that must stay baked
    (image operands, combinators)."""
    if not isinstance(value, dict):
        return None
    if set(value.keys()) == {"Checker"}:
        p = value["Checker"]
        if not isinstance(p.get("scale", 1.0), (int, float)):
            return None
        colors = p.get("colors", [[0.0] * 3, [1.0] * 3])
        try:
            ca = tuple(float(x) for x in colors[0])
            cb = tuple(float(x) for x in colors[1])
        except TypeError:
            return None
        return ("checker", (float(p.get("scale", 1.0)), ca, cb))
    if set(value.keys()) == {"Noise"}:
        p = value["Noise"]
        scale = p.get("scale", [1.0, 1.0, 1.0])
        period = p.get("period", [0.0, 0.0, 0.0])
        if not isinstance(scale, (list, tuple)):
            scale = [scale]
        return ("noise", (
            p.get("class", "") == "Cellular",
            int(p.get("levels", 1)),
            float(p.get("attenuation", 0.0)),
            float(p.get("ratio", 0.5)),
            float(p.get("transition", 0.5)),
            float(scale[0]),
            float(scale[1] if len(scale) > 1 else scale[0]),
            float(period[0]),
            float(period[1] if len(period) > 1 else period[0]),
            bool(p.get("absolute", False)),
            bool(p.get("invert", False)),
        ))
    return None


def _hash2_j(ix, iy):
    import jax.numpy as jnp

    h = (ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)) ^ (
        iy.astype(jnp.uint32) * jnp.uint32(0xD8163841)
    )
    h ^= h >> jnp.uint32(13)
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> jnp.uint32(16)
    return h


def perlin2d_j(x, y, period=(0.0, 0.0)):
    """jnp mirror of perlin2d (bit-identical lattice hash)."""
    import jax.numpy as jnp

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def grad_dot(cx, cy, ox, oy):
        ix = (x0 + cx).astype(jnp.int32)
        iy = (y0 + cy).astype(jnp.int32)
        if period[0] > 0:
            ix = jnp.mod(ix, int(period[0]))
        if period[1] > 0:
            iy = jnp.mod(iy, int(period[1]))
        h = _hash2_j(ix, iy)
        ang = h.astype(jnp.float32) * (2.0 * 3.14159265 / 2**32)
        return jnp.cos(ang) * (fx - ox) + jnp.sin(ang) * (fy - oy)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v = fade(fx), fade(fy)
    n00 = grad_dot(0, 0, 0.0, 0.0)
    n10 = grad_dot(1, 0, 1.0, 0.0)
    n01 = grad_dot(0, 1, 0.0, 1.0)
    n11 = grad_dot(1, 1, 1.0, 1.0)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return jnp.float32(np.sqrt(2.0)) * (nx0 + v * (nx1 - nx0))


def worley2d_j(x, y):
    import jax.numpy as jnp

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    best = jnp.full(x.shape, 1e9, jnp.float32)
    for cy in (-1, 0, 1):
        for cx in (-1, 0, 1):
            ix = (x0 + cx).astype(jnp.int32)
            iy = (y0 + cy).astype(jnp.int32)
            h = _hash2_j(ix, iy)
            jx = (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
            jy = (h >> jnp.uint32(16)).astype(jnp.float32) / 65535.0
            dx = cx + jx - fx
            dy = cy + jy - fy
            best = jnp.minimum(best, dx * dx + dy * dy)
    return jnp.sqrt(best)


_WORLEY_MEAN = 0.66  # spatial mean of F1 over the unit cell (host-measured)


def eval_analytic(kind: str, params: tuple, uv, foot=None):
    """Analytic procedural value at uv ([N,2]) with optional isotropic
    footprint width foot ([N], uv units). Returns [N,4] (alpha 1)."""
    import jax.numpy as jnp

    u = uv[..., 0]
    v = uv[..., 1]
    w = jnp.zeros_like(u) if foot is None else jnp.maximum(foot, 0.0)
    if kind == "checker":
        scale, ca, cb = params

        def fsq(x, wx):
            """Box-filtered square wave: mean of (floor(t) & 1) over
            [x - wx/2, x + wx/2] (exact integral). Footprints under a
            milli-cell take the point sample — the f32 integral difference
            underflows there (x +- wx/2 rounds to x)."""
            wx = jnp.maximum(wx, 1e-3)

            def integ(y):  # int_0^y (floor(t)&1) dt
                f = jnp.floor(y * 0.5)
                return f + jnp.maximum(y - 2.0 * f - 1.0, 0.0)

            filt = (integ(x + 0.5 * wx) - integ(x - 0.5 * wx)) / wx
            point = (jnp.floor(x).astype(jnp.int32) & 1).astype(jnp.float32)
            return jnp.where(wx > 1e-3, filt, point)

        au = fsq(u * scale, w * scale)
        av = fsq(v * scale, w * scale)
        # XOR of independently-filtered axes (separable box filter exact)
        t = au * (1.0 - av) + av * (1.0 - au)
        ca = jnp.asarray(ca, jnp.float32)
        cb = jnp.asarray(cb, jnp.float32)
        rgb = ca + t[..., None] * (cb - ca)
    else:
        (cellular, levels, att, ratio, transition,
         sx0, sy0, px0, py0, absolute, invert) = params
        value = jnp.zeros_like(u)
        weight = 0.0
        amplitude = 1.0
        sx, sy, px, py = sx0, sy0, px0, py0
        for _ in range(max(levels, 1)):
            lw = amplitude ** att if att else 1.0
            if cellular:
                local = worley2d_j(u * sx, v * sy)
                mean = _WORLEY_MEAN
            else:
                local = perlin2d_j(u * sx, v * sy, (px, py))
                mean = 0.0
            # band limit: fade this octave toward its mean once the
            # footprint spans ~a lattice cell (frequency > Nyquist)
            fade_w = jnp.clip(2.0 - 4.0 * w * max(sx, sy), 0.0, 1.0)
            value += lw * (mean + fade_w * (local - mean))
            weight += lw
            amplitude *= 0.5
            sx *= 2.0
            sy *= 2.0
            px *= 2.0
            py *= 2.0
        value = value / max(weight, 1e-9)
        unsigned = value if cellular else (
            jnp.abs(value) if absolute else (value + 1.0) * 0.5
        )
        a = ratio - transition
        b = ratio + transition
        out = jnp.clip((unsigned - a) / max(b - a, 1e-9), 0.0, 1.0)
        if invert:
            out = 1.0 - out
        rgb = jnp.repeat(out[..., None], 3, axis=-1)
    ones = jnp.ones(u.shape + (1,), jnp.float32)
    return jnp.concatenate([rgb, ones], axis=-1)
