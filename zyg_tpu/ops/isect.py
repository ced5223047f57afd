"""Fused analytic-prop intersection kernel.

The XLA formulation of `shapes.intersect_scene` / `shapes.occluded`
broadcasts every prop group to [G, N] and materializes ~10 fusion
kernels of [G, N](,3) intermediates per traversal — measured 500+ MB of
HBM traffic per wavefront iteration on the 6-rectangle Cornell scene
(compiled-HLO audit, round 4). Analytic props are a handful of tiny
parameter rows, so this Pallas kernel keeps them in SMEM and runs the
whole closest-hit/any-hit reduction over all props in ONE pass over the
lanes: traffic = read o/d/tmax + write t/slot/u/v, zero intermediates.

Formulas are copied 1:1 from scene/shapes.py (ref: the shape
intersectors of src/core/scene/shape/*.zig) — the CPU test suite runs
the XLA path, so both must agree to float rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import use_pallas

_FAR = 3.0e37
_RAY_MAX_T = 2.14748313e9
_LANE_TILE = 8192

# shape-type codes (must match scene.types.ShapeType; imported lazily in
# closest_props to avoid a cycle)
_SUPPORTED = None


def _supported():
    global _SUPPORTED
    if _SUPPORTED is None:
        from ..scene.types import ShapeType as S

        _SUPPORTED = {
            int(S.CANOPY): "canopy",
            int(S.CUBE): "cube",
            int(S.DISK): "disk",
            int(S.DISTANT): "distant",
            int(S.DOME): "dome",
            int(S.RECTANGLE): "rectangle",
            int(S.SPHERE): "sphere",
        }
    return _SUPPORTED


def _prop_hit(kind, tab, p, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """One prop's (t, u, v, hit) with scalar params from SMEM row p.

    Row layout: rot row-major [0:9], pos [9:12], scale [12:15]."""
    r = [tab[p, k] for k in range(9)]
    px, py, pz = tab[p, 9], tab[p, 10], tab[p, 11]
    sx, sy, sz = tab[p, 12], tab[p, 13], tab[p, 14]
    far = jnp.float32(_FAR)
    rmax = jnp.float32(_RAY_MAX_T)
    zero = jnp.zeros_like(ox)

    def plane_t():
        dd = r[6] * dx + r[7] * dy + r[8] * dz
        dist = r[6] * px + r[7] * py + r[8] * pz
        no = r[6] * ox + r[7] * oy + r[8] * oz
        return -(no - dist) / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)

    if kind in ("rectangle", "disk"):
        t = plane_t()
        kx = ox + t * dx - px
        ky = oy + t * dy - py
        kz = oz + t * dz - pz
        if kind == "rectangle":
            u = -(r[0] * kx + r[1] * ky + r[2] * kz) / (0.5 * sx)
            v = -(r[3] * kx + r[4] * ky + r[5] * kz) / (0.5 * sy)
            hit = (
                (t >= tmin) & (t <= tmax)
                & (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
            )
        else:
            l2 = kx * kx + ky * ky + kz * kz
            rr = 0.5 * sx
            hit = (t >= tmin) & (t <= tmax) & (l2 <= rr * rr)
            inv_r = 1.0 / jnp.maximum(rr, 1e-20)
            u = -(r[0] * kx + r[1] * ky + r[2] * kz) * inv_r
            v = -(r[3] * kx + r[4] * ky + r[5] * kz) * inv_r
        return jnp.where(hit, t, far), u, v, hit

    if kind == "sphere":
        vx, vy, vz = px - ox, py - oy, pz - oz
        b = dx * vx + dy * vy + dz * vz
        rx, ry, rz = vx - b * dx, vy - b * dy, vz - b * dz
        rr = 0.5 * sx
        disc = rr * rr - (rx * rx + ry * ry + rz * rz)
        ok = disc > 0.0
        dist = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = b - dist
        t1 = b + dist
        sel0 = ok & (t0 >= tmin) & (t0 <= tmax)
        sel1 = ok & ~sel0 & (t1 >= tmin) & (t1 <= tmax)
        t = jnp.where(sel0, t0, jnp.where(sel1, t1, far))
        return t, zero, zero, sel0 | sel1

    if kind == "cube":
        wx, wy, wz = ox - px, oy - py, oz - pz
        lox = (wx * r[0] + wy * r[1] + wz * r[2]) / sx
        loy = (wx * r[3] + wy * r[4] + wz * r[5]) / sy
        loz = (wx * r[6] + wy * r[7] + wz * r[8]) / sz
        ldx = (dx * r[0] + dy * r[1] + dz * r[2]) / sx
        ldy = (dx * r[3] + dy * r[4] + dz * r[5]) / sy
        ldz = (dx * r[6] + dy * r[7] + dz * r[8]) / sz

        def slab(lo, ld):
            inv = 1.0 / jnp.where(
                jnp.abs(ld) < 1e-20, jnp.where(ld < 0, -1e-20, 1e-20), ld
            )
            a = (-0.5 - lo) * inv
            b2 = (0.5 - lo) * inv
            return jnp.minimum(a, b2), jnp.maximum(a, b2)

        n0, f0 = slab(lox, ldx)
        n1, f1 = slab(loy, ldy)
        n2, f2 = slab(loz, ldz)
        tn = jnp.maximum(jnp.maximum(n0, n1), n2)
        tf = jnp.minimum(jnp.minimum(f0, f1), f2)
        hit_near = (tn <= tf) & (tn >= tmin) & (tn <= tmax)
        hit_far = (tn <= tf) & ~hit_near & (tf >= tmin) & (tf <= tmax)
        t = jnp.where(hit_near, tn, jnp.where(hit_far, tf, far))
        return t, zero, zero, hit_near | hit_far

    if kind == "distant":
        b = r[6] * dx + r[7] * dy + r[8] * dz
        nn = r[6] * r[6] + r[7] * r[7] + r[8] * r[8]
        radius = sx
        det = b * b - nn + radius * radius
        hit = (b <= 0.0) & (tmax >= rmax) & (radius > 0.0) & (det >= 0.0)
        kx, ky, kz = dx - r[6], dy - r[7], dz - r[8]
        inv_r = 1.0 / jnp.maximum(radius, 1e-20)
        u = (r[0] * kx + r[1] * ky + r[2] * kz) * inv_r
        v = (r[3] * kx + r[4] * ky + r[5] * kz) * inv_r
        return jnp.where(hit, rmax, far), u, v, hit

    if kind == "canopy":
        hit = (tmax >= rmax) & (
            (r[6] * dx + r[7] * dy + r[8] * dz) >= -0.0005
        )
        return jnp.where(hit, rmax, far), zero, zero, hit

    # dome
    hit = ((r[6] * dx + r[7] * dy + r[8] * dz) > -2.0) & (tmax >= rmax)
    return jnp.where(hit, rmax, far), zero, zero, hit


def _make_kernel(kinds, has_primary: bool, any_hit: bool):
    """kinds: static tuple of shape-kind strings, one per table row.
    Table row: rot[0:9] pos[9:12] scale[12:15] vis_cam[15] vis_class[16]."""

    def kernel(tab_ref, tmin_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
               tmax_r, *rest):
        # all lane arrays stay (1, T)-shaped (2D is the safe Mosaic layout)
        prim = rest[0][:, :] if has_primary else None
        outs = rest[1:] if has_primary else rest
        ox, oy, oz = ox_r[:, :], oy_r[:, :], oz_r[:, :]
        dx, dy, dz = dx_r[:, :], dy_r[:, :], dz_r[:, :]
        tmax = tmax_r[:, :]
        tmin = tmin_ref[0, 0]
        t_b = jnp.full_like(ox, _FAR)
        if not any_hit:
            slot_b = jnp.full(ox.shape, -1, jnp.int32)
            u_b = jnp.zeros_like(ox)
            v_b = jnp.zeros_like(ox)
        else:
            blocked = jnp.zeros(ox.shape, jnp.int32)
        for p, kind in enumerate(kinds):
            t, u, v, hit = _prop_hit(
                kind, tab_ref, p, ox, oy, oz, dx, dy, dz, tmin, tmax
            )
            # visibility select stays f32 until one final compare (a
            # bool-scalar select lowers to an unsupported i8->i1 trunc)
            vis_cls = tab_ref[p, 16]
            if has_primary:
                vis_cam = tab_ref[p, 15]
                lane_vis = jnp.where(prim > 0.5, vis_cam, vis_cls) > 0.5
            else:
                lane_vis = vis_cls > 0.5
            hit = hit & lane_vis
            if any_hit:
                blocked = blocked | hit.astype(jnp.int32)
            else:
                closer = hit & (t < t_b)
                t_b = jnp.where(closer, t, t_b)
                slot_b = jnp.where(closer, jnp.int32(p), slot_b)
                u_b = jnp.where(closer, u, u_b)
                v_b = jnp.where(closer, v, v_b)
        if any_hit:
            outs[0][:, :] = blocked
        else:
            outs[0][:, :] = t_b
            outs[1][:, :] = slot_b
            outs[2][:, :] = u_b
            outs[3][:, :] = v_b

    return kernel


def _run(kinds, table, o, d, tmin, tmax, primary, any_hit: bool):
    n = o.shape[0]
    tile = min(_LANE_TILE, -(-max(n, 1) // 128) * 128)  # lane-dim multiple of 128
    np_pad = ((n + tile - 1) // tile) * tile
    grid = np_pad // tile

    def row(x):
        x = jnp.asarray(x, jnp.float32)
        if np_pad != n:
            x = jnp.concatenate([x, jnp.zeros(np_pad - n, x.dtype)])
        return x.reshape(1, np_pad)

    ins = [
        table,
        jnp.asarray(tmin, jnp.float32).reshape(1, 1),
        row(o[:, 0]), row(o[:, 1]), row(o[:, 2]),
        row(d[:, 0]), row(d[:, 1]), row(d[:, 2]),
        row(jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))),
    ]
    has_primary = primary is not None
    if has_primary:
        ins.append(row(primary.astype(jnp.float32)))

    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    lane = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [smem(table.shape), smem((1, 1))] + [lane] * (7 + has_primary)
    if any_hit:
        out_shape = [jax.ShapeDtypeStruct((1, np_pad), jnp.int32)]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, np_pad), jnp.float32),
        ]
    outs = pl.pallas_call(
        _make_kernel(kinds, has_primary, any_hit),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[lane] * len(out_shape),
        out_shape=out_shape,
    )(*ins)
    return [x[0, :n] for x in outs]


def _static_layout(scene, groups):
    """(kinds tuple, concatenated prop-id array) or None if a group's
    shape type has no kernel snippet (portal etc. -> XLA fallback)."""
    sup = _supported()
    kinds = []
    idx_list = []
    for st, all_idx in sorted(groups.items(), key=lambda kv: int(kv[0])):
        if int(st) not in sup:
            return None
        kinds.extend([sup[int(st)]] * int(all_idx.shape[0]))
        idx_list.append(jnp.asarray(all_idx, jnp.int32))
    if not kinds or len(kinds) > 64:
        return None
    return tuple(kinds), jnp.concatenate(idx_list)


def _pack_table(scene, ids, ray_class: str):
    vis = {
        "camera": scene.prop_visible_camera,
        "reflection": scene.prop_visible_reflection,
        "shadow": scene.prop_visible_shadow,
    }[ray_class]
    return jnp.concatenate(
        [
            scene.prop_rot[ids].reshape(ids.shape[0], 9),
            scene.prop_pos[ids],
            scene.prop_scale[ids],
            scene.prop_visible_camera[ids].astype(jnp.float32)[:, None],
            vis[ids].astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


def closest_props(scene, groups, o, d, tmin, tmax, ray_class, primary):
    """Fused closest-hit over the static analytic props. Returns
    (t, prop_id, u, v) or None when the Pallas path does not apply."""
    if not use_pallas() or o.ndim != 2:
        return None
    lay = _static_layout(scene, groups)
    if lay is None:
        return None
    kinds, ids = lay
    table = _pack_table(scene, ids, ray_class)
    t, slot, u, v = _run(kinds, table, o, d, tmin, tmax, primary, False)
    from ..core.gather import small_gather

    pid = jnp.where(slot >= 0, small_gather(ids, jnp.maximum(slot, 0)), -1)
    return t, pid, u, v


def anyhit_props(scene, groups, o, d, tmin, tmax):
    """Fused shadow any-hit over the static analytic props. Returns
    blocked bool[N] or None when the Pallas path does not apply."""
    if not use_pallas() or o.ndim != 2:
        return None
    lay = _static_layout(scene, groups)
    if lay is None:
        return None
    kinds, ids = lay
    table = _pack_table(scene, ids, "shadow")
    (blocked,) = _run(kinds, table, o, d, tmin, tmax, None, True)
    return blocked > 0
