"""Vectorized analytic-shape intersection, fragments, and light sampling.

World-space conventions follow the reference shapes exactly
(ref: src/core/scene/shape/{rectangle,sphere,disk,cube,distant,canopy,dome}.zig):

- rectangle: plane normal = rot row 2, extents 0.5*scale.x/y, tangent -r0/-r1
- sphere:    center = pos, radius = 0.5*scale.x
- disk:      plane normal = r2, radius = 0.5*scale.x
- cube:      local unit box [-0.5, 0.5], full extents = scale
- distant:   sun disk at infinity, direction -r2, scale.x = tan(angular radius)
- canopy:    infinite upper hemisphere around r2
- dome:      infinite sphere

Instead of per-lane BVH traversal (pointless for <100 analytic props), the
scene is intersected by a `lax.scan` over props, each step a full-width
vector op — the classic wavefront trade.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from .types import SceneData, ShapeType, RAY_MAX_T
from ..core.gather import small_gather

FAR = jnp.float32(3.0e37)  # "no hit" sentinel, >> RAY_MAX_T


class Hit(NamedTuple):
    t: jax.Array  # float32[N], FAR when miss
    prop: jax.Array  # int32[N], -1 when miss
    u: jax.Array  # float32[N]
    v: jax.Array  # float32[N]
    prim: jax.Array  # int32[N] arena triangle index for mesh hits (-1 else)

    def valid(self):
        return self.prop >= 0


class Fragment(NamedTuple):
    """Shading fragment at a hit (ref: shape/intersection.zig Fragment)."""

    p: jax.Array  # [N,3] hit position
    geo_n: jax.Array  # [N,3]
    n: jax.Array  # [N,3] shading normal (== geo_n for analytic shapes)
    t: jax.Array  # [N,3] tangent
    b: jax.Array  # [N,3] bitangent
    uv: jax.Array  # [N,2]
    prop: jax.Array  # int32[N]
    material: jax.Array  # int32[N]


# ---------------------------------------------------------------------------
# Per-shape intersection: all return (t, u, v, hit_mask); t clamped to FAR on miss
# ---------------------------------------------------------------------------


def _plane_hit_t(o, d, n, pos):
    dd = vm.dot(n, d)
    dist = vm.dot(n, pos)
    t = -(vm.dot(n, o) - dist) / jnp.where(jnp.abs(dd) < 1e-20, 1e-20, dd)
    return t


def rectangle_intersect(o, d, rot, pos, scale, tmin, tmax):
    n = rot[..., 2, :]
    t = _plane_hit_t(o, d, n, pos)
    p = o + t[..., None] * d
    k = p - pos
    u = vm.dot(-rot[..., 0, :], k) / (0.5 * scale[..., 0])
    v = vm.dot(-rot[..., 1, :], k) / (0.5 * scale[..., 1])
    hit = (t >= tmin) & (t <= tmax) & (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
    return jnp.where(hit, t, FAR), u, v, hit


def disk_intersect(o, d, rot, pos, scale, tmin, tmax):
    n = rot[..., 2, :]
    t = _plane_hit_t(o, d, n, pos)
    p = o + t[..., None] * d
    k = p - pos
    l2 = vm.dot(k, k)
    r = 0.5 * scale[..., 0]
    hit = (t >= tmin) & (t <= tmax) & (l2 <= r * r)
    sk = k / jnp.maximum(r, 1e-20)[..., None]
    u = vm.dot(-rot[..., 0, :], sk)
    v = vm.dot(-rot[..., 1, :], sk)
    return jnp.where(hit, t, FAR), u, v, hit


def sphere_intersect(o, d, rot, pos, scale, tmin, tmax):
    v = pos - o
    b = vm.dot(d, v)  # d assumed normalized
    remedy = v - b[..., None] * d
    r = 0.5 * scale[..., 0]
    disc = r * r - vm.dot(remedy, remedy)
    ok = disc > 0.0
    dist = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = b - dist
    t1 = b + dist
    sel0 = ok & (t0 >= tmin) & (t0 <= tmax)
    sel1 = ok & ~sel0 & (t1 >= tmin) & (t1 <= tmax)
    t = jnp.where(sel0, t0, jnp.where(sel1, t1, FAR))
    hit = sel0 | sel1
    return t, jnp.zeros_like(t), jnp.zeros_like(t), hit


def cube_intersect(o, d, rot, pos, scale, tmin, tmax):
    lo = vm.world_to_object_point(rot, scale, pos, o)
    ld = vm.world_to_object_vector(rot, scale, d)
    inv = 1.0 / jnp.where(jnp.abs(ld) < 1e-20, jnp.where(ld < 0, -1e-20, 1e-20), ld)
    t0 = (-0.5 - lo) * inv
    t1 = (0.5 - lo) * inv
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tn = jnp.max(tsm, axis=-1)
    tf = jnp.min(tbg, axis=-1)
    # local ray is scaled, so tn/tf are in world units already (dir not renormalized)
    hit_near = (tn <= tf) & (tn >= tmin) & (tn <= tmax)
    hit_far = (tn <= tf) & ~hit_near & (tf >= tmin) & (tf <= tmax)
    t = jnp.where(hit_near, tn, jnp.where(hit_far, tf, FAR))
    hit = hit_near | hit_far
    z = jnp.zeros_like(t)
    return t, z, z, hit


def distant_intersect(o, d, rot, pos, scale, tmin, tmax):
    del o, pos, tmin
    n = rot[..., 2, :]
    b = vm.dot(n, d)
    radius = scale[..., 0]
    det = b * b - vm.dot(n, n) + radius * radius
    hit = (b <= 0.0) & (tmax >= RAY_MAX_T) & (radius > 0.0) & (det >= 0.0)
    k = d - n
    sk = k / jnp.maximum(radius, 1e-20)[..., None]
    u = vm.dot(rot[..., 0, :], sk)
    v = vm.dot(rot[..., 1, :], sk)
    t = jnp.where(hit, jnp.float32(RAY_MAX_T), FAR)
    return t, u, v, hit


def canopy_intersect(o, d, rot, pos, scale, tmin, tmax):
    del o, pos, scale, tmin
    eps = -0.0005
    hit = (tmax >= RAY_MAX_T) & (vm.dot(d, rot[..., 2, :]) >= eps)
    t = jnp.where(hit, jnp.float32(RAY_MAX_T), FAR)
    z = jnp.zeros_like(t)
    return t, z, z, hit


def dome_intersect(o, d, rot, pos, scale, tmin, tmax):
    del o, pos, scale, tmin
    # always "hits" at infinity when nothing closer; shaped via a cheap dot
    hit = (vm.dot(d, rot[..., 2, :]) > -2.0) & (tmax >= RAY_MAX_T)
    t = jnp.where(hit, jnp.float32(RAY_MAX_T), FAR)
    z = jnp.zeros_like(t)
    return t, z, z, hit


_INTERSECTORS = {
    int(ShapeType.CANOPY): canopy_intersect,
    int(ShapeType.CUBE): cube_intersect,
    int(ShapeType.DISK): disk_intersect,
    int(ShapeType.DISTANT): distant_intersect,
    int(ShapeType.DOME): dome_intersect,
    int(ShapeType.RECTANGLE): rectangle_intersect,
    int(ShapeType.SPHERE): sphere_intersect,
}


def _intersect_one_prop(o, d, tmin, tmax, shape_type, rot, pos, scale):
    """Intersect all N rays against ONE prop (broadcast prop params).

    shape_type is a traced scalar; every analytic formula is cheap, so all
    are evaluated and the result selected — branch-free lanes.
    """
    t_best = jnp.full(o.shape[:-1], FAR, jnp.float32)
    u_best = jnp.zeros_like(t_best)
    v_best = jnp.zeros_like(t_best)
    hit_best = jnp.zeros(o.shape[:-1], bool)
    for st, fn in _INTERSECTORS.items():
        t, u, v, hit = fn(o, d, rot, pos, scale, tmin, tmax)
        take = shape_type == st
        t_best = jnp.where(take, t, t_best)
        u_best = jnp.where(take, u, u_best)
        v_best = jnp.where(take, v, v_best)
        hit_best = jnp.where(take, hit, hit_best)
    return t_best, u_best, v_best, hit_best


_GROUP_CHUNK = 32  # props per batched pass (bounds the [N, G] transients)


def prop_transform_at(scene: SceneData, k, time):
    """Per-lane transform of animated prop k at lane times in [0,1]:
    piecewise slerp/lerp over the K+1 uniformly-spaced shutter keyframes
    in scene.prop_keys (ref scene/space.zig transformationAtMaybeStatic —
    the reference slerps between the two enclosing tick keyframes; K=8
    resampling is the static-shape analog). k may be a static int or a
    per-lane int32 array (animated-light NEE)."""
    if isinstance(k, int):
        keys = scene.prop_keys[k]  # [K+1, 10]
    else:
        # per-lane prop: select chain, never a real small-table gather
        P = scene.prop_keys.shape[0]
        flat = small_gather(scene.prop_keys.reshape(P, -1), k)
        keys = flat.reshape(k.shape + scene.prop_keys.shape[1:])
    K = keys.shape[-2] - 1
    if K == 1:
        row0 = keys[..., 0, :]
        row1 = keys[..., 1, :]
        f = time[..., None]
    else:
        u = jnp.clip(time, 0.0, 1.0) * K
        i = jnp.clip(u.astype(jnp.int32), 0, K - 1)
        f = (u - i.astype(jnp.float32))[..., None]
        iota = jnp.arange(K + 1, dtype=jnp.int32)
        sel0 = (iota == i[..., None])[..., None]
        sel1 = (iota == (i + 1)[..., None])[..., None]
        row0 = jnp.sum(jnp.where(sel0, keys, 0.0), axis=-2)
        row1 = jnp.sum(jnp.where(sel1, keys, 0.0), axis=-2)
    q = vm.quat_slerp(row0[..., 0:4], row1[..., 0:4], f)
    rot = vm.quat_to_mat3(q)
    pos = vm.lerp(row0[..., 4:7], row1[..., 4:7], f)
    scale = vm.lerp(row0[..., 7:10], row1[..., 7:10], f)
    return rot, pos, scale


def intersect_scene(scene: SceneData, o, d, tmin, tmax, ray_class: str = "reflection", primary=None, time=None) -> Hit:
    """Closest-hit over all props.

    Props are batched by shape type (static groups built at compile): one
    broadcasted [N, G] evaluation per type instead of a per-prop scan that
    evaluates every shape formula — the wavefront analog of the reference's
    typed dispatch. ray_class selects prop visibility ('camera' |
    'reflection' | 'shadow', ref prop.zig); `primary` lanes use camera
    visibility.
    """
    vis = {
        "camera": scene.prop_visible_camera,
        "reflection": scene.prop_visible_reflection,
        "shadow": scene.prop_visible_shadow,
    }[ray_class]

    n_shape = o.shape[:-1]
    t_b = jnp.full(n_shape, FAR, jnp.float32)
    p_b = jnp.full(n_shape, -1, jnp.int32)
    u_b = jnp.zeros(n_shape, jnp.float32)
    v_b = jnp.zeros(n_shape, jnp.float32)

    # group axis LEADS: shapes [G, N] keep the big N on the TPU lane dim
    o_e = o[None]
    d_e = d[None]

    groups = scene.prop_groups or {}
    fused = None
    if groups:
        # TPU: one Pallas pass over all analytic props (params in SMEM,
        # zero [G,N] intermediates — the XLA broadcast below measured
        # 500+MB HBM traffic/iteration on Cornell); CPU/portal scenes
        # fall through to the XLA formulation
        from ..ops import isect as isect_ops

        fused = isect_ops.closest_props(
            scene, groups, o, d, tmin, tmax, ray_class, primary
        )
    if fused is not None:
        t_b, p_b, u_b, v_b = fused
    else:
        for st, all_idx in groups.items():
            fn = _INTERSECTORS[int(st)]
            g_total = all_idx.shape[0]
            for c0 in range(0, g_total, _GROUP_CHUNK):
                idx = all_idx[c0 : c0 + _GROUP_CHUNK]
                rot = scene.prop_rot[idx][:, None]
                pos = scene.prop_pos[idx][:, None]
                scale = scene.prop_scale[idx][:, None]
                t, u, v, hit = fn(o_e, d_e, rot, pos, scale, tmin, tmax)  # [G,N]
                lane_vis = vis[idx][:, None]
                if primary is not None:
                    lane_vis = jnp.where(
                        primary[None], scene.prop_visible_camera[idx][:, None], lane_vis
                    )
                t = jnp.where(hit & lane_vis, t, FAR)
                gi = jnp.argmin(t, axis=0)  # [N]
                tg = jnp.min(t, axis=0)
                closer = tg < t_b
                take = lambda arr: jnp.take_along_axis(arr, gi[None], axis=0)[0]
                t_b = jnp.where(closer, tg, t_b)
                p_b = jnp.where(closer, idx[gi], p_b)
                u_b = jnp.where(closer, take(u), u_b)
                v_b = jnp.where(closer, take(v), v_b)

    # animated props: one per-prop pass with per-lane shutter transforms
    # (static scenes have an empty dict — compiles to nothing). Animated
    # mesh/curve/point props are handled by their own traversals.
    if scene.animated_props:
        tl = jnp.zeros(n_shape, jnp.float32) if time is None else time
        for pk, st in scene.animated_props.keys():
            if int(st) not in _INTERSECTORS:
                continue
            rot, pos, scale = prop_transform_at(scene, pk, tl)
            t, u, v, hit = _INTERSECTORS[int(st)](o, d, rot, pos, scale, tmin, tmax)
            lane_vis = vis[pk]
            if primary is not None:
                lane_vis = jnp.where(primary, scene.prop_visible_camera[pk], lane_vis)
            closer = hit & lane_vis & (t < t_b)
            t_b = jnp.where(closer, t, t_b)
            p_b = jnp.where(closer, pk, p_b)
            u_b = jnp.where(closer, u, u_b)
            v_b = jnp.where(closer, v, v_b)

    prim = jnp.full(n_shape, -1, jnp.int32)
    if scene.meshes is not None:
        t_b, p_b, u_b, v_b, prim = _intersect_meshes(
            scene, o, d, tmin, tmax, ray_class, primary, t_b, p_b, u_b, v_b,
            prim, time,
        )
    if scene.curves is not None:
        t_b, p_b, u_b, v_b, prim = _intersect_curves(
            scene, o, d, tmin, tmax, vis, primary, t_b, p_b, u_b, v_b, prim,
            time,
        )
    if scene.points is not None:
        t_b, p_b, u_b, v_b, prim = _intersect_points(
            scene, o, d, tmin, tmax, vis, primary, t_b, p_b, u_b, v_b, prim, time
        )
    return Hit(t_b, p_b, u_b, v_b, prim)


def _intersect_meshes(scene: SceneData, o, d, tmin, tmax, ray_class, primary, t_b, p_b, u_b, v_b, prim_b, time=None):
    """Closest-hit over all mesh props: dense instance phase + wide-BLAS
    walks (ref: prop_tree.zig:22 -> triangle_tree.zig two-level
    traversal)."""
    from . import trimesh

    th = trimesh.intersect_instances(
        scene.meshes, scene.mesh_instances, o, d, tmin,
        jnp.minimum(tmax, t_b), ray_class=ray_class, primary=primary,
        time=time,
    )
    closer = th.prim >= 0  # traversal starts bounded by t_b
    t_b = jnp.where(closer, th.t, t_b)
    p_b = jnp.where(closer, th.prop, p_b)
    u_b = jnp.where(closer, th.u, u_b)
    v_b = jnp.where(closer, th.v, v_b)
    prim_b = jnp.where(closer, th.prim, prim_b)
    return t_b, p_b, u_b, v_b, prim_b


def _intersect_curves(scene: SceneData, o, d, tmin, tmax, vis, primary, t_b, p_b, u_b, v_b, prim_b, time=None):
    """Closest-hit over curve (hair) props: rounded-cone segment BVHs
    (ref shape/curve/curve_tree.zig; TPU flattening in scene/curves.py).
    Hit.u carries the axial segment parameter; Hit.prim the arena segment."""
    from . import curves as cv

    def body(carry, prop_idx):
        t_b, p_b, u_b, v_b, prim_b = carry
        rot = scene.prop_rot[prop_idx]
        pos = scene.prop_pos[prop_idx]
        scale = scene.prop_scale[prop_idx]
        lane_vis = vis[prop_idx]
        if primary is not None:
            lane_vis = jnp.where(primary, scene.prop_visible_camera[prop_idx], lane_vis)
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)
        root = jnp.broadcast_to(
            scene.curves.curve_root[scene.prop_curve[prop_idx]], o.shape[:-1]
        )
        ch = cv.traverse(scene.curves, root, o_l, d_l, tmin, jnp.minimum(tmax, t_b))
        closer = (ch.prim >= 0) & (ch.t < t_b) & lane_vis
        t_b = jnp.where(closer, ch.t, t_b)
        p_b = jnp.where(closer, prop_idx, p_b)
        u_b = jnp.where(closer, ch.s, u_b)
        v_b = jnp.where(closer, 0.0, v_b)
        prim_b = jnp.where(closer, ch.prim, prim_b)
        return (t_b, p_b, u_b, v_b, prim_b), None

    (t_b, p_b, u_b, v_b, prim_b), _ = jax.lax.scan(
        body, (t_b, p_b, u_b, v_b, prim_b), scene.curve_props
    )

    # animated curve props: per-lane shutter transforms (static loop —
    # these ids left the scan array at scene compile)
    if scene.animated_curves:
        tl = jnp.zeros(o.shape[:-1], jnp.float32) if time is None else time
        for pk in scene.animated_curves.keys():
            rot, pos, scale = prop_transform_at(scene, pk, tl)
            lane_vis = vis[pk]
            if primary is not None:
                lane_vis = jnp.where(primary, scene.prop_visible_camera[pk], lane_vis)
            o_l = vm.world_to_object_point(rot, scale, pos, o)
            d_l = vm.world_to_object_vector(rot, scale, d)
            root = jnp.broadcast_to(
                scene.curves.curve_root[scene.prop_curve[pk]], o.shape[:-1]
            )
            ch = cv.traverse(scene.curves, root, o_l, d_l, tmin, jnp.minimum(tmax, t_b))
            closer = (ch.prim >= 0) & (ch.t < t_b) & lane_vis
            t_b = jnp.where(closer, ch.t, t_b)
            p_b = jnp.where(closer, pk, p_b)
            u_b = jnp.where(closer, ch.s, u_b)
            v_b = jnp.where(closer, 0.0, v_b)
            prim_b = jnp.where(closer, ch.prim, prim_b)
    return t_b, p_b, u_b, v_b, prim_b


def _intersect_points(scene: SceneData, o, d, tmin, tmax, vis, primary, t_b, p_b, u_b, v_b, prim_b, time=None):
    """Closest-hit over point-cloud props (ref shape/point/): sphere
    particles, optionally lerped over the shutter (motion clouds)."""
    from . import points as pt_mod

    tl = jnp.zeros(o.shape[:-1], jnp.float32) if time is None else time

    def body(carry, prop_idx):
        t_b, p_b, u_b, v_b, prim_b = carry
        rot = scene.prop_rot[prop_idx]
        pos = scene.prop_pos[prop_idx]
        scale = scene.prop_scale[prop_idx]
        lane_vis = vis[prop_idx]
        if primary is not None:
            lane_vis = jnp.where(primary, scene.prop_visible_camera[prop_idx], lane_vis)
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)
        root = jnp.broadcast_to(
            scene.points.cloud_root[scene.prop_cloud[prop_idx]], o.shape[:-1]
        )
        ph = pt_mod.traverse(scene.points, root, o_l, d_l, tmin, jnp.minimum(tmax, t_b), time=tl)
        closer = (ph.prim >= 0) & (ph.t < t_b) & lane_vis
        t_b = jnp.where(closer, ph.t, t_b)
        p_b = jnp.where(closer, prop_idx, p_b)
        u_b = jnp.where(closer, 0.0, u_b)
        v_b = jnp.where(closer, 0.0, v_b)
        prim_b = jnp.where(closer, ph.prim, prim_b)
        return (t_b, p_b, u_b, v_b, prim_b), None

    (t_b, p_b, u_b, v_b, prim_b), _ = jax.lax.scan(
        body, (t_b, p_b, u_b, v_b, prim_b), scene.point_props
    )

    # animated point-cloud props: per-lane shutter transforms
    if scene.animated_points:
        for pk in scene.animated_points.keys():
            rot, pos, scale = prop_transform_at(scene, pk, tl)
            lane_vis = vis[pk]
            if primary is not None:
                lane_vis = jnp.where(primary, scene.prop_visible_camera[pk], lane_vis)
            o_l = vm.world_to_object_point(rot, scale, pos, o)
            d_l = vm.world_to_object_vector(rot, scale, d)
            root = jnp.broadcast_to(
                scene.points.cloud_root[scene.prop_cloud[pk]], o.shape[:-1]
            )
            ph = pt_mod.traverse(scene.points, root, o_l, d_l, tmin, jnp.minimum(tmax, t_b), time=tl)
            closer = (ph.prim >= 0) & (ph.t < t_b) & lane_vis
            t_b = jnp.where(closer, ph.t, t_b)
            p_b = jnp.where(closer, pk, p_b)
            u_b = jnp.where(closer, 0.0, u_b)
            v_b = jnp.where(closer, 0.0, v_b)
            prim_b = jnp.where(closer, ph.prim, prim_b)
    return t_b, p_b, u_b, v_b, prim_b


def occluded_masked(scene: SceneData, o, d, tmin, tmax, key, time=None, rounds: int = 4) -> jax.Array:
    """Shadow visibility with stochastic opacity cutouts (ref
    triangle_tree.zig visibility + material_base.zig stochasticOpacity).

    Any-hit cannot order surfaces, so masked scenes re-march with CLOSEST
    hits: each blocking surface either passes (probability = its mask
    opacity complement) and the march continues behind it, or blocks.
    `rounds` bounds the unrolled marches; exhausted lanes report blocked
    (conservative). Only compiled when the scene's "mask" feature is set.
    """
    from ..core.rng import hash_u32, u32_to_float
    from ..core.gather import small_gather

    n = o.shape[:-1]
    blocked = jnp.zeros(n, bool)
    marching = jnp.ones(n, bool)
    oo = o
    rem = jnp.broadcast_to(tmax, n).astype(jnp.float32)
    k = jnp.asarray(key, jnp.uint32)
    for r in range(rounds):
        hit = intersect_scene(scene, oo, d, tmin, rem, "shadow", time=time)
        hit_any = marching & hit.valid() & (hit.t < rem)
        frag = build_fragment(scene, hit, oo, d, need_uv=True, time=time)
        mt = small_gather(scene.materials.mask_tex, jnp.maximum(frag.material, 0))
        from .textures import sample_stochastic

        k = hash_u32(k ^ jnp.uint32(0x9E3779B9 + r))
        xi2 = jnp.stack([u32_to_float(k), u32_to_float(hash_u32(k))], -1)
        opac = sample_stochastic(scene.textures, jnp.maximum(mt, 0), frag.uv, xi2)[..., 0]
        transparent = (mt >= 0) & ((opac <= 0.0) | (opac <= u32_to_float(hash_u32(k ^ jnp.uint32(0x85EBCA6B)))))
        blocked = blocked | (hit_any & ~transparent)
        marching = hit_any & transparent
        # continue just past the transparent surface
        adv = hit.t + 1e-4 * jnp.maximum(hit.t, 1.0)
        oo = jnp.where(marching[..., None], oo + adv[..., None] * d, oo)
        rem = jnp.where(marching, rem - adv, rem)
    return blocked | marching  # exhausted rounds: conservative


def occluded(scene: SceneData, o, d, tmin, tmax, time=None) -> jax.Array:
    """Any-hit visibility query for shadow rays. True = blocked."""
    blocked = jnp.zeros(o.shape[:-1], bool)
    o_e = o[None]
    d_e = d[None]

    if scene.animated_props:
        tl = jnp.zeros(o.shape[:-1], jnp.float32) if time is None else time
        for pk, st in scene.animated_props.keys():
            if int(st) not in _INTERSECTORS:
                continue
            rot, pos, scale = prop_transform_at(scene, pk, tl)
            _, _, _, hit = _INTERSECTORS[int(st)](o, d, rot, pos, scale, tmin, tmax)
            blocked = blocked | (hit & scene.prop_visible_shadow[pk])

    groups = scene.prop_groups or {}
    fused = None
    if groups:
        from ..ops import isect as isect_ops

        fused = isect_ops.anyhit_props(scene, groups, o, d, tmin, tmax)
    if fused is not None:
        blocked = blocked | fused
    else:
        for st, all_idx in groups.items():
            fn = _INTERSECTORS[int(st)]
            for c0 in range(0, all_idx.shape[0], _GROUP_CHUNK):
                idx = all_idx[c0 : c0 + _GROUP_CHUNK]
                rot = scene.prop_rot[idx][:, None]
                pos = scene.prop_pos[idx][:, None]
                scale = scene.prop_scale[idx][:, None]
                _, _, _, hit = fn(o_e, d_e, rot, pos, scale, tmin, tmax)
                blocked = blocked | jnp.any(hit & scene.prop_visible_shadow[idx][:, None], axis=0)

    if scene.meshes is not None:
        from . import trimesh

        th = trimesh.intersect_instances(
            scene.meshes, scene.mesh_instances, o, d, tmin,
            jnp.where(blocked, tmin, tmax),  # already-blocked lanes skip
            ray_class="shadow", time=time, any_hit=True,
        )
        blocked = blocked | (th.prim >= 0)

    if scene.curves is not None:
        from . import curves as cv

        def curve_body(blocked, prop_idx):
            rot = scene.prop_rot[prop_idx]
            pos = scene.prop_pos[prop_idx]
            scale = scene.prop_scale[prop_idx]
            o_l = vm.world_to_object_point(rot, scale, pos, o)
            d_l = vm.world_to_object_vector(rot, scale, d)
            root = jnp.broadcast_to(
                scene.curves.curve_root[scene.prop_curve[prop_idx]], o.shape[:-1]
            )
            root = jnp.where(blocked, -1, root)
            ch = cv.traverse(scene.curves, root, o_l, d_l, tmin, tmax, any_hit=True)
            return blocked | ((ch.prim >= 0) & scene.prop_visible_shadow[prop_idx]), None

        blocked, _ = jax.lax.scan(curve_body, blocked, scene.curve_props)
        if scene.animated_curves:
            tlc = jnp.zeros(o.shape[:-1], jnp.float32) if time is None else time
            for pk in scene.animated_curves.keys():
                rot, pos, scale = prop_transform_at(scene, pk, tlc)
                o_l = vm.world_to_object_point(rot, scale, pos, o)
                d_l = vm.world_to_object_vector(rot, scale, d)
                root = jnp.broadcast_to(
                    scene.curves.curve_root[scene.prop_curve[pk]], o.shape[:-1]
                )
                root = jnp.where(blocked, -1, root)
                ch = cv.traverse(scene.curves, root, o_l, d_l, tmin, tmax, any_hit=True)
                blocked = blocked | ((ch.prim >= 0) & scene.prop_visible_shadow[pk])

    if scene.points is not None:
        from . import points as pt_mod

        tl = jnp.zeros(o.shape[:-1], jnp.float32) if time is None else time

        def point_body(blocked, prop_idx):
            rot = scene.prop_rot[prop_idx]
            pos = scene.prop_pos[prop_idx]
            scale = scene.prop_scale[prop_idx]
            o_l = vm.world_to_object_point(rot, scale, pos, o)
            d_l = vm.world_to_object_vector(rot, scale, d)
            root = jnp.broadcast_to(
                scene.points.cloud_root[scene.prop_cloud[prop_idx]], o.shape[:-1]
            )
            root = jnp.where(blocked, -1, root)
            ph = pt_mod.traverse(scene.points, root, o_l, d_l, tmin, tmax, time=tl, any_hit=True)
            return blocked | ((ph.prim >= 0) & scene.prop_visible_shadow[prop_idx]), None

        blocked, _ = jax.lax.scan(point_body, blocked, scene.point_props)
        if scene.animated_points:
            for pk in scene.animated_points.keys():
                rot, pos, scale = prop_transform_at(scene, pk, tl)
                o_l = vm.world_to_object_point(rot, scale, pos, o)
                d_l = vm.world_to_object_vector(rot, scale, d)
                root = jnp.broadcast_to(
                    scene.points.cloud_root[scene.prop_cloud[pk]], o.shape[:-1]
                )
                root = jnp.where(blocked, -1, root)
                ph = pt_mod.traverse(scene.points, root, o_l, d_l, tmin, tmax, time=tl, any_hit=True)
                blocked = blocked | ((ph.prim >= 0) & scene.prop_visible_shadow[pk])
    return blocked


# ---------------------------------------------------------------------------
# Fragment (position + shading frame + uv) for the closest hit
# ---------------------------------------------------------------------------


def build_fragment(scene: SceneData, hit: Hit, o, d, need_uv: bool | None = None, need_tangents: bool = False, time=None) -> Fragment:
    """Shading fragment for the closest hit.

    Only shape types PRESENT in the scene (static prop_groups keys) are
    evaluated/selected — keeps the per-bounce cost proportional to the scene,
    not the shape catalog. uv and tangent frames are skipped unless needed
    (textures / anisotropy / AOVs) — they carry the expensive trig.
    """
    if need_uv is None:
        need_uv = scene.textures is not None
    present = set(int(k) for k in (scene.prop_groups or {}).keys())
    if scene.meshes is not None:
        present.add(int(ShapeType.TRIANGLE_MESH))

    prop = jnp.maximum(hit.prop, 0)
    shape = small_gather(scene.prop_shape, prop)
    rot = small_gather(scene.prop_rot, prop)
    pos = small_gather(scene.prop_pos, prop)
    scale = small_gather(scene.prop_scale, prop)
    material = small_gather(scene.prop_material, prop)
    anim_ids = list(
        {pk for pk, _st in (scene.animated_props or {}).keys()}
        | set((scene.animated_curves or {}).keys())
        | set((scene.animated_points or {}).keys())
    )
    if anim_ids:
        # shading frames of animated props use the lane-time transform
        tl = jnp.zeros(hit.t.shape, jnp.float32) if time is None else time
        for pk in sorted(anim_ids):
            rk, pk_pos, pk_scale = prop_transform_at(scene, pk, tl)
            m1 = (prop == pk)[..., None]
            rot = jnp.where(m1[..., None], rk, rot)
            pos = jnp.where(m1, pk_pos, pos)
            scale = jnp.where(m1, pk_scale, scale)

    p = o + hit.t[..., None] * d
    r0, r1, r2 = rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]

    has = lambda *ts: any(int(t) in present for t in ts)

    n_vals, t_vals, b_vals, uv_vals = {}, {}, {}, {}
    zero2 = jnp.zeros(hit.t.shape + (2,), jnp.float32)

    if has(ShapeType.RECTANGLE, ShapeType.DISK):
        for st in (ShapeType.RECTANGLE, ShapeType.DISK):
            if has(st):
                n_vals[int(st)] = r2
                t_vals[int(st)] = -r0
                b_vals[int(st)] = -r1
                uv_vals[int(st)] = jnp.stack(
                    [0.5 * (hit.u + 1.0), 0.5 * (hit.v + 1.0)], axis=-1
                )

    if has(ShapeType.SPHERE):
        sph_n = vm.safe_normalize(p - pos)
        n_vals[int(ShapeType.SPHERE)] = sph_n
        if need_uv or need_tangents:
            xyz = vm.safe_normalize(vm.world_to_object_normal(rot, sph_n))
            phi = -jnp.arctan2(xyz[..., 0], xyz[..., 2]) + jnp.pi
            theta = jnp.arccos(jnp.clip(xyz[..., 1], -1.0, 1.0))
            uv_vals[int(ShapeType.SPHERE)] = jnp.stack(
                [phi * (0.5 / jnp.pi), theta * (1.0 / jnp.pi)], axis=-1
            )
            if need_tangents:
                sin_theta = jnp.maximum(jnp.sin(theta), 1e-5)
                sph_t_local = jnp.stack(
                    [sin_theta * jnp.cos(phi), jnp.zeros_like(phi), sin_theta * jnp.sin(phi)],
                    axis=-1,
                )
                sph_t = vm.safe_normalize(vm.object_to_world_normal(rot, sph_t_local))
                t_vals[int(ShapeType.SPHERE)] = sph_t
                b_vals[int(ShapeType.SPHERE)] = -vm.cross(sph_t, sph_n)

    if has(ShapeType.CUBE):
        local_p = vm.world_to_object_point(rot, scale, pos, p)
        ax, ay, az = (0.5 - jnp.abs(local_p[..., k]) for k in range(3))
        use_x = (ax <= ay) & (ax <= az)
        use_y = (~use_x) & (ay <= az)
        face_n = jnp.where(
            use_x[..., None], r0, jnp.where(use_y[..., None], r1, r2)
        )
        comp = jnp.where(use_x, local_p[..., 0], jnp.where(use_y, local_p[..., 1], local_p[..., 2]))
        cube_n = jnp.sign(comp)[..., None] * face_n
        n_vals[int(ShapeType.CUBE)] = cube_n
        if need_tangents:
            ct, cb = vm.orthonormal_basis(cube_n)
            t_vals[int(ShapeType.CUBE)] = ct
            b_vals[int(ShapeType.CUBE)] = cb

    inf_present = has(ShapeType.CANOPY, ShapeType.DISTANT, ShapeType.DOME)
    if inf_present:
        inf_n = -d
        if has(ShapeType.CANOPY):
            n_vals[int(ShapeType.CANOPY)] = inf_n
            t_vals[int(ShapeType.CANOPY)] = r0
            b_vals[int(ShapeType.CANOPY)] = r1
        if has(ShapeType.DOME):
            n_vals[int(ShapeType.DOME)] = inf_n
            t_vals[int(ShapeType.DOME)] = r0
            b_vals[int(ShapeType.DOME)] = r1
        if has(ShapeType.DISTANT):
            n_vals[int(ShapeType.DISTANT)] = r2
            t_vals[int(ShapeType.DISTANT)] = r0
            b_vals[int(ShapeType.DISTANT)] = r1
            uv_vals[int(ShapeType.DISTANT)] = jnp.stack(
                [(hit.u + 1.0) * 0.5, (hit.v + 1.0) * 0.5], axis=-1
            )
        if need_uv and has(ShapeType.CANOPY, ShapeType.DOME):
            ldir = vm.safe_normalize(vm.world_to_object_normal(rot, d))
            if has(ShapeType.CANOPY):
                lz = jnp.clip(ldir[..., 2], -1.0, 1.0)
                r_eq = jnp.arccos(lz) * (2.0 / jnp.pi)
                lxy = jnp.sqrt(jnp.maximum(ldir[..., 0] ** 2 + ldir[..., 1] ** 2, 1e-20))
                uv_vals[int(ShapeType.CANOPY)] = jnp.stack(
                    [0.5 * (r_eq * ldir[..., 0] / lxy) + 0.5, 0.5 * (r_eq * ldir[..., 1] / lxy) + 0.5],
                    axis=-1,
                )
            if has(ShapeType.DOME):
                dome_phi = jnp.arctan2(ldir[..., 0], ldir[..., 2])
                uv_vals[int(ShapeType.DOME)] = jnp.stack(
                    [dome_phi * (0.5 / jnp.pi) + 0.5, jnp.arccos(jnp.clip(ldir[..., 1], -1, 1)) / jnp.pi],
                    axis=-1,
                )

    def sel(vals, default):
        keys = [k for k in vals.keys()]
        if not keys:
            return default
        out = None
        for st in keys:
            val = vals[st]
            if out is None:
                out = val
                continue
            cond = shape == st
            if val.ndim > cond.ndim:
                cond = cond[..., None]
            out = jnp.where(cond, val, out)
        return out

    n = sel(n_vals, -d)
    tangent = sel(t_vals, None)
    bitangent = sel(b_vals, None)
    if tangent is None or not need_tangents:
        tangent, bitangent = (jnp.zeros_like(n), jnp.zeros_like(n)) if not need_tangents else vm.orthonormal_basis(n)
    uv = sel(uv_vals, zero2) if need_uv or uv_vals else zero2

    if inf_present:
        is_inf = jnp.zeros(hit.t.shape, bool)
        for st in (ShapeType.CANOPY, ShapeType.DISTANT, ShapeType.DOME):
            if has(st):
                is_inf = is_inf | (shape == int(st))
        p = jnp.where(is_inf[..., None], jnp.float32(RAY_MAX_T) * d, p)
    geo_n = n

    if scene.meshes is not None:
        arena = scene.meshes
        pr = jnp.maximum(hit.prim, 0)
        is_mesh = (shape == int(ShapeType.TRIANGLE_MESH)) & (hit.prim >= 0)
        # ONE 80-byte row gather for all shading attributes (separate
        # e1/e2/n/uv gathers each pay the slow >=2^15-row gather price)
        row = arena.attr_rows[pr]
        e1 = row[..., 3:6]
        e2 = row[..., 6:9]
        if arena.attr_rows_d is not None and time is not None:
            # deforming mesh: edges at the lane's shutter time (the
            # geometric normal follows the deformation; per-vertex
            # shading normals stay frame-0 — small-angle approximation)
            tt = time[..., None]
            row_d = arena.attr_rows_d[pr]
            e1 = e1 + tt * row_d[..., 3:6]
            e2 = e2 + tt * row_d[..., 6:9]
        gn_l = vm.safe_normalize(vm.cross(e1, e2))
        w0 = 1.0 - hit.u - hit.v
        from ..core import encoding as enc

        tn = enc.oct_normal_unpack(
            jax.lax.bitcast_convert_type(row[..., 9:12], jnp.uint32)
        )  # [N,3] words -> [N,3,3]
        ns_l = (
            w0[..., None] * tn[..., 0, :]
            + hit.u[..., None] * tn[..., 1, :]
            + hit.v[..., None] * tn[..., 2, :]
        )
        # normals transform by rotation only (ref composed_transformation.zig
        # objectToWorldNormal — uniform-scale assumption like the reference)
        gn_w = vm.safe_normalize(vm.object_to_world_normal(rot, gn_l))
        ns_w = vm.safe_normalize(vm.object_to_world_normal(rot, ns_l))
        tuv = row[..., 12:18].reshape(row.shape[:-1] + (3, 2))
        uv_m = (
            w0[..., None] * tuv[..., 0, :]
            + hit.u[..., None] * tuv[..., 1, :]
            + hit.v[..., None] * tuv[..., 2, :]
        )
        mt, mb = vm.orthonormal_basis(ns_w)
        mask = is_mesh[..., None]
        geo_n = jnp.where(mask, gn_w, geo_n)
        n = jnp.where(mask, ns_w, n)
        tangent = jnp.where(mask, mt, tangent)
        bitangent = jnp.where(mask, mb, bitangent)
        uv = jnp.where(mask, uv_m, uv)

    if scene.curves is not None:
        # curve fragment (ref curve_data.zig interpolateData): shading
        # frame is (tangent along the strand, bitangent toward the viewer
        # plane, cylinder normal); uv = (strand parameter, azimuthal v)
        # with h = 2v-1 feeding the hair BSDF (hair_sample.zig rs.uvw[1]).
        from . import curves as cv

        is_curve = (shape == int(ShapeType.CURVES)) & (hit.prim >= 0)
        seg = cv.segment_fields(scene.curves, jnp.maximum(hit.prim, 0))
        s_ax = hit.u
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)
        p_l = o_l + hit.t[..., None] * d_l
        c_l = seg["pa"] + s_ax[..., None] * (seg["pb"] - seg["pa"])
        r_l = jnp.maximum(seg["ra"] + s_ax * (seg["rb"] - seg["ra"]), 1e-9)
        t_l = vm.safe_normalize(seg["pb"] - seg["pa"])
        n_l = vm.safe_normalize(p_l - c_l)
        # azimuthal offset in the view-perpendicular direction
        b_view = vm.safe_normalize(vm.cross(t_l, -d_l))
        hh = jnp.clip(vm.dot(p_l - c_l, b_view) / r_l, -1.0, 1.0)
        cu = seg["u0"] + s_ax * (seg["u1"] - seg["u0"])
        cn_w = vm.safe_normalize(vm.object_to_world_normal(rot, n_l))
        ct_w = vm.safe_normalize(vm.object_to_world_normal(rot, t_l))
        cb_w = vm.safe_normalize(vm.cross(cn_w, ct_w))
        cuv = jnp.stack([cu, 0.5 * (hh + 1.0)], axis=-1)
        mask = is_curve[..., None]
        geo_n = jnp.where(mask, cn_w, geo_n)
        n = jnp.where(mask, cn_w, n)
        tangent = jnp.where(mask, ct_w, tangent)
        bitangent = jnp.where(mask, cb_w, bitangent)
        uv = jnp.where(mask, cuv, uv)

    if scene.points is not None:
        # point fragment: sphere normal at the (possibly moving) center
        from . import points as pt_mod

        is_point = (shape == int(ShapeType.POINTS)) & (hit.prim >= 0)
        tlp = jnp.zeros(hit.t.shape, jnp.float32) if time is None else time
        pc, pr = pt_mod.point_center(scene.points, jnp.maximum(hit.prim, 0), tlp)
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)
        p_l = o_l + hit.t[..., None] * d_l
        pn_l = vm.safe_normalize(p_l - pc)
        pn_w = vm.safe_normalize(vm.object_to_world_normal(rot, pn_l))
        pt_t, pt_b = vm.orthonormal_basis(pn_w)
        mask = is_point[..., None]
        geo_n = jnp.where(mask, pn_w, geo_n)
        n = jnp.where(mask, pn_w, n)
        tangent = jnp.where(mask, pt_t, tangent)
        bitangent = jnp.where(mask, pt_b, bitangent)

    # portal-rect hits emit the linked env map: the material's emission
    # texture must be looked up at the DIRECTION's dome uv, not the rect's
    # surface uv (ref scene.zig lightPortalUvw -> PortalImpl.portalUvw)
    if scene.portals:
        from . import portal as portal_mod

        for (_l_const, pp), pd in sorted(scene.portals.items()):
            mask = (hit.prop == pp)[..., None]
            uv = jnp.where(mask, portal_mod.dome_uv_of_dir(pd.dome_rot, d), uv)

    return Fragment(p=p, geo_n=geo_n, n=n, t=tangent, b=bitangent, uv=uv, prop=hit.prop, material=material)


# ---------------------------------------------------------------------------
# Ray offsetting (ref: src/core/scene/ray_offset.zig — "A Fast and Robust
# Method for Avoiding Self-Intersection", Ray Tracing Gems)
# ---------------------------------------------------------------------------


def offset_ray(p, n):
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    int_scale = 256.0

    of_i = (int_scale * n).astype(jnp.int32)
    p_i = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_in = jax.lax.bitcast_convert_type(p_i - of_i, jnp.float32)
    p_ip = jax.lax.bitcast_convert_type(p_i + of_i, jnp.float32)
    p_adj = jnp.where(p < 0.0, p_in, p_ip)
    mad = float_scale * n + p
    return jnp.where(jnp.abs(p) < origin, mad, p_adj)


def uv_density(scene: SceneData, hit: Hit, time=None):
    """|duv/dworld| at the hit — converts a world-space footprint (pixel
    cone width x distance) into uv units for analytic-procedural
    filtering (the surface-projection step of the reference's
    screen-space differentials, context.zig:139-199).

    Mesh hits: sqrt(uv-area / world-area) of the hit triangle. Analytic
    props: 1 / (0.5 * max scale) (the rectangle/disk parameterization;
    a serviceable bound for the others). Only called when the scene has
    analytic procedurals (feature-gated in the integrator)."""
    prop = jnp.maximum(hit.prop, 0)
    scale = small_gather(scene.prop_scale, prop)
    dens = 1.0 / jnp.maximum(0.5 * jnp.max(scale, axis=-1), 1e-8)
    if scene.meshes is not None:
        arena = scene.meshes
        pr = jnp.maximum(hit.prim, 0)
        shape = small_gather(scene.prop_shape, prop)
        is_mesh = (shape == int(ShapeType.TRIANGLE_MESH)) & (hit.prim >= 0)
        # same single-row gather as build_fragment (CSEs with it when both
        # run in one jit over the same hit)
        row = arena.attr_rows[pr]
        e1 = row[..., 3:6]
        e2 = row[..., 6:9]
        if arena.attr_rows_d is not None and time is not None:
            tt = time[..., None]
            row_d = arena.attr_rows_d[pr]
            e1 = e1 + tt * row_d[..., 3:6]
            e2 = e2 + tt * row_d[..., 6:9]
        tuv = row[..., 12:18].reshape(row.shape[:-1] + (3, 2))
        duv1 = tuv[..., 1, :] - tuv[..., 0, :]
        duv2 = tuv[..., 2, :] - tuv[..., 0, :]
        area_uv = jnp.abs(duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0])
        area_w = vm.length(vm.cross(e1, e2))
        # object->world scaling of the triangle edges (instances)
        smax = jnp.max(scale, axis=-1)
        mdens = jnp.sqrt(area_uv / jnp.maximum(area_w * smax * smax, 1e-16))
        dens = jnp.where(is_mesh, mdens, dens)
    return dens
