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
    del o, pos, scale, tmin, rot
    hit = tmax >= RAY_MAX_T
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


def intersect_scene(scene: SceneData, o, d, tmin, tmax, ray_class: str = "reflection", primary=None) -> Hit:
    """Closest-hit over all props via lax.scan (each step full ray width).

    ray_class selects prop visibility: 'camera' | 'reflection' | 'shadow'
    (ref: prop.zig Properties visibility bits). If `primary` (bool[N]) is
    given, primary lanes use camera visibility and the rest `ray_class`.
    """
    vis = {
        "camera": scene.prop_visible_camera,
        "reflection": scene.prop_visible_reflection,
        "shadow": scene.prop_visible_shadow,
    }[ray_class]

    def body(carry, prop):
        t_b, p_b, u_b, v_b = carry
        shape_type, rot, pos, scale, visible, vis_cam, idx = prop
        t, u, v, hit = _intersect_one_prop(o, d, tmin, tmax, shape_type, rot, pos, scale)
        lane_vis = visible if primary is None else jnp.where(primary, vis_cam, visible)
        hit = hit & lane_vis
        closer = hit & (t < t_b)
        t_b = jnp.where(closer, t, t_b)
        p_b = jnp.where(closer, idx, p_b)
        u_b = jnp.where(closer, u, u_b)
        v_b = jnp.where(closer, v, v_b)
        return (t_b, p_b, u_b, v_b), None

    n_shape = o.shape[:-1]
    init = (
        jnp.full(n_shape, FAR, jnp.float32),
        jnp.full(n_shape, -1, jnp.int32),
        jnp.zeros(n_shape, jnp.float32),
        jnp.zeros(n_shape, jnp.float32),
    )
    props = (
        scene.prop_shape,
        scene.prop_rot,
        scene.prop_pos,
        scene.prop_scale,
        vis,
        scene.prop_visible_camera,
        jnp.arange(scene.num_props, dtype=jnp.int32),
    )
    (t, p, u, v), _ = jax.lax.scan(body, init, props)
    prim = jnp.full(o.shape[:-1], -1, jnp.int32)

    if scene.meshes is not None:
        t, p, u, v, prim = _intersect_meshes(
            scene, o, d, tmin, tmax, vis, primary, t, p, u, v, prim
        )
    return Hit(t, p, u, v, prim)


def _intersect_meshes(scene: SceneData, o, d, tmin, tmax, vis, primary, t_b, p_b, u_b, v_b, prim_b):
    """Closest-hit over all mesh props: scan over instances, threaded-BVH
    traversal per instance (ref: prop_tree -> triangle_tree two-level walk)."""
    from . import trimesh

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
            scene.meshes.mesh_root[scene.prop_mesh[prop_idx]], o.shape[:-1]
        )
        mh = trimesh.traverse(scene.meshes, root, o_l, d_l, tmin, jnp.minimum(tmax, t_b))
        closer = (mh.prim >= 0) & (mh.t < t_b) & lane_vis
        t_b = jnp.where(closer, mh.t, t_b)
        p_b = jnp.where(closer, prop_idx, p_b)
        u_b = jnp.where(closer, mh.u, u_b)
        v_b = jnp.where(closer, mh.v, v_b)
        prim_b = jnp.where(closer, mh.prim, prim_b)
        return (t_b, p_b, u_b, v_b, prim_b), None

    (t_b, p_b, u_b, v_b, prim_b), _ = jax.lax.scan(
        body, (t_b, p_b, u_b, v_b, prim_b), scene.mesh_props
    )
    return t_b, p_b, u_b, v_b, prim_b


def occluded(scene: SceneData, o, d, tmin, tmax) -> jax.Array:
    """Any-hit visibility query for shadow rays. True = blocked."""

    def body(blocked, prop):
        shape_type, rot, pos, scale, visible = prop
        _, _, _, hit = _intersect_one_prop(o, d, tmin, tmax, shape_type, rot, pos, scale)
        return blocked | (hit & visible), None

    props = (
        scene.prop_shape,
        scene.prop_rot,
        scene.prop_pos,
        scene.prop_scale,
        scene.prop_visible_shadow,
    )
    init = jnp.zeros(o.shape[:-1], bool)
    blocked, _ = jax.lax.scan(body, init, props)

    if scene.meshes is not None:
        from . import trimesh

        def mesh_body(blocked, prop_idx):
            rot = scene.prop_rot[prop_idx]
            pos = scene.prop_pos[prop_idx]
            scale = scene.prop_scale[prop_idx]
            o_l = vm.world_to_object_point(rot, scale, pos, o)
            d_l = vm.world_to_object_vector(rot, scale, d)
            root = jnp.broadcast_to(
                scene.meshes.mesh_root[scene.prop_mesh[prop_idx]], o.shape[:-1]
            )
            root = jnp.where(blocked, -1, root)  # skip already-blocked lanes
            mh = trimesh.traverse(scene.meshes, root, o_l, d_l, tmin, tmax, any_hit=True)
            return blocked | ((mh.prim >= 0) & scene.prop_visible_shadow[prop_idx]), None

        blocked, _ = jax.lax.scan(mesh_body, blocked, scene.mesh_props)
    return blocked


# ---------------------------------------------------------------------------
# Fragment (position + shading frame + uv) for the closest hit
# ---------------------------------------------------------------------------


def build_fragment(scene: SceneData, hit: Hit, o, d) -> Fragment:
    prop = jnp.maximum(hit.prop, 0)
    shape = scene.prop_shape[prop]
    rot = scene.prop_rot[prop]
    pos = scene.prop_pos[prop]
    scale = scene.prop_scale[prop]
    material = scene.prop_material[prop]

    p = o + hit.t[..., None] * d
    r0, r1, r2 = rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]

    # rectangle / disk: n = r2, t = -r0, b = -r1
    rect_n, rect_t, rect_b = r2, -r0, -r1
    rect_uv = jnp.stack([0.5 * (hit.u + 1.0), 0.5 * (hit.v + 1.0)], axis=-1)
    disk_uv = jnp.stack([0.5 * (hit.u + 1.0), 0.5 * (hit.v + 1.0)], axis=-1)

    # sphere
    sph_n = vm.safe_normalize(p - pos)
    xyz = vm.safe_normalize(vm.world_to_object_normal(rot, sph_n))
    phi = -jnp.arctan2(xyz[..., 0], xyz[..., 2]) + jnp.pi
    theta = jnp.arccos(jnp.clip(xyz[..., 1], -1.0, 1.0))
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-5)
    sph_t_local = jnp.stack(
        [sin_theta * jnp.cos(phi), jnp.zeros_like(phi), sin_theta * jnp.sin(phi)], axis=-1
    )
    sph_t = vm.safe_normalize(vm.object_to_world_normal(rot, sph_t_local))
    sph_b = -vm.cross(sph_t, sph_n)
    sph_uv = jnp.stack([phi * (0.5 / jnp.pi), theta * (1.0 / jnp.pi)], axis=-1)

    # cube: face normal from dominant local axis
    local_p = vm.world_to_object_point(rot, scale, pos, p)
    dist_face = 0.5 - jnp.abs(local_p)
    face = jnp.argmin(dist_face, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(local_p, face[..., None], axis=-1))[..., 0]
    face_n = jnp.take_along_axis(rot, face[..., None, None], axis=-2)[..., 0, :]
    cube_n = sign[..., None] * face_n
    cube_t, cube_b = vm.orthonormal_basis(cube_n)
    cube_uv = jnp.zeros_like(rect_uv)

    # infinite shapes: p at RAY_MAX_T*d, n = -d
    inf_p = jnp.float32(RAY_MAX_T) * d
    inf_n = -d
    # canopy uv: equidistant disk mapping of local dir
    ldir = vm.safe_normalize(vm.world_to_object_normal(rot, d))
    # hemisphereToDiskEquidistant (ref base/math/sample_distribution.zig)
    lz = jnp.clip(ldir[..., 2], -1.0, 1.0)
    r_eq = jnp.arccos(lz) * (2.0 / jnp.pi)
    lxy = jnp.sqrt(jnp.maximum(ldir[..., 0] ** 2 + ldir[..., 1] ** 2, 1e-20))
    can_uv = jnp.stack(
        [
            0.5 * (r_eq * ldir[..., 0] / lxy) + 0.5,
            0.5 * (r_eq * ldir[..., 1] / lxy) + 0.5,
        ],
        axis=-1,
    )
    dist_uv = jnp.stack([(hit.u + 1.0) * 0.5, (hit.v + 1.0) * 0.5], axis=-1)
    # dome uv: latlong of local dir
    dome_phi = jnp.arctan2(ldir[..., 0], ldir[..., 2])
    dome_uv = jnp.stack(
        [dome_phi * (0.5 / jnp.pi) + 0.5, jnp.arccos(jnp.clip(ldir[..., 1], -1, 1)) / jnp.pi],
        axis=-1,
    )

    def sel(vals, default):
        out = default
        for st, val in vals.items():
            out = jnp.where((shape == st)[..., None] if out.ndim > shape.ndim else (shape == st), val, out)
        return out

    n = sel(
        {
            int(ShapeType.RECTANGLE): rect_n,
            int(ShapeType.DISK): rect_n,
            int(ShapeType.SPHERE): sph_n,
            int(ShapeType.CUBE): cube_n,
            int(ShapeType.CANOPY): inf_n,
            int(ShapeType.DISTANT): r2,
            int(ShapeType.DOME): inf_n,
        },
        rect_n,
    )
    tangent = sel(
        {
            int(ShapeType.RECTANGLE): rect_t,
            int(ShapeType.DISK): rect_t,
            int(ShapeType.SPHERE): sph_t,
            int(ShapeType.CUBE): cube_t,
            int(ShapeType.CANOPY): r0,
            int(ShapeType.DISTANT): r0,
            int(ShapeType.DOME): r0,
        },
        rect_t,
    )
    bitangent = sel(
        {
            int(ShapeType.RECTANGLE): rect_b,
            int(ShapeType.DISK): rect_b,
            int(ShapeType.SPHERE): sph_b,
            int(ShapeType.CUBE): cube_b,
            int(ShapeType.CANOPY): r1,
            int(ShapeType.DISTANT): r1,
            int(ShapeType.DOME): r1,
        },
        rect_b,
    )
    uv = sel(
        {
            int(ShapeType.RECTANGLE): rect_uv,
            int(ShapeType.DISK): disk_uv,
            int(ShapeType.SPHERE): sph_uv,
            int(ShapeType.CUBE): cube_uv,
            int(ShapeType.CANOPY): can_uv,
            int(ShapeType.DISTANT): dist_uv,
            int(ShapeType.DOME): dome_uv,
        },
        rect_uv,
    )
    is_inf = (
        (shape == int(ShapeType.CANOPY))
        | (shape == int(ShapeType.DISTANT))
        | (shape == int(ShapeType.DOME))
    )
    p = jnp.where(is_inf[..., None], inf_p, p)
    geo_n = n

    if scene.meshes is not None:
        arena = scene.meshes
        pr = jnp.maximum(hit.prim, 0)
        is_mesh = (shape == int(ShapeType.TRIANGLE_MESH)) & (hit.prim >= 0)
        e1 = arena.tri_e1[pr]
        e2 = arena.tri_e2[pr]
        gn_l = vm.safe_normalize(vm.cross(e1, e2))
        w0 = 1.0 - hit.u - hit.v
        tn = arena.tri_n[pr]  # [N,3,3]
        ns_l = (
            w0[..., None] * tn[..., 0, :]
            + hit.u[..., None] * tn[..., 1, :]
            + hit.v[..., None] * tn[..., 2, :]
        )
        # normals transform by rotation only (ref composed_transformation.zig
        # objectToWorldNormal — uniform-scale assumption like the reference)
        gn_w = vm.safe_normalize(vm.object_to_world_normal(rot, gn_l))
        ns_w = vm.safe_normalize(vm.object_to_world_normal(rot, ns_l))
        tuv = arena.tri_uv[pr]
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
