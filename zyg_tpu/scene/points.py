"""Point clouds: sphere particles + threaded BVH (ref shape/point/).

The reference stores motion point clouds (point_motion_data.zig
positionAndRadiusAt lerps between two frame positions) with a dedicated
tree (point_motion_tree.zig). TPU redesign mirrors the curve/triangle
arenas: one packed SoA arena, threaded hit/miss-link traversal, spheres
tested with the stable quadratic. Motion support keeps BOTH shutter
endpoint positions per point and lerps by the lane's time — node AABBs
bound the full interval, so traversal stays conservative at any time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import compact_indices
from .bvh import build_bvh, FlatBVH, LEAF_SIZE


# packed point row: p0(3) r p1(3) pad = 8 floats
_PT_F = 8


class HostPoints(NamedTuple):
    positions: np.ndarray  # [P,3] shutter-open positions
    radii: np.ndarray  # [P] per-point radii
    positions_end: np.ndarray | None = None  # [P,3] shutter-close (motion)
    # frame-sequence clouds (ref point_motion_data.zig + sow particle
    # exporter): the full simulation stack; resolve_motion() samples it to
    # the flat fields above for one frame's shutter span at build time.
    position_frames: np.ndarray | None = None  # [F,P,3]
    radius_frames: np.ndarray | None = None  # [F,P]
    fps: float = 0.0  # simulation frames per second
    start_frame: int = 0


def resolve_motion(cloud: HostPoints, t0: float, t1: float) -> HostPoints:
    """Sample a frame-sequence cloud at a shutter span [t0, t1] seconds.

    ref point_motion_data.zig positionAndRadiusAt: absolute time maps to
    simulation frame i = t * fps - start_frame, positions lerp between the
    bracketing frames. Radii take the shutter-open sample (a zero radius
    is how sparks/rain hide dead particles; ref particle_generator.zig
    out_radius = 0 on spawn/expiry frames)."""
    if cloud.position_frames is None:
        return cloud
    pf = np.asarray(cloud.position_frames, np.float32)
    F = pf.shape[0]

    def sample(t):
        x = t * cloud.fps - cloud.start_frame
        i = int(np.clip(np.floor(x), 0, max(F - 2, 0)))
        frac = np.float32(np.clip(x - i, 0.0, 1.0))
        if F == 1:
            return pf[0], 0
        return (1.0 - frac) * pf[i] + frac * pf[min(i + 1, F - 1)], i

    p0, i0 = sample(t0)
    p1, _ = sample(t1)
    if cloud.radius_frames is not None:
        radii = np.asarray(cloud.radius_frames, np.float32)[i0]
    else:
        radii = cloud.radii
    return HostPoints(
        positions=p0,
        radii=radii,
        positions_end=p1 if t1 > t0 else None,
    )


@jax.tree_util.register_pytree_node_class
class PointArena:
    """Arena arrays + STATIC has_motion flag (pytree aux — it steers
    trace-time control flow, LightTree pattern)."""

    node_rows: jax.Array  # [M,12] same layout as trimesh/curves
    point_rows: jax.Array  # [G, _PT_F*LEAF_SIZE]
    cloud_root: jax.Array  # [K] int32 root per point cloud

    def __init__(self, node_rows, point_rows, cloud_root, has_motion: bool = False):
        self.node_rows = node_rows
        self.point_rows = point_rows
        self.cloud_root = cloud_root
        self.has_motion = bool(has_motion)

    def tree_flatten(self):
        return (self.node_rows, self.point_rows, self.cloud_root), (self.has_motion,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, has_motion=aux[0])

    @property
    def num_clouds(self) -> int:
        return self.cloud_root.shape[0]


def build_arena(clouds: list[HostPoints]) -> PointArena:
    all_rows, all_ptrows = [], []
    roots = []
    node_off = 0
    group_off = 0
    any_motion = any(c.positions_end is not None for c in clouds)

    for cloud in clouds:
        p0 = np.asarray(cloud.positions, np.float32)
        r = np.asarray(cloud.radii, np.float32)
        p1 = (
            np.asarray(cloud.positions_end, np.float32)
            if cloud.positions_end is not None
            else p0
        )
        pmin = np.minimum(p0, p1) - r[:, None]
        pmax = np.maximum(p0, p1) + r[:, None]
        bvh: FlatBVH = build_bvh(pmin, pmax)
        order = bvh.prim_order
        rows10 = np.concatenate(
            [p0[order], r[order, None], p1[order], np.zeros((len(order), 1), np.float32)],
            axis=1,
        ).astype(np.float32)  # [P,8]

        first = bvh.first_prim
        cnt = bvh.prim_count
        leaf_nodes = np.flatnonzero(first >= 0)
        g_first = first[leaf_nodes].astype(np.int64)
        g_cnt = cnt[leaf_nodes].astype(np.int64)
        num_groups = len(leaf_nodes)
        total = int(g_cnt.sum())
        within = np.arange(total) - np.repeat(np.cumsum(g_cnt) - g_cnt, g_cnt)
        src = np.repeat(g_first, g_cnt) + within
        dst = np.repeat(np.arange(num_groups) * LEAF_SIZE, g_cnt) + within

        sp = num_groups * LEAF_SIZE
        prow = np.zeros((sp, _PT_F), np.float32)
        prow[:, 3] = -1.0  # padding: negative radius never hits
        prow[dst] = rows10[src]
        point_rows = prow.reshape(num_groups, LEAF_SIZE * _PT_F)

        m = bvh.nodes_min.shape[0]
        group_of_node = np.full(m, -1.0, np.float32)
        group_of_node[leaf_nodes] = np.arange(num_groups) + group_off
        rows = np.zeros((m, 12), np.float32)
        rows[:, 0:3] = bvh.nodes_min
        rows[:, 3:6] = bvh.nodes_max
        rows[:, 6] = np.where(bvh.hit_link >= 0, bvh.hit_link + node_off, -1)
        rows[:, 7] = np.where(bvh.miss_link >= 0, bvh.miss_link + node_off, -1)
        rows[:, 8] = group_of_node
        rows[:, 9] = cnt

        all_rows.append(rows)
        all_ptrows.append(point_rows)
        roots.append(node_off)
        node_off += m
        group_off += num_groups

    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    return PointArena(
        node_rows=cat(all_rows),
        point_rows=cat(all_ptrows),
        cloud_root=jnp.asarray(np.array(roots, np.int32)),
        has_motion=any_motion,
    )


def tree_flatten_arena(a):  # convenience for tests
    return a


class PointHit(NamedTuple):
    t: jax.Array  # [N]
    prim: jax.Array  # [N] padded arena point index (-1 miss)


def _sphere_test(o, d, c, r, tmin, tmax):
    """Stable ray-sphere: returns (t, hit)."""
    L = c - o
    b = vm.dot(L, d)
    d2 = vm.dot(d, d)
    det = b * b - d2 * (vm.dot(L, L) - r * r)
    ok = (det >= 0.0) & (r > 0.0)
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = (b - sq) / jnp.maximum(d2, 1e-20)
    t1 = (b + sq) / jnp.maximum(d2, 1e-20)
    t = jnp.where((t0 >= tmin) & (t0 <= tmax), t0, t1)
    ok = ok & (t >= tmin) & (t <= tmax)
    return t, ok


class TState(NamedTuple):
    ptr: jax.Array
    t: jax.Array
    prim: jax.Array


# compaction-cascade floor (see trimesh/curves traverse: the while_loop
# pays the slowest lane; wide dispatches stage-compact the live set)
_COMPACT_MIN = 1 << 12


def traverse(arena: PointArena, root, o, d, tmin, tmax, time=None, any_hit: bool = False) -> PointHit:
    """Threaded-BVH traversal over motion spheres (object space).
    Wide dispatches run the live-lane compaction cascade."""
    n = o.shape[:-1]
    root = jnp.asarray(root, jnp.int32)
    tl = jnp.zeros(n, jnp.float32) if time is None else time
    state = TState(
        ptr=root,
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, jnp.int32),
    )
    if len(n) != 1 or n[0] < 4 * _COMPACT_MIN:
        st = _traverse_stage(arena, state, o, d, tl, tmin, any_hit, None)
        return PointHit(t=st.t, prim=st.prim)

    width = n[0]
    res = None
    gmap = None
    o_s, d_s, tl_s = o, d, tl
    st = state
    while True:
        nxt = max(width // 4, _COMPACT_MIN)
        limit = None if width <= _COMPACT_MIN else nxt
        st = _traverse_stage(arena, st, o_s, d_s, tl_s, tmin, any_hit, limit)
        if res is None:
            res = st
        else:
            upd = lambda full, part: full.at[gmap].set(part, mode="drop")
            res = TState(
                ptr=res.ptr, t=upd(res.t, st.t), prim=upd(res.prim, st.prim)
            )
        if limit is None:
            return PointHit(t=res.t, prim=res.prim)
        live = st.ptr >= 0
        if any_hit:
            live = live & (st.prim < 0)
        lidx = compact_indices(live, nxt)
        ls = jnp.minimum(lidx, width - 1)
        valid = lidx < width
        gmap = (ls if gmap is None else gmap[ls])
        gmap = jnp.where(valid, gmap, n[0])
        o_s, d_s, tl_s = o_s[ls], d_s[ls], tl_s[ls]
        st = TState(
            ptr=jnp.where(valid, st.ptr[ls], -1), t=st.t[ls], prim=st.prim[ls]
        )
        width = nxt


def _traverse_stage(
    arena: PointArena, state: TState, o, d, tl, tmin, any_hit, live_limit
) -> TState:
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    def cond(st: TState):
        active = st.ptr >= 0
        if any_hit:
            active = active & (st.prim < 0)
        alive = jnp.sum(active)
        return alive > (0 if live_limit is None else live_limit)

    def body(st: TState):
        ptr = jnp.maximum(st.ptr, 0)
        live = st.ptr >= 0
        if any_hit:
            live = live & (st.prim < 0)
        row = arena.node_rows[ptr]
        nmin = row[..., 0:3]
        nmax = row[..., 3:6]
        t0 = (nmin - o) * inv_d
        t1 = (nmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit_aabb = live & (tn <= tf) & (tf >= tmin) & (tn <= st.t)

        group = row[..., 8].astype(jnp.int32)
        cnt = row[..., 9].astype(jnp.int32)
        is_leaf = group >= 0

        t_b, p_b = st.t, st.prim
        do_prims = hit_aabb & is_leaf
        prow = arena.point_rows[jnp.maximum(group, 0)]
        base = group * LEAF_SIZE
        for j in range(LEAF_SIZE):
            c0 = j * _PT_F
            c = prow[..., c0 : c0 + 3]
            r = prow[..., c0 + 3]
            if arena.has_motion:
                c = c + tl[..., None] * (prow[..., c0 + 4 : c0 + 7] - c)
            tt, h = _sphere_test(o, d, c, r, tmin, t_b)
            h = h & do_prims & (j < cnt)
            t_b = jnp.where(h, tt, t_b)
            p_b = jnp.where(h, base + j, p_b)

        nxt = jnp.where(hit_aabb, row[..., 6], row[..., 7]).astype(jnp.int32)
        nxt = jnp.where(live, nxt, st.ptr)
        nxt = jnp.where(st.ptr < 0, -1, nxt)
        return TState(ptr=nxt, t=t_b, prim=p_b)

    return jax.lax.while_loop(cond, body, state)


def point_center(arena: PointArena, prim, time=None):
    """(center[N,3], radius[N]) of arena point `prim` at `time`."""
    group = prim // LEAF_SIZE
    j = prim % LEAF_SIZE
    row = arena.point_rows[jnp.maximum(group, 0)]
    offs = j[..., None] * _PT_F + jnp.arange(_PT_F)
    pt = jnp.take_along_axis(row, offs, axis=-1)
    c = pt[..., 0:3]
    if arena.has_motion and time is not None:
        c = c + time[..., None] * (pt[..., 4:7] - c)
    return c, pt[..., 3]
