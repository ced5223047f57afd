"""Triangle meshes: device arrays + stackless wavefront BVH traversal.

ref: src/core/scene/shape/triangle/ (triangle_tree.zig stack traversal,
triangle.zig intersection). TPU redesign: all meshes live concatenated in one
SoA arena (nodes + triangles); traversal is a threaded hit/miss-link pointer
walk per lane inside ``lax.while_loop`` — no per-lane stack, uniform control
flow. Leaves hold <= 4 triangles tested with a static unroll.

Triangle test: Möller-Trumbore on precomputed (p0, e1, e2) — same math the
reference uses (triangle.zig), vectorized over lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from .bvh import build_bvh, FlatBVH, LEAF_SIZE


class MeshArena(NamedTuple):
    """All meshes of the scene, concatenated.

    TPU layout rule: ONE per-lane gather on v5e costs ~3.2ns/lane regardless
    of row width (measured up to 16 f32) — so everything a traversal step
    needs is packed into a single row:

    - node_rows[M, 12]: min(3), max(3), hit_link, miss_link, leaf_group,
      prim_count, pad, pad — links/indices stored as float32 (exact < 2^24).
      leaf_group = -1 for inner nodes; leaf triangles live at
      [group*LEAF_SIZE, group*LEAF_SIZE + count) of the PADDED tri arrays.
    - tri_rows[G, 36]: a whole leaf's LEAF_SIZE triangles as
      (p0, e1, e2) x LEAF_SIZE; padding triangles are degenerate (e1=e2=0,
      Moller det == 0 -> never hit).

    The per-triangle shading arrays (normals/uv/part) are indexed by the
    padded arena triangle id a hit reports (group*LEAF_SIZE + j).
    """

    node_rows: jax.Array  # [M,12] float32 (see above)
    tri_rows: jax.Array  # [G, 9*LEAF_SIZE] float32
    tri_p0: jax.Array  # [Tp,3] (padded)
    tri_e1: jax.Array  # [Tp,3]
    tri_e2: jax.Array  # [Tp,3]
    tri_n: jax.Array  # [Tp,3,3] vertex normals
    tri_uv: jax.Array  # [Tp,3,2]
    tri_part: jax.Array  # [Tp] int32 part index (per-part materials)
    mesh_root: jax.Array  # [K] int32 root node per mesh

    @property
    def num_meshes(self) -> int:
        return self.mesh_root.shape[0]


class HostMesh(NamedTuple):
    """Host-side mesh description before arena packing."""

    positions: np.ndarray  # [V,3]
    indices: np.ndarray  # [F,3]
    normals: np.ndarray | None = None  # [V,3]
    uvs: np.ndarray | None = None  # [V,2]
    parts: np.ndarray | None = None  # [F] part id


def build_arena(meshes: list[HostMesh], return_host_info: bool = False):
    """Build per-mesh BVHs and pack everything into one arena.

    With return_host_info, also returns a per-mesh list of dicts:
    - "order": the BVH leaf-order primitive permutation (prim_order)
    - "arena_ids": the PADDED arena triangle id of each leaf-order position
      (what a traversal hit reports) — used by the emissive-mesh light CDFs.
    """
    all_rows, all_trirows = [], []
    all_p0, all_e1, all_e2, all_n, all_uv, all_part = [], [], [], [], [], []
    roots = []
    host_info = []
    node_off = 0
    group_off = 0

    for mesh in meshes:
        pos = np.asarray(mesh.positions, np.float32)
        idx = np.asarray(mesh.indices, np.int32)
        v0 = pos[idx[:, 0]]
        v1 = pos[idx[:, 1]]
        v2 = pos[idx[:, 2]]
        pmin = np.minimum(np.minimum(v0, v1), v2)
        pmax = np.maximum(np.maximum(v0, v1), v2)
        bvh: FlatBVH = build_bvh(pmin, pmax)

        order = bvh.prim_order
        p0 = v0[order]
        e1 = v1[order] - p0
        e2 = v2[order] - p0

        if mesh.normals is not None:
            nrm = np.asarray(mesh.normals, np.float32)
            tn = np.stack([nrm[idx[order, k]] for k in range(3)], axis=1)
        else:
            gn = np.cross(e1, e2)
            gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
            tn = np.repeat(gn[:, None, :], 3, axis=1)
        if mesh.uvs is not None:
            uv = np.asarray(mesh.uvs, np.float32)
            tuv = np.stack([uv[idx[order, k]] for k in range(3)], axis=1)
        else:
            tuv = np.zeros((len(order), 3, 2), np.float32)
        part = (
            np.asarray(mesh.parts, np.int32)[order]
            if mesh.parts is not None
            else np.zeros(len(order), np.int32)
        )

        # --- pad leaves to LEAF_SIZE-aligned triangle groups (vectorized)
        first = bvh.first_prim
        cnt = bvh.prim_count
        leaf_nodes = np.flatnonzero(first >= 0)
        g_first = first[leaf_nodes].astype(np.int64)
        g_cnt = cnt[leaf_nodes].astype(np.int64)
        num_groups = len(leaf_nodes)
        total = int(g_cnt.sum())
        # src: leaf-order positions; dst: padded positions
        within = np.arange(total) - np.repeat(np.cumsum(g_cnt) - g_cnt, g_cnt)
        src = np.repeat(g_first, g_cnt) + within
        dst = np.repeat(np.arange(num_groups) * LEAF_SIZE, g_cnt) + within

        tp = num_groups * LEAF_SIZE
        pp0 = np.zeros((tp, 3), np.float32)
        pe1 = np.zeros((tp, 3), np.float32)
        pe2 = np.zeros((tp, 3), np.float32)
        pn = np.zeros((tp, 3, 3), np.float32)
        puv = np.zeros((tp, 3, 2), np.float32)
        ppart = np.zeros(tp, np.int32)
        pp0[dst] = p0[src]
        pe1[dst] = e1[src]
        pe2[dst] = e2[src]
        pn[dst] = tn[src]
        puv[dst] = tuv[src]
        ppart[dst] = part[src]

        tri_rows = np.concatenate(
            [pp0.reshape(num_groups, -1, 3), pe1.reshape(num_groups, -1, 3),
             pe2.reshape(num_groups, -1, 3)],
            axis=2,  # [G, LEAF_SIZE, 9] -> interleave (p0,e1,e2) per tri
        ).reshape(num_groups, LEAF_SIZE * 9)

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

        # arena tri id per leaf-order position (for light CDFs)
        arena_ids = np.empty(total, np.int64)
        arena_ids[src] = dst + group_off * LEAF_SIZE
        host_info.append({"order": order, "arena_ids": arena_ids.astype(np.int32)})

        all_rows.append(rows)
        all_trirows.append(tri_rows)
        all_p0.append(pp0)
        all_e1.append(pe1)
        all_e2.append(pe2)
        all_n.append(pn)
        all_uv.append(puv)
        all_part.append(ppart)
        roots.append(node_off)
        node_off += m
        group_off += num_groups

    host_nodes = np.concatenate(all_rows, axis=0)
    host_roots = np.array(roots, np.int32)
    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    arena = MeshArena(
        node_rows=jnp.asarray(host_nodes),
        tri_rows=cat(all_trirows),
        tri_p0=cat(all_p0),
        tri_e1=cat(all_e1),
        tri_e2=cat(all_e2),
        tri_n=cat(all_n),
        tri_uv=cat(all_uv),
        tri_part=cat(all_part),
        mesh_root=jnp.asarray(host_roots),
    )
    if return_host_info:
        # host copies of the node arena ride along so build_tlas never has
        # to pull them back from the device (a 14 MB fetch over the axon
        # tunnel measured ~75 s; host numpy is free)
        return arena, host_info, {"node_rows": host_nodes, "mesh_root": host_roots}
    return arena


class MeshHit(NamedTuple):
    t: jax.Array  # [N]
    prim: jax.Array  # [N] arena-global triangle index (-1 miss)
    u: jax.Array  # [N] barycentric
    v: jax.Array  # [N]


class Tlas(NamedTuple):
    """Scene TLAS over mesh instances, appended to the mesh node arena.

    ref: src/core/scene/prop/prop_tree.zig (2-wide prop BVH). TPU redesign:
    the TLAS rows live in the SAME [*,12] row arena as the mesh BLAS nodes,
    so the two-level walk is ONE threaded pointer walk per lane:

    - TLAS inner/leaf rows use the standard node layout (min,max,hit,miss,
      -1,count,pad,pad); a TLAS *leaf*'s hit_link points at a TRANSFORM row.
    - Transform rows live at indices >= trafo_base (classified by index, no
      flag bits) and pack the whole instance entry in 12 floats:
        [qx,qy,qz, px,py,pz, sx,sy,sz, root_enc, resume, prop_enc]
      quat w = sqrt(1-|xyz|^2) (canonical w>=0); root_enc = BLAS root, or
      -(root+2) for animated instances (then row+1 holds the shutter-end
      keyframe [qx,qy,qz, px,py,pz, sx,sy,sz, 0,0,0] — rigid motion per
      ref scene/space.zig keyframes). resume = where the walk continues
      after the instance's BLAS is exhausted. prop_enc = prop + 1024 *
      (vis_camera | vis_reflection<<1 | vis_shadow<<2).

    On entering an instance the lane's active ray switches to object space
    (world ray restored at resume). One level of instancing only (the ref's
    nested Instancer sub-scenes are flattened by the loader).
    """

    node_rows: jax.Array  # [M+T,12] mesh BLAS rows ++ TLAS/transform rows
    root: jax.Array  # int32 scalar: TLAS root row
    # STATIC metadata rides the dict KEY: (trafo_base, has_animated)
    meta: dict


def build_tlas(arena: MeshArena, instances: list[dict], host=None) -> Tlas:
    """Build the TLAS rows over mesh instances and append to the arena rows.

    instances: per mesh prop a dict with keys
      prop (int), mesh (int), rot [3,3], pos [3], scale [3],
      vis (3 bools: camera, reflection, shadow),
      and optionally rot1/pos1/scale1 for shutter-end (animated).
    host: optional {"node_rows", "mesh_root"} numpy copies from build_arena
      (avoids pulling the arena back from the device).
    """
    if host is not None:
        node_rows = host["node_rows"]
        mesh_root = host["mesh_root"]
    else:
        node_rows = np.asarray(arena.node_rows)
        mesh_root = np.asarray(arena.mesh_root)
    m0 = node_rows.shape[0]

    # world AABB per instance: transform the BLAS root AABB's 8 corners
    # (animated: union over sampled shutter times — conservative for slerp)
    inst_min = np.empty((len(instances), 3), np.float32)
    inst_max = np.empty((len(instances), 3), np.float32)
    for i, ins in enumerate(instances):
        root = int(mesh_root[ins["mesh"]])
        bmin = node_rows[root, 0:3]
        bmax = node_rows[root, 3:6]
        corners = np.array(
            [[bmin[k] if (j >> k) & 1 == 0 else bmax[k] for k in range(3)]
             for j in range(8)], np.float64)
        keys = [(ins["rot"], ins["pos"], ins["scale"])]
        if "rot1" in ins:
            q0 = _np_quat(ins["rot"])
            q1 = _np_quat(ins["rot1"])
            if np.dot(q0, q1) < 0.0:
                q1 = -q1
            for t in (0.25, 0.5, 0.75, 1.0):
                q = q0 * (1 - t) + q1 * t
                q /= np.linalg.norm(q)
                keys.append((
                    _np_quat_to_mat(q),
                    np.asarray(ins["pos"]) * (1 - t) + np.asarray(ins["pos1"]) * t,
                    np.asarray(ins["scale"]) * (1 - t) + np.asarray(ins["scale1"]) * t,
                ))
        wmin = np.full(3, np.inf)
        wmax = np.full(3, -np.inf)
        for rot, pos, scale in keys:
            rot = np.asarray(rot, np.float64)
            w = (corners * np.asarray(scale, np.float64)) @ rot + np.asarray(pos, np.float64)
            wmin = np.minimum(wmin, w.min(axis=0))
            wmax = np.maximum(wmax, w.max(axis=0))
        if "rot1" in ins:  # slerp path can bulge slightly beyond samples
            c = 0.5 * (wmin + wmax)
            wmin = c + (wmin - c) * 1.05
            wmax = c + (wmax - c) * 1.05
        inst_min[i] = wmin
        inst_max[i] = wmax

    bvh = build_bvh(inst_min, inst_max, leaf_size=1)
    tl = bvh.nodes_min.shape[0]
    has_anim = any("rot1" in ins for ins in instances)

    # transform rows: one per instance (+1 for animated); laid out after the
    # TLAS rows so trafo_base classifies them by index alone
    trafo_base = m0 + tl
    trafo_rows = []
    trafo_of_inst = {}
    for i in np.asarray(bvh.prim_order):  # leaf order
        ins = instances[int(i)]
        trafo_of_inst[int(i)] = trafo_base + len(trafo_rows)
        q = _np_quat(ins["rot"])
        anim = "rot1" in ins
        root = float(mesh_root[ins["mesh"]])
        vis = ins.get("vis", (True, True, True))
        prop_enc = float(ins["prop"]) + 1024.0 * (
            (1 if vis[0] else 0) + (2 if vis[1] else 0) + (4 if vis[2] else 0)
        )
        row = np.zeros(12, np.float32)
        row[0:3] = q[0:3]
        row[3:6] = ins["pos"]
        row[6:9] = ins["scale"]
        row[9] = -(root + 2.0) if anim else root
        row[10] = -1.0  # resume patched below
        row[11] = prop_enc
        trafo_rows.append(row)
        if anim:
            # both endpoints store canonical w >= 0 quats; the device slerp
            # (vm.quat_slerp) flips internally for the shortest arc
            q1 = _np_quat(ins["rot1"])
            row2 = np.zeros(12, np.float32)
            row2[0:3] = q1[0:3]
            row2[3:6] = ins["pos1"]
            row2[6:9] = ins["scale1"]
            trafo_rows.append(row2)

    # TLAS rows in the standard layout; leaves redirect to transform rows
    rows = np.zeros((tl, 12), np.float32)
    rows[:, 0:3] = bvh.nodes_min
    rows[:, 3:6] = bvh.nodes_max
    rows[:, 8] = -1.0
    miss = np.where(bvh.miss_link >= 0, bvh.miss_link + m0, -1)
    hit = np.where(bvh.hit_link >= 0, bvh.hit_link + m0, -1)
    for ni in range(tl):
        if bvh.first_prim[ni] >= 0:  # leaf: exactly one instance
            inst = int(bvh.prim_order[bvh.first_prim[ni]])
            trow = trafo_of_inst[inst]
            hit[ni] = trow
            # the instance's BLAS resumes at this leaf's miss link
            trafo_rows[trow - trafo_base][10] = miss[ni]
    rows[:, 6] = hit
    rows[:, 7] = miss

    all_rows = np.concatenate([node_rows, rows, np.stack(trafo_rows)], axis=0)
    return Tlas(
        node_rows=jnp.asarray(all_rows),
        root=jnp.int32(m0),
        meta={(trafo_base, has_anim): True},
    )


def _np_quat(rot) -> np.ndarray:
    """Rotation rows -> quaternion (x,y,z,w), canonical w >= 0."""
    m = np.asarray(rot, np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                      (m[1, 0] - m[0, 1]) / s, 0.25 * s])
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = np.array([0.25 * s, (m[0, 1] + m[1, 0]) / s,
                      (m[0, 2] + m[2, 0]) / s, (m[2, 1] - m[1, 2]) / s])
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = np.array([(m[0, 1] + m[1, 0]) / s, 0.25 * s,
                      (m[1, 2] + m[2, 1]) / s, (m[0, 2] - m[2, 0]) / s])
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = np.array([(m[0, 2] + m[2, 0]) / s, (m[1, 2] + m[2, 1]) / s,
                      0.25 * s, (m[1, 0] - m[0, 1]) / s])
    if q[3] < 0.0:
        q = -q
    return q.astype(np.float32)


def _np_quat_to_mat(q) -> np.ndarray:
    x, y, z, w = q
    d = 2.0
    return np.array([
        [1 - d * (y * y + z * z), d * (x * y - w * z), d * (x * z + w * y)],
        [d * (x * y + w * z), 1 - d * (x * x + z * z), d * (y * z - w * x)],
        [d * (x * z - w * y), d * (y * z + w * x), 1 - d * (x * x + y * y)],
    ], np.float64)


def _slab_test(o, inv_d, nmin, nmax, tmin, tmax):
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf >= tmin) & (tn <= tmax)


def _tri_test(o, d, p0, e1, e2, tmin, tmax):
    """Möller-Trumbore. Returns (t, u, v, hit)."""
    pvec = vm.cross(d, e2)
    det = vm.dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = o - p0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= tmin) & (t <= tmax) & (jnp.abs(det) > 1e-12)
    return t, u, v, hit


def traverse(arena: MeshArena, root, o, d, tmin, tmax, any_hit: bool = False) -> MeshHit:
    """Threaded-BVH closest-hit traversal, vectorized over lanes.

    root: int32[N] per-lane root node (mesh instance). o/d in object space;
    t values stay in the caller's parameter units.

    Per step: exactly TWO per-lane gathers — the packed node row and (for
    leaves) the packed triangle-group row. On v5e a gather costs ~3.2ns/lane
    independent of row width, so packing is a ~9x reduction vs per-field
    gathers (the reference's pointer-chasing layout, triangle_tree.zig:46).
    """
    n = o.shape[:-1]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    class TState(NamedTuple):
        ptr: jax.Array
        t: jax.Array
        prim: jax.Array
        u: jax.Array
        v: jax.Array

    state = TState(
        ptr=root,
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, jnp.int32),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
    )

    def cond(s: TState):
        active = s.ptr >= 0
        if any_hit:
            active = active & (s.prim < 0)
        return jnp.any(active)

    def body(s: TState):
        ptr = jnp.maximum(s.ptr, 0)
        live = s.ptr >= 0
        if any_hit:
            live = live & (s.prim < 0)
        row = arena.node_rows[ptr]  # gather 1: the whole node
        nmin = row[..., 0:3]
        nmax = row[..., 3:6]
        hit_aabb = live & _slab_test(o, inv_d, nmin, nmax, tmin, s.t)

        group = row[..., 8].astype(jnp.int32)
        cnt = row[..., 9].astype(jnp.int32)
        is_leaf = group >= 0

        t_b, p_b, u_b, v_b = s.t, s.prim, s.u, s.v
        do_prims = hit_aabb & is_leaf
        trow = arena.tri_rows[jnp.maximum(group, 0)]  # gather 2: 4 triangles
        base = group * LEAF_SIZE
        for j in range(LEAF_SIZE):
            c = j * 9
            tt, uu, vvv, h = _tri_test(
                o, d, trow[..., c : c + 3], trow[..., c + 3 : c + 6],
                trow[..., c + 6 : c + 9], tmin, t_b,
            )
            h = h & do_prims & (j < cnt)
            t_b = jnp.where(h, tt, t_b)
            p_b = jnp.where(h, base + j, p_b)
            u_b = jnp.where(h, uu, u_b)
            v_b = jnp.where(h, vvv, v_b)

        nxt = jnp.where(hit_aabb, row[..., 6], row[..., 7]).astype(jnp.int32)
        nxt = jnp.where(live, nxt, s.ptr)
        nxt = jnp.where(s.ptr < 0, -1, nxt)
        return TState(ptr=nxt, t=t_b, prim=p_b, u=u_b, v=v_b)

    final = jax.lax.while_loop(cond, body, state)
    return MeshHit(t=final.t, prim=final.prim, u=final.u, v=final.v)


class TlasHit(NamedTuple):
    t: jax.Array  # [N] world-parameter distance
    prim: jax.Array  # [N] arena-global triangle index (-1 miss)
    u: jax.Array  # [N]
    v: jax.Array  # [N]
    prop: jax.Array  # int32[N] prop index of the hit instance (-1 miss)


def traverse_tlas(
    arena: MeshArena,
    tlas: Tlas,
    o,
    d,
    tmin,
    tmax,
    ray_class: str = "reflection",
    primary=None,
    time=None,
    any_hit: bool = False,
) -> TlasHit:
    """Two-level (TLAS -> BLAS) closest-hit walk, vectorized over lanes.

    ONE threaded pointer walk: TLAS rows, transform rows and BLAS rows live
    in the same arena (see Tlas). World rays slab-test TLAS rows; entering
    an instance (transform row) switches the lane's active ray to object
    space; exhausting a BLAS restores the world ray at the stored resume
    row. Replaces the per-instance `lax.scan` (O(instances) BLAS walks per
    ray, ref prop_tree.zig:22 does this with a node stack instead).

    t stays in world-parameter units throughout (object rays keep the
    scale in d, ref composed_transformation.zig worldToObject*).
    """
    from ..core import vecmath as vm

    (trafo_base, has_anim), = tlas.meta.keys()
    rows = tlas.node_rows
    n = o.shape[:-1]
    vis_bit = {"camera": 1, "reflection": 2, "shadow": 4}[ray_class]
    tl = jnp.zeros(n, jnp.float32) if time is None else time

    def inv_dir(dd):
        return 1.0 / jnp.where(
            jnp.abs(dd) < 1e-20, jnp.where(dd < 0, -1e-20, 1e-20), dd
        )

    inv_w = inv_dir(d)

    class S(NamedTuple):
        ptr: jax.Array
        resume: jax.Array  # -1 = walking in world space (TLAS)
        o_act: jax.Array
        d_act: jax.Array
        inv_act: jax.Array
        prop_cur: jax.Array
        t: jax.Array
        prim: jax.Array
        u: jax.Array
        v: jax.Array
        prop: jax.Array

    state = S(
        ptr=jnp.broadcast_to(tlas.root, n).astype(jnp.int32),
        resume=jnp.full(n, -1, jnp.int32),
        o_act=o,
        d_act=d,
        inv_act=inv_w,
        prop_cur=jnp.full(n, -1, jnp.int32),
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, jnp.int32),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        prop=jnp.full(n, -1, jnp.int32),
    )

    def cond(s: S):
        active = s.ptr >= 0
        if any_hit:
            active = active & (s.prim < 0)
        return jnp.any(active)

    def body(s: S):
        ptr = jnp.maximum(s.ptr, 0)
        live = s.ptr >= 0
        if any_hit:
            live = live & (s.prim < 0)
        row = rows[ptr]
        is_trafo = live & (ptr >= trafo_base)

        # ---- standard node rows (TLAS inner/leaf + BLAS)
        nmin = row[..., 0:3]
        nmax = row[..., 3:6]
        hit_aabb = (
            live & ~is_trafo
            & _slab_test(s.o_act, s.inv_act, nmin, nmax, tmin, s.t)
        )
        group = row[..., 8].astype(jnp.int32)
        cnt = row[..., 9].astype(jnp.int32)
        is_leaf = group >= 0

        t_b, p_b, u_b, v_b, pr_b = s.t, s.prim, s.u, s.v, s.prop
        do_prims = hit_aabb & is_leaf
        trow = arena.tri_rows[jnp.clip(group, 0, arena.tri_rows.shape[0] - 1)]
        base = group * LEAF_SIZE
        for j in range(LEAF_SIZE):
            c = j * 9
            tt, uu, vvv, h = _tri_test(
                s.o_act, s.d_act, trow[..., c : c + 3],
                trow[..., c + 3 : c + 6], trow[..., c + 6 : c + 9], tmin, t_b,
            )
            h = h & do_prims & (j < cnt)
            t_b = jnp.where(h, tt, t_b)
            p_b = jnp.where(h, base + j, p_b)
            u_b = jnp.where(h, uu, u_b)
            v_b = jnp.where(h, vvv, v_b)
            pr_b = jnp.where(h, s.prop_cur, pr_b)
        nxt_node = jnp.where(hit_aabb, row[..., 6], row[..., 7]).astype(jnp.int32)

        # ---- transform rows: enter the instance (or skip if invisible)
        prop_enc = row[..., 11]
        vbits = jnp.floor(prop_enc / 1024.0).astype(jnp.int32)
        prop_id = (prop_enc - vbits.astype(jnp.float32) * 1024.0).astype(jnp.int32)
        visible = (vbits & int(vis_bit)) > 0
        if primary is not None:
            # primary lanes use camera visibility (ref prop.zig Properties)
            visible = jnp.where(primary, (vbits & 1) > 0, visible)
        root_enc = row[..., 9]
        anim = root_enc < 0.0
        root = jnp.where(anim, -root_enc - 2.0, root_enc).astype(jnp.int32)
        resume_new = row[..., 10].astype(jnp.int32)

        qxyz = row[..., 0:3]
        pos = row[..., 3:6]
        scale = row[..., 6:9]
        if has_anim:
            row2 = rows[jnp.clip(ptr + anim.astype(jnp.int32), 0, rows.shape[0] - 1)]
            w0 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(qxyz * qxyz, axis=-1), 0.0))
            q0 = jnp.concatenate([qxyz, w0[..., None]], axis=-1)
            q1xyz = row2[..., 0:3]
            w1 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(q1xyz * q1xyz, axis=-1), 0.0))
            q1 = jnp.concatenate([q1xyz, w1[..., None]], axis=-1)
            tt1 = jnp.where(anim, tl, 0.0)[..., None]
            q = vm.quat_slerp(q0, q1, tt1)
            pos = jnp.where(anim[..., None], vm.lerp(pos, row2[..., 3:6], tt1), pos)
            scale = jnp.where(anim[..., None], vm.lerp(scale, row2[..., 6:9], tt1), scale)
            rot = vm.quat_to_mat3(q)
        else:
            w0 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(qxyz * qxyz, axis=-1), 0.0))
            rot = vm.quat_to_mat3(jnp.concatenate([qxyz, w0[..., None]], axis=-1))
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)

        enter = is_trafo & visible
        ptr_next = jnp.where(
            is_trafo, jnp.where(visible, root, resume_new), nxt_node
        )
        em = enter[..., None]
        o_act = jnp.where(em, o_l, s.o_act)
        d_act = jnp.where(em, d_l, s.d_act)
        inv_act = jnp.where(em, inv_dir(d_l), s.inv_act)
        resume = jnp.where(enter, resume_new, s.resume)
        prop_cur = jnp.where(enter, prop_id, s.prop_cur)

        # ---- BLAS exhausted: restore the world ray, continue at resume
        exit_blas = live & (ptr_next < 0) & (resume >= 0) & ~enter
        xm = exit_blas[..., None]
        o_act = jnp.where(xm, o, o_act)
        d_act = jnp.where(xm, d, d_act)
        inv_act = jnp.where(xm, inv_w, inv_act)
        ptr_next = jnp.where(exit_blas, resume, ptr_next)
        resume = jnp.where(exit_blas, -1, resume)

        ptr_next = jnp.where(live, ptr_next, s.ptr)
        return S(
            ptr=ptr_next, resume=resume, o_act=o_act, d_act=d_act,
            inv_act=inv_act, prop_cur=prop_cur,
            t=t_b, prim=p_b, u=u_b, v=v_b, prop=pr_b,
        )

    final = jax.lax.while_loop(cond, body, state)
    return TlasHit(t=final.t, prim=final.prim, u=final.u, v=final.v, prop=final.prop)


# ---------------------------------------------------------------------------
# procedural meshes for tests/examples
# ---------------------------------------------------------------------------


def make_cube_mesh() -> HostMesh:
    """Unit cube [-0.5, 0.5]^3, 12 triangles, outward normals."""
    v = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
        np.float32,
    )
    faces = []
    # idx = x*4 + y*2 + z
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    return HostMesh(positions=v, indices=np.array(faces, np.int32))


def make_trefoil_mesh(n_seg: int = 512, n_ring: int = 256, tube_r: float = 0.35, bumps: float = 0.12) -> HostMesh:
    """Dragon-class procedural stressor: a trefoil-knot tube with a bumpy
    displacement (2*n_seg*n_ring triangles; 512x256 ~ 262k tris, 1024x512 ~
    1M). Irregular curvature + self-proximity exercise the BVH like a
    scanned hero asset (BASELINE.md config 3)."""
    t = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    # trefoil centerline
    cx = np.sin(t) + 2.0 * np.sin(2 * t)
    cy = np.cos(t) - 2.0 * np.cos(2 * t)
    cz = -np.sin(3 * t)
    c = np.stack([cx, cy, cz], -1)
    # frame via finite differences
    tang = np.roll(c, -1, axis=0) - np.roll(c, 1, axis=0)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    ref = np.array([0.0, 0.0, 1.0])
    n1 = np.cross(tang, ref)
    bad = np.linalg.norm(n1, axis=-1) < 1e-6
    n1[bad] = np.cross(tang[bad], np.array([1.0, 0.0, 0.0]))
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = np.cross(tang, n1)

    ph = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    cosp, sinp = np.cos(ph), np.sin(ph)
    # displaced radius: high-frequency bumps along both parameters
    T, P = np.meshgrid(t, ph, indexing="ij")
    r = tube_r * (1.0 + bumps * np.sin(9 * T) * np.cos(7 * P) + 0.5 * bumps * np.sin(23 * T + 3 * P))
    pos = (
        c[:, None, :]
        + (r * cosp[None, :])[..., None] * n1[:, None, :]
        + (r * sinp[None, :])[..., None] * n2[:, None, :]
    ).reshape(-1, 3).astype(np.float32)
    uv = np.stack([T / (2 * np.pi), P / (2 * np.pi)], -1).reshape(-1, 2).astype(np.float32)

    def vid(i, j):
        return (i % n_seg) * n_ring + (j % n_ring)

    i = np.arange(n_seg)[:, None]
    j = np.arange(n_ring)[None, :]
    a = vid(i, j)
    b = vid(i + 1, j)
    cc = vid(i + 1, j + 1)
    dd = vid(i, j + 1)
    # winding: (tube, ring) edge order crosses inward — swap for outward
    faces = np.concatenate(
        [np.stack([a, cc, b], -1).reshape(-1, 3), np.stack([a, dd, cc], -1).reshape(-1, 3)]
    ).astype(np.int32)
    # smooth vertex normals by area-weighted face accumulation
    v0, v1, v2 = pos[faces[:, 0]], pos[faces[:, 1]], pos[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    nrm = np.zeros_like(pos)
    for k in range(3):
        np.add.at(nrm, faces[:, k], fn)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    return HostMesh(positions=pos, indices=faces, normals=nrm.astype(np.float32), uvs=uv)


def make_sphere_mesh(n_theta: int = 32, n_phi: int = 64, radius: float = 0.5) -> HostMesh:
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(TH) * np.cos(PH)
    y = np.cos(TH)
    z = np.sin(TH) * np.sin(PH)
    pos = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    nrm = pos.copy()
    pos = pos * radius
    uv = np.stack([PH / (2 * np.pi), TH / np.pi], -1).reshape(-1, 2).astype(np.float32)

    def vid(i, j):
        return i * n_phi + (j % n_phi)

    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                faces.append((a, b, c))
            if i < n_theta - 1:
                faces.append((a, c, d))
    return HostMesh(
        positions=pos, indices=np.array(faces, np.int32), normals=nrm, uvs=uv
    )
