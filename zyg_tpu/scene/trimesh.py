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
    """All meshes of the scene, concatenated."""

    nodes_min: jax.Array  # [M,3]
    nodes_max: jax.Array  # [M,3]
    hit_link: jax.Array  # [M] int32 (arena-global indices)
    miss_link: jax.Array  # [M] int32 (-1 = exit)
    first_prim: jax.Array  # [M] int32 (arena-global; -1 = inner)
    prim_count: jax.Array  # [M] int32
    tri_p0: jax.Array  # [T,3]
    tri_e1: jax.Array  # [T,3]
    tri_e2: jax.Array  # [T,3]
    tri_n: jax.Array  # [T,3,3] vertex normals
    tri_uv: jax.Array  # [T,3,2]
    tri_part: jax.Array  # [T] int32 part index (per-part materials)
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


def build_arena(meshes: list[HostMesh]) -> MeshArena:
    """Build per-mesh BVHs and pack everything into one arena."""
    all_nmin, all_nmax, all_hit, all_miss, all_first, all_cnt = [], [], [], [], [], []
    all_p0, all_e1, all_e2, all_n, all_uv, all_part = [], [], [], [], [], []
    roots = []
    node_off = 0
    prim_off = 0
    max_steps = 16

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

        m = bvh.nodes_min.shape[0]
        all_nmin.append(bvh.nodes_min)
        all_nmax.append(bvh.nodes_max)
        all_hit.append(np.where(bvh.hit_link >= 0, bvh.hit_link + node_off, -1))
        all_miss.append(np.where(bvh.miss_link >= 0, bvh.miss_link + node_off, -1))
        all_first.append(np.where(bvh.first_prim >= 0, bvh.first_prim + prim_off, -1))
        all_cnt.append(bvh.prim_count)
        all_p0.append(p0)
        all_e1.append(e1)
        all_e2.append(e2)
        all_n.append(tn)
        all_uv.append(tuv)
        all_part.append(part)
        roots.append(node_off)
        node_off += m
        prim_off += len(order)
        max_steps = max(max_steps, 2 * m)

    del max_steps
    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    return MeshArena(
        nodes_min=cat(all_nmin),
        nodes_max=cat(all_nmax),
        hit_link=cat(all_hit),
        miss_link=cat(all_miss),
        first_prim=cat(all_first),
        prim_count=cat(all_cnt),
        tri_p0=cat(all_p0),
        tri_e1=cat(all_e1),
        tri_e2=cat(all_e2),
        tri_n=cat(all_n),
        tri_uv=cat(all_uv),
        tri_part=cat(all_part),
        mesh_root=jnp.asarray(np.array(roots, np.int32)),
    )


class MeshHit(NamedTuple):
    t: jax.Array  # [N]
    prim: jax.Array  # [N] arena-global triangle index (-1 miss)
    u: jax.Array  # [N] barycentric
    v: jax.Array  # [N]


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
        nmin = arena.nodes_min[ptr]
        nmax = arena.nodes_max[ptr]
        hit_aabb = live & _slab_test(o, inv_d, nmin, nmax, tmin, s.t)

        first = arena.first_prim[ptr]
        cnt = arena.prim_count[ptr]
        is_leaf = first >= 0

        t_b, p_b, u_b, v_b = s.t, s.prim, s.u, s.v
        do_prims = hit_aabb & is_leaf
        for j in range(LEAF_SIZE):
            pj = jnp.minimum(first + j, arena.tri_p0.shape[0] - 1)
            tt, uu, vvv, h = _tri_test(
                o, d, arena.tri_p0[pj], arena.tri_e1[pj], arena.tri_e2[pj], tmin, t_b
            )
            h = h & do_prims & (j < cnt)
            t_b = jnp.where(h, tt, t_b)
            p_b = jnp.where(h, pj, p_b)
            u_b = jnp.where(h, uu, u_b)
            v_b = jnp.where(h, vvv, v_b)

        nxt = jnp.where(hit_aabb, arena.hit_link[ptr], arena.miss_link[ptr])
        nxt = jnp.where(live, nxt, s.ptr)
        nxt = jnp.where(s.ptr < 0, -1, nxt)
        return TState(ptr=nxt, t=t_b, prim=p_b, u=u_b, v=v_b)

    final = jax.lax.while_loop(cond, body, state)
    return MeshHit(t=final.t, prim=final.prim, u=final.u, v=final.v)


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
