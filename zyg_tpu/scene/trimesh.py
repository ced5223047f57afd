"""Triangle meshes: 8-wide BVH arena + continuation-stack wavefront traversal.

ref: src/core/scene/shape/triangle/ (triangle_tree.zig stack traversal,
triangle.zig intersection) and src/core/scene/prop/prop_tree.zig (the scene
prop BVH over instances).

TPU redesign (v2, measured on v5e):

- Per-lane random gathers cost ~1.8ns/ELEMENT at 12-float rows but fall
  ~50x to ~0.04ns/element at 96-float rows — per-lane overhead dominates
  narrow rows. So the binary threaded walk (hundreds of 12-float gather
  steps) is the worst possible shape; the v2 layout is an 8-WIDE BVH with
  16-triangle leaves: one 64-float node row slab-tests 8 children, one
  144-float leaf row Möller-tests 16 triangles. Typical visited rows per
  ray: tens, not hundreds.
- Traversal keeps a CONTINUATION stack: one int32 per level encoding
  (wide_node * 8 + next_child_rank). Pushes/pops are single one-hot writes,
  stack depth = tree depth (static per arena), and pruning against the
  current best t is exact because ranks re-slab the node on resume.
- Instances: no pointer-linked TLAS. A dense [chunk, N] slab pass over ALL
  instance world AABBs (broadcast, zero gathers) picks each lane's nearest
  unvisited instance; a round loop walks instances strictly in (t_entry,
  index) order until none beats the lane's best hit. Rounds ~= overlap
  depth along the ray (1-2 in practice), correctness does not depend on a
  fixed candidate budget.

Triangle test: Möller-Trumbore on precomputed (p0, e1, e2) — same math the
reference uses (triangle.zig), vectorized over lanes x 16 leaf triangles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import compact_indices, small_gather
from .bvh import build_bvh, FlatBVH

LEAF_SIZE = 12  # triangles per leaf row (padded; degenerate pads never
# hit). 12 tris = 108-float rows (432B) duck the >512B gather-latency
# cliff (measured 13.98 vs 11.67 ns/lane); trefoil 1M-ray sweep: L=16
# 2.72/3.11, L=14 2.92/3.26, L=12 2.96/3.28, L=8 2.97/3.15 Mrays/s
# (coherent/incoherent)
COLLAPSE_GRAN = 4  # binary-BVH leaf size BEFORE the wide collapse. The
# wide collapse (not the binary build) forms the LEAF_SIZE-triangle leaf
# groups: building binary leaves at the row size (12) let subtrees go
# unexpandable early and left wide nodes ~3.7/8 full (20.9k nodes for
# 57k groups on the bench trefoil); fine-grained binary leaves + leaf
# formation at collapse time fill the slots (Ylitie-style).
BRANCH = 8  # wide-BVH branching factor (power of two)
_MISS_KEY = jnp.int32(0x7F800000)  # +inf bit pattern: sorts after any hit


def _row_floats(branch: int) -> int:
    """Node-row float count: 6*B box planes + B child refs, padded to 8*B.
    Layout: [0:B]=min.x [B:2B]=min.y [2B:3B]=min.z [3B:4B]=max.x
    [4B:5B]=max.y [5B:6B]=max.z [6B:7B]=refs [7B:8B]=pad."""
    return 8 * branch


class MeshArena(NamedTuple):
    """All meshes of the scene, concatenated.

    - node_rows[W, 8*BRANCH]: one BRANCH-wide node per row, structure-of-
      arrays within the row so the slab test runs on [N, B] column slices
      directly (layout per _row_floats). Child ref (stored float32, exact
      < 2^24): >= 0 -> wide node index; <= -2 -> leaf triangle group
      -(ref+2); -1 -> empty slot.
    - tri_rows[G, 9*LEAF_SIZE]: a whole leaf's LEAF_SIZE triangles as
      (p0, e1, e2) per tri; padding triangles are degenerate (e1=e2=0,
      Möller det == 0 -> never hit).

    The per-triangle shading arrays (normals/uv/part) are indexed by the
    padded arena triangle id a hit reports (group*LEAF_SIZE + j).
    """

    node_rows: jax.Array  # [W, 64] float32 (see above)
    tri_rows: jax.Array  # [G, 9*LEAF_SIZE] float32
    # Per-triangle shading attributes packed into ONE 80-byte row so a
    # fragment build is a single per-lane gather. Separate p0/e1/e2/n/uv
    # arrays cost one ~11.7 ns/lane gather EACH (the table has >= 2^15
    # rows — the slow-gather regime, probe_rowsize2); at 921k lanes the
    # old 4-gather fragment build measured ~43 ms per wavefront
    # iteration, the packed row ~11 ms. Layout:
    #   [0:3] p0  [3:6] e1  [6:9] e2  [9:12] oct-snorm16x2 vertex
    #   normals (uint32 bitcast)  [12:18] uv (3 x 2)  [18] part  [19] pad
    attr_rows: jax.Array  # [Tp, 20] float32
    mesh_root: jax.Array  # [K] int32 root wide node per mesh
    # STATIC metadata on the dict KEY: (max_stack_depth,) — jit specializes
    meta: dict = None
    # motion meshes (ref triangle_motion_tree.zig, shutter-endpoint form):
    # per-triangle DELTAS frame1-frame0 of the leaf rows and shading
    # arrays; None = static arena (the lerp compiles away). Node AABBs
    # bound the UNION of both frames.
    tri_rows_d: jax.Array = None  # [G, 9*LEAF_SIZE]
    # [Tp, 12]: [0:3] p0 delta [3:6] e1 delta [6:9] e2 delta [9:12] pad
    attr_rows_d: jax.Array = None

    @property
    def num_meshes(self) -> int:
        return self.mesh_root.shape[0]

    # ---- host/test convenience views over the packed attribute rows
    # (hot device paths gather the whole row once and slice the result —
    # slicing the TABLE first would turn back into narrow gathers)
    @property
    def tri_p0(self) -> jax.Array:
        return self.attr_rows[:, 0:3]

    @property
    def tri_e1(self) -> jax.Array:
        return self.attr_rows[:, 3:6]

    @property
    def tri_e2(self) -> jax.Array:
        return self.attr_rows[:, 6:9]

    @property
    def tri_n(self) -> jax.Array:
        return jax.lax.bitcast_convert_type(self.attr_rows[:, 9:12], jnp.uint32)

    @property
    def tri_uv(self) -> jax.Array:
        return self.attr_rows[:, 12:18].reshape(-1, 3, 2)

    @property
    def tri_part(self) -> jax.Array:
        return self.attr_rows[:, 18].astype(jnp.int32)

    @property
    def tri_e1_d(self) -> jax.Array | None:
        return None if self.attr_rows_d is None else self.attr_rows_d[:, 3:6]

    @property
    def tri_e2_d(self) -> jax.Array | None:
        return None if self.attr_rows_d is None else self.attr_rows_d[:, 6:9]


class HostMesh(NamedTuple):
    """Host-side mesh description before arena packing."""

    positions: np.ndarray  # [V,3]
    indices: np.ndarray  # [F,3]
    normals: np.ndarray | None = None  # [V,3]
    uvs: np.ndarray | None = None  # [V,2]
    parts: np.ndarray | None = None  # [F] part id
    # deforming mesh: vertex positions at the shutter CLOSE endpoint
    # (ref triangle_motion_tree.zig frames; SUB Position num_frames > 1)
    positions_end: np.ndarray | None = None  # [V,3]


def _subtree_ranges(bvh: FlatBVH):
    """Per-node [lo, hi) range over leaf-order primitive positions.

    Both builders recursively PARTITION the prim_order array, so every
    subtree owns a contiguous range (spatial splits duplicate entries but
    keep the partition property). DFS numbering puts children after their
    parent, so one reverse sweep fills all ranges bottom-up."""
    fp = bvh.first_prim
    hl = bvh.hit_link
    ml = bvh.miss_link
    m = fp.shape[0]
    lo = np.where(fp >= 0, fp, 0).astype(np.int64)
    hi = np.where(fp >= 0, fp + bvh.prim_count, 0).astype(np.int64)
    for i in range(m - 1, -1, -1):
        if fp[i] < 0:
            l = hl[i]
            r = ml[l]
            lo[i] = min(lo[l], lo[r])
            hi[i] = max(hi[l], hi[r])
    return lo, hi


# a wide slot whose subtree holds <= LEAF_COLLECT triangles is flattened
# into ceil(cnt / LEAF_SIZE) near-full leaf groups by EVENLY CHUNKING its
# contiguous prim range (boxes recomputed from the triangles). MEASURED
# (tools/probe_collapse.py, trefoil 1M rays): flattening trades hierarchy
# quality for row count and LOSES — collect 12/24/48/96 gave 3.70/3.65/
# 3.49/3.39 Mrays/s (mean live iters 12.5 -> 14.2). 12 reproduces the
# round-4 tree; the probe also showed the real cost is DIVERGENCE (mean
# 12.5 live iters/ray vs ~37 effective through the cascade), so the
# cascade schedule, not the tree, is the lever.
LEAF_COLLECT = LEAF_SIZE


def _pack_wide(bvh: FlatBVH, group_off: int, node_off: int, tri_min, tri_max):
    """Collapse the binary SAH tree to BRANCH-wide packed rows, forming
    the LEAF_SIZE-triangle leaf groups DURING the collapse.

    The binary tree is built at COLLAPSE_GRAN granularity and the collapse
    (Ylitie et al. 2017 style; ref builder collapses similarly for its
    4/8-wide SIMD nodes) decides leaves: a slot whose subtree fits in
    LEAF_COLLECT triangles becomes ceil(cnt/LEAF_SIZE) evenly-chunked leaf
    groups over its contiguous prim_order range; the expansion loop
    replaces the largest-surface-area slot whose subtree is still too big
    with its children while the row's slot budget allows. Old scheme
    (binary leaves at row size, one group per leaf): 3.7/8 slot fill and
    8.6/12 group fill on the bench trefoil; this scheme measures ~7/8 and
    ~11/12.

    tri_min/tri_max: [P,3] per-triangle AABBs in LEAF ORDER (already
    permuted by bvh.prim_order; motion meshes bound both endpoints) — used
    for the chunk boxes.

    Returns (rows [W, 8*B] float32, depth, granges list[(lo, hi)]) with
    child refs already offset by node_off (wide) / group_off (groups).
    """
    fp = bvh.first_prim
    hl = bvh.hit_link
    B = BRANCH
    is_leaf = fp >= 0
    slo, shi = _subtree_ranges(bvh)
    cnt = shi - slo
    ext = np.maximum(bvh.nodes_max - bvh.nodes_min, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    def children(i):
        # binary threaded layout: left = hit_link, right = left's miss_link
        l = int(hl[i])
        return l, int(bvh.miss_link[l])

    def n_chunks(s):
        return max(1, -(-int(cnt[s]) // LEAF_SIZE))

    granges: list[tuple[int, int]] = []

    def chunks(s):
        """Even chunking of slot s's prim range into <= LEAF_SIZE pieces."""
        lo, hi = int(slo[s]), int(shi[s])
        k = n_chunks(s)
        bounds = [lo + ((hi - lo) * j) // k for j in range(k + 1)]
        return [(bounds[j], bounds[j + 1]) for j in range(k)]

    # breadth-first over wide rows; each queue entry is ONE binary node.
    # A node with cnt <= LEAF_COLLECT (or a demoted slot) becomes a PURE
    # LEAF row of <= B chunks; anything bigger expands its children.
    order = [0]
    depths = [0]
    wide_of = {0: 0}
    slot_lists = []  # (S, demoted) per wide row
    qi = 0
    while qi < len(order):
        b = order[qi]
        dep = depths[qi]
        qi += 1
        demoted: set = set()
        if cnt[b] <= LEAF_COLLECT or is_leaf[b]:
            S = [b]  # pure leaf row
        else:
            S = list(children(b))

            def slot_cost(s):
                if s in demoted or (cnt[s] > LEAF_COLLECT and not is_leaf[s]):
                    return 1  # wide child
                return n_chunks(s)

            total = sum(slot_cost(s) for s in S)
            # two leaf-destined children can overflow the row (up to 2B):
            # demote the costliest to its own pure-leaf row
            while total > B:
                x = max((s for s in S if slot_cost(s) > 1), key=slot_cost)
                total -= slot_cost(x) - 1
                demoted.add(x)
            while True:
                cand = [
                    s for s in S
                    if cnt[s] > LEAF_COLLECT and not is_leaf[s] and s not in demoted
                ]
                cand.sort(key=lambda s: -area[s])
                for x in cand:
                    c0, c1 = children(x)
                    nt = total - 1 + slot_cost(c0) + slot_cost(c1)
                    if nt <= B:
                        S.remove(x)
                        S.extend((c0, c1))
                        total = nt
                        break
                else:
                    break
        for s in S:
            if s in demoted or (cnt[s] > LEAF_COLLECT and not is_leaf[s]):
                wide_of[s] = len(order)
                order.append(s)
                depths.append(dep + 1)
        slot_lists.append((S, demoted))

    w = len(slot_lists)
    rows = np.zeros((w, _row_floats(B)), np.float32)
    rows[:, 6 * B : 7 * B] = -1.0
    for wi, (S, demoted) in enumerate(slot_lists):
        k = 0
        for s in S:
            if s in demoted or (cnt[s] > LEAF_COLLECT and not is_leaf[s]):
                rows[wi, 0 * B + k] = bvh.nodes_min[s, 0]
                rows[wi, 1 * B + k] = bvh.nodes_min[s, 1]
                rows[wi, 2 * B + k] = bvh.nodes_min[s, 2]
                rows[wi, 3 * B + k] = bvh.nodes_max[s, 0]
                rows[wi, 4 * B + k] = bvh.nodes_max[s, 1]
                rows[wi, 5 * B + k] = bvh.nodes_max[s, 2]
                rows[wi, 6 * B + k] = float(wide_of[s] + node_off)
                k += 1
            else:
                for lo, hi in chunks(s):
                    bmin = tri_min[lo:hi].min(axis=0)
                    bmax = tri_max[lo:hi].max(axis=0)
                    rows[wi, 0 * B + k] = bmin[0]
                    rows[wi, 1 * B + k] = bmin[1]
                    rows[wi, 2 * B + k] = bmin[2]
                    rows[wi, 3 * B + k] = bmax[0]
                    rows[wi, 4 * B + k] = bmax[1]
                    rows[wi, 5 * B + k] = bmax[2]
                    gid = len(granges) + group_off
                    granges.append((lo, hi))
                    rows[wi, 6 * B + k] = -float(gid + 2)
                    k += 1
        assert k <= B
    return rows, (max(depths) + 1 if depths else 1), granges


_BLAS_POOL = None


def _blas_pool():
    global _BLAS_POOL
    if _BLAS_POOL is None:
        import concurrent.futures

        _BLAS_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="blas"
        )
    return _BLAS_POOL


def _mesh_bounds(mesh: HostMesh):
    """Per-triangle AABBs; deforming meshes bound BOTH shutter endpoints
    (ref triangle_motion_tree.zig interval bounds)."""
    pos = np.asarray(mesh.positions, np.float32)
    idx = np.asarray(mesh.indices, np.int32)
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    if mesh.positions_end is not None:
        pe = np.asarray(mesh.positions_end, np.float32)
        w0, w1, w2 = pe[idx[:, 0]], pe[idx[:, 1]], pe[idx[:, 2]]
        pmin = np.minimum(pmin, np.minimum(np.minimum(w0, w1), w2))
        pmax = np.maximum(pmax, np.maximum(np.maximum(w0, w1), w2))
    return pmin, pmax


def submit_blas_build(mesh: HostMesh):
    """Async BLAS build (ref shape_provider.zig:127 async commit): the SAH
    build runs on a pool thread (the native builder releases the GIL for
    the C call) while scene loading continues; build_arena consumes the
    future. Returns a concurrent.futures.Future[FlatBVH]."""
    return _blas_pool().submit(
        lambda: build_bvh(*_mesh_bounds(mesh), leaf_size=COLLAPSE_GRAN)
    )


def build_arena(
    meshes: list[HostMesh],
    return_host_info: bool = False,
    prebuilt: list | None = None,
):
    """Build per-mesh wide BVHs and pack everything into one arena.

    With return_host_info, also returns a per-mesh list of dicts
    ("order": BVH leaf-order primitive permutation; "arena_ids": padded
    arena tri id per leaf-order position — for emissive-mesh light CDFs)
    and host numpy copies of node_rows/mesh_root (so instance-table builds
    never fetch from the device — a 14 MB pull over the axon tunnel
    measured ~75 s).
    """
    all_rows, all_trirows, all_attr = [], [], []
    all_trirows_d, all_attr_d = [], []
    any_motion = any(m.positions_end is not None for m in meshes)
    roots = []
    host_info = []
    node_off = 0
    group_off = 0
    max_depth = 1

    for mi, mesh in enumerate(meshes):
        pos = np.asarray(mesh.positions, np.float32)
        idx = np.asarray(mesh.indices, np.int32)
        v0 = pos[idx[:, 0]]
        v1 = pos[idx[:, 1]]
        v2 = pos[idx[:, 2]]
        if mesh.positions_end is not None:
            pe = np.asarray(mesh.positions_end, np.float32)
            w0, w1, w2 = pe[idx[:, 0]], pe[idx[:, 1]], pe[idx[:, 2]]
        fut = prebuilt[mi] if prebuilt is not None else None
        if fut is not None:
            bvh: FlatBVH = fut.result()
        else:
            bvh = build_bvh(*_mesh_bounds(mesh), leaf_size=COLLAPSE_GRAN)

        order = bvh.prim_order
        p0 = v0[order]
        e1 = v1[order] - p0
        e2 = v2[order] - p0
        if any_motion:
            if mesh.positions_end is not None:
                p0e = w0[order]
                e1e = w1[order] - p0e
                e2e = w2[order] - p0e
                dp0, de1, de2 = p0e - p0, e1e - e1, e2e - e2
            else:
                dp0 = np.zeros_like(p0)
                de1 = np.zeros_like(e1)
                de2 = np.zeros_like(e2)

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

        # per-triangle AABBs in leaf order (motion: both endpoints) for
        # the collapse's chunk boxes
        t_lo = np.minimum(np.minimum(p0, p0 + e1), p0 + e2)
        t_hi = np.maximum(np.maximum(p0, p0 + e1), p0 + e2)
        if any_motion and mesh.positions_end is not None:
            q0, q1, q2 = p0 + dp0, p0 + dp0 + e1 + de1, p0 + dp0 + e2 + de2
            t_lo = np.minimum(t_lo, np.minimum(np.minimum(q0, q1), q2))
            t_hi = np.maximum(t_hi, np.maximum(np.maximum(q0, q1), q2))
        rows, depth, granges = _pack_wide(bvh, group_off, node_off, t_lo, t_hi)
        max_depth = max(max_depth, depth)

        # --- pad groups to LEAF_SIZE-aligned triangle rows (vectorized)
        g_first = np.array([g[0] for g in granges], np.int64)
        g_cnt = np.array([g[1] - g[0] for g in granges], np.int64)
        assert g_cnt.max(initial=0) <= LEAF_SIZE
        num_groups = len(granges)
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

        def rows_of(a, b, c):
            return np.concatenate(
                [a.reshape(num_groups, -1, 3), b.reshape(num_groups, -1, 3),
                 c.reshape(num_groups, -1, 3)],
                axis=2,  # [G, LEAF_SIZE, 9] -> interleave (p0,e1,e2) per tri
            ).reshape(num_groups, LEAF_SIZE * 9)

        tri_rows = rows_of(pp0, pe1, pe2)
        if any_motion:
            pp0d = np.zeros((tp, 3), np.float32)
            pe1d = np.zeros((tp, 3), np.float32)
            pe2d = np.zeros((tp, 3), np.float32)
            pp0d[dst] = dp0[src]
            pe1d[dst] = de1[src]
            pe2d[dst] = de2[src]
            all_trirows_d.append(rows_of(pp0d, pe1d, pe2d))

        # arena tri id per leaf-order position (for light CDFs)
        arena_ids = np.empty(total, np.int64)
        arena_ids[src] = dst + group_off * LEAF_SIZE
        host_info.append({"order": order, "arena_ids": arena_ids.astype(np.int32)})

        all_rows.append(rows)
        all_trirows.append(tri_rows)
        # shading normals pack to oct-snorm16x2 words (padding slots are
        # zero vectors -> encode to a valid word; never read)
        from ..core import encoding as enc

        attr = np.zeros((tp, 20), np.float32)
        attr[:, 0:3] = pp0
        attr[:, 3:6] = pe1
        attr[:, 6:9] = pe2
        attr[:, 9:12] = np.ascontiguousarray(
            enc.oct_normal_pack(pn).astype(np.uint32)
        ).view(np.float32)
        attr[:, 12:18] = puv.reshape(tp, 6)
        attr[:, 18] = ppart.astype(np.float32)
        all_attr.append(attr)
        if any_motion:
            attr_d = np.zeros((tp, 12), np.float32)
            attr_d[:, 0:3] = pp0d
            attr_d[:, 3:6] = pe1d
            attr_d[:, 6:9] = pe2d
            all_attr_d.append(attr_d)
        roots.append(node_off)
        node_off += rows.shape[0]
        group_off += num_groups

    host_nodes = np.concatenate(all_rows, axis=0)
    host_roots = np.array(roots, np.int32)
    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    arena = MeshArena(
        node_rows=jnp.asarray(host_nodes),
        tri_rows=cat(all_trirows),
        attr_rows=cat(all_attr),
        mesh_root=jnp.asarray(host_roots),
        meta={(max_depth,): True},
        tri_rows_d=cat(all_trirows_d) if any_motion else None,
        attr_rows_d=cat(all_attr_d) if any_motion else None,
    )
    if return_host_info:
        return arena, host_info, {"node_rows": host_nodes, "mesh_root": host_roots}
    return arena


class MeshHit(NamedTuple):
    t: jax.Array  # [N]
    prim: jax.Array  # [N] arena-global triangle index (-1 miss)
    u: jax.Array  # [N] barycentric
    v: jax.Array  # [N]
    iters: jax.Array = None  # int32 scalar loop iterations (diagnostics)


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


def _inv_dir(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)


# probe/diagnostic switch (tools/probe_*): when True, TState.it becomes a
# 2-vector [iterations, total live lane-iterations] so probes can report
# MEAN per-lane trip counts, not just the while_loop max. Ships False —
# the extra reduction costs a sum per iteration.
_COUNT_LIVE = False


class TState(NamedTuple):
    node: jax.Array  # [N] current wide node
    mask: jax.Array  # [N] remaining-children bitmask at `node`
    sp: jax.Array  # [N] stack pointer
    stack: jax.Array  # [N, D] int32 continuations (see _traverse_stage)
    live: jax.Array  # [N] bool
    t: jax.Array
    prim: jax.Array
    u: jax.Array
    v: jax.Array
    it: jax.Array  # scalar iteration counter (diagnostics + NaN fuse)


# below this width, live-lane compaction stages are not worth their
# compile/scatter overhead; also the floor width of the cascade
_COMPACT_MIN = 1 << 10
# stage shrink factor: a stage loops until live <= width/_CASCADE_SHRINK,
# then compacts. The cascade's total cost is bounded by SHRINK x the ideal
# (sum of live counts), so smaller shrinks track the live curve tighter at
# the price of more compaction stages (each ~1.3 iteration-equivalents of
# [width] ops). probe_collapse measured mean 12.5 live iters/ray vs ~37
# effective at shrink 4. Round-5 sweep AFTER packed one-row compaction
# (probe_cascade, 1M incoherent trefoil): shrink 4 = 4.67, 2 = 5.08,
# 1.5 = 4.26 Mrays/s — 2 is the knee; below it the extra compaction
# stages cost more than the tighter live tracking saves.
_CASCADE_SHRINK = 2.0
# ... but at LARGE widths the per-stage compaction MACHINERY dominates:
# compact_indices is ~6.5 ms at 1M lanes (the int32 scatter is ~all of
# it, probe_cumsum) and the packed-row gather ~11.7 ns per survivor, so
# a full 921k->1k shrink-2 ladder costs ~20+ ms even when every stage
# exits after zero iterations. That is exactly the wavefront case: the
# bench trefoil's per-iteration traversal population is ~5-10% live
# (TLAS box misses arrive dead), and the measured shadow cascade cost
# (20.3 ms at 1M lanes, 4.6% live) was ~pure machinery. Above
# _CASCADE_TOP_MIN the ladder therefore shrinks 4x per stage — halving
# the number of big scatters/gathers — and returns to 2x below it where
# stage-loop tracking, not machinery, sets the price. Measured (bench
# mesh iteration accounting, probe_meshbench): see commit message.
_CASCADE_SHRINK_TOP = 4.0
_CASCADE_TOP_MIN = 1 << 17


def traverse(
    arena: MeshArena, root, o, d, tmin, tmax, any_hit: bool = False, time=None
) -> MeshHit:
    """Wide-BVH closest-hit traversal, vectorized over lanes.

    root: int32[N] per-lane root wide node (-1 = lane inactive). o/d in
    object space; t values stay in the caller's parameter units.
    time: [N] shutter time — deforming arenas (tri_rows_d) lerp the leaf
    triangles per lane; ignored (compiled away) for static arenas.

    Each iteration gathers ONE 64-float node row, slab-tests its 8 children
    and packs (t_near bits &~7 | slot) into int32 keys (t >= 0 so float
    bits order as ints; misses get +inf bits). The lane descends the
    NEAREST child remaining in its bitmask — a single masked min-reduction
    over the 8 keys; no sort network, no rank select chains (those chains
    measured 6ns/lane-iter of unfused [N] selects, 2.5x the whole slab) —
    and pushes (node, mask & ~nearest) so the siblings resume later.
    Because resumes re-slab the node, pruning against the shrunken best t
    is exact and pushed state is ONE int32 per level.

    Divergence control: a lax.while_loop pays the SLOWEST lane's iteration
    count on every lane (measured: max 121 vs mean ~30 on the trefoil
    stressor). Wide dispatches therefore run a compaction cascade — each
    stage loops only until the live count drops below width/4, then
    flatnonzero-compacts the survivors into a 4x smaller buffer and
    continues there, finishing at <= _COMPACT_MIN lanes.
    """
    n = o.shape[:-1]
    root = jnp.asarray(root, jnp.int32)
    if arena.tri_rows_d is not None and time is None:
        time = jnp.zeros(n, jnp.float32)
    if len(n) != 1 or n[0] < 4 * _COMPACT_MIN:
        return _traverse_stage(
            arena, root, o, d, tmin, tmax, any_hit, None, time=time
        )[0]

    width = n[0]
    res = None
    gmap = None  # stage-local index -> original lane (None = identity)
    st = None
    o_s, d_s = o, d
    time_s = time
    while True:
        shrink = (
            _CASCADE_SHRINK_TOP if width >= _CASCADE_TOP_MIN else _CASCADE_SHRINK
        )
        nxt = max(int(width / shrink), _COMPACT_MIN)
        limit = None if width <= _COMPACT_MIN else nxt
        hit, st = _traverse_stage(
            arena, root, o_s, d_s, tmin, tmax, any_hit, limit, state=st,
            time=time_s,
        )
        if res is None:
            res = hit
        else:
            # gmap entries >= n[0] are padding -> dropped by the scatter
            upd = lambda full, part: full.at[gmap].set(part, mode="drop")
            res = MeshHit(
                t=upd(res.t, hit.t), prim=upd(res.prim, hit.prim),
                u=upd(res.u, hit.u), v=upd(res.v, hit.v),
                iters=res.iters + hit.iters,
            )
        if limit is None:
            return res
        # compact: survivors (<= nxt by the stage's exit condition).
        # The whole lane state packs into ONE row so the compaction is a
        # single row gather — per-array compaction ran ~14 separate
        # gathers from >=2^15-row tables (the SLOW gather path: row COUNT
        # sets the price, probe_rowsize2) and measured ~122 ms at 1M
        # lanes, 4.4x a full traversal iteration (tools/probe_compact.py).
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        stack_d = st.stack.shape[-1]
        cols = [
            o_s[:, 0], o_s[:, 1], o_s[:, 2],
            d_s[:, 0], d_s[:, 1], d_s[:, 2],
            st.t, bc(st.prim), st.u, st.v,
            bc(st.node), bc(st.mask), bc(st.sp),
            st.live.astype(jnp.float32),
            time_s if time_s is not None else jnp.zeros(width, jnp.float32),
        ]
        packed = jnp.concatenate(
            [jnp.stack(cols, axis=-1), bc(st.stack)], axis=-1
        )
        lidx = compact_indices(st.live, nxt)
        ls = jnp.minimum(lidx, width - 1)
        valid = lidx < width
        gmap = (ls if gmap is None else gmap[ls])
        gmap = jnp.where(valid, gmap, n[0])
        rows_p = packed[ls]
        ci = lambda j: jax.lax.bitcast_convert_type(rows_p[:, j], jnp.int32)
        o_s = rows_p[:, 0:3]
        d_s = rows_p[:, 3:6]
        if time_s is not None:
            time_s = rows_p[:, 14]
        root = None
        st = TState(
            node=ci(10), mask=ci(11), sp=ci(12),
            stack=jax.lax.bitcast_convert_type(
                rows_p[:, 15 : 15 + stack_d], jnp.int32
            ),
            live=(rows_p[:, 13] > 0.5) & valid,
            t=rows_p[:, 6], prim=ci(7), u=rows_p[:, 8], v=rows_p[:, 9],
            it=jnp.zeros(3, jnp.int32) if _COUNT_LIVE else jnp.int32(0),
        )
        width = nxt


def _traverse_stage(
    arena: MeshArena, root, o, d, tmin, tmax, any_hit, live_limit, state=None,
    time=None,
):
    """One while_loop stage of `traverse`. With live_limit, the loop exits
    once the live-lane count drops to <= live_limit (cascade stages);
    live_limit=None runs to completion. Returns (MeshHit, final TState)."""
    rows = arena.node_rows
    trows = arena.tri_rows
    (max_depth,), = arena.meta.keys()
    stack_d = int(max_depth) + 1
    n = o.shape[:-1]
    inv = _inv_dir(d)
    i32 = jnp.int32

    if state is None:
        state = TState(
            node=jnp.maximum(jnp.broadcast_to(root, n), 0),
            mask=jnp.full(n, (1 << BRANCH) - 1, i32),
            sp=jnp.zeros(n, i32),
            stack=jnp.zeros(n + (stack_d,), i32),
            live=jnp.broadcast_to(root, n) >= 0,
            t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
            prim=jnp.full(n, -1, i32),
            u=jnp.zeros(n, jnp.float32),
            v=jnp.zeros(n, jnp.float32),
            it=jnp.zeros(3, jnp.int32) if _COUNT_LIVE else jnp.int32(0),
        )

    iota_s = jnp.arange(stack_d, dtype=i32)

    def cond(s: TState):
        # the iteration fuse only guards NaN rays (all-false compares would
        # otherwise keep a lane live forever)
        alive = jnp.sum(s.live)
        go = alive > (0 if live_limit is None else live_limit)
        it0 = s.it[0] if _COUNT_LIVE else s.it
        return go & (it0 < 65536)

    def pop_step(s: TState, need_pop, found, t_b, p_b, u_b, v_b, descend, cref, sp, stack, leaf_phase=False):
        """Shared continuation/pop logic over the hybrid stack encoding
        (low bit): EVEN entry 2*(node*256 + mask) = mask-resume (re-slab
        the node, min-reduce over the remaining-children bits — exact
        pruning against the shrunken best t); ODD entry 2*cref + 1 = a
        DIRECT child ref (node OR parked leaf) — its pop skips the
        parent re-gather + re-slab iteration entirely."""
        if _COUNT_LIVE:
            # [iterations, live lane-iters in NODE phases, in LEAF phases]
            nl = jnp.sum(s.live, dtype=jnp.int32)
            z = jnp.int32(0)
            it_inc = jnp.stack([
                jnp.int32(1), z if leaf_phase else nl, nl if leaf_phase else z,
            ])
        else:
            it_inc = 1
        blocked = s.live & found if any_hit else None
        if any_hit:
            need_pop = need_pop & ~blocked
        can_pop = need_pop & (sp > 0)
        top = jnp.sum(
            jnp.where((iota_s == (sp - 1)[..., None]) & can_pop[..., None], stack, 0),
            axis=-1,
        )
        sp = sp - can_pop.astype(i32)
        live = s.live & ~(need_pop & ~can_pop)
        if any_hit:
            live = live & ~blocked

        full = i32((1 << BRANCH) - 1)
        top_direct = (top & 1) == 1
        top_ref = jnp.right_shift(top - 1, 1)  # arithmetic: leaf refs < 0
        top_even = jnp.right_shift(top, 1)  # even entries are >= 0
        top_node = top_even // 256
        top_mask = top_even % 256
        node = jnp.where(
            descend,
            cref,
            jnp.where(
                can_pop, jnp.where(top_direct, top_ref, top_node), s.node
            ),
        )
        mask = jnp.where(
            descend | (can_pop & top_direct),
            full,
            jnp.where(can_pop, top_mask, s.mask),
        )
        return TState(
            node=node, mask=mask, sp=sp, stack=stack, live=live,
            t=t_b, prim=p_b, u=u_b, v=v_b, it=s.it + it_inc,
        )

    def node_body(s: TState):
        """NODE phase: lanes at wide nodes descend one child; a leaf
        child PARKS (node' = leaf ref <= -2) for a later LEAF phase.
        Parked lanes idle. No triangle-row gathers in this phase — the
        576-byte leaf row is ~4x a node gather (measured), so batching
        leaf tests into dedicated iterations pays for the idling."""
        is_node_lane = s.live & (s.node >= 0)
        row = rows[jnp.maximum(s.node, 0)]  # [N, 8B] fat gather
        # ---- slab-test all B children on row column slices
        B = BRANCH
        lox = (row[..., 0 * B : 1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B : 2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B : 3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B : 4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B : 5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B : 6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        refs = row[..., 6 * B : 7 * B]
        nearc = jnp.maximum(jnp.maximum(near, tmin), 0.0)
        hit = (nearc <= far) & (refs != -1.0) & (nearc < s.t[..., None])
        hit = hit & is_node_lane[..., None]

        # ---- pack keys: (t_near bits & ~(B-1)) | slot; misses and
        # children outside the lane's remaining-mask get +inf bits
        iota_b = jnp.arange(B, dtype=i32)
        elig = hit & (((s.mask[..., None] >> iota_b) & 1) != 0)
        tbits = jax.lax.bitcast_convert_type(nearc, i32) & i32(~(B - 1))
        keys = jnp.where(elig, tbits | iota_b, _MISS_KEY | iota_b)

        # ---- nearest remaining child: one masked min-reduction
        key_min = jnp.min(keys, axis=-1)
        valid = is_node_lane & (key_min < _MISS_KEY)
        slot = key_min & (B - 1)
        onehot_b = iota_b == slot[..., None]
        cref = jnp.sum(jnp.where(onehot_b, refs, 0.0), axis=-1).astype(i32)
        # a leaf child PARKS exactly like a node descend (node' = cref)
        descend = valid

        # ---- second-nearest (for the direct-push entry) + remaining set
        keys2 = jnp.where(onehot_b, _MISS_KEY | iota_b, keys)
        key2 = jnp.min(keys2, axis=-1)
        slot2 = key2 & (B - 1)
        onehot2 = iota_b == slot2[..., None]
        cref2 = jnp.sum(jnp.where(onehot2, refs, 0.0), axis=-1).astype(i32)
        # push only the still-ELIGIBLE bits: children that missed now can
        # never hit later (slabs are ray-static, t only shrinks), so the
        # resume's min-reduction prunes them for free. keys2 already has
        # the nearest slot removed, so its sub-MISS bits ARE the remaining
        # set — one [N,8] reduction + a popcount instead of two reductions
        rem = jnp.sum(
            jnp.where(keys2 < _MISS_KEY, jnp.left_shift(1, iota_b), 0), axis=-1
        )
        nrem = jax.lax.population_count(rem.astype(jnp.uint32)).astype(i32)

        push = descend & (nrem > 0)
        ent = jnp.where(
            nrem == 1,
            cref2 * 2 + 1,
            (s.node * 256 + rem) * 2,
        )
        onehot = iota_s == s.sp[..., None]
        stack = jnp.where(push[..., None] & onehot, ent[..., None], s.stack)
        sp = s.sp + push.astype(i32)

        # idle parked lanes are neither descending nor popping
        need_pop = is_node_lane & ~descend
        falses = jnp.zeros(n, bool)
        return pop_step(
            s, need_pop, falses, s.t, s.prim, s.u, s.v, descend, cref,
            sp, stack,
        )

    def leaf_body(s: TState):
        """LEAF phase: every parked lane Möller-tests its 144-float
        triangle row, then pops; node lanes idle this iteration."""
        at_leaf = s.live & (s.node <= -2)
        g = jnp.where(at_leaf, -s.node - 2, 0)
        tr = trows[g].reshape(n + (LEAF_SIZE, 9))
        if arena.tri_rows_d is not None:
            # deforming mesh: lerp the whole leaf row to the lane's
            # shutter time (one extra fat gather; static arenas skip)
            trd = arena.tri_rows_d[g].reshape(n + (LEAF_SIZE, 9))
            tr = tr + time[..., None, None] * trd
        tt, uu, vv, th = _tri_test(
            o[..., None, :], d[..., None, :],
            tr[..., 0:3], tr[..., 3:6], tr[..., 6:9], tmin, s.t[..., None],
        )
        th = th & at_leaf[..., None]
        tmask = jnp.where(th, tt, jnp.float32(3.4e38))
        jj = jnp.argmin(tmask, axis=-1)
        t16 = jnp.min(tmask, axis=-1)
        found = t16 < s.t
        iota16 = jnp.arange(LEAF_SIZE, dtype=i32)
        pick = jj[..., None] == iota16
        u16 = jnp.sum(jnp.where(pick, uu, 0.0), axis=-1)
        v16 = jnp.sum(jnp.where(pick, vv, 0.0), axis=-1)
        t_b = jnp.where(found, t16, s.t)
        p_b = jnp.where(found, g * LEAF_SIZE + jj.astype(i32), s.prim)
        u_b = jnp.where(found, u16, s.u)
        v_b = jnp.where(found, v16, s.v)

        falses = jnp.zeros(n, bool)
        zeros = jnp.zeros(n, i32)
        return pop_step(
            s, at_leaf, found & at_leaf, t_b, p_b, u_b, v_b, falses,
            zeros, s.sp, s.stack, leaf_phase=True,
        )

    def body(s: TState):
        # scalar phase pick: run a LEAF iteration once parked lanes reach
        # half the live set (or nothing but parked lanes remains)
        parked = jnp.sum(s.live & (s.node <= -2))
        alive = jnp.sum(s.live)
        do_leaf = (parked * 2 >= alive) & (parked > 0)
        return jax.lax.cond(do_leaf, leaf_body, node_body, s)

    final = jax.lax.while_loop(cond, body, state)
    hit = MeshHit(t=final.t, prim=final.prim, u=final.u, v=final.v, iters=final.it)
    return hit, final


# ---------------------------------------------------------------------------
# Mesh instances (the reference's prop BVH, prop_tree.zig)
# ---------------------------------------------------------------------------


class TlasHit(NamedTuple):
    t: jax.Array  # [N] world-parameter distance
    prim: jax.Array  # [N] arena-global triangle index (-1 miss)
    u: jax.Array  # [N]
    v: jax.Array  # [N]
    prop: jax.Array  # int32[N] prop index of the hit instance (-1 miss)
    iters: jax.Array = None  # int32 scalar: dense-pick loop trips (the
    # number of candidate instances the WORST lane actually visited —
    # sublinearity diagnostic; bounded by ninst+1)


class InstanceTable(NamedTuple):
    """Mesh instances for the dense two-phase walk (ref prop_tree.zig:22).

    trafo[I, 24]: q0(4) pos0(3) scale0(3) q1(4) pos1(3) scale1(3) root prop
    pad(2) — one row so the per-lane fetch after instance selection is a
    single small_gather. Static scenes store endpoint 1 == endpoint 0.
    wmin/wmax: world AABBs (shutter-union for animated instances).
    vis[I, 3]: camera / reflection / shadow visibility.
    """

    wmin: jax.Array  # [I,3]
    wmax: jax.Array  # [I,3]
    trafo: jax.Array  # [I,24]
    vis: jax.Array  # [I,3] bool
    # STATIC: (has_animated,) rides the dict key
    meta: dict


def build_instance_table(host, instances: list[dict]) -> InstanceTable:
    """Build the instance table on the host.

    host: {"node_rows", "mesh_root"} numpy copies from build_arena.
    instances: per mesh prop a dict with keys prop (int), mesh (int),
    rot [3,3], pos [3], scale [3], vis (3 bools), and optionally
    rot1/pos1/scale1 for shutter-end (animated).
    """
    node_rows = host["node_rows"]
    mesh_root = host["mesh_root"]
    ninst = len(instances)
    wmin = np.empty((ninst, 3), np.float32)
    wmax = np.empty((ninst, 3), np.float32)
    trafo = np.zeros((ninst, 24), np.float32)
    vis = np.zeros((ninst, 3), bool)
    has_anim = any("rot1" in ins for ins in instances)

    for i, ins in enumerate(instances):
        root = int(mesh_root[ins["mesh"]])
        # root box = union of the root row's child slots
        row = node_rows[root]
        B = BRANCH
        filled = row[6 * B : 7 * B] != -1.0
        bmin = np.array([row[k * B : (k + 1) * B][filled].min() for k in range(3)])
        bmax = np.array([row[k * B : (k + 1) * B][filled].max() for k in range(3, 6)])
        corners = np.array(
            [[bmin[k] if (j >> k) & 1 == 0 else bmax[k] for k in range(3)]
             for j in range(8)], np.float64)
        keys = [(ins["rot"], ins["pos"], ins["scale"])]
        if "rot1" in ins:
            # union over sampled shutter times — conservative for slerp
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
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for rot, pos, scale in keys:
            rot = np.asarray(rot, np.float64)
            w = (corners * np.asarray(scale, np.float64)) @ rot + np.asarray(pos, np.float64)
            lo = np.minimum(lo, w.min(axis=0))
            hi = np.maximum(hi, w.max(axis=0))
        if "rot1" in ins:  # slerp path can bulge slightly beyond samples
            c = 0.5 * (lo + hi)
            lo = c + (lo - c) * 1.05
            hi = c + (hi - c) * 1.05
        wmin[i] = lo
        wmax[i] = hi

        trafo[i, 0:4] = _np_quat(ins["rot"])
        trafo[i, 4:7] = ins["pos"]
        trafo[i, 7:10] = ins["scale"]
        if "rot1" in ins:
            trafo[i, 10:14] = _np_quat(ins["rot1"])
            trafo[i, 14:17] = ins["pos1"]
            trafo[i, 17:20] = ins["scale1"]
        else:
            trafo[i, 10:20] = trafo[i, 0:10]
        trafo[i, 20] = float(int(mesh_root[ins["mesh"]]))
        trafo[i, 21] = float(ins["prop"])
        vis[i] = ins.get("vis", (True, True, True))

    return InstanceTable(
        wmin=jnp.asarray(wmin),
        wmax=jnp.asarray(wmax),
        trafo=jnp.asarray(trafo),
        vis=jnp.asarray(vis),
        meta={(has_anim,): True},
    )


_INST_CHUNK = 32  # instances per dense [G, N] slab pass


def intersect_instances(
    arena: MeshArena,
    itab: InstanceTable,
    o,
    d,
    tmin,
    tmax,
    ray_class: str = "reflection",
    primary=None,
    time=None,
    any_hit: bool = False,
) -> TlasHit:
    """Two-phase instance walk: dense world-AABB scan + per-round BLAS.

    Each round picks per lane the nearest instance not yet visited — the
    strict (t_entry, index) order over rounds replaces a TLAS's stack with
    a 2-scalar cursor — then traverses that instance's wide BLAS in object
    space. Lanes finish when no remaining instance's entry beats their best
    hit. Cost: rounds ~= max instance-overlap along a ray (1-2 typical),
    each round one broadcast slab pass (no gathers) + one BLAS walk.
    """
    n = o.shape[:-1]
    (has_anim,), = itab.meta.keys()
    ninst = itab.trafo.shape[0]
    vi = {"camera": 0, "reflection": 1, "shadow": 2}[ray_class]
    tl = jnp.zeros(n, jnp.float32) if time is None else time
    inv = _inv_dir(d)
    i32 = jnp.int32
    BIG = jnp.float32(3.4e38)

    def dense_pick(t_b, last_t, last_i):
        """Nearest eligible instance per lane, strictly after (last_t, last_i)."""
        best_t = jnp.full(n, BIG)
        best_i = jnp.full(n, -1, i32)
        for c0 in range(0, ninst, _INST_CHUNK):
            bmin = itab.wmin[c0 : c0 + _INST_CHUNK][:, None]  # [G,1,3]
            bmax = itab.wmax[c0 : c0 + _INST_CHUNK][:, None]
            lo = (bmin - o[None]) * inv[None]
            hi = (bmax - o[None]) * inv[None]
            near = jnp.max(jnp.minimum(lo, hi), axis=-1)  # [G,N]
            far = jnp.min(jnp.maximum(lo, hi), axis=-1)
            nearc = jnp.maximum(jnp.maximum(near, tmin), 0.0)
            g = near.shape[0]
            visg = itab.vis[c0 : c0 + _INST_CHUNK, vi][:, None]
            if primary is not None:
                visg = jnp.where(
                    primary[None], itab.vis[c0 : c0 + _INST_CHUNK, 0][:, None], visg
                )
            idxg = jnp.arange(c0, c0 + g, dtype=i32)[:, None]
            elig = (
                (nearc <= far)
                & visg
                & (nearc < t_b[None])
                & ((nearc > last_t[None]) | ((nearc == last_t[None]) & (idxg > last_i[None])))
            )
            te = jnp.where(elig, nearc, BIG)
            gi = jnp.argmin(te, axis=0)  # first min -> smallest index (tiebreak)
            tg = jnp.min(te, axis=0)
            upd = tg < best_t  # strict: ties keep the earlier (smaller) chunk
            best_t = jnp.where(upd, tg, best_t)
            best_i = jnp.where(upd, c0 + gi.astype(i32), best_i)
        return best_t, best_i

    class IState(NamedTuple):
        t: jax.Array
        prim: jax.Array
        u: jax.Array
        v: jax.Array
        prop: jax.Array
        last_t: jax.Array
        last_i: jax.Array
        cont: jax.Array  # bool[N]
        it: jax.Array

    state = IState(
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, i32),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        prop=jnp.full(n, -1, i32),
        last_t=jnp.full(n, -1.0, jnp.float32),
        last_i=jnp.full(n, -1, i32),
        cont=jnp.ones(n, bool),
        it=jnp.int32(0),
    )

    def cond(s: IState):
        return jnp.any(s.cont) & (s.it < ninst + 1)

    def body(s: IState):
        bt, bi = dense_pick(s.t, s.last_t, s.last_i)
        active = s.cont & (bi >= 0)
        if any_hit:
            active = active & (s.prim < 0)
        row = small_gather(itab.trafo, jnp.maximum(bi, 0))  # [N,24]
        if has_anim:
            tt1 = tl[..., None]
            q = vm.quat_slerp(row[..., 0:4], row[..., 10:14], tt1)
            pos = vm.lerp(row[..., 4:7], row[..., 14:17], tt1)
            scale = vm.lerp(row[..., 7:10], row[..., 17:20], tt1)
        else:
            q = row[..., 0:4]
            pos = row[..., 4:7]
            scale = row[..., 7:10]
        rot = vm.quat_to_mat3(q)
        o_l = vm.world_to_object_point(rot, scale, pos, o)
        d_l = vm.world_to_object_vector(rot, scale, d)
        root_l = jnp.where(active, row[..., 20].astype(i32), -1)
        mh = traverse(arena, root_l, o_l, d_l, tmin, s.t, any_hit=any_hit, time=tl)
        closer = mh.prim >= 0  # traversal was bounded by s.t
        return IState(
            t=jnp.where(closer, mh.t, s.t),
            prim=jnp.where(closer, mh.prim, s.prim),
            u=jnp.where(closer, mh.u, s.u),
            v=jnp.where(closer, mh.v, s.v),
            prop=jnp.where(closer, row[..., 21].astype(i32), s.prop),
            last_t=jnp.where(active, bt, s.last_t),
            last_i=jnp.where(active, bi, s.last_i),
            cont=active,
            it=s.it + 1,
        )

    final = jax.lax.while_loop(cond, body, state)
    return TlasHit(
        t=final.t, prim=final.prim, u=final.u, v=final.v, prop=final.prop,
        iters=final.it,
    )


def _np_quat(rot) -> np.ndarray:
    """Rotation rows -> quaternion (x,y,z,w), canonical w >= 0."""
    m = np.asarray(rot, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
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
