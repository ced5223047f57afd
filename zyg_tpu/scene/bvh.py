"""BVH build (host) + flattened threaded layout for stackless TPU traversal.

The reference builds a 2-wide SAH BVH with spatial splits and traverses it
with a per-thread node stack (ref: src/core/scene/bvh/builder_base.zig,
node.zig, triangle/triangle_tree.zig). Per-lane stacks are hostile to SIMT
wavefronts, so the TPU layout is a **threaded** BVH: every node stores

    hit_link  — node to visit when its AABB is hit (first child / next leaf)
    miss_link — node to visit when missed (skip the subtree)

making traversal a single pointer walk per lane — uniform control flow, no
stack. Children are ordered by the split axis so near-first ordering holds
for rays with positive direction on that axis; the miss/hit links encode
depth-first order.

Builder: vectorized numpy binned SAH (16 bins, leaf <= 4 tris). A C++
builder drops in behind the same array contract later.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LEAF_SIZE = 4
NUM_BINS = 16


@dataclass
class FlatBVH:
    """Flattened threaded BVH over primitives.

    nodes_min/max: [M,3] float32
    hit_link:      [M]  int32  (node index when AABB hit; leaves: self-skip)
    miss_link:     [M]  int32  (node index when missed; -1 = done)
    first_prim:    [M]  int32  (-1 for inner nodes)
    prim_count:    [M]  int32
    prim_order:    [P]  int32  (primitive permutation, leaf-contiguous)
    """

    nodes_min: np.ndarray
    nodes_max: np.ndarray
    hit_link: np.ndarray
    miss_link: np.ndarray
    first_prim: np.ndarray
    prim_count: np.ndarray
    prim_order: np.ndarray


def build_bvh(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int = LEAF_SIZE) -> FlatBVH:
    """Binned-SAH top-down build over primitive AABBs.

    Dispatches to the native C++ builder (zyg_tpu/native/bvh_builder.cpp,
    same algorithm and array contract) when the toolchain is available;
    this numpy implementation is the fallback and the reference-of-record
    for tests."""
    from ..native import build_bvh_native

    native = build_bvh_native(prim_min, prim_max, leaf_size)
    if native is not None:
        return native
    return _build_bvh_numpy(prim_min, prim_max, leaf_size)


def _build_bvh_numpy(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int = LEAF_SIZE) -> FlatBVH:
    n = prim_min.shape[0]
    assert n > 0
    centroids = 0.5 * (prim_min + prim_max)

    # worst case 2n nodes
    cap = max(2 * n, 4)
    nodes_min = np.zeros((cap, 3), np.float32)
    nodes_max = np.zeros((cap, 3), np.float32)
    lchild = np.full(cap, -1, np.int32)
    first = np.full(cap, -1, np.int32)
    count = np.zeros(cap, np.int32)

    order = np.arange(n, dtype=np.int32)
    node_count = 1
    # stack of (node_index, lo, hi)
    stack = [(0, 0, n)]

    while stack:
        ni, lo, hi = stack.pop()
        idx = order[lo:hi]
        pmin = prim_min[idx]
        pmax = prim_max[idx]
        nodes_min[ni] = pmin.min(axis=0)
        nodes_max[ni] = pmax.max(axis=0)
        m = hi - lo
        if m <= leaf_size:
            first[ni] = lo
            count[ni] = m
            continue

        cent = centroids[idx]
        cmin = cent.min(axis=0)
        cmax = cent.max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            # degenerate: median split
            half = m // 2
            part = np.argsort(cent[:, axis], kind="stable")
            order[lo:hi] = idx[part]
            split = lo + half
        else:
            # binned SAH
            scale = NUM_BINS * (1.0 - 1e-6) / ext[axis]
            bins = np.minimum(((cent[:, axis] - cmin[axis]) * scale).astype(np.int32), NUM_BINS - 1)
            bin_count = np.bincount(bins, minlength=NUM_BINS)
            bin_min = np.full((NUM_BINS, 3), np.inf, np.float32)
            bin_max = np.full((NUM_BINS, 3), -np.inf, np.float32)
            for b in range(NUM_BINS):
                sel = bins == b
                if bin_count[b]:
                    bin_min[b] = pmin[sel].min(axis=0)
                    bin_max[b] = pmax[sel].max(axis=0)

            # prefix/suffix surface areas
            def area(bmin, bmax):
                d = np.maximum(bmax - bmin, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_count)
            rcnt = np.cumsum(bin_count[::-1])[::-1]
            cost = area(lmin, lmax)[: NUM_BINS - 1] * lcnt[: NUM_BINS - 1] + area(rmin, rmax)[1:] * rcnt[1:]
            cost = np.where((lcnt[: NUM_BINS - 1] == 0) | (rcnt[1:] == 0), np.inf, cost)
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                half = m // 2
                part = np.argsort(cent[:, axis], kind="stable")
                order[lo:hi] = idx[part]
                split = lo + half
            else:
                go_left = bins <= best
                left_idx = idx[go_left]
                right_idx = idx[~go_left]
                order[lo : lo + len(left_idx)] = left_idx
                order[lo + len(left_idx) : hi] = right_idx
                split = lo + len(left_idx)

        li = node_count
        ri = node_count + 1
        node_count += 2
        lchild[ni] = li
        # push right first so left is processed next (defines DFS order)
        stack.append((ri, split, hi))
        stack.append((li, lo, split))

    # compact + thread: DFS renumber so hit_link(inner) = next node (i+1)
    new_index = np.full(cap, -1, np.int32)
    dfs: list[int] = []
    st = [0]
    while st:
        ni = st.pop()
        new_index[ni] = len(dfs)
        dfs.append(ni)
        if lchild[ni] >= 0:
            st.append(lchild[ni] + 1)  # right
            st.append(lchild[ni])  # left
    m = len(dfs)
    dfs_arr = np.array(dfs, np.int32)

    nm = nodes_min[dfs_arr]
    nx = nodes_max[dfs_arr]
    fp = first[dfs_arr]
    ct = count[dfs_arr]
    lc = lchild[dfs_arr]

    hit_link = np.full(m, -1, np.int32)
    miss_link = np.full(m, -1, np.int32)

    # miss links: computed via an explicit DFS with "next right sibling"
    def assign(ni_new, miss):
        # iterative
        work = [(ni_new, miss)]
        while work:
            i, ms = work.pop()
            miss_link[i] = ms
            if lc[i] >= 0:
                l_new = new_index[lc[i]]
                r_new = new_index[lc[i] + 1]
                hit_link[i] = l_new
                work.append((l_new, r_new))
                work.append((r_new, ms))
            else:
                hit_link[i] = ms  # leaf: after testing prims, continue at miss

    assign(0, -1)

    return FlatBVH(
        nodes_min=nm.astype(np.float32),
        nodes_max=nx.astype(np.float32),
        hit_link=hit_link,
        miss_link=miss_link,
        first_prim=fp.astype(np.int32),
        prim_count=ct.astype(np.int32),
        prim_order=order,
    )
