"""Curve (hair) shapes: flattened round-cone segments + threaded BVH.

ref: src/core/scene/shape/curve/ — the reference stores cubic Bézier
partitions as BVH primitives and intersects them by RECURSIVE ray-space
subdivision (curve_data.zig recursiveIntersectSegment), a depth-first
algorithm that maps badly to XLA (data-dependent recursion, per-lane
stacks). TPU redesign: each Bézier is flattened ON THE HOST into a few
round-cone segments (linearly varying radius); the device intersects a
segment with ONE closed-form quadratic (body + spherical caps — the
standard GPU formulation) inside the same threaded hit/miss-link BVH walk
the triangle arena uses (trimesh.traverse). Uniform control flow, two
gathers per step, no recursion.

Flattening resolution adapts to curvature: a Bézier whose control polygon
deviates from the chord by more than a fraction of its width gets more
segments (up to 16) — the same error criterion the reference's
refinementDepth encodes (curve_data.zig), applied once at build time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import compact_indices
from .bvh import build_bvh, FlatBVH, LEAF_SIZE


# packed segment row: p0(3) r0(1) p1(3) r1(1) u0(1) u1(1) = 10 floats
_SEG_F = 10


class HostCurves(NamedTuple):
    """Host-side curve set: consecutive groups of 4 control points form
    cubic Béziers (the reference's curve buffer layout, curve_buffer.zig)."""

    points: np.ndarray  # [P,3] control points
    widths: np.ndarray  # [P] per-point widths (diameter-like: ref uses
    # width/2 as radius at the two curve ends)
    curve_starts: np.ndarray  # [C] first control-point index per curve
    strand_ids: np.ndarray  # [C] strand each curve belongs to
    strand_u: np.ndarray  # [C,2] parameter range of each curve on its strand


class CurveArena(NamedTuple):
    """All curve shapes of the scene, concatenated (mirror of MeshArena).

    node_rows[M,12]: min(3) max(3) hit_link miss_link leaf_group count pad
    pad — identical layout to trimesh so the traversal loop is shared in
    structure. seg_rows[G, 10*LEAF_SIZE] packs a whole leaf.
    """

    node_rows: jax.Array  # [M,12] float32
    seg_rows: jax.Array  # [G, _SEG_F*LEAF_SIZE] float32
    seg_strand: jax.Array  # [Sp] int32 strand id (padded arena order)
    curve_root: jax.Array  # [K] int32 root node per curve shape

    @property
    def num_shapes(self) -> int:
        return self.curve_root.shape[0]


def _bezier_eval(cp: np.ndarray, t: np.ndarray) -> np.ndarray:
    """cp [C,4,3], t [S] -> [C,S,3]."""
    t = t[None, :, None]
    u = 1.0 - t
    return (
        u * u * u * cp[:, None, 0]
        + 3.0 * u * u * t * cp[:, None, 1]
        + 3.0 * u * t * t * cp[:, None, 2]
        + t * t * t * cp[:, None, 3]
    )


def flatten_curves(curves: HostCurves, max_segments: int = 16):
    """Bézier -> round-cone segments. Returns (pa[S,3], ra[S], pb[S,3],
    rb[S], u0[S], u1[S], strand[S])."""
    pts = np.asarray(curves.points, np.float32)
    wid = np.asarray(curves.widths, np.float32)
    starts = np.asarray(curves.curve_starts, np.int64)
    C = len(starts)
    cp = np.stack([pts[starts + k] for k in range(4)], axis=1)  # [C,4,3]
    # radius at ends: the reference takes widths at the curve's first/last
    # control point and lerps along u (curve_data.zig width interpolation)
    r0 = 0.5 * wid[starts]
    r1 = 0.5 * wid[np.minimum(starts + 3, len(wid) - 1)]

    # flatness: control-polygon deviation from the chord
    chord = cp[:, 3] - cp[:, 0]
    cl = np.maximum(np.linalg.norm(chord, axis=-1), 1e-12)
    cn = chord / cl[:, None]
    dev = np.zeros(C, np.float32)
    for k in (1, 2):
        v = cp[:, k] - cp[:, 0]
        perp = v - (v * cn).sum(-1, keepdims=True) * cn
        dev = np.maximum(dev, np.linalg.norm(perp, axis=-1))
    w_ref = np.maximum(np.maximum(r0, r1), 1e-6)
    nseg = np.clip(
        np.ceil(np.sqrt(np.maximum(dev / (0.25 * w_ref), 1.0))).astype(np.int64),
        2, max_segments,
    )

    pa, ra, pb, rb, u0s, u1s, sid = [], [], [], [], [], [], []
    su = np.asarray(curves.strand_u, np.float32)
    strands = np.asarray(curves.strand_ids, np.int32)
    for n in np.unique(nseg):
        sel = np.flatnonzero(nseg == n)
        t = np.linspace(0.0, 1.0, n + 1, dtype=np.float32)
        p = _bezier_eval(cp[sel], t)  # [c,n+1,3]
        r = r0[sel, None] * (1.0 - t)[None] + r1[sel, None] * t[None]
        uu = su[sel, 0:1] * (1.0 - t)[None] + su[sel, 1:2] * t[None]
        pa.append(p[:, :-1].reshape(-1, 3))
        pb.append(p[:, 1:].reshape(-1, 3))
        ra.append(r[:, :-1].reshape(-1))
        rb.append(r[:, 1:].reshape(-1))
        u0s.append(uu[:, :-1].reshape(-1))
        u1s.append(uu[:, 1:].reshape(-1))
        sid.append(np.repeat(strands[sel], n))
    return (
        np.concatenate(pa), np.concatenate(ra), np.concatenate(pb),
        np.concatenate(rb), np.concatenate(u0s), np.concatenate(u1s),
        np.concatenate(sid),
    )


def _flatten_and_build(curves: "HostCurves"):
    """Flatten strands to rounded-cone segments + SAH build (the heavy
    host-side work, runs on the BLAS pool for async builds)."""
    pa, ra, pb, rb, u0, u1, sid = flatten_curves(curves)
    pmin = np.minimum(pa - ra[:, None], pb - rb[:, None])
    pmax = np.maximum(pa + ra[:, None], pb + rb[:, None])
    bvh: FlatBVH = build_bvh(pmin, pmax)
    return (pa, ra, pb, rb, u0, u1, sid), bvh


def submit_blas_build(curves: "HostCurves"):
    """Async curve-BLAS build (ref shape_provider.zig:127 async commit);
    returns a Future consumed by build_arena's `prebuilt`."""
    from .trimesh import _blas_pool

    return _blas_pool().submit(_flatten_and_build, curves)


def build_arena(
    shapes: list[HostCurves], prebuilt: list | None = None
) -> CurveArena:
    """BVH per curve shape over segment AABBs, packed into one arena."""
    all_rows, all_segrows, all_strand = [], [], []
    roots = []
    node_off = 0
    group_off = 0

    for ci, curves in enumerate(shapes):
        fut = prebuilt[ci] if prebuilt is not None else None
        if fut is not None:
            (pa, ra, pb, rb, u0, u1, sid), bvh = fut.result()
        else:
            (pa, ra, pb, rb, u0, u1, sid), bvh = _flatten_and_build(curves)
        order = bvh.prim_order
        seg = np.concatenate(
            [pa[order], ra[order, None], pb[order], rb[order, None],
             u0[order, None], u1[order, None]],
            axis=1,
        ).astype(np.float32)  # [S,10]
        sid_o = sid[order]

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
        pseg = np.zeros((sp, _SEG_F), np.float32)
        pseg[:, 3] = -1.0  # padding: negative radius never hits
        pseg[:, 7] = -1.0
        pstrand = np.zeros(sp, np.int32)
        pseg[dst] = seg[src]
        pstrand[dst] = sid_o[src]

        seg_rows = pseg.reshape(num_groups, LEAF_SIZE * _SEG_F)

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
        all_segrows.append(seg_rows)
        all_strand.append(pstrand)
        roots.append(node_off)
        node_off += m
        group_off += num_groups

    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    return CurveArena(
        node_rows=cat(all_rows),
        seg_rows=cat(all_segrows),
        seg_strand=cat(all_strand),
        curve_root=jnp.asarray(np.array(roots, np.int32)),
    )


class CurveHit(NamedTuple):
    t: jax.Array  # [N]
    prim: jax.Array  # [N] arena-global (padded) segment index; -1 miss
    s: jax.Array  # [N] axial parameter on the hit segment [0,1]


def _cone_test(o, dn, pa, ra, pb, rb, tmin, tmax):
    """Ray vs rounded cone (linearly varying radius + spherical caps),
    closed form (Quilez). dn must be UNIT length; t in dn units.
    Returns (t, s_axial, hit)."""
    ba = pb - pa
    oa = o - pa
    ob = o - pb
    rr = ra - rb
    m0 = vm.dot(ba, ba)
    m1 = vm.dot(ba, oa)
    m2 = vm.dot(ba, dn)
    m3 = vm.dot(dn, oa)
    m5 = vm.dot(oa, oa)
    m6 = vm.dot(ob, dn)
    m7 = vm.dot(ob, ob)

    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * ra - m0 * ra * ra
    h = k1 * k1 - k0 * k2
    k2s = jnp.where(jnp.abs(k2) < 1e-12, 1e-12, k2)
    t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / k2s
    y = m1 - ra * rr + t_body * m2
    body_ok = (h > 0.0) & (y > 0.0) & (y < d2) & (ra > 0.0)

    # spherical caps
    h1 = m3 * m3 - m5 + ra * ra
    h2 = m6 * m6 - m7 + rb * rb
    t_a = -m3 - jnp.sqrt(jnp.maximum(h1, 0.0))
    t_cb = -m6 - jnp.sqrt(jnp.maximum(h2, 0.0))
    a_ok = (h1 > 0.0) & (ra > 0.0)
    b_ok = (h2 > 0.0) & (rb > 0.0)

    FARV = jnp.float32(3.0e38)

    def rng(t, ok):
        return jnp.where(ok & (t >= tmin) & (t <= tmax), t, FARV)

    tb = rng(t_body, body_ok)
    ta = rng(t_a, a_ok)
    tbb = rng(t_cb, b_ok)
    t = jnp.minimum(tb, jnp.minimum(ta, tbb))
    hit = t < FARV
    # axial parameter: body -> y/d2; caps clamp to 0/1
    s_body = jnp.clip(y / jnp.maximum(d2, 1e-20), 0.0, 1.0)
    s = jnp.where(
        t == tb, s_body, jnp.where(t == ta, 0.0, 1.0)
    )
    return t, s, hit


class TState(NamedTuple):
    ptr: jax.Array
    t: jax.Array  # in |d| units (caller's parameterization)
    prim: jax.Array
    s: jax.Array


# floor width of the curve-traversal compaction cascade (see
# trimesh.traverse — same divergence economics: the while_loop pays the
# slowest lane, so wide dispatches stage-compact the live set)
_COMPACT_MIN = 1 << 14


def traverse(arena: CurveArena, root, o, d, tmin, tmax, any_hit: bool = False) -> CurveHit:
    """Threaded-BVH closest-hit over curve segments (object space).

    Same two-gather structure as trimesh.traverse; the leaf test is the
    rounded-cone quadratic. d may be non-unit (instance scale): the cone
    test runs on the normalized direction and t rescales back to d units.
    Wide dispatches run the live-lane compaction cascade (width/4 stages,
    as trimesh.traverse).
    """
    n = o.shape[:-1]
    root = jnp.asarray(root, jnp.int32)
    state = TState(
        ptr=root,
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, jnp.int32),
        s=jnp.zeros(n, jnp.float32),
    )
    if len(n) != 1 or n[0] < 4 * _COMPACT_MIN:
        st = _traverse_stage(arena, state, o, d, tmin, any_hit, None)
        return CurveHit(t=st.t, prim=st.prim, s=st.s)

    width = n[0]
    res = None
    gmap = None
    o_s, d_s = o, d
    st = state
    while True:
        nxt = max(width // 4, _COMPACT_MIN)
        limit = None if width <= _COMPACT_MIN else nxt
        st = _traverse_stage(arena, st, o_s, d_s, tmin, any_hit, limit)
        if res is None:
            res = st
        else:
            upd = lambda full, part: full.at[gmap].set(part, mode="drop")
            res = TState(
                ptr=res.ptr, t=upd(res.t, st.t),
                prim=upd(res.prim, st.prim), s=upd(res.s, st.s),
            )
        if limit is None:
            return CurveHit(t=res.t, prim=res.prim, s=res.s)
        live = st.ptr >= 0
        if any_hit:
            live = live & (st.prim < 0)
        lidx = compact_indices(live, nxt)
        ls = jnp.minimum(lidx, width - 1)
        valid = lidx < width
        gmap = (ls if gmap is None else gmap[ls])
        gmap = jnp.where(valid, gmap, n[0])
        o_s, d_s = o_s[ls], d_s[ls]
        st = TState(
            ptr=jnp.where(valid, st.ptr[ls], -1),
            t=st.t[ls], prim=st.prim[ls], s=st.s[ls],
        )
        width = nxt


def _traverse_stage(
    arena: CurveArena, state: TState, o, d, tmin, any_hit, live_limit
) -> TState:
    n = o.shape[:-1]
    dlen = jnp.maximum(vm.length(d), 1e-20)
    dn = d / dlen[..., None]
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

        t_b, p_b, s_b = st.t, st.prim, st.s
        do_prims = hit_aabb & is_leaf
        srow = arena.seg_rows[jnp.maximum(group, 0)]
        base = group * LEAF_SIZE
        for j in range(LEAF_SIZE):
            c = j * _SEG_F
            pa = srow[..., c : c + 3]
            ra = srow[..., c + 3]
            pb = srow[..., c + 4 : c + 7]
            rb = srow[..., c + 7]
            # cone test in unit-direction parameterization
            tt_u, ss, h = _cone_test(
                o, dn, pa, ra, pb, rb, tmin * dlen, t_b * dlen
            )
            tt = tt_u / dlen
            h = h & do_prims & (j < cnt)
            t_b = jnp.where(h, tt, t_b)
            p_b = jnp.where(h, base + j, p_b)
            s_b = jnp.where(h, ss, s_b)

        nxt = jnp.where(hit_aabb, row[..., 6], row[..., 7]).astype(jnp.int32)
        nxt = jnp.where(live, nxt, st.ptr)
        nxt = jnp.where(st.ptr < 0, -1, nxt)
        return TState(ptr=nxt, t=t_b, prim=p_b, s=s_b)

    return jax.lax.while_loop(cond, body, state)


def segment_fields(arena: CurveArena, prim):
    """Gather one padded segment's packed fields by arena index."""
    group = prim // LEAF_SIZE
    j = prim % LEAF_SIZE
    row = arena.seg_rows[jnp.maximum(group, 0)]
    # dynamic within-row slice: select the j-th segment's 10 floats
    offs = j[..., None] * _SEG_F + jnp.arange(_SEG_F)
    seg = jnp.take_along_axis(row, offs, axis=-1)
    return {
        "pa": seg[..., 0:3],
        "ra": seg[..., 3],
        "pb": seg[..., 4:7],
        "rb": seg[..., 7],
        "u0": seg[..., 8],
        "u1": seg[..., 9],
        "strand": arena.seg_strand[jnp.maximum(prim, 0)],
    }


# ---------------------------------------------------------------------------
# procedural curves for tests/examples
# ---------------------------------------------------------------------------


def make_hair_ball(
    num_strands: int = 200,
    segments_per_strand: int = 3,
    radius: float = 0.5,
    length: float = 0.35,
    width: float = 0.01,
    seed: int = 7,
) -> HostCurves:
    """Fur ball: strands grow outward from a sphere with slight curl."""
    rng = np.random.default_rng(seed)
    pts, widths, starts, sids, sus = [], [], [], [], []
    pi = 0
    for s in range(num_strands):
        z = rng.uniform(-1, 1)
        phi = rng.uniform(0, 2 * np.pi)
        r = np.sqrt(max(1.0 - z * z, 0.0))
        n = np.array([r * np.cos(phi), z, r * np.sin(phi)], np.float32)
        t_dir = np.cross(n, [0.0, 1.0, 0.0])
        if np.linalg.norm(t_dir) < 1e-5:
            t_dir = np.array([1.0, 0.0, 0.0])
        t_dir = t_dir / np.linalg.norm(t_dir)
        curl = rng.uniform(0.2, 0.8)
        base = n * radius
        # one cubic per strand-third
        cps = [base]
        dirv = n.copy()
        for k in range(segments_per_strand * 3):
            dirv = dirv + curl * 0.25 * t_dir + rng.normal(0, 0.08, 3)
            dirv = dirv / np.linalg.norm(dirv)
            cps.append(cps[-1] + dirv * (length / (segments_per_strand * 3)))
        cps = np.asarray(cps, np.float32)
        w_root = width
        w_tip = width * 0.2
        nc = segments_per_strand
        for c in range(nc):
            starts.append(pi + c * 3)
            sids.append(s)
            sus.append((c / nc, (c + 1) / nc))
        for k, p in enumerate(cps):
            u = k / (len(cps) - 1)
            pts.append(p)
            widths.append(w_root * (1 - u) + w_tip * u)
        pi += len(cps)
    return HostCurves(
        points=np.asarray(pts, np.float32),
        widths=np.asarray(widths, np.float32),
        curve_starts=np.asarray(starts, np.int64),
        strand_ids=np.asarray(sids, np.int32),
        strand_u=np.asarray(sus, np.float32),
    )
