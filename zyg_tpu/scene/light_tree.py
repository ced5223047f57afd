"""Many-light sampling tree (ref: src/core/scene/light/light_tree.zig).

The reference builds a BVH over lights with a SAOH (surface-area orientation
heuristic) builder — axis sweeps plus normal-cone splits scored by
``power x coneCost x surfaceArea`` (light_tree_builder.zig evaluateSplits,
SplitCandidate.evaluate) — and picks up to 64 lights per shading point via
adaptive stochastic traversal with variance-driven splitting
(light_tree.zig Node.split, randomLight).

The TPU equivalent: the same SAOH build runs on the host and flattens to SoA
arrays (``build_light_tree``); on device

* ``select``        — single-pick bounded masked descent (every lane walks
                      root->leaf accumulating the branch pdf),
* ``pdf``           — the matching upward pdf walk for MIS,
* ``select_split``  — adaptive splitting with a STATIC pick budget K=2^S:
                      the top of the descent deterministically forks into
                      both children while the reference's variance criterion
                      (Node.split) fires, using the balanced binary slot
                      trick (child1 lands at slot i + K>>(s+1)) so no
                      dynamic allocation is needed,
* ``pdf_split``     — the split-aware selection pdf: record the leaf->root
                      path, replay it downward applying the same criterion.

Per-node importance follows the reference's Kulla/Conty-style estimate
(light_tree.zig importance()): power / d^2, attenuated by the cluster's
bounding-cone-vs-direction visibility and the receiver's cos bound.

Infinite lights live outside the tree. Single-pick mode mixes them by a
power CDF with probability ``inf_weight`` (light_tree.zig randomLight's ip
split). Split mode instead emits ONE stochastic infinite pick with
pdf = CDF mass (the reference enumerates every infinite light exhaustively,
light_tree.zig:362-366; a stochastic pick keeps the estimator unbiased at
bounded static width).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import small_gather


_ARRAY_FIELDS = (
    "center", "radius", "cone", "power", "variance", "two_sided", "child0",
    "light", "parent", "sibling", "light_leaf", "inf_lights", "inf_cdf",
)


@jax.tree_util.register_pytree_node_class
class LightTree:
    """Flattened binary light BVH + infinite-light CDF. All [Nn] node arrays;
    singleton leaves (num_nodes = 2*F - 1 over F finite lights).

    `depth` (loop bound) and `inf_weight` (mix probability) are STATIC pytree
    aux data — they steer trace-time control flow.
    """

    center: jax.Array  # float32[Nn,3]
    radius: jax.Array  # float32[Nn]
    cone: jax.Array  # float32[Nn,4] axis + cos half-angle
    power: jax.Array  # float32[Nn]
    variance: jax.Array  # float32[Nn] power variance of member lights
    two_sided: jax.Array  # bool[Nn]
    child0: jax.Array  # int32[Nn] first child (-1 = leaf)
    light: jax.Array  # int32[Nn] light index at leaves (-1 inside)
    parent: jax.Array  # int32[Nn] (-1 at root)
    sibling: jax.Array  # int32[Nn] (-1 at root)
    light_leaf: jax.Array  # int32[L] leaf node per light (-1 for infinite)
    inf_lights: jax.Array  # int32[I] light indices ([0] dummy when empty)
    inf_cdf: jax.Array  # float32[I+1]

    def __init__(self, *, depth: int, inf_weight: float, num_finite: int = 0, **arrays):
        self.depth = int(depth)
        self.inf_weight = float(inf_weight)
        self.num_finite = int(num_finite)
        for k in _ARRAY_FIELDS:
            setattr(self, k, arrays[k])

    def tree_flatten(self):
        return (
            tuple(getattr(self, k) for k in _ARRAY_FIELDS),
            (self.depth, self.inf_weight, self.num_finite),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        depth, inf_weight, num_finite = aux
        return cls(
            depth=depth, inf_weight=inf_weight, num_finite=num_finite,
            **dict(zip(_ARRAY_FIELDS, children)),
        )

    @property
    def has_infinite(self) -> bool:
        return self.inf_weight > 0.0


# ---------------------------------------------------------------------------
# Host build (SAOH, ref light_tree_builder.zig)
# ---------------------------------------------------------------------------


def _cone_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact pairwise bounding-cone union (ref base/math/cone.zig merge)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if np.allclose(a, b):
        return a.astype(np.float32)
    a_angle = math.acos(float(np.clip(a[3], -1.0, 1.0)))
    b_angle = math.acos(float(np.clip(b[3], -1.0, 1.0)))
    if b_angle > a_angle:
        a, b = b, a
        a_angle, b_angle = b_angle, a_angle
    d_angle = math.acos(float(np.clip(np.dot(a[:3], b[:3]), -1.0, 1.0)))
    if min(d_angle + b_angle, math.pi) <= a_angle:
        return a.astype(np.float32)
    o_angle = (a_angle + d_angle + b_angle) / 2.0
    if o_angle >= math.pi:
        return np.array([a[0], a[1], a[2], -1.0], np.float32)
    r_angle = o_angle - a_angle
    axis = np.cross(a[:3], b[:3])
    n = np.linalg.norm(axis)
    if n < 1e-12:
        return np.array([a[0], a[1], a[2], math.cos(o_angle)], np.float32)
    axis /= n
    # Rodrigues rotation of a's axis by r_angle around `axis`
    c, s = math.cos(r_angle), math.sin(r_angle)
    v = a[:3]
    rot = v * c + np.cross(axis, v) * s + axis * float(np.dot(axis, v)) * (1.0 - c)
    rot /= max(np.linalg.norm(rot), 1e-12)
    return np.array([rot[0], rot[1], rot[2], math.cos(o_angle)], np.float32)


def _cone_merge_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized pairwise cone union: a, b [K,4] -> [K,4]. Same math as
    _cone_merge, branchless over the batch (the 10k-light build does
    ~N log N merges — python-scalar merges were the build bottleneck)."""
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    aa = np.arccos(np.clip(a[:, 3], -1.0, 1.0))
    ba = np.arccos(np.clip(b[:, 3], -1.0, 1.0))
    swap = ba > aa
    a2 = np.where(swap[:, None], b, a)
    b2 = np.where(swap[:, None], a, b)
    aa2 = np.where(swap, ba, aa)
    ba2 = np.where(swap, aa, ba)
    ad, bd = a2[:, :3], b2[:, :3]
    da = np.arccos(np.clip(np.sum(ad * bd, axis=-1), -1.0, 1.0))
    contained = np.minimum(da + ba2, np.pi) <= aa2 + 1e-12
    o = 0.5 * (aa2 + da + ba2)
    full = o >= np.pi
    r = o - aa2
    axis = np.cross(ad, bd)
    n = np.linalg.norm(axis, axis=-1)
    degen = n < 1e-12
    axis = axis / np.maximum(n, 1e-12)[:, None]
    c, s = np.cos(r)[:, None], np.sin(r)[:, None]
    rot = (
        ad * c
        + np.cross(axis, ad) * s
        + axis * np.sum(axis * ad, axis=-1)[:, None] * (1.0 - c)
    )
    rot = rot / np.maximum(np.linalg.norm(rot, axis=-1), 1e-12)[:, None]
    dir_out = np.where((contained | full | degen)[:, None], ad, rot)
    cos_out = np.where(
        contained, a2[:, 3], np.where(full, -1.0, np.cos(np.minimum(o, np.pi)))
    )
    return np.concatenate([dir_out, cos_out[:, None]], axis=-1).astype(np.float32)


def _cone_reduce(cones: np.ndarray) -> np.ndarray:
    """Union of many cones by batched tree reduction: [K,4] -> [4]."""
    c = np.asarray(cones, np.float32).reshape(-1, 4)
    while len(c) > 1:
        half = len(c) // 2
        merged = _cone_merge_batch(c[:half], c[half : 2 * half])
        c = np.concatenate([merged, c[2 * half :]], axis=0)
    return c[0]


def _cone_merge_many(cones: np.ndarray) -> np.ndarray:
    cones = np.asarray(cones, np.float32).reshape(-1, 4)
    if len(cones) == 1:
        return cones[0]
    return _cone_reduce(cones)


def _cone_cost_vec(cos: np.ndarray, two_sided: np.ndarray) -> np.ndarray:
    """Vectorized _cone_cost over arrays."""
    cos = np.clip(np.asarray(cos, np.float64), -1.0, 1.0)
    o = np.where(two_sided, np.pi, np.arccos(cos))
    w = np.minimum(o + np.pi / 2.0, np.pi)
    sin_o = np.sin(o)
    b = (np.pi / 2.0) * (
        2.0 * w * sin_o - np.cos(o - 2.0 * w) - 2.0 * o * sin_o + np.cos(o)
    )
    return (2.0 * np.pi) * (1.0 - cos) + b


def _bound_cone(cones: np.ndarray) -> tuple[np.ndarray, float]:
    """Cheap conservative bounding cone (axis, cos) of many cones: axis =
    normalized mean direction, aperture = max(angle(axis, d_i) + ap_i).
    Used ONLY for SAOH split scoring — the tree's stored node cones stay
    exact pairwise merges (children union in fill)."""
    c = np.asarray(cones, np.float64)
    axis = c[:, :3].sum(axis=0)
    nrm = np.linalg.norm(axis)
    if nrm < 1e-9:
        axis = c[0, :3]
    else:
        axis = axis / nrm
    ang = np.arccos(np.clip(c[:, :3] @ axis, -1.0, 1.0)) + np.arccos(
        np.clip(c[:, 3], -1.0, 1.0)
    )
    return axis, float(np.cos(min(float(ang.max()), np.pi)))


def _prefix_cone_cos(cones: np.ndarray) -> np.ndarray:
    """Inclusive prefix bounding-cone COSINE, [n,4] -> [n].

    Conservative fixed-axis bound: every prefix cone is anchored at the
    first element's axis, aperture = max over the prefix of
    angle(d0, d_i) + aperture_i. Slightly looser than the exact rotating
    merge, but the SAOH sweep only consumes the cosine and this is 4
    numpy ops instead of log(n) batched Rodrigues merges — the build's
    hot path over thousands of medium nodes."""
    c = np.asarray(cones, np.float64)
    d0 = c[0, :3]
    ang = np.arccos(np.clip(c[:, :3] @ d0, -1.0, 1.0)) + np.arccos(
        np.clip(c[:, 3], -1.0, 1.0)
    )
    return np.cos(np.minimum(np.maximum.accumulate(ang), np.pi))


def _cone_cost(cos: float, two_sided: bool) -> float:
    """ref light_tree_builder.zig coneCost: orientation measure of a cone."""
    o = math.pi if two_sided else math.acos(float(np.clip(cos, -1.0, 1.0)))
    w = min(o + math.pi / 2.0, math.pi)
    sin_o = math.sin(o)
    b = (math.pi / 2.0) * (
        2.0 * w * sin_o - math.cos(o - 2.0 * w) - 2.0 * o * sin_o + math.cos(o)
    )
    return (2.0 * math.pi) * (1.0 - float(np.clip(cos, -1.0, 1.0))) + b


def _surface_area(lo: np.ndarray, hi: np.ndarray) -> float:
    e = np.maximum(hi - lo, 0.0)
    return float(2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0]))


class _Lights:
    """Per-light SAOH attributes (AABB from bounding sphere)."""

    def __init__(self, centers, radii, cones, powers, two_sided):
        self.centers = np.asarray(centers, np.float32)
        self.radii = np.asarray(radii, np.float32)
        self.cones = np.asarray(cones, np.float32)
        self.powers = np.asarray(powers, np.float32)
        self.two_sided = np.asarray(two_sided, bool)
        self.lo = self.centers - self.radii[:, None]
        self.hi = self.centers + self.radii[:, None]


def _variance(powers: np.ndarray) -> float:
    """Incremental power variance (ref light_tree_builder.zig variance())."""
    p = powers[powers > 0.0]
    if len(p) == 0:
        return 0.0
    return float(abs(np.mean(p.astype(np.float64) ** 2) - np.mean(p.astype(np.float64)) ** 2))


_SWEEP_THRESHOLD = 128
_NUM_SLICES = 16


def _best_split(L: _Lights, members) -> tuple[list[int], list[int]]:
    """SAOH candidate sweep (ref evaluateSplits): axis slices at light AABB
    maxima (or bins for big sets), explicit small-set partitions, plus three
    normal-cone half-space splits. Falls back to a spatial median when every
    candidate leaves a side empty (the reference would emit a multi-light
    leaf there; singleton leaves need a forced split).

    Candidates are boolean MASKS over the member array and every side
    aggregate is a vectorized numpy reduction (the ref parallelizes the
    same sweep with threads, light_tree_builder.zig:389; the old per-member
    python scoring was O(n^2) scalar work — minutes at 10k lights)."""
    idx = np.asarray(members, np.int64)
    n = len(idx)
    if n == 2:  # only one real partition — nothing to score
        return [int(idx[0])], [int(idx[1])]
    lo = L.lo[idx].min(axis=0)
    hi = L.hi[idx].max(axis=0)
    extent = np.maximum(hi - lo, 1e-20)
    bounds_sa = max(_surface_area(lo, hi), 1e-20)
    cone_axis, cone_cos = _bound_cone(L.cones[idx])
    two = bool(L.two_sided[idx].any())
    cone_weight = max(_cone_cost(cone_cos, two), 1e-20)
    maxe, mine = float(extent.max()), float(extent.min())

    norm = 1.0 / max(bounds_sa * cone_weight, 1e-20)
    best_mask, best_cost = None, None

    def consider(m: np.ndarray, cost: float):
        nonlocal best_mask, best_cost
        if best_cost is None or cost < best_cost:
            best_cost, best_mask = cost, m

    def side_cost(part_idx: np.ndarray) -> float:
        plo = L.lo[part_idx].min(axis=0)
        phi = L.hi[part_idx].max(axis=0)
        _, pcos = _bound_cone(L.cones[part_idx])
        ptwo = bool(L.two_sided[part_idx].any())
        return (
            float(L.powers[part_idx].sum())
            * _cone_cost(pcos, ptwo)
            * _surface_area(plo, phi)
        )

    if n <= 4:
        # explicit partitions (ref evaluateSplits 2/3/4-light cases)
        import itertools

        reg = maxe / mine
        for k in range(1, n // 2 + 1):
            for combo in itertools.combinations(range(n), k):
                m = np.zeros(n, bool)
                m[list(combo)] = True
                consider(m, reg * (side_cost(idx[m]) + side_cost(idx[~m])) * norm)
    else:
        # axis sweeps over ALL n-1 sorted boundaries, scored vectorized
        # from prefix/suffix scans (power cumsum, running bbox, doubling
        # cone merges) — O(n log n) per node instead of O(n^2) scalar
        his = L.hi[idx]
        for a in range(3):
            order = np.argsort(his[:, a], kind="stable")
            oi = idx[order]
            pw = L.powers[oi].astype(np.float64)
            lo_o, hi_o = L.lo[oi], L.hi[oi]
            two_o = L.two_sided[oi]
            cn_o = L.cones[oi]

            p_pw = np.cumsum(pw)
            p_lo = np.minimum.accumulate(lo_o, axis=0)
            p_hi = np.maximum.accumulate(hi_o, axis=0)
            p_two = np.maximum.accumulate(two_o)
            p_cos = _prefix_cone_cos(cn_o)
            s_pw = np.cumsum(pw[::-1])[::-1]
            s_lo = np.minimum.accumulate(lo_o[::-1], axis=0)[::-1]
            s_hi = np.maximum.accumulate(hi_o[::-1], axis=0)[::-1]
            s_two = np.maximum.accumulate(two_o[::-1])[::-1]
            s_cos = _prefix_cone_cos(cn_o[::-1])[::-1]

            def sa(lo_b, hi_b):
                e = np.maximum(hi_b - lo_b, 0.0)
                return 2.0 * (
                    e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]
                )

            # split before element k (left = first k): valid where the
            # sort key strictly increases (matches the `hi < d` candidates)
            ks = np.arange(1, n)
            valid = his[order][1:, a] > his[order][:-1, a]
            left_c = (
                p_pw[:-1]
                * _cone_cost_vec(p_cos[:-1], p_two[:-1])
                * sa(p_lo[:-1], p_hi[:-1])
            )
            right_c = (
                s_pw[1:]
                * _cone_cost_vec(s_cos[1:], s_two[1:])
                * sa(s_lo[1:], s_hi[1:])
            )
            reg = maxe / float(extent[a])
            costs = np.where(valid, reg * (left_c + right_c) * norm, np.inf)
            k_best = int(np.argmin(costs))
            if np.isfinite(costs[k_best]):
                m = np.zeros(n, bool)
                m[order[: ks[k_best]]] = True
                consider(m, float(costs[k_best]))
        # normal-cone half-space splits around the cluster cone's basis
        t, b = _onb(cone_axis)
        dirs = L.cones[idx][:, :3].astype(np.float64)
        reg = maxe / mine
        for axis_v in (t, b, cone_axis):
            m = dirs @ np.asarray(axis_v, np.float64) < 0.0
            nl = int(m.sum())
            if nl == 0 or nl == n:
                continue
            consider(m, reg * (side_cost(idx[m]) + side_cost(idx[~m])) * norm)

    if best_mask is not None:
        return list(idx[best_mask]), list(idx[~best_mask])
    # every candidate exhausted: spatial median on the longest axis
    a = int(np.argmax(extent))
    order = idx[np.argsort(L.centers[idx, a])]
    half = n // 2
    return list(order[:half]), list(order[half:])


def _onb(n):
    n = np.asarray(n, np.float64)
    a = np.array([0.0, 1.0, 0.0]) if abs(n[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
    t = np.cross(a, n)
    t /= max(np.linalg.norm(t), 1e-12)
    return t, np.cross(n, t)


def build_light_tree(
    centers: np.ndarray,  # [L,3] finite-light bounding-sphere centers
    radii: np.ndarray,  # [L]
    cones: np.ndarray,  # [L,4]
    powers: np.ndarray,  # [L]
    two_sided: np.ndarray,  # [L] bool
    finite_mask: np.ndarray,  # [L] bool
) -> LightTree | None:
    L = len(powers)
    fin = [i for i in range(L) if finite_mask[i] and powers[i] > 0.0]
    inf = [i for i in range(L) if not finite_mask[i] and powers[i] > 0.0]
    if not fin:
        return None

    lights = _Lights(centers, radii, cones, powers, two_sided)
    nodes = []  # dicts
    light_leaf = np.full(L, -1, np.int32)

    def fill(idx_list, ni, parent, depth):
        """Fill node slot `ni` for idx_list; children get ADJACENT slots
        (child1 = child0 + 1, the reference's node layout)."""
        if len(idx_list) == 1:
            li = idx_list[0]
            nodes[ni] = dict(
                center=centers[li], radius=float(radii[li]), cone=cones[li],
                power=float(powers[li]), variance=0.0,
                two_sided=bool(two_sided[li]),
                child0=-1, light=li, parent=parent, depth=depth,
            )
            light_leaf[li] = ni
            return
        left, right = _best_split(lights, idx_list)
        c0 = len(nodes)
        nodes.append({})
        nodes.append({})
        fill(left, c0, ni, depth + 1)
        fill(right, c0 + 1, ni, depth + 1)
        c1 = c0 + 1
        lo = lights.lo[idx_list].min(axis=0)
        hi = lights.hi[idx_list].max(axis=0)
        ctr = 0.5 * (lo + hi)
        r = 0.5 * float(np.linalg.norm(hi - lo))
        cn = _cone_merge(np.asarray(nodes[c0]["cone"]), np.asarray(nodes[c1]["cone"]))
        nodes[ni] = dict(
            center=ctr.astype(np.float32), radius=r, cone=cn,
            power=nodes[c0]["power"] + nodes[c1]["power"],
            variance=_variance(lights.powers[idx_list]),
            two_sided=nodes[c0]["two_sided"] or nodes[c1]["two_sided"],
            child0=c0, light=-1, parent=parent, depth=depth,
        )

    nodes.append({})
    fill(fin, 0, -1, 0)
    nn = len(nodes)
    sibling = np.full(nn, -1, np.int32)
    for n_ in nodes:
        if n_["child0"] >= 0:
            sibling[n_["child0"]] = n_["child0"] + 1
            sibling[n_["child0"] + 1] = n_["child0"]

    inf_p = np.asarray([powers[i] for i in inf], np.float32)
    total_inf = float(inf_p.sum())
    total = total_inf + nodes[0]["power"]
    inf_cdf = np.concatenate([[0.0], np.cumsum(inf_p) / max(total_inf, 1e-20)]).astype(np.float32)
    if len(inf):
        inf_cdf[-1] = 1.0

    return LightTree(
        center=jnp.asarray(np.stack([n_["center"] for n_ in nodes]), jnp.float32),
        radius=jnp.asarray([n_["radius"] for n_ in nodes], jnp.float32),
        cone=jnp.asarray(np.stack([n_["cone"] for n_ in nodes]), jnp.float32),
        power=jnp.asarray([n_["power"] for n_ in nodes], jnp.float32),
        variance=jnp.asarray([n_["variance"] for n_ in nodes], jnp.float32),
        two_sided=jnp.asarray([n_["two_sided"] for n_ in nodes], bool),
        child0=jnp.asarray([n_["child0"] for n_ in nodes], jnp.int32),
        light=jnp.asarray([n_["light"] for n_ in nodes], jnp.int32),
        parent=jnp.asarray([n_["parent"] for n_ in nodes], jnp.int32),
        sibling=jnp.asarray(sibling, jnp.int32),
        light_leaf=jnp.asarray(light_leaf, jnp.int32),
        depth=max(n_["depth"] for n_ in nodes),
        inf_lights=jnp.asarray(inf if inf else [0], jnp.int32),
        inf_cdf=jnp.asarray(inf_cdf if len(inf) else [0.0, 1.0], jnp.float32),
        inf_weight=(total_inf / total) if total > 0 else 0.0,
        num_finite=len(fin),
    )


# ---------------------------------------------------------------------------
# Device traversal
# ---------------------------------------------------------------------------


def _node_importance(tree: LightTree, node, p, n, total_sphere):
    """ref light_tree.zig importance(): power/d^2 x cone visibility x cos
    bound of the receiver, with the angle-sum clamping of Conty/Kulla."""
    center = small_gather(tree.center, node)
    radius = small_gather(tree.radius, node)
    cone = small_gather(tree.cone, node)
    power = small_gather(tree.power, node)
    two = small_gather(tree.two_sided, node)

    axis = p - center
    l = jnp.maximum(vm.length(axis), 1e-9)
    na = axis / l[..., None]
    da = cone[..., :3]
    cos_cone = cone[..., 3]

    sin_cu = jnp.minimum(radius / l, 1.0)
    cos_a0 = vm.dot(da, na)
    cos_a = jnp.where(two, jnp.abs(cos_a0), cos_a0)
    cos_n = jnp.maximum(-vm.dot(n, na), 0.0)

    def srt(c):
        return jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))

    cos_cu = srt(sin_cu)
    sin_cone = srt(cos_cone)
    sin_a = srt(cos_a)
    sin_n = srt(cos_n)

    def ccs(ca, cb, sa, sb):  # clampedCosSub
        return jnp.where(ca > cb, 1.0, ca * cb + sa * sb)

    def css(ca, cb, sa, sb):  # clampedSinSub
        return jnp.where(ca > cb, 0.0, sa * cb - sb * ca)

    ta = ccs(cos_a, cos_cone, sin_a, sin_cone)
    tb = css(cos_a, cos_cone, sin_a, sin_cone)
    tc = ccs(ta, cos_cu, tb, sin_cu)
    tn = ccs(cos_n, cos_cu, sin_n, sin_cu)

    ra = jnp.where(jnp.asarray(total_sphere), 1.0, tn)
    rb = jnp.maximum(tc, 0.0)
    clamped = jnp.maximum(l, 0.5 * radius)
    return jnp.maximum(ra * rb * power / (clamped * clamped), 0.0)


def _node_split(tree: LightTree, node, p, threshold):
    """Variance-driven split criterion (ref light_tree.zig Node.split):
    normalized second-moment estimate of the cluster's contribution; split
    while the estimated relative deviation exceeds the threshold."""
    center = small_gather(tree.center, node)
    radius = small_gather(tree.radius, node)
    ve = small_gather(tree.variance, node)
    ee = small_gather(tree.power, node)

    d = jnp.minimum(jnp.maximum(vm.length(p - center), 1e-9), 1.0e6)
    a = jnp.maximum(d - radius, 0.001)
    b = d + radius
    eg = 1.0 / (a * b)
    eg2 = eg * eg
    a3 = a * a * a
    b3 = b * b * b
    e2g = (b3 - a3) / (3.0 * jnp.maximum(b - a, 1e-12) * a3 * b3)
    vg = e2g - eg2
    s2 = jnp.maximum(ve * vg + ve * eg2 + ee * ee * vg, 0.0)
    ns = 1.0 / (1.0 + jnp.sqrt(s2))
    return ns < threshold


def select(tree: LightTree, p, n, total_sphere, u):
    """Stochastic root->leaf descent. Returns (light_idx int32[N], pdf[N])."""
    nshape = u.shape
    use_inf = u < tree.inf_weight
    # infinite branch: CDF pick
    ui = jnp.clip(u / max(tree.inf_weight, 1e-12), 0.0, 1.0) if tree.inf_weight > 0 else u
    k = jnp.clip(
        jnp.searchsorted(tree.inf_cdf, ui, side="right") - 1, 0, tree.inf_lights.shape[0] - 1
    )
    inf_light = small_gather(tree.inf_lights, k)
    inf_pdf = (small_gather(tree.inf_cdf, k + 1) - small_gather(tree.inf_cdf, k)) * tree.inf_weight

    # finite branch: masked descent
    node = jnp.zeros(nshape, jnp.int32)
    pdf_ = jnp.full(nshape, 1.0 - tree.inf_weight, jnp.float32)
    r = jnp.clip((u - tree.inf_weight) / max(1.0 - tree.inf_weight, 1e-12), 0.0, 1.0)
    node, pdf_, _ = _descend(tree, node, pdf_, r, p, n, total_sphere)
    fin_light = small_gather(tree.light, node)

    light = jnp.where(use_inf, inf_light, fin_light)
    out_pdf = jnp.where(use_inf, inf_pdf, pdf_)
    return light, out_pdf


def _descend(tree: LightTree, node, pdf_, r, p, n, total_sphere, steps=None):
    """Shared stochastic descent loop: walk `steps` (default tree depth)
    levels, choosing children by relative importance."""
    for _ in range(tree.depth if steps is None else steps):
        c0 = small_gather(tree.child0, node)
        leaf = c0 < 0
        c0c = jnp.maximum(c0, 0)
        w0 = _node_importance(tree, c0c, p, n, total_sphere)
        w1 = _node_importance(tree, c0c + 1, p, n, total_sphere)
        wt = w0 + w1
        p0 = jnp.where(wt > 0.0, w0 / jnp.maximum(wt, 1e-20), 0.5)
        go0 = r < p0
        psel = jnp.where(go0, p0, 1.0 - p0)
        r_new = jnp.where(go0, r / jnp.maximum(p0, 1e-12), (r - p0) / jnp.maximum(1.0 - p0, 1e-12))
        node = jnp.where(leaf, node, jnp.where(go0, c0c, c0c + 1))
        pdf_ = jnp.where(leaf, pdf_, pdf_ * psel)
        r = jnp.where(leaf, r, jnp.clip(r_new, 0.0, 1.0))
    return node, pdf_, r


def pdf(tree: LightTree, p, n, total_sphere, light_idx):
    """Selection pdf of `light_idx` from (p, n): upward parent walk."""
    li = jnp.clip(light_idx, 0, tree.light_leaf.shape[0] - 1)
    leaf = small_gather(tree.light_leaf, li)
    is_inf = leaf < 0
    # infinite pdf: CDF mass x inf_weight
    inf_pdf = jnp.zeros(light_idx.shape, jnp.float32)
    if tree.inf_weight > 0.0:
        for j in range(int(tree.inf_lights.shape[0])):
            mass = (tree.inf_cdf[j + 1] - tree.inf_cdf[j]) * tree.inf_weight
            inf_pdf = jnp.where(light_idx == tree.inf_lights[j], mass, inf_pdf)

    node = jnp.maximum(leaf, 0)
    acc = jnp.full(light_idx.shape, 1.0 - tree.inf_weight, jnp.float32)
    for _ in range(tree.depth):
        at_root = node == 0
        sib = small_gather(tree.sibling, node)
        w_self = _node_importance(tree, node, p, n, total_sphere)
        w_sib = _node_importance(tree, jnp.maximum(sib, 0), p, n, total_sphere)
        wt = w_self + w_sib
        psel = jnp.where(wt > 0.0, w_self / jnp.maximum(wt, 1e-20), 0.5)
        acc = jnp.where(at_root, acc, acc * psel)
        node = jnp.where(at_root, node, small_gather(tree.parent, node))
    return jnp.where(is_inf, inf_pdf, acc)


# ---------------------------------------------------------------------------
# Adaptive splitting (static pick budget)
# ---------------------------------------------------------------------------


def select_split(tree: LightTree, p, n, total_sphere, u, threshold, split_depth: int):
    """Adaptive-split selection with K = 2^split_depth static finite picks
    plus one stochastic infinite pick when infinite lights exist.

    Returns (lights int32[N,P], pdfs float32[N,P]); inactive picks have
    light = -1 and pdf = 0. `threshold` is per-lane (depth-decayed by the
    caller, ref helper.zig splitThreshold).
    """
    K = 1 << split_depth
    nshape = u.shape

    # -- split phase: deterministically fork while the criterion fires.
    # Slot i at split-step s forks child1 into slot i + (K >> (s+1)).
    node = jnp.full(nshape + (K,), -1, jnp.int32)
    node = node.at[..., 0].set(0)
    stoch = jnp.zeros(nshape + (K,), bool)  # sticky: no more forks below
    for s in range(split_depth):
        stride = K >> (s + 1)
        for i in range(0, K, K >> s):
            ni = node[..., i]
            active = ni >= 0
            c0 = small_gather(tree.child0, jnp.maximum(ni, 0))
            internal = active & (c0 >= 0)
            want = internal & ~stoch[..., i] & _node_split(tree, jnp.maximum(ni, 0), p, threshold)
            node = node.at[..., i].set(jnp.where(want, c0, ni))
            node = node.at[..., i + stride].set(jnp.where(want, c0 + 1, node[..., i + stride]))
            stoch = stoch.at[..., i].set(stoch[..., i] | (internal & ~want))

    # -- stochastic phase: every active slot descends to a leaf sharing the
    # same random (the reference's stack pushes copy t.random too)
    lights_out = []
    pdfs_out = []
    for i in range(K):
        ni = node[..., i]
        active = ni >= 0
        nd, pd, _ = _descend(
            tree, jnp.maximum(ni, 0), jnp.ones(nshape, jnp.float32), u, p, n, total_sphere
        )
        li = small_gather(tree.light, nd)
        lights_out.append(jnp.where(active, li, -1))
        pdfs_out.append(jnp.where(active, pd, 0.0))

    # -- one stochastic infinite pick (pdf = CDF mass, no inf_weight mix)
    if tree.inf_weight > 0.0:
        k = jnp.clip(
            jnp.searchsorted(tree.inf_cdf, u, side="right") - 1,
            0, tree.inf_lights.shape[0] - 1,
        )
        lights_out.append(small_gather(tree.inf_lights, k))
        pdfs_out.append(small_gather(tree.inf_cdf, k + 1) - small_gather(tree.inf_cdf, k))

    return jnp.stack(lights_out, -1), jnp.stack(pdfs_out, -1)


def pdf_split(tree: LightTree, p, n, total_sphere, light_idx, threshold, split_depth: int):
    """Split-aware selection pdf (ref light_tree.zig Tree.pdf with
    split_threshold > 0): record the leaf->root path, replay downward —
    levels where the criterion fires contribute 1 (deterministic fork),
    the rest contribute the stochastic branch probability."""
    li = jnp.clip(light_idx, 0, tree.light_leaf.shape[0] - 1)
    leaf = small_gather(tree.light_leaf, li)
    is_inf = leaf < 0
    inf_pdf = jnp.zeros(light_idx.shape, jnp.float32)
    if tree.inf_weight > 0.0:
        for j in range(int(tree.inf_lights.shape[0])):
            mass = tree.inf_cdf[j + 1] - tree.inf_cdf[j]  # no inf_weight mix
            inf_pdf = jnp.where(light_idx == tree.inf_lights[j], mass, inf_pdf)

    # record the path leaf -> root (padded by repeating the root)
    path = [jnp.maximum(leaf, 0)]
    for _ in range(tree.depth):
        prev = path[-1]
        par = small_gather(tree.parent, prev)
        path.append(jnp.where(prev == 0, 0, par))

    # replay root -> leaf
    acc = jnp.ones(light_idx.shape, jnp.float32)
    splits = jnp.zeros(light_idx.shape, jnp.int32)
    for j in range(tree.depth, 0, -1):
        cur = path[j]
        nxt = path[j - 1]
        valid = cur != nxt  # padded steps repeat the root
        do_split = (
            valid & (splits < split_depth) & _node_split(tree, cur, p, threshold)
        )
        c0 = small_gather(tree.child0, cur)
        c0c = jnp.maximum(c0, 0)
        w0 = _node_importance(tree, c0c, p, n, total_sphere)
        w1 = _node_importance(tree, c0c + 1, p, n, total_sphere)
        wt = w0 + w1
        w_next = jnp.where(nxt == c0c, w0, w1)
        # zero-importance clusters descend uniformly — must match _descend's
        # 0.5 fallback or select/pdf disagree on invisible subtrees
        psel_stoch = jnp.where(wt > 0.0, w_next / jnp.maximum(wt, 1e-20), 0.5)
        psel = jnp.where(do_split, 1.0, psel_stoch)
        acc = jnp.where(valid, acc * psel, acc)
        # once a stochastic step happens no more splits below
        # (ref: t.depth = max_split_depth)
        splits = jnp.where(
            valid, jnp.where(do_split, splits + 1, split_depth), splits
        )
    return jnp.where(is_inf, inf_pdf, acc)
