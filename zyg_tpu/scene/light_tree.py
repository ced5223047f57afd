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


def _cone_merge_many(cones: np.ndarray) -> np.ndarray:
    out = cones[0]
    for c in cones[1:]:
        out = _cone_merge(out, c)
    return np.asarray(out, np.float32)


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


def _evaluate_candidate(L: _Lights, members: list[int], left_of, bounds_sa, cone_weight, reg):
    """Score one split candidate (ref SplitCandidate.evaluate). Returns
    (cost, left_members, right_members) or None when one side is empty."""
    left, right = [], []
    for l in members:
        (left if left_of(l) else right).append(l)
    if not left or not right:
        return None
    sides = []
    for part in (left, right):
        lo = L.lo[part].min(axis=0)
        hi = L.hi[part].max(axis=0)
        cone = _cone_merge_many(L.cones[part])
        two = bool(L.two_sided[part].any())
        sides.append((
            float(L.powers[part].sum()), _cone_cost(cone[3], two), _surface_area(lo, hi),
        ))
    cost = reg * (
        (sides[0][0] * sides[0][1] * sides[0][2] + sides[1][0] * sides[1][1] * sides[1][2])
        / max(bounds_sa * cone_weight, 1e-20)
    )
    return cost, left, right


_SWEEP_THRESHOLD = 128
_NUM_SLICES = 16


def _best_split(L: _Lights, members: list[int]) -> tuple[list[int], list[int]]:
    """SAOH candidate sweep (ref evaluateSplits): axis slices at light AABB
    maxima (or bins for big sets), explicit small-set partitions, plus three
    normal-cone half-space splits. Falls back to a spatial median when every
    candidate leaves a side empty (the reference would emit a multi-light
    leaf there; singleton leaves need a forced split)."""
    lo = L.lo[members].min(axis=0)
    hi = L.hi[members].max(axis=0)
    extent = np.maximum(hi - lo, 1e-20)
    bounds_sa = max(_surface_area(lo, hi), 1e-20)
    cone = _cone_merge_many(L.cones[members])
    two = bool(L.two_sided[members].any())
    cone_weight = max(_cone_cost(cone[3], two), 1e-20)
    maxe, mine = float(extent.max()), float(extent.min())

    candidates = []
    n = len(members)
    if n <= 4:
        # explicit partitions (ref evaluateSplits 2/3/4-light cases)
        import itertools

        for k in range(1, n // 2 + 1):
            for combo in itertools.combinations(members, k):
                cset = set(combo)
                candidates.append((lambda l, cs=cset: l in cs, maxe / mine))
    else:
        if n <= _SWEEP_THRESHOLD:
            positions = [(float(L.hi[l][a]), a) for l in members for a in range(3)]
        else:
            positions = []
            step = maxe / _NUM_SLICES
            for a in range(3):
                num_steps = max(int(math.ceil(float(extent[a]) / max(step, 1e-20))), 1)
                step_a = float(extent[a]) / num_steps
                for i in range(1, num_steps):
                    positions.append((float(lo[a]) + i * step_a, a))
        for d, a in positions:
            candidates.append((lambda l, d=d, a=a: float(L.hi[l][a]) < d, maxe / float(extent[a])))
        # normal-cone half-space splits around the cluster cone's basis
        t, b = vm.host_orthonormal_basis(cone[:3]) if hasattr(vm, "host_orthonormal_basis") else _onb(cone[:3])
        for axis_v in (t, b, cone[:3]):
            candidates.append(
                (lambda l, v=np.asarray(axis_v, np.float32): float(np.dot(v, L.cones[l][:3])) < 0.0,
                 maxe / mine)
            )

    best = None
    for left_of, reg in candidates:
        r = _evaluate_candidate(L, members, left_of, bounds_sa, cone_weight, reg)
        if r is not None and (best is None or r[0] < best[0]):
            best = r
    if best is not None:
        return best[1], best[2]
    # every candidate exhausted: spatial median on the longest axis
    a = int(np.argmax(extent))
    order = sorted(members, key=lambda l: float(L.centers[l][a]))
    half = len(order) // 2
    return order[:half], order[half:]


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
