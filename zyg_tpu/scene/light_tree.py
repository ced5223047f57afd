"""Many-light sampling tree (ref: src/core/scene/light/light_tree.zig).

The reference builds a BVH over lights with compressed nodes and picks up to
64 lights per shading point via adaptive stochastic traversal. The TPU
equivalent: a binary tree flattened to SoA arrays on the host
(``build_light_tree``), traversed on device by a *bounded masked descent*
(``select``) — every lane walks root->leaf, accumulating the branch pdf —
plus the matching *upward* pdf walk (``pdf``) for MIS, driven by
parent/sibling links (the reference's recursive pdf() becomes a fixed-depth
loop). Adaptive splitting is not replicated (one pick per NEE sample keeps
the estimator unbiased; variance differs, not bias).

Per-node importance follows the reference's Kulla/Conty-style estimate
(light_tree.zig importance()): power / d^2, attenuated by the cluster's
bounding-cone-vs-direction visibility and the receiver's cos bound.

Infinite lights live outside the tree in a power CDF mixed in by
``infinite_weight`` (light_tree.zig randomLight's ip split).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import small_gather


_ARRAY_FIELDS = (
    "center", "radius", "cone", "power", "two_sided", "child0", "light",
    "parent", "sibling", "light_leaf", "inf_lights", "inf_cdf",
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
    two_sided: jax.Array  # bool[Nn]
    child0: jax.Array  # int32[Nn] first child (-1 = leaf)
    light: jax.Array  # int32[Nn] light index at leaves (-1 inside)
    parent: jax.Array  # int32[Nn] (-1 at root)
    sibling: jax.Array  # int32[Nn] (-1 at root)
    light_leaf: jax.Array  # int32[L] leaf node per light (-1 for infinite)
    inf_lights: jax.Array  # int32[I] light indices ([0] dummy when empty)
    inf_cdf: jax.Array  # float32[I+1]

    def __init__(self, *, depth: int, inf_weight: float, **arrays):
        self.depth = int(depth)
        self.inf_weight = float(inf_weight)
        for k in _ARRAY_FIELDS:
            setattr(self, k, arrays[k])

    def tree_flatten(self):
        return tuple(getattr(self, k) for k in _ARRAY_FIELDS), (self.depth, self.inf_weight)

    @classmethod
    def tree_unflatten(cls, aux, children):
        depth, inf_weight = aux
        return cls(depth=depth, inf_weight=inf_weight, **dict(zip(_ARRAY_FIELDS, children)))


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------


def _merge_cones(axes, cosines):
    """Conservative union of bounding cones: average axis, widened angle."""
    axis = axes.mean(axis=0)
    n = np.linalg.norm(axis)
    if n < 1e-8:
        return np.array([0.0, 0.0, 1.0], np.float32), -1.0
    axis = axis / n
    # widen by the max (angle between axis and member axis + member angle)
    ang = 0.0
    for a, c in zip(axes, cosines):
        d = float(np.clip(np.dot(axis, a), -1.0, 1.0))
        ang = max(ang, np.arccos(d) + np.arccos(float(np.clip(c, -1.0, 1.0))))
    return axis.astype(np.float32), float(np.cos(min(ang, np.pi)))


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

    nodes = []  # dicts
    light_leaf = np.full(L, -1, np.int32)

    def fill(idx_list, ni, parent, depth):
        """Fill node slot `ni` for idx_list; children get ADJACENT slots
        (child1 = child0 + 1, the reference's node layout)."""
        if len(idx_list) == 1:
            li = idx_list[0]
            nodes[ni] = dict(
                center=centers[li], radius=float(radii[li]), cone=cones[li],
                power=float(powers[li]), two_sided=bool(two_sided[li]),
                child0=-1, light=li, parent=parent, depth=depth,
            )
            light_leaf[li] = ni
            return
        c = centers[idx_list]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = sorted(idx_list, key=lambda i: centers[i][axis])
        half = len(order) // 2
        c0 = len(nodes)
        nodes.append({})
        nodes.append({})
        fill(order[:half], c0, ni, depth + 1)
        fill(order[half:], c0 + 1, ni, depth + 1)
        c1 = c0 + 1
        ctr = (np.asarray(nodes[c0]["center"]) + np.asarray(nodes[c1]["center"])) * 0.5
        r = max(
            float(np.linalg.norm(ctr - nodes[k]["center"])) + nodes[k]["radius"]
            for k in (c0, c1)
        )
        ax, cw = _merge_cones(
            np.stack([np.asarray(nodes[c0]["cone"][:3]), np.asarray(nodes[c1]["cone"][:3])]),
            np.asarray([nodes[c0]["cone"][3], nodes[c1]["cone"][3]]),
        )
        nodes[ni] = dict(
            center=ctr.astype(np.float32), radius=r,
            cone=np.concatenate([ax, [cw]]).astype(np.float32),
            power=nodes[c0]["power"] + nodes[c1]["power"],
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
    pdf = jnp.full(nshape, 1.0 - tree.inf_weight, jnp.float32)
    r = jnp.clip((u - tree.inf_weight) / max(1.0 - tree.inf_weight, 1e-12), 0.0, 1.0)
    for _ in range(tree.depth):
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
        pdf = jnp.where(leaf, pdf, pdf * psel)
        r = jnp.where(leaf, r, jnp.clip(r_new, 0.0, 1.0))
    fin_light = small_gather(tree.light, node)

    light = jnp.where(use_inf, inf_light, fin_light)
    out_pdf = jnp.where(use_inf, inf_pdf, pdf)
    return light, out_pdf


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
