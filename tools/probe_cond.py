"""Probe 5: (a) does XLA flatten scalar lax.cond inside while_loop on TPU?
(b) unified node+leaf traversal body vs the shipped phase-split cond body.

Run on TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import zyg_tpu  # noqa: F401
from zyg_tpu.scene import trimesh
from zyg_tpu.scene.trimesh import (
    BRANCH, LEAF_SIZE, _MISS_KEY, _inv_dir, _tri_test, MeshHit,
)

# rank-based traversal state (the shipped TState moved to mask-based
# continuations; this probe keeps the historical rank variant runnable)
from typing import NamedTuple as _NT
import jax as _jax


class TState(_NT):
    node: _jax.Array
    rank: _jax.Array
    sp: _jax.Array
    stack: _jax.Array
    live: _jax.Array
    t: _jax.Array
    prim: _jax.Array
    u: _jax.Array
    v: _jax.Array
    it: _jax.Array

# optimal 19-comparator sorting network for 8 keys (was trimesh._SORT8;
# the shipped traversal replaced it with mask-min continuations — kept
# here so the historical probe variants still run)
_SORT8 = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6),
    (1, 4), (3, 6),
    (2, 4), (3, 5),
    (3, 4),
]

N = 1 << 20


def make_rays(seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-6, 6, size=(N, 3)).astype(np.float32)
    tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def timeit(f, *args):
    out = f(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best, out


# ---------------------------------------------------------------- part (a)
def part_a(rows):
    W = rows.shape[0]
    o, d = make_rays()
    inv = _inv_dir(d)

    def heavy(c):
        idx, i = c
        row = rows[idx]
        s = row.sum(axis=-1)
        return ((idx * 1664525 + s.astype(jnp.int32)) % W, i + 1)

    def cheap(c):
        idx, i = c
        return (idx, i + 1)

    @jax.jit
    def run(idx0, take_heavy):
        def cond(c):
            return c[1] < 128

        def body(c):
            return jax.lax.cond(take_heavy, heavy, cheap, c)

        return jax.lax.while_loop(cond, body, (idx0, jnp.int32(0)))

    idx0 = jnp.arange(N, dtype=jnp.int32) % W
    t_true, _ = timeit(run, idx0, jnp.bool_(True))
    t_false, _ = timeit(run, idx0, jnp.bool_(False))
    print(
        f"cond(all-heavy)={t_true/128/N*1e9:6.2f} ns  "
        f"cond(all-cheap)={t_false/128/N*1e9:6.2f} ns  "
        f"(flattened if cheap ~= heavy)",
        flush=True,
    )


# ---------------------------------------------------------------- part (b)
def unified_stage(arena, root, o, d, tmin, tmax):
    """Unified body: node lanes AND parked-leaf lanes work every iteration."""
    rows = arena.node_rows
    trows = arena.tri_rows
    (max_depth,), = arena.meta.keys()
    stack_d = int(max_depth) + 1
    n = o.shape[:-1]
    inv = _inv_dir(d)
    i32 = jnp.int32

    state = TState(
        node=jnp.maximum(jnp.broadcast_to(root, n), 0),
        rank=jnp.zeros(n, i32),
        sp=jnp.zeros(n, i32),
        stack=jnp.zeros(n + (stack_d,), i32),
        live=jnp.broadcast_to(root, n) >= 0,
        t=jnp.broadcast_to(tmax, n).astype(jnp.float32),
        prim=jnp.full(n, -1, i32),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        it=jnp.int32(0),
    )
    iota_s = jnp.arange(stack_d, dtype=i32)

    def cond(s):
        return (jnp.sum(s.live) > 0) & (s.it < 65536)

    def body(s: TState):
        is_node = s.live & (s.node >= 0)
        at_leaf = s.live & (s.node <= -2)
        B = BRANCH

        # ---- node lanes
        row = rows[jnp.maximum(s.node, 0)]
        lox = (row[..., 0 * B:1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B:2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B:3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B:4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B:5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B:6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)), jnp.minimum(loz, hiz))
        far = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)), jnp.maximum(loz, hiz))
        refs = row[..., 6 * B:7 * B]
        nearc = jnp.maximum(jnp.maximum(near, tmin), 0.0)
        hit = (nearc <= far) & (refs != -1.0) & (nearc < s.t[..., None])
        hit = hit & is_node[..., None]
        tbits = jax.lax.bitcast_convert_type(nearc, i32) & i32(~(B - 1))
        keys = jnp.where(hit, tbits | jnp.arange(B, dtype=i32), _MISS_KEY | jnp.arange(B, dtype=i32))
        k = [keys[..., j] for j in range(B)]
        for a, b in _SORT8:
            ka, kb = k[a], k[b]
            k[a] = jnp.minimum(ka, kb)
            k[b] = jnp.maximum(ka, kb)
        h = jnp.sum(hit, axis=-1).astype(i32)
        key_r = jnp.zeros(n, i32)
        key_r1 = jnp.zeros(n, i32)
        for j in range(B):
            key_r = jnp.where(s.rank == j, k[j], key_r)
            key_r1 = jnp.where(s.rank + 1 == j, k[j], key_r1)
        slot_r = key_r & (B - 1)
        slot_r1 = key_r1 & (B - 1)
        tn_r = jax.lax.bitcast_convert_type(key_r & i32(~(B - 1)), jnp.float32)
        valid = is_node & (s.rank < h) & (tn_r < s.t)
        cref = jnp.zeros(n, jnp.float32)
        cref1 = jnp.zeros(n, jnp.float32)
        for j in range(B):
            cref = jnp.where(slot_r == j, refs[..., j], cref)
            cref1 = jnp.where(slot_r1 == j, refs[..., j], cref1)
        cref = cref.astype(i32)
        cref1 = cref1.astype(i32)
        descend = valid & (cref != -1)
        more = valid & (s.rank + 1 < h)
        push = descend & more
        last_one = s.rank + 2 == h
        ent = jnp.where(last_one, cref1 * 2 + 1, (s.node * B + (s.rank + 1)) * 2)
        onehot = iota_s == s.sp[..., None]
        stack = jnp.where(push[..., None] & onehot, ent[..., None], s.stack)
        sp = s.sp + push.astype(i32)

        # ---- leaf lanes (same iteration)
        g = jnp.where(at_leaf, -s.node - 2, 0)
        tr = trows[g].reshape(n + (LEAF_SIZE, 9))
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

        # ---- shared pop
        need_pop = (is_node & ~descend) | at_leaf
        can_pop = need_pop & (sp > 0)
        top = jnp.sum(
            jnp.where((iota_s == (sp - 1)[..., None]) & can_pop[..., None], stack, 0),
            axis=-1,
        )
        sp2 = sp - can_pop.astype(i32)
        live = s.live & ~(need_pop & ~can_pop)
        top_direct = (top & 1) == 1
        top_ref = jnp.right_shift(top - 1, 1)
        top_node = jnp.right_shift(top, 1) // B
        top_rank = jnp.right_shift(top, 1) % B
        node = jnp.where(
            descend, cref,
            jnp.where(can_pop, jnp.where(top_direct, top_ref, top_node), s.node),
        )
        rank = jnp.where(
            descend, 0,
            jnp.where(can_pop & ~top_direct, top_rank, jnp.where(can_pop, 0, s.rank)),
        )
        return TState(node=node, rank=rank, sp=sp2, stack=stack, live=live,
                      t=t_b, prim=p_b, u=u_b, v=v_b, it=s.it + 1)

    final = jax.lax.while_loop(cond, body, state)
    return MeshHit(t=final.t, prim=final.prim, u=final.u, v=final.v, iters=final.it)


def part_b(arena):
    o, d = make_rays()
    root = jnp.zeros(N, jnp.int32)

    base = jax.jit(lambda o, d: trimesh._traverse_stage(arena, root, o, d, 1e-4, 1e9, False, None)[0])
    t0, hit0 = timeit(base, o, d)
    it0 = int(hit0.iters)
    print(f"base(split): {t0*1e3:8.1f} ms iters={it0} -> {t0/it0/N*1e9:6.2f} ns/it  {N/t0/1e6:5.2f} Mrays/s", flush=True)

    uni = jax.jit(lambda o, d: unified_stage(arena, root, o, d, 1e-4, 1e9))
    t1, hit1 = timeit(uni, o, d)
    it1 = int(hit1.iters)
    same = (
        bool(jnp.all(hit0.prim == hit1.prim))
        and bool(jnp.all(jnp.abs(hit0.t - hit1.t) < 1e-5))
    )
    print(
        f"unified    : {t1*1e3:8.1f} ms iters={it1} -> {t1/it1/N*1e9:6.2f} ns/it  "
        f"{N/t1/1e6:5.2f} Mrays/s  same_hits={same}",
        flush=True,
    )


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}", flush=True)
    arena = trimesh.build_arena([trimesh.make_trefoil_mesh(512, 480)])
    part_a(arena.node_rows)
    part_b(arena)
