"""Probe 6: incrementally build node_body inside a scan to find the
expensive increment over the 3.7ns gather+slab core.

Steps: a=gather+slab+sort, b=+rank/cref chains, c=+stack push (carried
[N,D]), d=+pop top extraction, e=+hit carries (t/prim/u/v). Run on TPU."""

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
from zyg_tpu.scene.trimesh import BRANCH, _MISS_KEY, _inv_dir

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
K = 64
D = 8


def timeit(f, *args):
    out = f(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    arena = trimesh.build_arena([trimesh.make_trefoil_mesh(512, 480)])
    rows = arena.node_rows
    W = rows.shape[0]
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.uniform(-6, 6, size=(N, 3)).astype(np.float32))
    d0 = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d = jnp.asarray(d0)
    inv = _inv_dir(d)
    i32 = jnp.int32
    iota_s = jnp.arange(D, dtype=i32)
    B = BRANCH

    def slab_sort(idx, tcur):
        row = rows[idx]
        lox = (row[..., 0 * B:1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B:2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B:3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B:4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B:5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B:6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)), jnp.minimum(loz, hiz))
        far = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)), jnp.maximum(loz, hiz))
        refs = row[..., 6 * B:7 * B]
        nearc = jnp.maximum(near, 0.0)
        hit = (nearc <= far) & (refs != -1.0) & (nearc < tcur[..., None])
        tb = jax.lax.bitcast_convert_type(nearc, i32) & i32(~(B - 1))
        keys = jnp.where(hit, tb | jnp.arange(B, dtype=i32), _MISS_KEY | jnp.arange(B, dtype=i32))
        k = [keys[..., j] for j in range(B)]
        for a, b2 in _SORT8:
            ka, kb = k[a], k[b2]
            k[a] = jnp.minimum(ka, kb)
            k[b2] = jnp.maximum(ka, kb)
        h = jnp.sum(hit, axis=-1).astype(i32)
        return k, h, refs

    def run_case(label, body, init):
        @jax.jit
        def run():
            c, _ = jax.lax.scan(lambda c, _: (body(c), None), init, None, length=K)
            return c

        t = timeit(run)
        print(f"{label}: {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    idx0 = jnp.arange(N, dtype=i32) % W
    t0 = jnp.full((N,), 1e9, jnp.float32)

    # a: gather+slab+sort
    def body_a(c):
        idx, tcur = c
        k, h, refs = slab_sort(idx, tcur)
        idx = (idx * 1664525 + 12345 + k[0]) % W
        return (idx, tcur)

    run_case("a slab+sort          ", body_a, (idx0, t0))

    # b: + rank/cref select chains
    def chains(k, h, refs, rank, tcur, node):
        key_r = jnp.zeros((N,), i32)
        key_r1 = jnp.zeros((N,), i32)
        for j in range(B):
            key_r = jnp.where(rank == j, k[j], key_r)
            key_r1 = jnp.where(rank + 1 == j, k[j], key_r1)
        slot_r = key_r & (B - 1)
        slot_r1 = key_r1 & (B - 1)
        tn_r = jax.lax.bitcast_convert_type(key_r & i32(~(B - 1)), jnp.float32)
        valid = (rank < h) & (tn_r < tcur)
        cref = jnp.zeros((N,), jnp.float32)
        cref1 = jnp.zeros((N,), jnp.float32)
        for j in range(B):
            cref = jnp.where(slot_r == j, refs[..., j], cref)
            cref1 = jnp.where(slot_r1 == j, refs[..., j], cref1)
        return valid, cref.astype(i32), cref1.astype(i32)

    def body_b(c):
        idx, tcur, rank = c
        k, h, refs = slab_sort(idx, tcur)
        valid, cref, cref1 = chains(k, h, refs, rank, tcur, idx)
        idx = (idx * 1664525 + 12345 + cref + cref1) % W
        rank = (rank + valid.astype(i32)) % B
        return (idx, tcur, rank)

    run_case("b +rank/cref chains  ", body_b, (idx0, t0, jnp.zeros((N,), i32)))

    # c: + stack push
    def body_c(c):
        idx, tcur, rank, stack, sp = c
        k, h, refs = slab_sort(idx, tcur)
        valid, cref, cref1 = chains(k, h, refs, rank, tcur, idx)
        push = valid & (cref > 0)
        ent = jnp.where(rank + 2 == h, cref1 * 2 + 1, (idx * B + rank + 1) * 2)
        onehot = iota_s == sp[..., None]
        stack = jnp.where(push[..., None] & onehot, ent[..., None], stack)
        sp = jnp.clip(sp + push.astype(i32), 0, D - 1)
        idx = (idx * 1664525 + 12345 + cref) % W
        rank = (rank + valid.astype(i32)) % B
        return (idx, tcur, rank, stack, sp)

    run_case("c +stack push        ", body_c,
             (idx0, t0, jnp.zeros((N,), i32), jnp.zeros((N, D), i32), jnp.zeros((N,), i32)))

    # d: + pop
    def body_d(c):
        idx, tcur, rank, stack, sp = c
        k, h, refs = slab_sort(idx, tcur)
        valid, cref, cref1 = chains(k, h, refs, rank, tcur, idx)
        push = valid & (cref > 0)
        ent = jnp.where(rank + 2 == h, cref1 * 2 + 1, (idx * B + rank + 1) * 2)
        onehot = iota_s == sp[..., None]
        stack = jnp.where(push[..., None] & onehot, ent[..., None], stack)
        sp = jnp.clip(sp + push.astype(i32), 0, D - 1)
        need_pop = ~valid
        can_pop = need_pop & (sp > 0)
        top = jnp.sum(jnp.where((iota_s == (sp - 1)[..., None]) & can_pop[..., None], stack, 0), axis=-1)
        sp = sp - can_pop.astype(i32)
        top_direct = (top & 1) == 1
        top_ref = jnp.right_shift(top - 1, 1)
        top_node = jnp.right_shift(top, 1) // B
        top_rank = jnp.right_shift(top, 1) % B
        node = jnp.where(valid, cref, jnp.where(can_pop, jnp.where(top_direct, top_ref, top_node), idx))
        rank = jnp.where(valid, 0, jnp.where(can_pop & ~top_direct, top_rank, rank))
        idx = jnp.abs(node * 1664525 + 12345) % W
        return (idx, tcur, rank, stack, sp)

    run_case("d +pop               ", body_d,
             (idx0, t0, jnp.zeros((N,), i32), jnp.zeros((N, D), i32), jnp.zeros((N,), i32)))

    # e: + hit carries (t/prim/u/v/live as in TState)
    def body_e(c):
        idx, tcur, rank, stack, sp, prim, u, v, live = c
        k, h, refs = slab_sort(idx, tcur)
        valid, cref, cref1 = chains(k, h, refs, rank, tcur, idx)
        valid = valid & live
        push = valid & (cref > 0)
        ent = jnp.where(rank + 2 == h, cref1 * 2 + 1, (idx * B + rank + 1) * 2)
        onehot = iota_s == sp[..., None]
        stack = jnp.where(push[..., None] & onehot, ent[..., None], stack)
        sp = jnp.clip(sp + push.astype(i32), 0, D - 1)
        need_pop = ~valid & live
        can_pop = need_pop & (sp > 0)
        top = jnp.sum(jnp.where((iota_s == (sp - 1)[..., None]) & can_pop[..., None], stack, 0), axis=-1)
        sp = sp - can_pop.astype(i32)
        live = live & ~(need_pop & ~can_pop)
        top_direct = (top & 1) == 1
        top_ref = jnp.right_shift(top - 1, 1)
        top_node = jnp.right_shift(top, 1) // B
        top_rank = jnp.right_shift(top, 1) % B
        node = jnp.where(valid, cref, jnp.where(can_pop, jnp.where(top_direct, top_ref, top_node), idx))
        rank = jnp.where(valid, 0, jnp.where(can_pop & ~top_direct, top_rank, rank))
        found = (node & 3) == 3
        tcur = jnp.where(found, tcur * 0.999, tcur)
        prim = jnp.where(found, node, prim)
        u = jnp.where(found, u + 0.1, u)
        v = jnp.where(found, v - 0.1, v)
        idx = jnp.abs(node * 1664525 + 12345) % W
        return (idx, tcur, rank, stack, sp, prim, u, v, live)

    run_case("e +hit carries       ", body_e,
             (idx0, t0, jnp.zeros((N,), i32), jnp.zeros((N, D), i32), jnp.zeros((N,), i32),
              jnp.full((N,), -1, i32), jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
              jnp.ones((N,), bool)))

    # f: case e wrapped in while_loop with a sum-reduction cond
    @jax.jit
    def run_f():
        init = (idx0, t0, jnp.zeros((N,), i32), jnp.zeros((N, D), i32), jnp.zeros((N,), i32),
                jnp.full((N,), -1, i32), jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
                jnp.ones((N,), bool), jnp.int32(0))

        def cond(c):
            return (jnp.sum(c[8]) > 0) & (c[9] < K)

        def body(c):
            out = body_e(c[:9])
            return (*out, c[9] + 1)

        return jax.lax.while_loop(cond, body, init)

    t = timeit(run_f)
    print(f"f e-in-while         : {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    # g: case e with a scalar lax.cond picking between body_e and a clone
    @jax.jit
    def run_g():
        init = (idx0, t0, jnp.zeros((N,), i32), jnp.zeros((N, D), i32), jnp.zeros((N,), i32),
                jnp.full((N,), -1, i32), jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32),
                jnp.ones((N,), bool), jnp.int32(0))

        def cond(c):
            return (jnp.sum(c[8]) > 0) & (c[9] < K)

        def body(c):
            pick = (c[9] % 4) == 3
            out = jax.lax.cond(pick, lambda s: body_e(s), lambda s: body_e(s), c[:9])
            return (*out, c[9] + 1)

        return jax.lax.while_loop(cond, body, init)

    t = timeit(run_g)
    print(f"g e-in-while-cond    : {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
