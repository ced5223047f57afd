"""Probe: where does a trefoil BVH traversal iteration actually spend time?

Ablations (all at the bench trefoil, 512x480 ~ 491k tris, 1M incoherent rays):
  full       - traverse() as shipped (cascade)
  stage      - single _traverse_stage (no cascade), reports iters
  twotable   - loop that alternates node-row + leaf-row gathers only
  gathers    - loop with ONE node-row gather + slab+sort, no stack/pop
  stackonly  - loop with just the one-hot stack push/pop pattern
  elemfloor  - loop carrying the same state with trivial fused math

Run: python tools/probe_traverse.py
"""

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


def make_rays(arena, seed=0, coherent=False):
    rng = np.random.RandomState(seed)
    # trefoil fits in roughly [-3.5, 3.5]^3
    if coherent:
        o = np.tile(np.array([[0.0, 0.8, -14.0]], np.float32), (N, 1))
        tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
        d = tgt - o
    else:
        o = rng.uniform(-6, 6, size=(N, 3)).astype(np.float32)
        tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
        d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # force a scalar fetch (axon block_until_ready unreliable)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf.ravel()[0] * 0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(np.asarray(leaf.ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    mesh = trimesh.make_trefoil_mesh(512, 480)
    arena = trimesh.build_arena([mesh])
    W = arena.node_rows.shape[0]
    G = arena.tri_rows.shape[0]
    (max_depth,), = arena.meta.keys()
    print(
        f"tris={mesh.indices.shape[0]} wide_nodes={W} "
        f"({W*64*4/1e6:.2f}MB) groups={G} ({G*9*trimesh.LEAF_SIZE*4/1e6:.2f}MB) "
        f"depth={max_depth}",
        flush=True,
    )

    for label, coh in (("incoherent", False), ("coherent", True)):
        o, d = make_rays(arena, coherent=coh)
        root = jnp.zeros(N, jnp.int32)

        full = jax.jit(
            lambda o, d: trimesh.traverse(arena, root, o, d, 1e-4, 1e9)
        )
        t, hit = timed(full, o, d)
        hr = float(jnp.mean((hit.prim >= 0).astype(jnp.float32)))
        print(
            f"[{label}] full traverse: {t*1e3:8.2f} ms  {N/t/1e6:6.2f} Mrays/s "
            f"hit_rate={hr:.3f}",
            flush=True,
        )

        stage = jax.jit(
            lambda o, d: trimesh._traverse_stage(
                arena, root, o, d, 1e-4, 1e9, False, None
            )[0]
        )
        t, hit = timed(stage, o, d)
        it = int(hit.iters)
        print(
            f"[{label}] single stage : {t*1e3:8.2f} ms  {N/t/1e6:6.2f} Mrays/s "
            f"iters={it}  ns/lane-iter={t/it/N*1e9:.2f}",
            flush=True,
        )

    # ---- synthetic loops over the same arrays --------------------------
    o, d = make_rays(arena, coherent=False)
    rows = arena.node_rows
    trows = arena.tri_rows
    K = 64

    def loop(body, init):
        def run(o, d):
            def b(c, _):
                return body(c), None
            c, _ = jax.lax.scan(b, init(o, d), None, length=K)
            return c
        return jax.jit(run)

    # twotable: alternate fat gathers, nothing else
    def tt_init(o, d):
        return (jnp.arange(N, dtype=jnp.int32) % W, jnp.zeros(N, jnp.float32))

    def tt_body(c):
        idx, acc = c
        nrow = rows[idx % W]
        trow = trows[idx % G]
        acc = acc + nrow[..., 0] + trow[..., 0]
        idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % W
        return (idx, acc)

    t, _ = timed(loop(tt_body, tt_init), o, d)
    print(f"twotable   : {t/K/N*1e9:6.2f} ns/lane-iter (node+leaf gather)", flush=True)

    # gathers: node gather + slab + sort-network keys (no stack)
    inv = trimesh._inv_dir(d)

    def g_init(o, d):
        return (jnp.arange(N, dtype=jnp.int32) % W, jnp.zeros(N, jnp.float32))

    def g_body(c):
        idx, acc = c
        B = trimesh.BRANCH
        row = rows[idx]
        lox = (row[..., 0 * B:1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B:2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B:3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B:4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B:5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B:6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)), jnp.minimum(loz, hiz))
        far = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)), jnp.maximum(loz, hiz))
        hit = near <= far
        tb = jax.lax.bitcast_convert_type(jnp.maximum(near, 0.0), jnp.int32) & jnp.int32(~7)
        keys = jnp.where(hit, tb | jnp.arange(B, dtype=jnp.int32), trimesh._MISS_KEY | jnp.arange(B, dtype=jnp.int32))
        k = [keys[..., j] for j in range(B)]
        for a, b2 in _SORT8:
            ka, kb = k[a], k[b2]
            k[a] = jnp.minimum(ka, kb)
            k[b2] = jnp.maximum(ka, kb)
        acc = acc + k[0].astype(jnp.float32)
        idx = (idx * 1664525 + 12345 + k[0]) % W
        return (idx, acc)

    t, _ = timed(loop(g_body, g_init), o, d)
    print(f"gather+slab: {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    # stackonly: the one-hot push/pop pattern on [N, D]
    D = int(max_depth) + 1
    iota_s = jnp.arange(D, dtype=jnp.int32)

    def s_init(o, d):
        return (
            jnp.zeros((N, D), jnp.int32),
            jnp.zeros(N, jnp.int32),
            jnp.zeros(N, jnp.int32),
        )

    def s_body(c):
        stack, sp, x = c
        push = (x & 1) == 0
        onehot = iota_s == sp[..., None]
        stack = jnp.where(push[..., None] & onehot, (x * 3)[..., None], stack)
        sp = jnp.clip(sp + jnp.where(push, 1, -1), 0, D - 1)
        top = jnp.sum(jnp.where((iota_s == (sp - 1)[..., None]), stack, 0), axis=-1)
        x = x + top + 1
        return (stack, sp, x)

    t, _ = timed(loop(s_body, s_init), o, d)
    print(f"stackonly  : {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    # elemfloor: carry same-size state, trivial math
    def e_init(o, d):
        return (
            jnp.zeros((N, D), jnp.int32),
            jnp.zeros(N, jnp.float32),
            jnp.zeros(N, jnp.int32),
        )

    def e_body(c):
        stack, tcur, x = c
        tcur = tcur * 1.0001 + 0.5
        x = x + 1
        stack = stack + 1
        return (stack, tcur, x)

    t, _ = timed(loop(e_body, e_init), o, d)
    print(f"elemfloor  : {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
