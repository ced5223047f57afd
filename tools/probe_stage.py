"""Probe 4: bisect the real _traverse_stage 11.6ns/iter vs the 3.7ns
gather+slab core. Variants patch trimesh internals in-process.

  base        - _traverse_stage as shipped (trefoil 512x480)
  small       - same code, tiny trefoil (128x120): table-size effect
  tinyleaf    - leaf_body gathers from a 4096-row alias of tri_rows
  nodeonly    - leaf children treated as misses (no leaf phase at all)
  altsched    - phase pick on (it % 4 == 3) instead of live-count sums
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

N = 1 << 20


def make_rays(seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-6, 6, size=(N, 3)).astype(np.float32)
    tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def timed_stage(arena, o, d):
    root = jnp.zeros(N, jnp.int32)
    f = jax.jit(
        lambda o, d: trimesh._traverse_stage(arena, root, o, d, 1e-4, 1e9, False, None)[0]
    )
    hit = f(o, d)
    it = int(hit.iters)
    _ = float(np.asarray(hit.t[0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        hit = f(o, d)
        _ = float(np.asarray(hit.t[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best, it, hit


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    o, d = make_rays()

    arena = trimesh.build_arena([trimesh.make_trefoil_mesh(512, 480)])
    t, it, hit = timed_stage(arena, o, d)
    hr = float(jnp.mean((hit.prim >= 0).astype(jnp.float32)))
    print(f"base     : {t*1e3:8.1f} ms iters={it:4d} -> {t/it/N*1e9:6.2f} ns/lane-iter hit={hr:.3f}", flush=True)

    small = trimesh.build_arena([trimesh.make_trefoil_mesh(128, 120)])
    t, it, _ = timed_stage(small, o, d)
    print(f"small    : {t*1e3:8.1f} ms iters={it:4d} -> {t/it/N*1e9:6.2f} ns/lane-iter", flush=True)

    # tinyleaf: alias tri_rows to its first 4096 rows (wrong hits, same code)
    tiny = arena._replace(tri_rows=arena.tri_rows[:4096])
    # leaf refs may point past 4096 -> clamp via monkeypatching the gather is
    # overkill; instead rebuild refs modulo 4096 on the host
    rows = np.asarray(arena.node_rows).copy()
    B = trimesh.BRANCH
    refs = rows[:, 6 * B:7 * B]
    leaf = refs <= -2.0
    g = -(refs[leaf] + 2.0)
    refs[leaf] = -(np.mod(g, 4096.0) + 2.0)
    rows[:, 6 * B:7 * B] = refs
    tiny = tiny._replace(node_rows=jnp.asarray(rows))
    t, it, _ = timed_stage(tiny, o, d)
    print(f"tinyleaf : {t*1e3:8.1f} ms iters={it:4d} -> {t/it/N*1e9:6.2f} ns/lane-iter", flush=True)

    # nodeonly: all leaf refs become empty (-1): pure node-phase traversal
    rows2 = np.asarray(arena.node_rows).copy()
    refs2 = rows2[:, 6 * B:7 * B]
    refs2[refs2 <= -2.0] = -1.0
    rows2[:, 6 * B:7 * B] = refs2
    nodeonly = arena._replace(node_rows=jnp.asarray(rows2))
    t, it, _ = timed_stage(nodeonly, o, d)
    print(f"nodeonly : {t*1e3:8.1f} ms iters={it:4d} -> {t/it/N*1e9:6.2f} ns/lane-iter", flush=True)

    # altsched: patch body's phase pick to a static schedule
    orig = trimesh._traverse_stage

    import types

    src_body_marker = True  # patch via closure: reimplement body selection
    def patched_stage(arena, root, o, d, tmin, tmax, any_hit, live_limit, state=None, time=None):
        # copy of _traverse_stage with the do_leaf pick replaced
        return orig(arena, root, o, d, tmin, tmax, any_hit, live_limit, state=state, time=time)

    # altsched requires editing the body; emulate by monkeypatching lax.cond
    # pick inputs: cheaper — measure the two reductions alone instead:
    root = jnp.zeros(N, jnp.int32)

    @jax.jit
    def reductions_only(o, d):
        def body(c):
            x, i = c
            parked = jnp.sum(x > 0)
            alive = jnp.sum(x >= 0)
            x = x + jnp.where(parked * 2 >= alive, 1, -1)
            return (x, i + 1)

        def cond(c):
            return (jnp.sum(c[0]) > -100000000) & (c[1] < 128)

        return jax.lax.while_loop(cond, body, (jnp.zeros(N, jnp.int32), jnp.int32(0)))

    out = reductions_only(o, d)
    _ = float(np.asarray(out[0][0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = reductions_only(o, d)
        _ = float(np.asarray(out[0][0] * 0))
        best = min(best, time.perf_counter() - t0)
    print(f"reductions-only loop: {best/128/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
