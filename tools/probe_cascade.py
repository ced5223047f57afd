"""Probe: traversal compaction-cascade shrink-factor sweep.

probe_collapse measured mean live work of 12.5 iters/ray vs ~37 effective:
the cascade pays `width` per iteration while live hugs width/SHRINK. Total
cost is bounded by SHRINK x ideal, so smaller shrinks should close the gap
at the price of more compaction stages.

Run: python tools/probe_cascade.py [shrink ...]
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


def make_rays(coherent, seed=0):
    rng = np.random.RandomState(seed)
    if coherent:
        o = np.tile(np.array([[0.0, 0.8, -14.0]], np.float32), (N, 1))
        tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    else:
        o = rng.uniform(-6, 6, size=(N, 3)).astype(np.float32)
        tgt = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def timed(fn, *a):
    out = fn(*a)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    mesh = trimesh.make_trefoil_mesh(512, 480)
    arena = trimesh.build_arena([mesh])
    shrinks = [float(x) for x in sys.argv[1:]] or [4.0, 2.0, 1.5, 1.25]
    root = jnp.zeros(N, jnp.int32)
    for shrink in shrinks:
        trimesh._CASCADE_SHRINK = shrink
        for label, coh in (("inc", False), ("coh", True)):
            o, d = make_rays(coh)
            full = jax.jit(lambda o, d: trimesh.traverse(arena, root, o, d, 1e-4, 1e9))
            t, hit = timed(full, o, d)
            print(
                f"shrink={shrink:5.2f} [{label}] full {t*1e3:7.1f} ms "
                f"{N/t/1e6:5.2f} Mrays/s "
                f"hit={float(jnp.mean((hit.prim >= 0)*1.0)):.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
