"""Probe: wide-collapse LEAF_COLLECT sweep with mean-iteration diagnostics.

Round-5 question: iteration count is the mesh lever — what does each
collapse variant do to (a) MEAN live lane-iterations per ray (the honest
work), (b) the while_loop max (what an uncascaded stage pays), (c) wall
time of the shipped cascade? LEAF_COLLECT=12 reproduces the round-4 tree
exactly (leaf-ify at <=12 with gran-4 builds the same regions).

Run: python tools/probe_collapse.py [collect ...]
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
    trimesh._COUNT_LIVE = True
    mesh = trimesh.make_trefoil_mesh(512, 480)
    collects = [int(x) for x in sys.argv[1:]] or [12, 24, 48, 96]
    for collect in collects:
        trimesh.LEAF_COLLECT = collect
        arena = trimesh.build_arena([mesh])
        W = arena.node_rows.shape[0]
        G = arena.tri_rows.shape[0]
        root = jnp.zeros(N, jnp.int32)
        for label, coh in (("inc", False), ("coh", True)):
            o, d = make_rays(coh)
            full = jax.jit(lambda o, d: trimesh.traverse(arena, root, o, d, 1e-4, 1e9))
            t, hit = timed(full, o, d)
            it = np.asarray(hit.iters)
            print(
                f"collect={collect:3d} [{label}] nodes={W} groups={G} "
                f"full {t*1e3:7.1f} ms {N/t/1e6:5.2f} Mrays/s "
                f"cascade_iters={it[0]} mean_node={it[1]/N:.1f} "
                f"mean_leaf={it[2]/N:.1f} hit={float(jnp.mean((hit.prim>=0)*1.0)):.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
