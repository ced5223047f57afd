"""Probe: what does one cascade compaction actually cost at 1M lanes?

shrink=2 measured +25 ms per extra stage — if flatnonzero+gather is that
expensive, the compaction primitive (not the schedule) is the lever.

Times, at N=1M, live fraction 0.25:
  flatnonzero    jnp.flatnonzero(mask, size=N/4)
  gather14       the 14-array compact gather at size N/4 (incl [N,8] stack)
  cumsum_scatter stream compaction via exclusive cumsum + scatter-drop
  iter_cost      one traversal-shaped gather+slab iteration for scale

Run: python tools/probe_compact.py
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

N = 1 << 20
K = N // 4


def timed(fn, *a, reps=5):
    out = fn(*a)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(N) < 0.24)
    scal = [jnp.asarray(rng.rand(N).astype(np.float32)) for _ in range(13)]
    stack = jnp.asarray(rng.randint(0, 1 << 20, (N, 8)).astype(np.int32))

    t = timed(jax.jit(lambda m: jnp.flatnonzero(m, size=K, fill_value=N)), mask)
    print(f"flatnonzero   : {t*1e3:7.2f} ms", flush=True)

    def compact(m, stack, *arrs):
        lidx = jnp.flatnonzero(m, size=K, fill_value=N)
        ls = jnp.minimum(lidx, N - 1)
        return (stack[ls],) + tuple(a[ls] for a in arrs)

    t = timed(jax.jit(compact), mask, stack, *scal)
    print(f"flat+gather14 : {t*1e3:7.2f} ms", flush=True)

    def cum_scatter(m, stack, *arrs):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        dst = jnp.where(m, jnp.minimum(pos, K - 1), K)
        outs = [jnp.zeros((K, 8), stack.dtype).at[dst].set(stack, mode="drop")]
        for a in arrs:
            outs.append(jnp.zeros(K, a.dtype).at[dst].set(a, mode="drop"))
        return tuple(outs)

    t = timed(jax.jit(cum_scatter), mask, stack, *scal)
    print(f"cumsum_scatter: {t*1e3:7.2f} ms", flush=True)

    # scale bar: one gather+slab iteration shape at width N
    tab = jnp.asarray(rng.rand(20000, 64).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 20000, N).astype(np.int32))

    def one_iter(idx):
        row = tab[idx]
        s = row[:, 0:8] + row[:, 8:16] * 1.5
        return jnp.min(s, axis=-1)

    t = timed(jax.jit(one_iter), idx)
    print(f"iter_scale    : {t*1e3:7.2f} ms (one 1M-lane node gather+slab)", flush=True)


if __name__ == "__main__":
    main()
