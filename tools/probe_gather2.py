"""Probe 2: fine sweep of the gather-cost vs table-size threshold, plus
two-table combos at quantized-BVH sizes. Run on TPU."""

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
K = 32


def time_scalar(run, *args):
    acc = run(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(acc)[0].ravel()[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(acc)[0].ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def single(rows, cols, dtype):
    tab = jnp.asarray(
        np.random.RandomState(0).randint(0, 127, size=(rows, cols)).astype(dtype)
    )
    idx0 = jnp.asarray(np.random.RandomState(1).randint(0, rows, size=(N,)).astype(np.int32))

    @jax.jit
    def run(tab, idx0):
        def body(c, _):
            idx, acc = c
            s = tab[idx].astype(jnp.int32).sum(axis=-1)
            return ((idx * 1664525 + s) % rows, acc + s), None

        c, _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.int32)), None, length=K)
        return c[1]

    t = time_scalar(run, tab, idx0)
    mb = rows * cols * np.dtype(dtype).itemsize / 1e6
    print(f"single rows={rows:7d} cols={cols:4d} {np.dtype(dtype).name:8s} {mb:7.2f}MB -> {t/(N*K)*1e9:6.2f} ns", flush=True)


def duo(r1, c1, d1, r2, c2, d2):
    t1 = jnp.asarray(np.random.RandomState(0).randint(0, 127, size=(r1, c1)).astype(d1))
    t2 = jnp.asarray(np.random.RandomState(2).randint(0, 127, size=(r2, c2)).astype(d2))
    idx0 = jnp.asarray(np.random.RandomState(1).randint(0, min(r1, r2), size=(N,)).astype(np.int32))

    @jax.jit
    def run(t1, t2, idx0):
        def body(c, _):
            idx, acc = c
            s1 = t1[idx % r1].astype(jnp.int32).sum(axis=-1)
            s2 = t2[idx % r2].astype(jnp.int32).sum(axis=-1)
            s = s1 + s2
            return ((idx * 1664525 + s) % (r1 * 7919), acc + s), None

        c, _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.int32)), None, length=K)
        return c[1]

    t = time_scalar(run, t1, t2, idx0)
    mb = (r1 * c1 * np.dtype(d1).itemsize + r2 * c2 * np.dtype(d2).itemsize) / 1e6
    print(
        f"duo ({r1}x{c1} {np.dtype(d1).name} + {r2}x{c2} {np.dtype(d2).name}) "
        f"total={mb:7.2f}MB -> {t/(N*K)*1e9:6.2f} ns (2 gathers)", flush=True
    )


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for mb in (16, 20, 22, 24, 26, 28, 32, 40, 64, 128):
        rows = mb * 1000000 // 256
        single(rows, 64, np.float32)
    # quantized combos (trefoil-class): nodes int16[80] 20864 rows (3.3MB)
    # + leaves int16[120] (240B: 12 tris snorm16 + anchor) 56908 rows (13.7MB)
    duo(20864, 80, np.int16, 56908, 120, np.int16)
    # current f32 shapes for comparison
    duo(20864, 64, np.float32, 56908, 108, np.float32)
    # half-quantized: f32 nodes + int16 leaves
    duo(20864, 64, np.float32, 56908, 120, np.int16)
    # int8 leaves fantasy (12 tris x 9 x 1B + anchor)
    duo(20864, 80, np.int16, 56908, 128, np.int8)


if __name__ == "__main__":
    main()
