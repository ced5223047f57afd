"""Probe: per-lane random-gather cost vs table size / row width / dtype.

Maps the v5e gather landscape that sets the BVH traversal floor
(CLAUDE.md rule 8). Run on TPU: python tools/probe_gather.py

Timing protocol per CLAUDE.md: warmup compile, best-of-3, serialize by
chaining the gathered value into the next index, and return the live
accumulator so XLA can't DCE the loop.
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import zyg_tpu  # noqa: F401  (compile cache + f32 matmul config)

N = 1 << 21  # 2M lanes
K = 16  # chained gather iterations per timed call


def make_bench(rows: int, cols: int, dtype):
    tab_np = np.random.RandomState(0).randint(0, 255, size=(rows, cols)).astype(dtype)
    tab = jnp.asarray(tab_np)
    idx0 = jnp.asarray(
        np.random.RandomState(1).randint(0, rows, size=(N,)).astype(np.int32)
    )

    @jax.jit
    def run(tab, idx0):
        def body(c, _):
            idx, acc = c
            row = tab[idx]  # [N, cols] per-lane gather
            s = row.astype(jnp.int32).sum(axis=-1)
            acc = acc + s
            idx = (idx * 1664525 + s) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.int32)), None, length=K)
        return acc

    return run, tab, idx0


def time_it(run, tab, idx0) -> float:
    acc = run(tab, idx0)
    _ = int(np.asarray(acc[0]))  # force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(tab, idx0)
        _ = int(np.asarray(acc[0]))
        best = min(best, time.perf_counter() - t0)
    return best / (N * K) * 1e9  # ns per lane-gather


def main():
    print(f"platform={jax.devices()[0].platform} N={N} K={K}", flush=True)
    cases = []
    # table-size sweep at 64 f32 cols (256B rows, the node-row shape)
    for rows in (512, 2048, 8192, 32768, 131072):
        cases.append((rows, 64, np.float32))
    # row-width sweep at ~8k rows
    for cols in (8, 16, 32, 128):
        cases.append((8192, cols, np.float32))
    # quantized rows: int16 / int8 at node-like byte sizes
    cases.append((8192, 64, np.int16))   # 128B rows
    cases.append((8192, 128, np.int16))  # 256B rows
    cases.append((8192, 128, np.int8))   # 128B rows
    cases.append((32768, 64, np.int16))
    # leaf-like: 108 f32 (432B) at trefoil leaf count ~41k
    cases.append((40960, 112, np.float32))
    cases.append((40960, 56, np.float32))  # half-width leaf rows

    for rows, cols, dt in cases:
        run, tab, idx0 = make_bench(rows, cols, dt)
        ns = time_it(run, tab, idx0)
        mb = rows * cols * np.dtype(dt).itemsize / 1e6
        print(
            f"rows={rows:7d} cols={cols:4d} dtype={np.dtype(dt).name:8s} "
            f"table={mb:8.2f}MB rowB={cols*np.dtype(dt).itemsize:5d} -> {ns:7.2f} ns/lane",
            flush=True,
        )


if __name__ == "__main__":
    main()
