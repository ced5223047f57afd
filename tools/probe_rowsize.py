"""Probe: per-lane gather cost vs row width x table size on v5e.

CLAUDE.md rule 8 says HBM row fetches are FLAT ~11.7 ns/lane for 256-512B
rows and ~3.6 ns for VMEM-size tables — but the region BELOW 256 B was
never measured (README's "quantization rejected" claim extrapolated).
This maps the surface: rows of 8..128 f32 from tables of 0.5..64 MB,
random per-lane indices, 1M lanes, 64-iteration scan (the BVH loop shape).

Run: python tools/probe_rowsize.py
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
K = 64


def timed(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(3)

    for mb in (0.5, 1.5, 6.0, 18.0, 64.0):
        for w in (8, 16, 24, 32, 40, 48, 64, 96, 128):
            rows = int(mb * 1e6 / (4 * w))
            if rows < 64:
                continue
            tab = jnp.asarray(rng.rand(rows, w).astype(np.float32))
            idx0 = jnp.asarray(rng.randint(0, rows, N).astype(np.int32))

            def run(idx0, tab=tab, rows=rows):
                def body(c, _):
                    idx, acc = c
                    r = tab[idx]
                    acc = acc + r[..., 0] + r[..., w - 1]
                    # next index depends on the fetch (serial chain, like
                    # BVH descent) but stays uniform-random
                    idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
                    return (idx, acc), None

                (idx, acc), _ = jax.lax.scan(
                    body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K
                )
                return acc

            t = timed(jax.jit(run), idx0)
            print(
                f"table {mb:5.1f}MB rows={rows:8d} width={w:3d} ({w*4:4d}B): "
                f"{t/K/N*1e9:6.2f} ns/lane-iter",
                flush=True,
            )


if __name__ == "__main__":
    main()
