"""Probe 2: map the ~32k-row gather cliff + fat rows + split-table trick.

probe_rowsize found cost is a function of ROW COUNT, not bytes:
<= ~32k rows -> 3.6 ns/lane, more -> 11.7, for any width 8..128 f32.
Questions here:
  (a) is the cliff exactly 32768 rows?
  (b) do FAT rows (576..1152B) stay on the fast path below the cliff?
  (c) does gathering from TWO <=32k tables + select cost ~2x fast path
      (i.e. beat one slow-path gather for 33k..64k rows)?

Run: python tools/probe_rowsize2.py
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


def loop_gather(tab, rows, w):
    def run(idx0):
        def body(c, _):
            idx, acc = c
            r = tab[idx]
            acc = acc + r[..., 0] + r[..., w - 1]
            idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(
            body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K
        )
        return acc

    return jax.jit(run)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(3)

    print("-- (a) cliff position at width 64", flush=True)
    for rows in (30000, 32300, 32768, 32769, 33000, 36000, 49152, 65536):
        tab = jnp.asarray(rng.rand(rows, 64).astype(np.float32))
        idx0 = jnp.asarray(rng.randint(0, rows, N).astype(np.int32))
        t = timed(loop_gather(tab, rows, 64), idx0)
        print(f"rows={rows:6d} width 64: {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    print("-- (b) fat rows below the cliff", flush=True)
    for w in (144, 216, 288):
        rows = 28000
        tab = jnp.asarray(rng.rand(rows, w).astype(np.float32))
        idx0 = jnp.asarray(rng.randint(0, rows, N).astype(np.int32))
        t = timed(loop_gather(tab, rows, w), idx0)
        print(
            f"rows={rows:6d} width {w:3d} ({w*4:5d}B): {t/K/N*1e9:6.2f} ns/lane-iter",
            flush=True,
        )

    print("-- (c) split-table gather for 64k rows", flush=True)
    rows = 65536
    half = rows // 2
    tab = jnp.asarray(rng.rand(rows, 64).astype(np.float32))
    ta, tb = tab[:half], tab[half:]
    idx0 = jnp.asarray(rng.randint(0, rows, N).astype(np.int32))

    def run_split(idx0):
        def body(c, _):
            idx, acc = c
            hi = idx >= half
            i2 = jnp.where(hi, idx - half, idx)
            ra = ta[i2]
            rb = tb[i2]
            r = jnp.where(hi[..., None], rb, ra)
            acc = acc + r[..., 0] + r[..., 63]
            idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(
            body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K
        )
        return acc

    t = timed(jax.jit(run_split), idx0)
    print(f"rows=65536 split 2x32768: {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)
    t = timed(loop_gather(tab, rows, 64), idx0)
    print(f"rows=65536 single       : {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
