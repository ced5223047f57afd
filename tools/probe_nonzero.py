"""Probe: flatnonzero(size=k) vs cumsum+scatter for compaction indices.

First version timed single dispatches — flat ~28-33 ms across 64k..1M
lanes, i.e. pure axon dispatch+sync overhead (CLAUDE.md rule 11). This
version chains REPS data-dependent ops inside one jit and reports the
(REPS2 - REPS1) delta per op.

Variants produce the EXACT flatnonzero contract (first k live lane ids
ascending, fill_value=n for the tail):
  fnz      jnp.flatnonzero(live, size=k, fill_value=n)
  cumsum   dest = cumsum(live)-1; one int32 scatter of iota
Run: python tools/probe_nonzero.py
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


def fnz(live, k, n):
    return jnp.flatnonzero(live, size=k, fill_value=n)


def cumsum_scatter(live, k, n):
    dest = jnp.cumsum(live.astype(jnp.int32)) - 1
    iota = jnp.arange(n, dtype=jnp.int32)
    dest = jnp.where(live, dest, k)  # dead lanes park on a dump slot
    out = jnp.full(k + 1, n, jnp.int32).at[dest].set(
        jnp.where(live, iota, n), mode="drop"
    )
    return out[:k]


def chain(op, reps, k, n):
    """reps data-dependent op applications (rotate live by the first
    output element so XLA can't CSE or DCE them)."""

    def f(live):
        acc = jnp.int32(0)
        for _ in range(reps):
            idx = op(live, k, n)
            acc = acc + idx[0]
            live = jnp.roll(live, idx[0] & 7)
        return acc

    return jax.jit(f)


def timed(fn, *a):
    out = fn(*a)
    _ = float(np.asarray(out * 0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(np.asarray(out * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    R1, R2 = 2, 10
    for n in (1 << 20, 1 << 18):
        k = n // 4
        live = jnp.asarray(rng.rand(n) < 0.23)
        for name, op in (("fnz", fnz), ("cumsum", cumsum_scatter)):
            t1 = timed(chain(op, R1, k, n), live)
            t2 = timed(chain(op, R2, k, n), live)
            per = (t2 - t1) / (R2 - R1)
            print(f"n={n:>8} {name:>6}: {per*1e3:7.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
