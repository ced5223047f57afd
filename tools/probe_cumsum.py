"""Probe: compact_indices component costs + a triangular-matmul cumsum.

compact_indices (cumsum + scatter) measured 5.2 ms at 1M lanes and runs
at EVERY cascade stage of every traversal/tracking/drain loop. Which
part is slow — the cumsum (XLA lowers it as O(log N) reduce-window
passes) or the int32 scatter? And does the one-MXU-pass reformulation
  blocks = x.reshape(G, B); within = blocks @ LOWER_TRI[B, B]
  offs   = exclusive-cumsum(row sums)  (tiny)
beat it? Counts <= 2^21 are exact in f32.

Run: python tools/probe_cumsum.py
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
from zyg_tpu.core.gather import compact_indices

N = 1 << 20
K = 16


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


_B = 512


def mm_cumsum_i32(x):
    """Inclusive int32 cumsum via one [G,B]x[B,B] f32 matmul (exact for
    sums < 2^24)."""
    g = x.shape[0] // _B
    blocks = x.reshape(g, _B).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((_B, _B), jnp.float32)).T  # within[i] = sum_{j<=i}
    within = blocks @ tri  # [G,B] inclusive within-block
    sums = within[:, -1]
    offs = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(sums)[:-1]])
    return (within + offs[:, None]).reshape(-1).astype(jnp.int32)


def compact_indices_mm(live, size: int):
    (n,) = live.shape
    dest = mm_cumsum_i32(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, dest, size)
    iota = jax.lax.iota(jnp.int32, n)
    out = jnp.full(size + 1, n, jnp.int32).at[dest].set(
        jnp.where(live, iota, n), mode="drop"
    )
    return out[:size]


def loop(fn):
    def run(live0):
        def body(c, _):
            live, acc = c
            out = fn(live)
            acc = acc + out[0]
            live = jnp.roll(live, acc % 7 + 1)
            return (live, acc), None

        (_, acc), _ = jax.lax.scan(body, (live0, jnp.int32(0)), None, length=K)
        return acc

    return jax.jit(run)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(3)
    live = jnp.asarray(rng.rand(N) < 0.5)

    cases = [
        ("cumsum_xla     ", lambda l: jnp.cumsum(l.astype(jnp.int32))),
        ("cumsum_mm      ", lambda l: mm_cumsum_i32(l.astype(jnp.int32))),
        ("compact_cur    ", lambda l: compact_indices(l, N // 2)),
        ("compact_mm     ", lambda l: compact_indices_mm(l, N // 2)),
        ("scatter_only   ", lambda l: jnp.full(N // 2 + 1, N, jnp.int32).at[
            jnp.where(l, jax.lax.iota(jnp.int32, N) % (N // 2), N // 2)
        ].set(jax.lax.iota(jnp.int32, N), mode="drop")[: N // 2]),
    ]
    for name, fn in cases:
        t = timed(loop(fn), live)
        print(f"{name}: {t/K*1e3:7.3f} ms/call at {N} lanes", flush=True)

    ok = np.array_equal(
        np.asarray(jax.jit(lambda l: compact_indices(l, N // 2))(live)),
        np.asarray(jax.jit(lambda l: compact_indices_mm(l, N // 2))(live)),
    )
    print(f"exactness compact_mm == compact_cur: {ok}", flush=True)


if __name__ == "__main__":
    main()
