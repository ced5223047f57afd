"""Probe 8: small-table gather formulations at wavefront width.

  chain   - shipped select chain (core/gather.py::small_gather)
  onehot  - sum over [N,P] one-hot mask (b_mask trick, one reduction/col)
  matmul  - one-hot [N,P] @ table [P,C] on the MXU (f32 precision)

Sweep P (table rows) x C (row floats). Run on TPU.
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
from zyg_tpu.core.gather import small_gather

N = 1 << 21
K = 32


def timeit(f):
    out = f()
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def onehot_gather(table, idx):
    p = table.shape[0]
    oh = idx[..., None] == jnp.arange(p, dtype=idx.dtype)
    if table.ndim == 1:
        return jnp.sum(jnp.where(oh, table, 0), axis=-1)
    return jnp.sum(jnp.where(oh[..., None], table, 0), axis=-2)


def matmul_gather(table, idx):
    p = table.shape[0]
    oh = (idx[..., None] == jnp.arange(p, dtype=idx.dtype)).astype(jnp.float32)
    return oh @ table


def main():
    print(f"platform={jax.devices()[0].platform} N={N} K={K}", flush=True)
    rng = np.random.RandomState(0)
    for p, c in [(4, 8), (8, 8), (8, 24), (16, 24), (32, 16), (48, 8)]:
        tab = jnp.asarray(rng.rand(p, c).astype(np.float32))
        idx0 = jnp.asarray(rng.randint(0, p, size=(N,)).astype(np.int32))

        def chained(g):
            @jax.jit
            def run():
                def body(cr, _):
                    idx, acc = cr
                    row = g(tab, idx)
                    s = row.sum(axis=-1)
                    acc = acc + s
                    idx = (idx + acc.astype(jnp.int32)) % p
                    return (idx, acc), None
                (idx, acc), _ = jax.lax.scan(
                    body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K)
                return acc
            return run

        for name, g in [("chain", small_gather), ("onehot", onehot_gather),
                        ("matmul", matmul_gather)]:
            ns = timeit(chained(g)) / N / K * 1e9
            print(f"P={p:3d} C={c:3d} {name:7s}: {ns:6.2f} ns/lane", flush=True)


if __name__ == "__main__":
    main()
