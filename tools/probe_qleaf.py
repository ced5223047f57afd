"""Probe: quantized 512B leaf rows vs the shipping 432B/57k-row rows.

The round-5 gather law (probe_rowsize/rowsize2): a table gathers at
~3.6 ns/lane only when BOTH rows <= ~32k AND row bytes <= 512. The bench
trefoil's tri_rows (56908 x 108f = 432B) violates the row count and pays
~11.7 ns. A u16-quantized leaf row (27 tris x 9 snorm16 + 6f anchor =
128 floats = 512B) re-packs the same mesh into ~24k rows — fast path —
at the price of per-lane decode ALU and a 27-wide (vs 12) Moller test.
This probe measures the TRADE in isolation on synthetic tables with the
dependent-index loop shape of the real traversal:

  A  gather [57k,108] + 12-wide Moller + min-reduce   (shipping shape)
  B  gather [24k,128] + u16 decode + 27-wide Moller   (quantized shape)
  Ag/Bg gather-only baselines

Run: python tools/probe_qleaf.py
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
K = 32


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


def moller(o, d, p0, e1, e2):
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tv = o - p0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    t = jnp.sum(e2 * qv, axis=-1) * inv
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    return jnp.where(ok, t, 3.4e38)


def chain_a(tab, rows):
    L = 12

    def run(idx0, o, d):
        def body(c, _):
            idx, acc = c
            r = tab[idx].reshape(N, L, 9)
            t = moller(o[:, None], d[:, None], r[..., 0:3], r[..., 3:6], r[..., 6:9])
            tm = jnp.min(t, axis=-1)
            acc = acc + jnp.where(tm < 1e9, tm, 0.0)
            idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K)
        return acc

    return jax.jit(run)


def chain_b(tab, rows):
    L = 27

    def run(idx0, o, d):
        def body(c, _):
            idx, acc = c
            r = tab[idx]  # [N,128] f32
            anchor = r[:, :6]
            lo, ext = anchor[:, 0:3], anchor[:, 3:6]
            w = jax.lax.bitcast_convert_type(r[:, 6:128], jnp.int32)  # [N,122]
            u16 = jnp.concatenate(
                [w & 0xFFFF, (w >> 16) & 0xFFFF], axis=-1
            )  # [N,244] int32 (lo halves then hi halves — layout-agnostic probe)
            q = u16[:, :243].reshape(N, L, 9).astype(jnp.float32)
            p0 = lo[:, None] + q[..., 0:3] * (ext[:, None] / 65535.0)
            sc = ext[:, None] / 32767.0
            e1 = (q[..., 3:6] - 32768.0) * sc
            e2 = (q[..., 6:9] - 32768.0) * sc
            t = moller(o[:, None], d[:, None], p0, e1, e2)
            tm = jnp.min(t, axis=-1)
            acc = acc + jnp.where(tm < 1e9, tm, 0.0)
            idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K)
        return acc

    return jax.jit(run)


def chain_gather(tab, rows, w):
    def run(idx0, o, d):
        def body(c, _):
            idx, acc = c
            r = tab[idx]
            acc = acc + r[..., 0] + r[..., w - 1]
            idx = (idx * 1664525 + 12345 + acc.astype(jnp.int32)) % rows
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.zeros(N, jnp.float32)), None, length=K)
        return acc

    return jax.jit(run)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(3)
    o = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    d = jnp.asarray(rng.rand(N, 3).astype(np.float32) - 0.5)

    rows_a = 56908
    tab_a = jnp.asarray(rng.rand(rows_a, 108).astype(np.float32))
    idx_a = jnp.asarray(rng.randint(0, rows_a, N).astype(np.int32))

    rows_b = 24064
    tab_b = jnp.asarray(rng.rand(rows_b, 128).astype(np.float32))
    idx_b = jnp.asarray(rng.randint(0, rows_b, N).astype(np.int32))

    for name, fn, idx in (
        ("A  gather57k/432B + moller12 ", chain_a(tab_a, rows_a), idx_a),
        ("B  gather24k/512B + dec+mo27 ", chain_b(tab_b, rows_b), idx_b),
        ("Ag gather57k/432B only       ", chain_gather(tab_a, rows_a, 108), idx_a),
        ("Bg gather24k/512B only       ", chain_gather(tab_b, rows_b, 128), idx_b),
    ):
        t = timed(fn, idx, o, d)
        print(f"{name}: {t/K/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
