"""Probe 3: lax.scan vs lax.while_loop cost for the gather+slab body, and
whether chunking K body steps per while-trip recovers scan speed.

Hypothesis: while_loop serializes iterations (cond reduction barrier) so the
~4ns scan body costs ~12ns; scanning K steps inside each while trip should
amortize it back down. Run on TPU."""

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

# optimal 19-comparator sorting network for 8 keys (was trimesh._SORT8;
# the shipped traversal replaced it with mask-min continuations — kept
# here so the historical probe variants still run)
_SORT8 = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6),
    (1, 4), (3, 6),
    (2, 4), (3, 5),
    (3, 4),
]

N = 1 << 20
TOTAL = 128  # total body iterations


def timed(run, *args):
    out = run(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    mesh = trimesh.make_trefoil_mesh(512, 480)
    arena = trimesh.build_arena([mesh])
    rows = arena.node_rows
    W = rows.shape[0]
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.uniform(-6, 6, size=(N, 3)).astype(np.float32))
    d0 = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d = jnp.asarray(d0)
    inv = trimesh._inv_dir(d)
    B = trimesh.BRANCH

    def body(c):
        idx, acc = c
        row = rows[idx]
        lox = (row[..., 0 * B:1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B:2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B:3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B:4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B:5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B:6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)), jnp.minimum(loz, hiz))
        far = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)), jnp.maximum(loz, hiz))
        hit = near <= far
        tb = jax.lax.bitcast_convert_type(jnp.maximum(near, 0.0), jnp.int32) & jnp.int32(~7)
        keys = jnp.where(hit, tb | jnp.arange(B, dtype=jnp.int32), trimesh._MISS_KEY | jnp.arange(B, dtype=jnp.int32))
        k = [keys[..., j] for j in range(B)]
        for a, b2 in _SORT8:
            ka, kb = k[a], k[b2]
            k[a] = jnp.minimum(ka, kb)
            k[b2] = jnp.maximum(ka, kb)
        acc = acc + k[0].astype(jnp.float32)
        idx = (idx * 1664525 + 12345 + k[0]) % W
        return (idx, acc)

    init = (jnp.arange(N, dtype=jnp.int32) % W, jnp.zeros(N, jnp.float32))

    @jax.jit
    def run_scan():
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), init, None, length=TOTAL)
        return c

    t = timed(run_scan)
    print(f"scan           : {t/TOTAL/N*1e9:6.2f} ns/lane-iter", flush=True)

    for chunk in (1, 2, 4, 8):
        @jax.jit
        def run_while(chunk=chunk):
            def cond(c):
                idx, acc, i = c
                # mimic the real cond: a full-lane reduction + counter
                return (jnp.sum(idx >= 0) > 0) & (i < TOTAL)

            def wbody(c):
                idx, acc, i = c
                for _ in range(chunk):
                    idx, acc = body((idx, acc))
                return (idx, acc, i + chunk)

            c = jax.lax.while_loop(cond, wbody, (*init, jnp.int32(0)))
            return c[:2]

        t = timed(run_while)
        print(f"while chunk={chunk}  : {t/TOTAL/N*1e9:6.2f} ns/lane-iter", flush=True)

    # while_loop with NO reduction in cond (counter only)
    @jax.jit
    def run_while_nored():
        def cond(c):
            return c[2] < TOTAL

        def wbody(c):
            idx, acc, i = c
            idx, acc = body((idx, acc))
            return (idx, acc, i + 1)

        c = jax.lax.while_loop(cond, wbody, (*init, jnp.int32(0)))
        return c[:2]

    t = timed(run_while_nored)
    print(f"while nored    : {t/TOTAL/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
