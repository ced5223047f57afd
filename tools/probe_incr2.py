"""Probe 7: post-slab child-selection alternatives.

  b_chains  - shipped: full sort network + rank/cref select chains (9.9ns)
  b_mask    - mask-min: masked min-reduction picks nearest child, one-hot
              ref pick, second-min for the direct-push entry (no sort)
Run on TPU."""

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
from zyg_tpu.scene.trimesh import BRANCH, _MISS_KEY, _inv_dir

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
K = 64
B = BRANCH


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


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    arena = trimesh.build_arena([trimesh.make_trefoil_mesh(512, 480)])
    rows = arena.node_rows
    W = rows.shape[0]
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.uniform(-6, 6, size=(N, 3)).astype(np.float32))
    d0 = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d = jnp.asarray(d0)
    inv = _inv_dir(d)
    i32 = jnp.int32
    iota_b = jnp.arange(B, dtype=i32)

    def slab(idx, tcur):
        row = rows[idx]
        lox = (row[..., 0 * B:1 * B] - o[..., 0:1]) * inv[..., 0:1]
        loy = (row[..., 1 * B:2 * B] - o[..., 1:2]) * inv[..., 1:2]
        loz = (row[..., 2 * B:3 * B] - o[..., 2:3]) * inv[..., 2:3]
        hix = (row[..., 3 * B:4 * B] - o[..., 0:1]) * inv[..., 0:1]
        hiy = (row[..., 4 * B:5 * B] - o[..., 1:2]) * inv[..., 1:2]
        hiz = (row[..., 5 * B:6 * B] - o[..., 2:3]) * inv[..., 2:3]
        near = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)), jnp.minimum(loz, hiz))
        far = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)), jnp.maximum(loz, hiz))
        refs = row[..., 6 * B:7 * B]
        nearc = jnp.maximum(near, 0.0)
        hit = (nearc <= far) & (refs != -1.0) & (nearc < tcur[..., None])
        tb = jax.lax.bitcast_convert_type(nearc, i32) & i32(~(B - 1))
        keys = jnp.where(hit, tb | iota_b, _MISS_KEY | iota_b)
        return keys, hit, refs

    idx0 = jnp.arange(N, dtype=i32) % W
    t0v = jnp.full((N,), 1e9, jnp.float32)

    # ---- b_chains (shipped shape)
    def body_chains(c):
        idx, tcur, rank = c
        keys, hit, refs = slab(idx, tcur)
        k = [keys[..., j] for j in range(B)]
        for a, b2 in _SORT8:
            ka, kb = k[a], k[b2]
            k[a] = jnp.minimum(ka, kb)
            k[b2] = jnp.maximum(ka, kb)
        h = jnp.sum(hit, axis=-1).astype(i32)
        key_r = jnp.zeros((N,), i32)
        key_r1 = jnp.zeros((N,), i32)
        for j in range(B):
            key_r = jnp.where(rank == j, k[j], key_r)
            key_r1 = jnp.where(rank + 1 == j, k[j], key_r1)
        slot_r = key_r & (B - 1)
        slot_r1 = key_r1 & (B - 1)
        cref = jnp.zeros((N,), jnp.float32)
        cref1 = jnp.zeros((N,), jnp.float32)
        for j in range(B):
            cref = jnp.where(slot_r == j, refs[..., j], cref)
            cref1 = jnp.where(slot_r1 == j, refs[..., j], cref1)
        idx = (idx * 1664525 + 12345 + cref.astype(i32) + cref1.astype(i32) + h) % W
        rank = (rank + 1) % B
        return (idx, tcur, rank)

    @jax.jit
    def run_chains():
        c, _ = jax.lax.scan(lambda c, _: (body_chains(c), None),
                            (idx0, t0v, jnp.zeros((N,), i32)), None, length=K)
        return c

    print(f"b_chains : {timeit(run_chains)/K/N*1e9:6.2f} ns/lane-iter", flush=True)

    # ---- b_mask (masked min-reduction)
    def body_mask(c):
        idx, tcur, mask = c
        keys, hit, refs = slab(idx, tcur)
        mbits = ((mask[..., None] >> iota_b) & 1) != 0
        keysm = jnp.where(mbits, keys, _MISS_KEY | iota_b)
        key_min = jnp.min(keysm, axis=-1)
        slot = key_min & (B - 1)
        onehot = iota_b == slot[..., None]
        cref = jnp.sum(jnp.where(onehot, refs, 0.0), axis=-1)
        # second nearest (for the direct-push entry) + remaining-hit count
        keys2 = jnp.where(onehot, _MISS_KEY | iota_b, keysm)
        key2 = jnp.min(keys2, axis=-1)
        slot2 = key2 & (B - 1)
        onehot2 = iota_b == slot2[..., None]
        cref2 = jnp.sum(jnp.where(onehot2, refs, 0.0), axis=-1)
        nrem = jnp.sum((keys2 < (_MISS_KEY & ~(B - 1))).astype(i32), axis=-1)
        newmask = mask & ~(1 << slot)
        idx = (idx * 1664525 + 12345 + cref.astype(i32) + cref2.astype(i32) + nrem + newmask) % W
        return (idx, tcur, jnp.full((N,), 255, i32))

    @jax.jit
    def run_mask():
        c, _ = jax.lax.scan(lambda c, _: (body_mask(c), None),
                            (idx0, t0v, jnp.full((N,), 255, i32)), None, length=K)
        return c

    print(f"b_mask   : {timeit(run_mask)/K/N*1e9:6.2f} ns/lane-iter", flush=True)


if __name__ == "__main__":
    main()
