"""Small-table gathers as select chains.

XLA lowers per-lane gathers from tiny tables (prop transforms, material
rows) catastrophically on TPU (~37ms per gather of [2M] lanes from an 8-row
table, measured on v5e). For tables up to a threshold, an unrolled
where-chain is pure VPU work and ~100x faster. Big tables (BVH nodes,
triangles, texture arenas) stay real gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMALL_TABLE_LIMIT = 48


def small_gather(table, idx):
    """table[idx] with a select chain when the table is small.

    table: [P, ...]; idx: int[...] -> [..., ...rest]."""
    p = table.shape[0]
    if p > SMALL_TABLE_LIMIT:
        return table[idx]
    rest = table.ndim - 1
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    for row in range(1, p):
        cond = idx == row
        if rest:
            cond = cond.reshape(cond.shape + (1,) * rest)
        out = jnp.where(cond, table[row], out)
    return out


def gather_tree(tree, idx):
    """small_gather over every array leaf of a pytree (e.g. Materials)."""
    return jax.tree.map(lambda t: small_gather(t, idx), tree)


def compact_indices(live, size: int):
    """First `size` live lane indices, ascending; tail filled with n
    (the jnp.flatnonzero(live, size=size, fill_value=n) contract).

    flatnonzero lowers ~1.8x slower than this cumsum + one int32 scatter
    on v5e (9.5 vs 5.2 ms at 1M lanes, tools/probe_nonzero.py in-loop
    deltas) — and compaction-index builds run at every cascade stage of
    every traversal, so the difference is a few percent of whole renders.
    """
    (n,) = live.shape
    dest = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, dest, size)  # dead lanes park on a dump slot
    iota = jax.lax.iota(jnp.int32, n)
    out = jnp.full(size + 1, n, jnp.int32).at[dest].set(
        jnp.where(live, iota, n), mode="drop"
    )
    return out[:size]
