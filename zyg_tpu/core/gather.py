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
