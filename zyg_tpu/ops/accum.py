"""Sample-flush accumulator kernel for the persistent wavefront.

The persistent PTMIS loop (render/integrator/ptmis.py integrate_persistent)
shuffles lane->pixel per sample; finished samples are buffered per lane in a
[C*K, N] column buffer (K = sample slots this dispatch, N = lanes, C = 3 RGB
channels or 4 with a sample-count plane; pixel identity is recovered after
the loop by an affine unpermute). The per-iteration flush

    acc[C*col[i] + c, i] += val[i, c]   for lanes with col[i] >= 0

is a one-hot masked add. XLA materializes it at ~590 ms/iteration at 2M
lanes (layout cliff on the [N,C]->[C,N] transpose + carried-buffer copy);
this kernel does it in-place at HBM speed (~2x buffer size per call).

ref: replaces the atomic sensor adds of src/core/rendering/sensor/sensor.zig
(addSample) in the reference's tiled accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import use_pallas

_LANE_TILE = 8192  # lanes per grid step; f32 rows tile (8, 128)


def _flush_kernel(col_ref, *refs):
    """One lane tile: masked one-hot add over all C*K rows (acc aliased).
    refs = (v0..v{C-1}, acc_ref, out_ref)."""
    vrefs, acc_ref, out_ref = refs[:-2], refs[-2], refs[-1]
    ch = len(vrefs)
    rows_ck = acc_ref.shape[0]
    col = col_ref[0, :]  # [T] int32; -1 = no flush
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_ck, col.shape[0]), 0)
    k_of_row = rows // ch
    c_of_row = rows - ch * k_of_row
    mask = k_of_row == col[None, :]
    val = vrefs[-1][0, :][None, :]
    for c in range(ch - 2, -1, -1):
        val = jnp.where(c_of_row == c, vrefs[c][0, :][None, :], val)
    out_ref[:, :] = acc_ref[:, :] + jnp.where(mask, val, 0.0)


def _flush_pallas(acc, col, vals):
    # no outer jit: always called inside a traced context; the in-place
    # update comes from pallas input_output_aliases
    rows_ck, n = acc.shape
    tile = min(_LANE_TILE, n)
    grid = (n + tile - 1) // tile
    row2 = lambda x: x.reshape(1, n)
    spec1 = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    nv = len(vals)
    return pl.pallas_call(
        _flush_kernel,
        grid=(grid,),
        in_specs=[spec1] * (1 + nv)
        + [pl.BlockSpec((rows_ck, tile), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (rows_ck, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={1 + nv: 0},
    )(row2(col), *(row2(v) for v in vals), acc)


def _flush_xla(acc, col, vals):
    """Fallback: same math as plain (fused) XLA ops, [C*K, N] one-hot add."""
    rows_ck, n = acc.shape
    ch = len(vals)
    rows = jnp.arange(rows_ck, dtype=jnp.int32)
    k_of_row = rows // ch
    c_of_row = rows - ch * k_of_row
    mask = k_of_row[:, None] == col[None, :]
    val = vals[-1][None, :]
    for c in range(ch - 2, -1, -1):
        val = jnp.where((c_of_row == c)[:, None], vals[c][None, :], val)
    return acc + jnp.where(mask, val, 0.0)


def flush_columns(acc, col, *vals):
    """acc[C*k+c, i] += vals[c][i] where col[i]==k; col<0 lanes skip.

    acc: [C*K, N] f32 (donated on the Pallas path), C = len(vals) channel
    planes per sample slot. col: [N] int32. vals: per-channel [N] f32 (the
    flushed sample; zeros where col<0 are NOT required — masking is by col).
    """
    if use_pallas():
        return _flush_pallas(acc, col, list(vals))
    return _flush_xla(acc, col, list(vals))
