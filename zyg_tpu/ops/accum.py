"""Sample-flush accumulator kernel for the persistent wavefront.

The persistent PTMIS loop (render/integrator/ptmis.py integrate_persistent)
shuffles lane->pixel per sample; finished samples are buffered per lane in a
[3*K, N] column buffer (K = samples this dispatch, N = lanes; pixel identity
is recovered after the loop by an affine unpermute). The per-iteration flush

    acc[3*col[i] + c, i] += val[i, c]   for lanes with col[i] >= 0

is a one-hot masked add. XLA materializes it at ~590 ms/iteration at 2M
lanes (layout cliff on the [N,3]->[3,N] transpose + carried-buffer copy);
this kernel does it in-place at HBM speed (~2x buffer size per call).

ref: replaces the atomic sensor adds of src/core/rendering/sensor/sensor.zig
(addSample) in the reference's tiled accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import use_pallas

_LANE_TILE = 8192  # lanes per grid step; f32 rows tile (8, 128)


def _flush_kernel(col_ref, v0_ref, v1_ref, v2_ref, acc_ref, out_ref):
    """One lane tile: masked one-hot add over all 3K rows (acc aliased)."""
    rows3k = acc_ref.shape[0]
    col = col_ref[0, :]  # [T] int32; -1 = no flush
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows3k, col.shape[0]), 0)
    k_of_row = rows // 3
    c_of_row = rows - 3 * k_of_row
    mask = k_of_row == col[None, :]
    val3 = jnp.where(
        c_of_row == 0,
        v0_ref[0, :][None, :],
        jnp.where(c_of_row == 1, v1_ref[0, :][None, :], v2_ref[0, :][None, :]),
    )
    out_ref[:, :] = acc_ref[:, :] + jnp.where(mask, val3, 0.0)


def _flush_pallas(acc, col, v0, v1, v2):
    # no outer jit: always called inside a traced context; the in-place
    # update comes from pallas input_output_aliases
    rows3k, n = acc.shape
    tile = min(_LANE_TILE, n)
    grid = (n + tile - 1) // tile
    row2 = lambda x: x.reshape(1, n)
    spec1 = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _flush_kernel,
        grid=(grid,),
        in_specs=[
            spec1,
            spec1,
            spec1,
            spec1,
            pl.BlockSpec((rows3k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows3k, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={4: 0},
    )(row2(col), row2(v0), row2(v1), row2(v2), acc)


def _flush_xla(acc, col, v0, v1, v2):
    """Fallback: same math as plain (fused) XLA ops, [3K, N] one-hot add."""
    rows3k, n = acc.shape
    rows = jnp.arange(rows3k, dtype=jnp.int32)
    k_of_row = rows // 3
    c_of_row = rows - 3 * k_of_row
    mask = k_of_row[:, None] == col[None, :]
    val3 = jnp.where(
        (c_of_row == 0)[:, None],
        v0[None, :],
        jnp.where((c_of_row == 1)[:, None], v1[None, :], v2[None, :]),
    )
    return acc + jnp.where(mask, val3, 0.0)


def flush_columns(acc, col, v0, v1, v2):
    """acc[3k+c, i] += [v0,v1,v2][c][i] where col[i]==k; col<0 lanes skip.

    acc: [3K, N] f32 (donated on the Pallas path). col: [N] int32.
    v0/v1/v2: [N] f32 (the RGB of the flushed sample; zeros where col<0
    are NOT required — masking is by col).
    """
    if use_pallas():
        return _flush_pallas(acc, col, v0, v1, v2)
    return _flush_xla(acc, col, v0, v1, v2)
