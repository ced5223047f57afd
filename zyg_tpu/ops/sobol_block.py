"""Fused Owen-scrambled Sobol' block generation.

One 5-D block draw (core/sobol.py::_increment_seed) is ~400 pure-uint32
ALU ops per lane (shuffle hash -> 32-bit Sobol accumulation -> per-dim
nested scramble). XLA materializes it as ~8 fusion kernels with ~300MB
of [N]-u32 tuple intermediates per wavefront iteration (compiled-HLO
audit, round 4); this kernel runs the whole chain in registers — traffic
drops to read (sample, seed) + write the 5 floats + next seed.

Bit-exact with the XLA path by construction: the kernel body CALLS the
same core/sobol.py functions (they are pure jnp and lower under Mosaic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import use_pallas

_LANE_TILE = 8192


def _kernel(sample_ref, seed_ref, b0, b1, b2, b3, b4, seed_out):
    from ..core.rng import hash_u32, hash_combine
    from ..core import sobol as sb

    sample = sample_ref[:, :]
    s = seed_ref[:, :]
    idx = sb.nested_uniform_scramble(sample, s)
    # sobol5 inlined to per-dim (1,T) accumulators (no [.,5] stacking)
    acc = [jnp.zeros_like(idx) for _ in range(5)]
    for bit in range(32):
        take = ((idx >> jnp.uint32(bit)) & jnp.uint32(1)) * jnp.uint32(0xFFFFFFFF)
        for d in range(5):
            acc[d] = acc[d] ^ (take & jnp.uint32(int(sb._DIRECTIONS[d, bit])))
    outs = (b0, b1, b2, b3, b4)
    for d in range(5):
        seeds = hash_combine(s, jnp.uint32(d))
        scrambled = sb.nested_uniform_scramble(acc[d], seeds)
        f = jax.lax.bitcast_convert_type(
            (scrambled >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32
        )
        outs[d][:, :] = f - 1.0
    seed_out[:, :] = hash_u32(s + jnp.uint32(1))


def sobol_block(sample, run_seed):
    """(buffer float32[N,5], next_run_seed uint32[N]) for one 5-D block.
    Falls back to None on CPU (caller keeps the XLA path)."""
    if not use_pallas() or sample.ndim != 1:
        return None
    n = sample.shape[0]
    tile = min(_LANE_TILE, -(-max(n, 1) // 128) * 128)  # lane-dim multiple of 128
    np_pad = ((n + tile - 1) // tile) * tile

    def row(x):
        if np_pad != n:
            x = jnp.concatenate([x, jnp.zeros(np_pad - n, x.dtype)])
        return x.reshape(1, np_pad)

    lane = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=(np_pad // tile,),
        in_specs=[lane] * 2,
        out_specs=[lane] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, np_pad), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((1, np_pad), jnp.uint32)],
    )(row(jnp.asarray(sample, jnp.uint32)), row(jnp.asarray(run_seed, jnp.uint32)))
    buf = jnp.stack([o[0, :n] for o in outs[:5]], axis=-1)
    return buf, outs[5][0, :n]
