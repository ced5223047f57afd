"""Random number generation.

The reference uses PCG32 with 64-bit state, seedable by (state, sequence)
(ref: src/base/random/generator.zig). TPUs have no fast 64-bit integer path,
so the device-side RNG is a counter-based construction over the same
hash-prospector finalizer family the reference uses for its Sobol seeding:
every draw is ``hash2(key, counter)`` — stateless, order-independent, and
splittable per lane, which is what a wavefront tracer wants anyway.

A bit-exact PCG32 reimplementation (numpy, uint64) is provided for parity
tests and any host-side sampling that must match the reference stream shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# -- lowbias32 (hash-prospector), same finalizer the reference uses
#    (ref: src/core/sampler/sobol.zig hash())


def hash_u32(x):
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_combine(seed, v):
    seed = jnp.asarray(seed, jnp.uint32)
    v = jnp.asarray(v, jnp.uint32)
    return seed ^ (v + (seed << 6) + (seed >> 2))


def hash2_u32(key, counter):
    """Two-word mix: distinct streams per key, distinct draws per counter."""
    return hash_u32(hash_combine(hash_u32(jnp.asarray(key, jnp.uint32)), counter))


def u32_to_float(bits):
    """uint32 -> float in [0, 1) via the mantissa trick.

    Same construction as ref src/base/random/generator.zig randomFloat:
    place 23 random mantissa bits under exponent 127 -> [1,2), subtract 1.
    """
    bits = jnp.asarray(bits, jnp.uint32)
    f = ((bits >> 9) | jnp.uint32(0x3F800000)).view(jnp.float32)
    return f - 1.0


class LaneRng:
    """Per-lane counter RNG state for wavefront integrators.

    Holds a per-lane key (uint32[N]) and a scalar draw counter that advances
    at each call site. The call pattern is identical across lanes (SIMD), so
    the counter is a plain Python int captured at trace time.
    """

    def __init__(self, key, counter: int = 0):
        self.key = jnp.asarray(key, jnp.uint32)
        self.counter = counter

    def next_u32(self):
        bits = hash2_u32(self.key, jnp.uint32(self.counter))
        self.counter += 1
        return bits

    def next_float(self):
        return u32_to_float(self.next_u32())

    def next_float2(self):
        return jnp.stack([self.next_float(), self.next_float()], axis=-1)


# ---------------------------------------------------------------------------
# Bit-exact PCG32 (host/numpy) — ref src/base/random/generator.zig
# ---------------------------------------------------------------------------

_PCG_MULT = np.uint64(0x5851F42D4C957F2D)


class Pcg32:
    """Vectorized PCG32 XSH-RR, matching the reference's generator exactly.

    start(state, sequence) follows the reference's init: inc = (sequence<<1)|1,
    state advanced once, += seed state, advanced again.
    """

    def __init__(self, state=0, sequence=0):
        self.state = np.zeros(1, np.uint64)
        self.inc = np.zeros(1, np.uint64)
        self.start(state, sequence)

    def start(self, state, sequence):
        state = np.atleast_1d(np.asarray(state, np.uint64))
        sequence = np.atleast_1d(np.asarray(sequence, np.uint64))
        self.inc = (sequence << np.uint64(1)) | np.uint64(1)
        self.state = np.zeros_like(state)
        self._advance()
        self.state = self.state + state
        self._advance()

    def _advance(self):
        with np.errstate(over="ignore"):
            self.state = self.state * _PCG_MULT + self.inc

    def random_u32(self):
        old = self.state
        self._advance()
        xorshifted = ((old >> np.uint64(18)) ^ old) >> np.uint64(27)
        rot = (old >> np.uint64(59)).astype(np.uint32)
        x = xorshifted.astype(np.uint32)
        return (x >> rot) | (x << ((np.uint32(0) - rot) & np.uint32(31)))

    def random_float(self):
        bits = self.random_u32()
        f = ((bits >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32)
        return f - np.float32(1.0)
