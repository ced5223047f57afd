"""Owen-scrambled 5-D Sobol' sampler, vectorized over ray lanes.

Reimplements the semantics of the reference sampler
(ref: src/core/sampler/sobol.zig): 5-dimension blocks, Burley-style shuffled
index + nested uniform scrambling via the improved Laine-Karras hash, with
per-pixel streams keyed by (sample_index, seed) and "padding" between
decision groups (each padding step advances to a fresh scrambled 5-D block).

Direction numbers are generated from the standard Joe-Kuo primitive
polynomial parameters for dimensions 1-5 (identical to the reference's table,
which is itself the standard public constant set).

The per-lane state is arrays over N lanes; the *dimension counter* is a
Python int because every lane consumes dimensions at the same call sites in a
wavefront program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .rng import hash_u32, hash_combine, u32_to_float


def _generate_directions() -> np.ndarray:
    """Joe-Kuo direction numbers for dims 1..5, 32 bits. Returns (5, 32) uint32."""
    # (degree s, coefficient bits a, initial m values)
    params = [
        (0, 0, []),  # dim 1: van der Corput
        (1, 0, [1]),
        (2, 1, [1, 3]),
        (3, 1, [1, 3, 1]),
        (3, 2, [1, 1, 1]),
    ]
    out = np.zeros((5, 32), np.uint32)
    for d, (s, a, m_init) in enumerate(params):
        if s == 0:
            for k in range(32):
                out[d, k] = np.uint32(1 << (31 - k))
            continue
        m = list(m_init)
        for k in range(s, 32):
            new = m[k - s] ^ (m[k - s] << s)
            for j in range(1, s):
                if (a >> (s - 1 - j)) & 1:
                    new ^= m[k - j] << j
            m.append(new)
        for k in range(32):
            out[d, k] = np.uint32((m[k] << (31 - k)) & 0xFFFFFFFF)
    return out


_DIRECTIONS = _generate_directions()  # (5, 32) uint32


def bit_reverse32(x):
    x = jnp.asarray(x, jnp.uint32)
    m1, m2, m4, m8 = (jnp.uint32(v) for v in (0x55555555, 0x33333333, 0x0F0F0F0F, 0x00FF00FF))
    x = ((x >> 1) & m1) | ((x & m1) << 1)
    x = ((x >> 2) & m2) | ((x & m2) << 2)
    x = ((x >> 4) & m4) | ((x & m4) << 4)
    x = ((x >> 8) & m8) | ((x & m8) << 8)
    return (x >> 16) | (x << 16)


def laine_karras_permutation(x, seed):
    """Improved LK hash (psychopath.io 2021) — same constants as the reference."""
    x = jnp.asarray(x, jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


def nested_uniform_scramble(x, seed):
    return bit_reverse32(laine_karras_permutation(bit_reverse32(x), seed))


def sobol5(index):
    """5-D Sobol' point for (scrambled) index. index: uint32[...]. -> uint32[..., 5]."""
    index = jnp.asarray(index, jnp.uint32)
    acc = [jnp.zeros_like(index) for _ in range(5)]
    for bit in range(32):
        mask = (index >> jnp.uint32(bit)) & jnp.uint32(1)
        take = mask * jnp.uint32(0xFFFFFFFF)  # 0 or all-ones
        for d in range(5):
            acc[d] = acc[d] ^ (take & jnp.uint32(int(_DIRECTIONS[d, bit])))
    return jnp.stack(acc, axis=-1)


class SobolArrays(NamedTuple):
    """The traced (carry-able) part of the sampler state."""

    sample: jax.Array  # uint32[N]
    start_seed: jax.Array  # uint32[N]
    run_seed: jax.Array  # uint32[N]
    buffer: jax.Array  # float32[N, 5]


class SobolSampler:
    """Mutable wrapper over SobolArrays + a static dimension counter.

    Mirrors the reference call surface: start_pixel / increment_sample /
    increment_padding / sample_1d / sample_2d / sample_4d.
    """

    def __init__(self, arrays: SobolArrays, dim: int = 5):
        self.arrays = arrays
        self.dim = dim

    @staticmethod
    def start_pixel(sample, seed) -> "SobolSampler":
        """sample: uint32[N] global sample index; seed: uint32[N] stream seed."""
        sample = jnp.asarray(sample, jnp.uint32)
        hashed = hash_u32(jnp.asarray(seed, jnp.uint32))
        buf = jnp.zeros(sample.shape + (5,), jnp.float32)
        return SobolSampler(SobolArrays(sample, hashed, hashed, buf), dim=5)

    def increment_sample(self):
        a = self.arrays
        self.arrays = SobolArrays(a.sample + jnp.uint32(1), a.start_seed, a.start_seed, a.buffer)
        self.dim = 5

    def increment_padding(self):
        self.dim = 5

    def _increment_seed(self):
        a = self.arrays
        s = a.run_seed
        fused = None
        if a.sample.ndim == 1:
            # TPU: one Pallas kernel for the whole ~400-uint-op chain
            # (ops/sobol_block.py — bit-exact, it calls these same fns)
            from ..ops.sobol_block import sobol_block

            fused = sobol_block(a.sample, s)
        if fused is not None:
            buf, next_seed = fused
        else:
            idx = nested_uniform_scramble(a.sample, s)
            sob = sobol5(idx)  # uint32[N,5]
            seeds = hash_combine(s[..., None], jnp.arange(5, dtype=jnp.uint32))
            scrambled = nested_uniform_scramble(sob, seeds)
            buf = u32_to_float(scrambled)
            next_seed = hash_u32(s + jnp.uint32(1))
        self.arrays = SobolArrays(a.sample, a.start_seed, next_seed, buf)
        self.dim = 0

    def _take(self, n: int):
        if self.dim > 5 - n:
            self._increment_seed()
        d = self.dim
        self.dim += n
        return self.arrays.buffer[..., d : d + n]

    def sample_1d(self):
        return self._take(1)[..., 0]

    def sample_2d(self):
        return self._take(2)

    def sample_3d(self):
        return self._take(3)

    def sample_4d(self):
        return self._take(4)


class RandomSampler:
    """The reference's pure-random fallback sampler (bounces >= 3) over LaneRng."""

    def __init__(self, rng):
        self.rng = rng

    def sample_1d(self):
        return self.rng.next_float()

    def sample_2d(self):
        return self.rng.next_float2()

    def sample_4d(self):
        return jnp.stack([self.rng.next_float() for _ in range(4)], axis=-1)

    def increment_padding(self):
        pass
