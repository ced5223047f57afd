"""Discrete/continuous CDF distributions for importance sampling.

TPU-native rebuild of ref src/base/math/distribution_1d.zig / _2d.zig /
_3d.zig: CDFs are cumsum tables built on host (numpy) or device; sampling is
a vectorized ``searchsorted`` — no per-lane loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Distribution1D(NamedTuple):
    """cdf[n+1] with cdf[0]=0, cdf[-1]=1 (unless total power 0); integral = sum."""

    cdf: jax.Array  # float32[n+1]
    integral: jax.Array  # float32 scalar

    @property
    def size(self) -> int:
        return self.cdf.shape[-1] - 1

    @staticmethod
    def build(weights) -> "Distribution1D":
        w = jnp.asarray(weights, jnp.float32)
        total = jnp.sum(w, axis=-1)
        safe = jnp.where(total > 0.0, total, 1.0)
        cdf = jnp.cumsum(w, axis=-1) / safe[..., None]
        zeros = jnp.zeros(w.shape[:-1] + (1,), jnp.float32)
        cdf = jnp.concatenate([zeros, cdf], axis=-1)
        # force exact 1.0 at the end
        cdf = cdf.at[..., -1].set(1.0)
        return Distribution1D(cdf, total)

    def sample_discrete(self, u):
        """u in [0,1) -> (index, pdf). Vectorized over u's batch shape."""
        idx = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.size - 1)
        pdf = self.cdf[idx + 1] - self.cdf[idx]
        return idx, pdf

    def sample_continuous(self, u):
        """u -> (x in [0,1), pdf). Linear within the selected cell."""
        idx, pdf = self.sample_discrete(u)
        lo = self.cdf[idx]
        w = jnp.where(pdf > 0.0, pdf, 1.0)
        t = (u - lo) / w
        n = self.size
        x = (idx.astype(jnp.float32) + t) / n
        return x, pdf * n

    def pdf_discrete(self, idx):
        return self.cdf[idx + 1] - self.cdf[idx]

    def pdf_continuous(self, x):
        n = self.size
        idx = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
        return (self.cdf[idx + 1] - self.cdf[idx]) * n


class Distribution2D(NamedTuple):
    """Row-major 2D distribution: marginal over rows + conditional per row.

    ref src/base/math/distribution_2d.zig. Sample order: v selects row
    (marginal), u selects column (conditional).
    """

    marginal_cdf: jax.Array  # [h+1]
    conditional_cdf: jax.Array  # [h, w+1]
    integral: jax.Array  # scalar (mean cell value)

    @property
    def height(self) -> int:
        return self.marginal_cdf.shape[0] - 1

    @property
    def width(self) -> int:
        return self.conditional_cdf.shape[1] - 1

    @staticmethod
    def build(grid) -> "Distribution2D":
        g = jnp.asarray(grid, jnp.float32)  # [h, w]
        h, w = g.shape
        row_sums = jnp.sum(g, axis=-1)  # [h]
        cond_safe = jnp.where(row_sums > 0.0, row_sums, 1.0)
        cond = jnp.cumsum(g, axis=-1) / cond_safe[:, None]
        cond = jnp.concatenate([jnp.zeros((h, 1), jnp.float32), cond], axis=-1)
        cond = cond.at[:, -1].set(1.0)

        total = jnp.sum(row_sums)
        marg_safe = jnp.where(total > 0.0, total, 1.0)
        marg = jnp.cumsum(row_sums) / marg_safe
        marg = jnp.concatenate([jnp.zeros((1,), jnp.float32), marg])
        marg = marg.at[-1].set(1.0)
        return Distribution2D(marg, cond, total / (h * w))

    def sample_continuous(self, uv):
        """uv [.., 2] -> (xy in [0,1)^2, pdf) w.r.t. unit-square area."""
        u, v = uv[..., 0], uv[..., 1]
        h, w = self.height, self.width
        row = jnp.clip(jnp.searchsorted(self.marginal_cdf, v, side="right") - 1, 0, h - 1)
        row_pdf = self.marginal_cdf[row + 1] - self.marginal_cdf[row]
        rw = jnp.where(row_pdf > 0.0, row_pdf, 1.0)
        y = (row.astype(jnp.float32) + (v - self.marginal_cdf[row]) / rw) / h

        ccdf = self.conditional_cdf[row]  # [.., w+1]
        col = jnp.clip(_searchsorted_rows(ccdf, u) - 1, 0, w - 1)
        col_lo = jnp.take_along_axis(ccdf, col[..., None], axis=-1)[..., 0]
        col_hi = jnp.take_along_axis(ccdf, col[..., None] + 1, axis=-1)[..., 0]
        col_pdf = col_hi - col_lo
        cw = jnp.where(col_pdf > 0.0, col_pdf, 1.0)
        x = (col.astype(jnp.float32) + (u - col_lo) / cw) / w

        pdf = (row_pdf * h) * (col_pdf * w)
        return jnp.stack([x, y], axis=-1), pdf

    def pdf(self, xy):
        h, w = self.height, self.width
        col = jnp.clip((xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
        row = jnp.clip((xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
        row_pdf = self.marginal_cdf[row + 1] - self.marginal_cdf[row]
        ccdf = self.conditional_cdf[row]
        col_lo = jnp.take_along_axis(ccdf, col[..., None], axis=-1)[..., 0]
        col_hi = jnp.take_along_axis(ccdf, col[..., None] + 1, axis=-1)[..., 0]
        return (row_pdf * h) * ((col_hi - col_lo) * w)


def _searchsorted_rows(sorted_rows, values):
    """Per-row searchsorted: sorted_rows [..., m], values [...]. side='right'."""
    return jnp.sum(sorted_rows <= values[..., None], axis=-1)


def build_distribution_1d_np(weights: np.ndarray):
    """Host-side builder returning plain numpy (for scene compile)."""
    w = np.asarray(weights, np.float32)
    total = float(w.sum())
    safe = total if total > 0.0 else 1.0
    cdf = np.concatenate([[0.0], np.cumsum(w) / safe]).astype(np.float32)
    cdf[-1] = 1.0
    return cdf, total
