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


class Distribution3D(NamedTuple):
    """Piecewise-constant 3D distribution over a [D,H,W] grid
    (ref base/math/distribution_3d.zig: a marginal over slices, each slice a
    Distribution2D). Vectorized: all slice tables stacked so sampling stays
    one fused gather chain per lane — used for emissive-volume sampling."""

    # marginal over the slice (w) axis
    slice_cdf: jax.Array  # [D+1]
    # per-slice 2D machinery, stacked (ref distribution_2d conditional)
    row_cdf: jax.Array  # [D, H+1] marginal over rows per slice
    col_cdf: jax.Array  # [D, H, W+1] conditional over columns
    pdf_grid: jax.Array  # [D, H, W] normalized density (integrates to 1
    # over the unit cube)

    @staticmethod
    def build(grid) -> "Distribution3D":
        """grid: [D,H,W] nonnegative weights."""
        g = jnp.maximum(jnp.asarray(grid, jnp.float32), 0.0)
        d, h, w = g.shape
        slice_sum = g.sum(axis=(1, 2))  # [D]
        total = slice_sum.sum()
        # zero totals fall back to UNIFORM at that level and every cdf ends
        # exactly at 1.0 — degenerate (never-reaching-1) cdfs made
        # sample_continuous emit huge/NaN points, which sent NaN shadow rays
        # into the tracking while_loops and hung them (all-false NaN compares)
        slice_w = jnp.where(total > 0.0, slice_sum, 1.0)
        slice_cdf = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(slice_w) / slice_w.sum()]
        ).at[-1].set(1.0)
        row_sum = g.sum(axis=2)  # [D,H]
        row_tot = row_sum.sum(axis=1, keepdims=True)
        row_w = jnp.where(row_tot > 0.0, row_sum, 1.0)
        row_cdf = jnp.concatenate(
            [jnp.zeros((d, 1)),
             jnp.cumsum(row_w, axis=1) / row_w.sum(axis=1, keepdims=True)],
            axis=1,
        ).at[:, -1].set(1.0)
        col_w = jnp.where(row_sum[..., None] > 0.0, g, 1.0)
        col_cdf = jnp.concatenate(
            [jnp.zeros((d, h, 1)),
             jnp.cumsum(col_w, axis=2) / col_w.sum(axis=2, keepdims=True)],
            axis=2,
        ).at[:, :, -1].set(1.0)
        pdf = g / jnp.maximum(total, 1e-20) * (d * h * w)
        return Distribution3D(slice_cdf, row_cdf, col_cdf, pdf)

    def sample_continuous(self, uvw):
        """uvw: [...,3] uniforms -> (xyz [...,3] in [0,1)^3, pdf [...])."""
        u, v, w = uvw[..., 0], uvw[..., 1], uvw[..., 2]
        d, h, wd = self.pdf_grid.shape
        k = jnp.clip(jnp.searchsorted(self.slice_cdf, w, side="right") - 1, 0, d - 1)
        # row within slice
        rc = self.row_cdf[k]  # [...,H+1]
        j = jnp.clip(
            jnp.sum((rc <= v[..., None]).astype(jnp.int32), axis=-1) - 1, 0, h - 1
        )
        cc = self.col_cdf[k, j]  # [...,W+1]
        i = jnp.clip(
            jnp.sum((cc <= u[..., None]).astype(jnp.int32), axis=-1) - 1, 0, wd - 1
        )
        # continuous offsets within the chosen cells
        s0 = self.slice_cdf[k]
        s1 = self.slice_cdf[k + 1]
        # offsets clamped to [0,1): a zero-width cell (possible only at cdf
        # plateau boundaries) must still yield an in-cube point
        fz = jnp.clip((w - s0) / jnp.maximum(s1 - s0, 1e-20), 0.0, 1.0 - 1e-6)
        r0 = jnp.take_along_axis(rc, j[..., None], axis=-1)[..., 0]
        r1 = jnp.take_along_axis(rc, j[..., None] + 1, axis=-1)[..., 0]
        fy = jnp.clip((v - r0) / jnp.maximum(r1 - r0, 1e-20), 0.0, 1.0 - 1e-6)
        c0 = jnp.take_along_axis(cc, i[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(cc, i[..., None] + 1, axis=-1)[..., 0]
        fx = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-20), 0.0, 1.0 - 1e-6)
        xyz = jnp.stack(
            [(i + fx) / wd, (j + fy) / h, (k + fz) / d], axis=-1
        )
        return xyz, self.pdf_grid[k, j, i]

    def pdf(self, xyz):
        d, h, w = self.pdf_grid.shape
        i = jnp.clip((xyz[..., 0] * w).astype(jnp.int32), 0, w - 1)
        j = jnp.clip((xyz[..., 1] * h).astype(jnp.int32), 0, h - 1)
        k = jnp.clip((xyz[..., 2] * d).astype(jnp.int32), 0, d - 1)
        return self.pdf_grid[k, j, i]


class SummedAreaTable(NamedTuple):
    """2D prefix-sum table with box-integral queries
    (ref base/math/summed_area_table.zig): integral over any sub-rectangle
    in O(1) — the reference's windowed environment-map sampling uses it."""

    table: jax.Array  # [H+1, W+1] inclusive prefix sums
    width: int
    height: int

    @staticmethod
    def build(grid) -> "SummedAreaTable":
        g = jnp.asarray(grid, jnp.float32)
        h, w = g.shape
        t = jnp.cumsum(jnp.cumsum(g, axis=0), axis=1)
        t = jnp.pad(t, ((1, 0), (1, 0)))
        return SummedAreaTable(t, int(w), int(h))

    def integral(self, x0, y0, x1, y1):
        """Sum over texels [x0,x1) x [y0,y1) (integer texel coords)."""
        t = self.table
        x0 = jnp.clip(x0, 0, self.width)
        x1 = jnp.clip(x1, 0, self.width)
        y0 = jnp.clip(y0, 0, self.height)
        y1 = jnp.clip(y1, 0, self.height)
        return t[y1, x1] - t[y0, x1] - t[y1, x0] + t[y0, x0]

    @property
    def total(self):
        return self.table[self.height, self.width]
