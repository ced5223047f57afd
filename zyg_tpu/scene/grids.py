"""3D density grids for heterogeneous volumes.

The reference builds a sparse octree ("Gridtree", ref:
src/core/scene/material/volumetric/gridtree.zig) of density min/max over
64-cubed cells to drive decomposition tracking. On TPU a pointer-chasing
octree is the wrong shape; the equivalent here is a **flat voxel arena** plus
per-grid majorants and a coarse max-pooled *supergrid* (dense, small) that
plays the role of the octree's per-cell majorants: tracking loops read the
local majorant with one arena gather instead of a tree walk.

Density lookup inside the tracking loop uses **stochastic trilinear
filtering** (one jittered nearest-neighbor gather instead of 8 corner
gathers) — the same estimator the reference uses for all texture sampling
(ref: src/core/texture/texture_sampler.zig LinearStochastic), and exactly
what a gather-bound TPU loop wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gather import small_gather

SUPER_CELL = 8  # voxels per supergrid cell edge (ref gridtree uses 64; our
# grids are small enough that 8 gives tight majorants without blowing up the
# supergrid arena)


class GridArena(NamedTuple):
    """All density grids of a scene, flattened into one arena.

    Device storage is SPARSE (ref image.zig Float1Sparse): voxels live in
    a pool of SUPER_CELL^3 BRICKS; all-zero bricks share pool brick 0, so
    empty space costs no HBM (a mostly-empty cloud's footprint shrinks
    ~proportionally to occupancy). The per-cell page index rides column 3
    of the supergrid row the tracking loop already fetches.

    Addressing is a STATIC per-arena choice (meta key rides the treedef):
    when every grid is mostly occupied ("dense" mode), ALL bricks are kept
    in grid order so the page is brick_base[g] + linear cell index — pure
    arithmetic, no page-table gather. The page-lookup indirection measured
    -21% on the dense smoke bench (3.80 -> 3.00 Mrays/s), so sparse
    addressing only pays where it actually saves HBM."""

    data: jax.Array  # float32[B * SUPER_CELL^3] brick pool (brick 0 = zeros)
    offset: jax.Array  # int32[G] legacy dense offsets (unused addressing)
    dims: jax.Array  # int32[G,3] (nx, ny, nz)
    majorant: jax.Array  # float32[G] global max density per grid
    minorant: jax.Array  # float32[G] global min density (control variate)
    # coarse pooled supergrid over (SUPER_CELL+2)^3 HALO windows: the
    # stochastic trilinear sample can land one voxel outside its cell, so
    # un-halo'd cell maxima could be EXCEEDED by a sampled density (the
    # ratio clip would then bias transmittance low). Rows pack
    # (majorant, minorant) so local_extrema costs ONE 8-byte row gather —
    # the minorant is the per-cell control variate for residual-ratio
    # transmittance
    # row layout: (majorant, minorant, free_radius, brick_page). free_radius R is the
    # Chebyshev distance (in cells, minus one) to the nearest cell with a
    # nonzero halo'd majorant: every cell within |delta|_inf <= R of an
    # empty cell is also empty, so a tracking step in empty space hops to
    # the exit of the (2R+1)^3 cell box in ONE step instead of walking
    # cell by cell (empty-space skipping; the dense-supergrid equivalent
    # of the reference octree's empty-interior-node skip, gridtree.zig)
    sdata: jax.Array  # float32[Ts, 4] (majorant, minorant, free_r, page)
    soffset: jax.Array  # int32[G]
    sdims: jax.Array  # int32[G,3]
    brick_base: jax.Array  # int32[G] first pool brick of each grid (the
    # arithmetic page base in dense mode; informational in sparse mode)
    # STATIC addressing mode: {"sparse": 0} or {"dense": 0} — the KEY rides
    # the pytree treedef so jit specializes (LightTree pattern)
    meta: dict

    @property
    def count(self) -> int:
        return self.offset.shape[0]

    @property
    def sparse(self) -> bool:
        (mode,) = self.meta.keys()
        return mode == "sparse"


def _dilate(g: np.ndarray, op) -> np.ndarray:
    """Separable 3^3 min/max filter (edge-replicated): pooling the dilated
    grid equals pooling (SUPER_CELL+2)^3 halo windows."""
    out = g
    for ax in range(3):
        p = np.pad(out, [(1, 1) if a == ax else (0, 0) for a in range(3)], mode="edge")
        n = out.shape[ax]
        sl = lambda s: tuple(
            slice(s, s + n) if a == ax else slice(None) for a in range(3)
        )
        out = op(op(p[sl(0)], p[sl(1)]), p[sl(2)])
    return out


# below this mean brick occupancy the arena drops empty bricks and pays
# the per-sample page-table gather; above it, dense arithmetic addressing
# is faster (the page lookup measured -21% on the dense smoke bench) and
# the HBM saving would be marginal anyway
SPARSE_OCCUPANCY = 0.6


def build_grid_arena(grids: list[np.ndarray]) -> GridArena:
    """Flatten host grids (each float32[nz, ny, nx]) into one arena."""
    offsets, dims = [], []
    sdatas, smins, sfree, spages, soffsets, sdims = [], [], [], [], [], []
    majorants, minorants = [], []
    off = 0
    soff = 0
    # first pass: brick every grid, decide the STATIC addressing mode from
    # total occupancy (dense mode keeps all bricks -> page is arithmetic)
    bricked = []
    for g in grids:
        g = np.asarray(g, np.float32)
        assert g.ndim == 3
        nz, ny, nx = g.shape
        bz, by, bx = (-(-n // SUPER_CELL) for n in (nz, ny, nx))
        gp = np.zeros((bz * SUPER_CELL, by * SUPER_CELL, bx * SUPER_CELL), np.float32)
        gp[:nz, :ny, :nx] = g
        bl = (
            gp.reshape(bz, SUPER_CELL, by, SUPER_CELL, bx, SUPER_CELL)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(bz * by * bx, -1)
        )
        bricked.append((g, bl))
    total = sum(bl.shape[0] for _, bl in bricked) or 1
    occ = sum(int((np.abs(bl).max(axis=1) > 0.0).sum()) for _, bl in bricked)
    sparse = occ / total < SPARSE_OCCUPANCY
    bricks = [np.zeros(SUPER_CELL ** 3, np.float32)]  # pool; 0 = zero brick
    brick_base = []
    for g, bl in bricked:
        nz, ny, nx = g.shape
        offsets.append(off)
        dims.append((nx, ny, nz))
        majorants.append(float(g.max()))
        minorants.append(float(g.min()))
        off += g.size
        occ_b = (
            np.abs(bl).max(axis=1) > 0.0
            if sparse
            else np.ones(bl.shape[0], bool)
        )
        page = np.zeros(bl.shape[0], np.float32)
        page[occ_b] = np.arange(len(bricks), len(bricks) + int(occ_b.sum()))
        brick_base.append(len(bricks))
        bricks.extend(bl[occ_b])
        spages.append(page)
        # halo'd min/max-pool supergrids, padded to a full cell
        sz, sy, sx = (-(-n // SUPER_CELL) for n in (nz, ny, nx))
        # pad voxels are never SAMPLED (uvw clips to dims-1), so they must
        # not dilute partial cells' extrema: identity pad per op (0 for
        # max, +inf for min — a straddling cell keeps its REAL minimum)
        for op, acc, pad in (
            (np.maximum, sdatas, 0.0),
            (np.minimum, smins, np.inf),
        ):
            gd = _dilate(g, op)
            sp = np.full(
                (sz * SUPER_CELL, sy * SUPER_CELL, sx * SUPER_CELL),
                pad, np.float32,
            )
            sp[:nz, :ny, :nx] = gd
            s = op.reduce(
                sp.reshape(sz, SUPER_CELL, sy, SUPER_CELL, sx, SUPER_CELL)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(sz, sy, sx, -1),
                axis=-1,
            )
            acc.append(s.reshape(-1))
        # free radius per cell: iterated 3^3 dilation of the occupancy
        # mask; R = iterations until the dilation reaches the cell
        occ = sdatas[-1].reshape(sz, sy, sx) > 1e-9
        R = np.zeros((sz, sy, sx), np.float32)
        reach = occ.copy()
        for r in range(1, 33):
            if reach.all():
                break
            reach_n = _dilate(reach.astype(np.float32), np.maximum) > 0.0
            R[~reach_n & ~reach] = r  # still unreachable after r dilations
            R[reach_n & ~reach] = r - 1
            reach = reach_n
        sfree.append(R.reshape(-1))
        soffsets.append(soff)
        sdims.append((sx, sy, sz))
        soff += sdatas[-1].size
        # supergrid cells and bricks share the SUPER_CELL partition, so
        # the page table aligns with the supergrid rows
        assert sx * sy * sz == bl.shape[0]
    return GridArena(
        data=jnp.asarray(np.concatenate(bricks)),
        offset=jnp.asarray(offsets, jnp.int32),
        dims=jnp.asarray(dims, jnp.int32),
        majorant=jnp.asarray(majorants, jnp.float32),
        minorant=jnp.asarray(minorants, jnp.float32),
        sdata=jnp.asarray(
            np.stack(
                [np.concatenate(sdatas), np.concatenate(smins),
                 np.concatenate(sfree), np.concatenate(spages)],
                axis=-1,
            )
        ),
        soffset=jnp.asarray(soffsets, jnp.int32),
        sdims=jnp.asarray(sdims, jnp.int32),
        brick_base=jnp.asarray(brick_base, jnp.int32),
        meta={"sparse" if sparse else "dense": 0},
    )


def _voxel_fetch(arena: GridArena, g, idx):
    """Brick-pool fetch of voxel idx ([N,3] ints, in-range). Sparse mode:
    page lookup through the supergrid cell, then one pool gather (empty
    bricks share pool brick 0). Dense mode: the page is brick_base[g] +
    the linear cell index — no page-table gather."""
    sdimsi = small_gather(arena.sdims, g)
    cell = idx // SUPER_CELL
    local = idx - cell * SUPER_CELL
    snx, sny = sdimsi[..., 0], sdimsi[..., 1]
    cellloc = (cell[..., 2] * sny + cell[..., 1]) * snx + cell[..., 0]
    if arena.sparse:
        soff = small_gather(arena.soffset, g)
        page = arena.sdata[soff + cellloc, 3].astype(jnp.int32)
    else:
        page = small_gather(arena.brick_base, g) + cellloc
    flat = page * (SUPER_CELL ** 3) + (
        local[..., 2] * SUPER_CELL + local[..., 1]
    ) * SUPER_CELL + local[..., 0]
    return arena.data[flat]


def sample_density_stochastic(arena: GridArena, grid_id, uvw, r):
    """Unbiased trilinear density via ONE jittered nearest gather.

    uvw in [0,1]^3 (unit-cube object space), r: float[N,3] uniforms."""
    g = jnp.maximum(grid_id, 0)
    dims = small_gather(arena.dims, g).astype(jnp.float32)  # [N,3]
    # cell-centered: continuous voxel coord c = uvw*n - 0.5; stochastic
    # rounding of c + (r - 0.5) == trilinear weights in expectation
    c = uvw * dims - 0.5 + (r - 0.5)
    idx = jnp.clip(jnp.round(c), 0.0, dims - 1.0).astype(jnp.int32)
    return _voxel_fetch(arena, g, idx)


def sample_density_trilinear(arena: GridArena, grid_id, uvw):
    """Deterministic trilinear density (8 gathers; for non-loop contexts)."""
    g = jnp.maximum(grid_id, 0)
    dims = small_gather(arena.dims, g).astype(jnp.float32)
    c = uvw * dims - 0.5
    c0 = jnp.floor(c)
    f = c - c0
    out = jnp.zeros(uvw.shape[:-1], jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corner = c0 + jnp.asarray([dx, dy, dz], jnp.float32)
                idx = jnp.clip(corner, 0.0, dims - 1.0).astype(jnp.int32)
                wx = f[..., 0] if dx else 1.0 - f[..., 0]
                wy = f[..., 1] if dy else 1.0 - f[..., 1]
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                out = out + wx * wy * wz * _voxel_fetch(arena, g, idx)
    return out


def _cell_flat(arena: GridArena, grid_id, uvw):
    g = jnp.maximum(grid_id, 0)
    dims = small_gather(arena.dims, g).astype(jnp.float32)
    sdimsi = small_gather(arena.sdims, g)
    soff = small_gather(arena.soffset, g)
    vox = jnp.clip(uvw * dims, 0.0, dims - 1.0).astype(jnp.int32) // SUPER_CELL
    snx, sny = sdimsi[..., 0], sdimsi[..., 1]
    return soff + (vox[..., 2] * sny + vox[..., 1]) * snx + vox[..., 0]


def local_majorant(arena: GridArena, grid_id, uvw):
    """Supergrid (max-pooled) majorant at uvw — the octree-cell equivalent."""
    return arena.sdata[_cell_flat(arena, grid_id, uvw), 0]


def local_majorant_free(arena: GridArena, grid_id, uvw):
    """(majorant, free_radius) of the macrocell at uvw — one row gather.
    free_radius cells around this one are all empty when the majorant is
    zero (see GridArena.sdata; drives empty-space skipping)."""
    row = arena.sdata[_cell_flat(arena, grid_id, uvw)]
    return row[..., 0], row[..., 2]


def local_extrema(arena: GridArena, grid_id, uvw):
    """(majorant, minorant) of the macrocell at uvw — ONE 8-byte row
    gather. The minorant is the per-cell control variate for
    residual-ratio transmittance (ref tracking.zig's residual-ratio
    estimator, with octree cell bounds replaced by the halo'd pooled
    supergrid)."""
    row = arena.sdata[_cell_flat(arena, grid_id, uvw)]
    return row[..., 0], row[..., 1]


# ---------------------------------------------------------------------------
# Host-side procedural grid generators (for examples/tests; the reference
# loads SUB voxel files — ref image/encoding/sub/sub_reader.zig — which we
# also accept via io.mesh's numpy loaders)
# ---------------------------------------------------------------------------


def make_fbm_grid(n: int = 64, octaves: int = 4, seed: int = 7, sharpness: float = 2.0) -> np.ndarray:
    """Smoke-like fBm density in [0,1], spherically masked."""
    rng = np.random.default_rng(seed)
    acc = np.zeros((n, n, n), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cn = max(2, n >> (octaves - 1 - o))
        coarse = rng.standard_normal((cn, cn, cn)).astype(np.float32)
        z = np.linspace(0, cn - 1, n)
        zi = np.clip(z.astype(int), 0, cn - 2)
        zf = (z - zi).astype(np.float32)

        def lerp_axis(a, axis, zi=zi, zf=zf):
            a0 = np.take(a, zi, axis=axis)
            a1 = np.take(a, zi + 1, axis=axis)
            sh = [1, 1, 1]
            sh[axis] = -1
            return a0 + (a1 - a0) * zf.reshape(sh)

        up = lerp_axis(lerp_axis(lerp_axis(coarse, 0), 1), 2)
        acc += amp * up
        total += amp
        amp *= 0.5
    acc = (acc / total - acc.min() / total) / max(1e-6, (acc.max() - acc.min()) / total)
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, n)] * 3), indexing="ij")
    mask = np.clip(1.0 - np.sqrt(xx**2 + yy**2 + zz**2), 0.0, 1.0)
    out = np.clip(acc**sharpness * mask * 2.0, 0.0, 1.0).astype(np.float32)
    return out


def to_dense(arena: GridArena, gid: int) -> np.ndarray:
    """Host-side dense [nz, ny, nx] reconstruction of grid `gid` from the
    sparse brick pool (tests / exports)."""
    nx, ny, nz = (int(x) for x in np.asarray(arena.dims[gid]))
    sx, sy, sz = (int(x) for x in np.asarray(arena.sdims[gid]))
    soff = int(arena.soffset[gid])
    pages = np.asarray(
        arena.sdata[soff : soff + sx * sy * sz, 3]
    ).astype(np.int64)
    pool = np.asarray(arena.data).reshape(-1, SUPER_CELL ** 3)
    gp = (
        pool[pages]
        .reshape(sz, sy, sx, SUPER_CELL, SUPER_CELL, SUPER_CELL)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(sz * SUPER_CELL, sy * SUPER_CELL, sx * SUPER_CELL)
    )
    return gp[:nz, :ny, :nx]
