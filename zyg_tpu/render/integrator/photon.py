"""Photon mapping: bake + hash-grid build + density-estimation gather.

ref: src/core/rendering/integrator/particle/photon/{photon_mapper.zig,
photon_map.zig, photon_grid.zig}. The reference traces photon paths per
worker, merges them, and builds a dense cell grid over the photon AABB with
43 precomputed adjacency patterns. The TPU-native equivalents:

- ``bake``: one jitted wavefront — N lanes, one light path each, depositing
  up to ``max_bounces`` photons per lane into [N, B] slots (deposit rule
  matches photon_mapper.zig tracePhoton: at canEvaluate vertices reached
  through a specular chain, or everywhere in full_light_path mode).
- ``build_map``: a **hashed** uniform grid with a STATIC table size — cell
  ids hash into 2^18 buckets, photons are sorted by bucket (one device sort)
  and bucket ranges come from one searchsorted. Hash aliasing only ever ADDS
  candidate photons, which the radius^2 test rejects, so the estimate is
  unchanged — and the table shape stays static for jit, which a dense
  AABB-sized grid could not.
- ``gather``: the cone-filtered estimate of photon_grid.zig li(): for the 8
  cells a radius-r sphere can touch (cell edge = 2r), scan a bounded number
  of photons per bucket, k = (1 - d^2/r^2)^2, contribution
  k * alpha * f(wi) / cos, normalized by 1/((pi/3) * num_paths * r^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import vecmath as vm
from ...core.gather import small_gather
from ...core.sobol import SobolSampler
from ...scene import shapes, light_sampling as ls_mod
from ...scene.types import SceneData, RAY_MAX_T
from .. import materials as mat
from . import volume as vol_mod
from .lighttracer import sample_light_from

TABLE_BITS = 18  # 2^18 hash buckets
TABLE_SIZE = 1 << TABLE_BITS
MAX_PER_CELL = 64  # bounded per-bucket scan in gather. The reference walks
# unbounded cell lists; a static bound keeps the TPU loop uniform. Photons
# beyond the bound are dropped (slight darkening when the map is locally
# denser than ~64 photons per (2r)^3 cell — the reference's merge pass
# (photon_map.zig compileIteration merge_radius) bounds density similarly).


class PhotonSettings(NamedTuple):
    num_photons: int = 0  # number of photon PATHS to trace
    max_bounces: int = 4
    search_radius: float = 0.01
    full_light_path: bool = False


class PhotonMap(NamedTuple):
    """Sorted photon arrays + hashed-grid bucket ranges."""

    p: jax.Array  # [M,3]
    wi: jax.Array  # [M,3] direction TOWARD the light (incoming)
    alpha: jax.Array  # [M,3] power
    cell_start: jax.Array  # int32[TABLE_SIZE+1]
    radius: float  # static
    num_paths: int  # static
    inv_cell: float  # static 1/(2*radius)


def _cell_hash(ix, iy, iz):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(73856093)
        ^ iy.astype(jnp.uint32) * jnp.uint32(19349663)
        ^ iz.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    return (h & jnp.uint32(TABLE_SIZE - 1)).astype(jnp.int32)


def bake(scene: SceneData, ray_keys, settings: PhotonSettings, max_depth: int = 8):
    """Trace one photon path per lane; returns (p, wi, alpha, valid) arrays
    of shape [N*max_bounces, ...]."""
    n = ray_keys.shape[0]
    B = settings.max_bounces
    smp = SobolSampler.start_pixel(ray_keys, jnp.zeros_like(ray_keys))

    s2 = smp.sample_2d()
    light_idx, sel_pdf = ls_mod.select_light(scene, s2[..., 0])
    xi4 = smp.sample_4d()
    smp.increment_padding()
    p0, n0, d0, weight, finite = sample_light_from(scene, light_idx, xi4, u_side=s2[..., 1])
    throughput = weight / jnp.maximum(sel_pdf, 1e-12)[..., None]

    class PhState(NamedTuple):
        o: jax.Array
        d: jax.Array
        throughput: jax.Array
        alive: jax.Array
        medium: jax.Array
        depth: jax.Array
        specular_chain: jax.Array
        n_dep: jax.Array  # int32[N] photons deposited so far per lane
        ph_p: jax.Array  # [N,B,3]
        ph_wi: jax.Array
        ph_a: jax.Array
        sobol: object

    state = PhState(
        o=shapes.offset_ray(p0, n0),
        d=d0,
        throughput=throughput,
        alive=finite,
        medium=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        specular_chain=jnp.zeros((n,), bool),
        n_dep=jnp.zeros((n,), jnp.int32),
        ph_p=jnp.zeros((n, B, 3), jnp.float32),
        ph_wi=jnp.zeros((n, B, 3), jnp.float32),
        ph_a=jnp.zeros((n, B, 3), jnp.float32),
        sobol=smp.arrays,
    )
    lanes = jnp.arange(n)

    def cond(s: PhState):
        return jnp.any(s.alive)

    def body(s: PhState):
        smp = SobolSampler(s.sobol, dim=5)
        hit = shapes.intersect_scene(
            scene, s.o, s.d, jnp.float32(0.0), jnp.float32(RAY_MAX_T), "reflection"
        )
        frag = shapes.build_fragment(scene, hit, s.o, s.d)
        med_mat = vol_mod.medium_material(scene, s.medium)
        medium_ior = jnp.where(
            s.medium >= 0, small_gather(scene.materials.ior, jnp.maximum(med_mat, 0)), 1.0
        )
        params = mat.gather(
            scene.materials, frag.material, medium_ior, scene.textures, frag.uv,
            features=scene.mat_features,
        )
        wo = -s.d
        throughput = s.throughput * mat.medium_absorption(scene.materials, med_mat, hit.t)
        finite_hit = hit.valid() & (hit.t < RAY_MAX_T)
        cont = s.alive & finite_hit & (s.depth < max_depth)

        # ---- deposit (ref tracePhoton: canEvaluate + started_specular)
        deposit = (
            cont
            & mat.can_evaluate(params)
            & (settings.full_light_path | s.specular_chain)
            & (s.n_dep < B)
        )
        slot = jnp.minimum(s.n_dep, B - 1)
        dep3 = deposit[..., None]
        ph_p = s.ph_p.at[lanes, slot].set(jnp.where(dep3, frag.p, s.ph_p[lanes, slot]))
        ph_wi = s.ph_wi.at[lanes, slot].set(jnp.where(dep3, wo, s.ph_wi[lanes, slot]))
        ph_a = s.ph_a.at[lanes, slot].set(jnp.where(dep3, throughput, s.ph_a[lanes, slot]))
        n_dep = s.n_dep + deposit.astype(jnp.int32)

        # ---- bounce
        r = smp.sample_1d()
        throughput, kill = mat.russian_roulette(throughput, r)
        cont = cont & ~kill & (n_dep < B)
        s3 = smp.sample_3d()
        bs = mat.sample_bsdf(params, wo, frag.n, frag.geo_n, s3)
        cont = cont & bs.valid
        throughput = throughput * bs.weight
        entering = vm.dot(wo, frag.geo_n) > 0.0
        new_medium = jnp.where(
            bs.transmission & cont, jnp.where(entering, frag.prop, -1), s.medium
        )
        new_o = shapes.offset_ray(
            frag.p,
            jnp.where(vm.dot(bs.wi, frag.geo_n)[..., None] >= 0.0, frag.geo_n, -frag.geo_n),
        )
        smp.increment_padding()
        return PhState(
            o=jnp.where(cont[..., None], new_o, s.o),
            d=jnp.where(cont[..., None], bs.wi, s.d),
            throughput=throughput,
            alive=cont,
            medium=new_medium,
            depth=s.depth + 1,
            specular_chain=s.specular_chain | (cont & bs.singular & ~bs.passthrough),
            n_dep=n_dep,
            ph_p=ph_p,
            ph_wi=ph_wi,
            ph_a=ph_a,
            sobol=smp.arrays,
        )

    f = jax.lax.while_loop(cond, body, state)
    valid = jnp.arange(B)[None, :] < f.n_dep[:, None]  # [N,B]
    return (
        f.ph_p.reshape(n * B, 3),
        f.ph_wi.reshape(n * B, 3),
        f.ph_a.reshape(n * B, 3),
        valid.reshape(n * B),
    )


def build_map(p, wi, alpha, valid, search_radius: float, num_paths: int) -> PhotonMap:
    """Sort photons into the hashed grid (all device ops, jittable)."""
    inv_cell = 1.0 / (2.0 * search_radius)
    ip = jnp.floor(p * inv_cell).astype(jnp.int32)
    cell = _cell_hash(ip[..., 0], ip[..., 1], ip[..., 2])
    cell = jnp.where(valid, cell, TABLE_SIZE)  # invalid photons sort last
    order = jnp.argsort(cell)
    cell_sorted = cell[order]
    starts = jnp.searchsorted(cell_sorted, jnp.arange(TABLE_SIZE + 1, dtype=jnp.int32))
    return PhotonMap(
        p=p[order],
        wi=wi[order],
        alpha=jnp.where(valid[order][..., None], alpha[order], 0.0),
        cell_start=starts.astype(jnp.int32),
        radius=float(search_radius),
        num_paths=int(num_paths),
        inv_cell=float(inv_cell),
    )


def gather(pmap: PhotonMap, params, pos, wo, ns, geo_n, active, max_per_cell: int = MAX_PER_CELL):
    """Cone-filtered photon density estimate at shading points (ref
    photon_grid.zig li, one-sided branch). Returns [N,3] radiance."""
    r2 = pmap.radius * pmap.radius
    inv_r2 = 1.0 / r2
    result = jnp.zeros(pos.shape, jnp.float32)

    lo = jnp.floor((pos - pmap.radius) * pmap.inv_cell).astype(jnp.int32)
    hi = jnp.floor((pos + pmap.radius) * pmap.inv_cell).astype(jnp.int32)

    def cell_contrib(result, cell_id):
        start = pmap.cell_start[cell_id]
        end = pmap.cell_start[cell_id + 1]

        def one(k, acc):
            idx = jnp.minimum(start + k, pmap.p.shape[0] - 1)
            ok = (start + k < end) & active
            php = pmap.p[idx]
            d2 = vm.dot(php - pos, php - pos)
            phwi = pmap.wi[idx]
            cosw = vm.dot(ns, phwi)
            front = cosw > 0.0
            ok = ok & (d2 < r2) & front
            kcone = jnp.square(1.0 - d2 * inv_r2)
            # FULL BSDF response per photon (ref photon_grid.zig:575 li()
            # evaluates the material sample at the photon direction) —
            # glossy floors now pick up caustic photons correctly. The
            # density estimate uses f (no cos): eval_bsdf returns f*cos,
            # divide it back out.
            f_cos, _ = mat.eval_bsdf(params, wo, phwi, ns, geo_n)
            f = f_cos / jnp.maximum(cosw, 1e-5)[..., None]
            contrib = kcone[..., None] * pmap.alpha[idx] * f
            return acc + jnp.where(ok[..., None], contrib, 0.0)

        return jax.lax.fori_loop(0, min(max_per_cell, MAX_PER_CELL), one, result)

    # the 8 cells a radius-r sphere can touch when cell edge = 2r
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = jnp.where(dx, hi[..., 0], lo[..., 0])
                cy = jnp.where(dy, hi[..., 1], lo[..., 1])
                cz = jnp.where(dz, hi[..., 2], lo[..., 2])
                # skip duplicate cells (lo == hi on an axis -> same id)
                dup = ((dx > 0) & (hi[..., 0] == lo[..., 0])) | (
                    (dy > 0) & (hi[..., 1] == lo[..., 1])
                ) | ((dz > 0) & (hi[..., 2] == lo[..., 2]))
                cid = _cell_hash(cx, cy, cz)
                part = cell_contrib(jnp.zeros_like(result), cid)
                result = result + jnp.where(dup[..., None], 0.0, part)

    norm = 1.0 / ((jnp.pi / 3.0) * pmap.num_paths * r2)
    return result * norm
