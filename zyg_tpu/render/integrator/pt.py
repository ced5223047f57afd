"""Wavefront PT: naive BSDF-sampling path tracer (no NEE/MIS).

TPU-native rebuild of ref src/core/rendering/integrator/surface/pathtracer.zig:
the recursive per-ray loop becomes a ``lax.while_loop`` over a whole ray
batch with masked (alive) lanes — SoA path state, uniform control flow.
Medium tracking is a single-entry stack (current medium material id) with
Beer-Lambert absorption applied per segment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import vecmath as vm
from ...core.sobol import SobolSampler, SobolArrays
from ...scene import shapes
from ...scene.types import SceneData, RAY_MAX_T
from .. import materials as mat
from . import volume as vol_mod
from ...core.gather import small_gather


class PtSettings(NamedTuple):
    max_depth: int = 16


class PathState(NamedTuple):
    o: jax.Array  # [N,3]
    d: jax.Array  # [N,3]
    throughput: jax.Array  # [N,3]
    radiance: jax.Array  # [N,3]
    alive: jax.Array  # bool[N]
    medium: jax.Array  # int32[N] prop id of enclosing medium (-1 = air)
    depth: jax.Array  # int32 scalar
    rays: jax.Array  # int32 scalar: total scene-intersection rays traced
    sobol: SobolArrays


def integrate(scene: SceneData, o, d, sobol: SobolSampler, settings: PtSettings):
    """Trace a batch to completion. Returns (radiance[N,3], sobol, num_rays)."""
    n = o.shape[0]
    state = PathState(
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
        medium=jnp.full((n,), -1, jnp.int32),
        depth=jnp.int32(0),
        rays=jnp.int32(0),
        sobol=sobol.arrays,
    )

    def cond(s: PathState):
        return jnp.any(s.alive) & (s.depth <= settings.max_depth)

    def body(s: PathState):
        smp = SobolSampler(s.sobol, dim=5)

        primary = jnp.broadcast_to(s.depth == 0, s.alive.shape)
        hit = shapes.intersect_scene(
            scene, s.o, s.d, jnp.float32(0.0), jnp.float32(RAY_MAX_T),
            "reflection", primary=primary,
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

        # Beer-Lambert absorption through the current medium
        throughput = s.throughput * mat.medium_absorption(scene.materials, med_mat, hit.t)

        emission = mat.eval_radiance(params, wo, frag.geo_n)
        emission = jnp.where(hit.valid()[..., None], emission, 0.0)
        radiance = s.radiance + jnp.where(
            s.alive[..., None], throughput * emission, 0.0
        )

        finite_hit = hit.valid() & (hit.t < RAY_MAX_T)
        cont = s.alive & finite_hit & (s.depth < settings.max_depth)

        # russian roulette (ref pathtracer.zig:58 -> helper.zig)
        r = smp.sample_1d()
        throughput, kill = mat.russian_roulette(throughput, r)
        cont = cont & ~kill

        # BSDF sample
        s3 = smp.sample_3d()
        bs = mat.sample_bsdf(params, wo, frag.n, frag.geo_n, s3)
        cont = cont & bs.valid
        throughput = throughput * bs.weight

        # medium interface change (ref vertex.zig interfaceChange)
        entering = vm.dot(wo, frag.geo_n) > 0.0
        new_medium = jnp.where(
            bs.transmission & cont,
            jnp.where(entering, frag.prop, -1),
            s.medium,
        )

        new_o = shapes.offset_ray(
            frag.p,
            jnp.where(vm.dot(bs.wi, frag.geo_n)[..., None] >= 0.0, frag.geo_n, -frag.geo_n),
        )
        smp.increment_padding()

        return PathState(
            o=jnp.where(cont[..., None], new_o, s.o),
            d=jnp.where(cont[..., None], bs.wi, s.d),
            throughput=throughput,
            radiance=radiance,
            alive=cont,
            medium=new_medium,
            depth=s.depth + 1,
            rays=s.rays + jnp.sum(s.alive, dtype=jnp.int32),
            sobol=smp.arrays,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance, SobolSampler(final.sobol, dim=5), final.rays
