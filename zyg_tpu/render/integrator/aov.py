"""AOV (debug/analysis) surface integrator.

ref: src/core/rendering/integrator/surface/aov.zig — renders non-beauty
values: ambient occlusion, tangent frame vectors, normals, hit side, depth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import vecmath as vm
from ...core.sobol import SobolSampler
from ...scene import shapes
from ...scene.types import SceneData, RAY_MAX_T


class AovSettings(NamedTuple):
    # AO | Tangent | Bitangent | GeometricNormal | ShadingNormal | Side |
    # Depth | LightSampleCount | Photon (ref aov.zig Value enum :21-30)
    value: str = "AO"
    num_samples: int = 1
    radius: float = 1.0
    max_depth: int = 1
    # LightSampleCount inputs (ref aov.zig lightSampleCount uses the take's
    # light_sampling settings)
    light_split_threshold: float = 0.5**4
    light_split_depth: int = 0


def integrate(scene: SceneData, o, d, sobol: SobolSampler, settings: AovSettings,
              photon_map=None, photon_max_per_cell: int = 64):
    """Returns (value[N,3], sobol, num_rays)."""
    n = o.shape[0]
    hit = shapes.intersect_scene(
        scene, o, d, jnp.float32(0.0), jnp.float32(RAY_MAX_T), "camera"
    )
    frag = shapes.build_fragment(scene, hit, o, d, need_uv=True, need_tangents=True)
    valid = hit.valid() & (hit.t < RAY_MAX_T)
    rays = jnp.sum(jnp.ones_like(valid), dtype=jnp.int32)

    v = settings.value
    if v in ("Tangent", "Bitangent", "GeometricNormal", "ShadingNormal"):
        vec = {
            "Tangent": frag.t,
            "Bitangent": frag.b,
            "GeometricNormal": frag.geo_n,
            "ShadingNormal": frag.n,
        }[v]
        out = 0.5 * (vec + 1.0)
    elif v == "Side":
        front = vm.dot(-d, frag.geo_n) > 0.0
        out = jnp.where(
            front[..., None],
            jnp.broadcast_to(jnp.asarray([0.2, 1.0, 0.1]), (n, 3)),
            jnp.broadcast_to(jnp.asarray([1.0, 0.1, 0.2]), (n, 3)),
        )
    elif v == "Depth":
        out = jnp.broadcast_to(hit.t[..., None], (n, 3))
    elif v == "LightSampleCount":
        # ref aov.zig lightSampleCount (:141-174): run the light selection
        # at the hit and visualize how many samples it drew, normalized by
        # the maximum the tree could produce. Our splitting uses a STATIC
        # pick budget P = 2^split_depth (+1 infinite column), so the max
        # potential is the slot count and "drawn" is the active-slot count.
        from ...scene import light_sampling as ls_mod

        u_sel = sobol.sample_1d()
        if scene.light_tree is not None and settings.light_split_depth > 0:
            thr = jnp.full((n,), settings.light_split_threshold, jnp.float32)
            picks_l, _pdf = ls_mod.select_lights_split(
                scene, u_sel, frag.p, frag.n, jnp.zeros((n,), bool), thr,
                settings.light_split_depth,
            )
            drawn = jnp.sum((picks_l >= 0).astype(jnp.float32), axis=-1)
            r = drawn / float(picks_l.shape[-1])
        else:
            # no tree / no splitting: the integrator draws exactly one
            # light sample per vertex
            r = jnp.ones((n,), jnp.float32)
        out = jnp.broadcast_to(r[..., None], (n, 3))
    elif v == "Photon":
        # ref aov.zig photons (:189-): visualize the photon map — gather at
        # the first gatherable (non-pure-specular) vertex. The wavefront
        # form gathers at the PRIMARY hit: AOV scenes are diagnostic and
        # the specular-chase loop would add a full bounce loop for a debug
        # view; primary-hit density is the quantity users inspect.
        from ...render import materials as mat
        from . import photon as photon_mod

        if photon_map is None:
            out = jnp.zeros((n, 3), jnp.float32)
        else:
            params = mat.gather(
                scene.materials, frag.material, None, scene.textures, frag.uv,
                features=scene.mat_features,
            )
            gather_ok = valid & mat.can_evaluate(params)
            out = photon_mod.gather(
                photon_map, params, frag.p, -d, frag.n, frag.geo_n, gather_ok,
                max_per_cell=photon_max_per_cell,
            )
            out = jnp.where(gather_ok[..., None], out, 0.0)
    else:  # AO
        ns = jnp.where(vm.dot(-d, frag.geo_n)[..., None] > 0.0, frag.geo_n, -frag.geo_n)
        t, b = vm.orthonormal_basis(ns)
        occ = jnp.zeros((n,), jnp.float32)
        origin = shapes.offset_ray(frag.p, ns)
        for _ in range(max(settings.num_samples, 1)):
            xi = sobol.sample_2d()
            local, _ = vm.sample_hemisphere_cosine(xi)
            wi = vm.frame_to_world(t, b, ns, local)
            blocked = shapes.occluded(
                scene, origin, wi, jnp.float32(0.0), jnp.float32(settings.radius)
            )
            occ = occ + blocked.astype(jnp.float32)
            rays = rays + n
        ao = 1.0 - occ / max(settings.num_samples, 1)
        out = jnp.broadcast_to(ao[..., None], (n, 3))

    out = jnp.where(valid[..., None], out, 0.0)
    return out, sobol, rays
