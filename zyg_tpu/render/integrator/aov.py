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
    value: str = "AO"  # AO | Tangent | Bitangent | GeometricNormal | ShadingNormal | Side | Depth
    num_samples: int = 1
    radius: float = 1.0
    max_depth: int = 1


def integrate(scene: SceneData, o, d, sobol: SobolSampler, settings: AovSettings):
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
