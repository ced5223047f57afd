"""Material evaluation/sampling over SoA lanes.

The reference dispatches through tagged unions
(ref: src/core/scene/material/material.zig). Lanes here are branch-free:
every material model is evaluated and the result selected by material kind —
cheap on the VPU, no divergence. This module starts with the diffuse path of
the Substitute material and pure emitters; GGX/glass build on it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..scene.types import Materials, MaterialKind


class BsdfSample(NamedTuple):
    wi: jax.Array  # [N,3]
    weight: jax.Array  # [N,3] reflection/pdf (throughput multiplier)
    pdf: jax.Array  # [N]
    valid: jax.Array  # bool[N]
    singular: jax.Array  # bool[N] (delta event: no MIS vs NEE)


def gather(materials: Materials, mat_id):
    """Gather per-lane material parameters."""
    m = jnp.maximum(mat_id, 0)
    return {
        "kind": materials.kind[m],
        "color": materials.color[m],
        "roughness": materials.roughness[m],
        "metallic": materials.metallic[m],
        "ior": materials.ior[m],
        "specular": materials.specular[m],
        "emission": materials.emission[m],
        "two_sided": materials.two_sided[m],
    }


def eval_radiance(params, wo, geo_n):
    """Emitted radiance toward wo (ref: vertex.zig evaluateRadiance ->
    light_material.zig evaluateRadiance): gated on facing unless two-sided."""
    facing = vm.dot(wo, geo_n) > 0.0
    visible = facing | params["two_sided"]
    return jnp.where(visible[..., None], params["emission"], 0.0)


def sample_bsdf(params, wo, n, geo_n, xi) -> BsdfSample:
    """Sample the BSDF. xi: float[N,2] uniforms.

    Currently: Substitute diffuse lobe (Lambert, albedo=color). Emitters and
    debug materials terminate the path.
    """
    kind = params["kind"]

    # flip the shading frame to the side wo is on (two-sided shading base,
    # ref material_sample sample_base.zig)
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)

    t, b = vm.orthonormal_basis(ns)
    local_dir, pdf = vm.sample_hemisphere_cosine(xi)
    wi = vm.frame_to_world(t, b, ns, local_dir)

    albedo = params["color"]
    weight = albedo  # (albedo/pi * cos) / (cos/pi)

    can_scatter = (kind == int(MaterialKind.SUBSTITUTE)) | (kind == int(MaterialKind.GLASS))
    valid = can_scatter & (pdf > 0.0)
    return BsdfSample(
        wi=wi,
        weight=jnp.where(valid[..., None], weight, 0.0),
        pdf=jnp.where(valid, pdf, 0.0),
        valid=valid,
        singular=jnp.zeros_like(valid),
    )


def eval_bsdf(params, wo, wi, n, geo_n):
    """Evaluate f(wo,wi)*|cos| and pdf for NEE/MIS. Lambert for now."""
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    cos_wi = vm.dot(wi, ns)
    f = params["color"] / jnp.pi
    pdf = jnp.maximum(cos_wi, 0.0) / jnp.pi
    reflect_ok = cos_wi > 0.0
    value = jnp.where(reflect_ok[..., None], f * jnp.maximum(cos_wi, 0.0)[..., None], 0.0)
    return value, jnp.where(reflect_ok, pdf, 0.0)


def russian_roulette(throughput, r):
    """ref integrator/helper.zig russianRoulette: p = maxcomp/0.1."""
    mx = jnp.max(throughput, axis=-1)
    p = mx / 0.1
    kill = (p < 1.0) & (r >= p)
    scale = jnp.where(p < 1.0, 1.0 / jnp.maximum(p, 1e-12), 1.0)
    throughput = throughput * jnp.where(kill, 0.0, scale)[..., None]
    return throughput, kill
