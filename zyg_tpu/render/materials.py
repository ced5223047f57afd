"""Material evaluation/sampling over SoA lanes.

The reference dispatches material models through tagged unions
(ref: src/core/scene/material/material.zig); here every lane evaluates the
models branch-free and selects by material kind (cheap on the VPU).

Implemented models:
- **Substitute** (uber, ref substitute/substitute_sample.zig): energy-
  conserving microfacet diffuse (ref diffuse.zig Micro) + isotropic GGX with
  VNDF sampling (ref ggx.zig Iso/Aniso), Schlick fresnel with metallic f0,
  and dspbr-style multi-scatter compensation from regenerated energy tables.
- **Glass** (smooth dielectric, ref glass/glass_sample.zig specularSample):
  fresnel-weighted reflect/refract delta events; Beer absorption handled by
  the integrator's medium tracking.
- **Light/Debug**: emitters terminate paths.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..scene.types import Materials, MaterialKind
from ..core.gather import small_gather

MIN_ROUGHNESS = 0.01314  # ref ggx.zig MinRoughness
MIN_ALPHA = MIN_ROUGHNESS * MIN_ROUGHNESS

# ---------------------------------------------------------------------------
# Energy functions (directional/average GGX albedos).
#
# The reference ships LUTs (ggx_integral.zig). Table gathers are slow on the
# TPU VPU, so we use tensor-polynomial fits of the same integrals (generated
# by tools/generate_ggx_tables.py + the fit in ggx_fit.npz; max err ~2.5%,
# below the furnace tolerance). Schlick fresnel is LINEAR in f0, so
#     E_schlick(f0) = f0 * E_m + (1 - f0) * E_p
# with E_m = albedo at F=1 and E_p = albedo weighted by (1-cos_h)^5.
# All evaluations are unrolled Horner chains — pure FMA, no memory traffic.
# ---------------------------------------------------------------------------

_fit = np.load(os.path.join(os.path.dirname(__file__), "ggx_fit.npz"))
_CM = np.asarray(_fit["cm"], np.float64)  # [7,7] coeffs over alpha^i * sqrt(mu)^j
_CP = np.asarray(_fit["cp"], np.float64)
_CMA = np.asarray(_fit["cma"], np.float64)  # [7] coeffs over alpha^i
_CPA = np.asarray(_fit["cpa"], np.float64)


def _poly2(c, x, y):
    res = None
    for i in reversed(range(c.shape[0])):
        row = None
        for j in reversed(range(c.shape[1])):
            row = jnp.float32(c[i, j]) if row is None else row * y + jnp.float32(c[i, j])
        res = row if res is None else res * x + row
    return res


def _poly1(c, x):
    res = None
    for i in reversed(range(c.shape[0])):
        res = jnp.float32(c[i]) if res is None else res * x + jnp.float32(c[i])
    return res


def eval_e_m(alpha, mu):
    return jnp.clip(_poly2(_CM, alpha, jnp.sqrt(jnp.maximum(mu, 0.0))), 0.0, 1.0)


def eval_e_p(alpha, mu):
    return jnp.clip(_poly2(_CP, alpha, jnp.sqrt(jnp.maximum(mu, 0.0))), 0.0, 1.0)


def eval_e_m_avg(alpha):
    return jnp.clip(_poly1(_CMA, alpha), 0.0, 1.0)


def eval_e_p_avg(alpha):
    return jnp.clip(_poly1(_CPA, alpha), 0.0, 1.0)


def eval_e_s(f0, alpha, mu):
    return f0 * eval_e_m(alpha, mu) + (1.0 - f0) * eval_e_p(alpha, mu)


def eval_e_s_avg(f0, alpha):
    return f0 * eval_e_m_avg(alpha) + (1.0 - f0) * eval_e_p_avg(alpha)


# ---------------------------------------------------------------------------


class BsdfSample(NamedTuple):
    wi: jax.Array  # [N,3]
    weight: jax.Array  # [N,3] reflection/pdf (throughput multiplier)
    pdf: jax.Array  # [N]
    valid: jax.Array  # bool[N]
    singular: jax.Array  # bool[N] delta event (no MIS)
    transmission: jax.Array  # bool[N] crossed the surface
    passthrough: jax.Array  # bool[N] null interface (volume boundary): the
    # ray continues straight and the PREVIOUS vertex's MIS state must be kept
    reg_alpha: jax.Array  # [N] alpha of the SAMPLED lobe (ref bxdf.zig
    # Path.reg_alpha: diffuse 1, glossy alpha, specular 0) — feeds
    # path-space regularization of the next vertex
    wavelength: jax.Array = None  # [N] hero wavelength in nm (0 = spectral
    # path not yet pinned; ref probe.zig wavelength, glass dispersion)
    fresnel: jax.Array = None  # [N] dielectric fresnel F at the sampled
    # microfacet/normal for GLASS lanes (garbage elsewhere) — the BSDF
    # path-splitting weights f / (1-f) (ref glass_sample.zig split_weight)


def ior_to_f0(ior, ior_outside):
    t = (ior - ior_outside) / (ior + ior_outside)
    return t * t


def gather(materials: Materials, mat_id, medium_ior=None, textures=None, uv=None, features=None, tex_xi=None, uv_alt=None, footprint=None):
    """Gather per-lane material parameters + derived BSDF constants.

    medium_ior: IoR of the medium the ray travels in (1.0 = air).
    textures/uv: optional texture arena + per-lane uv; texture-mapped
    parameters multiply their uniform values (ref texture.zig Texture scale).
    features: STATIC dict of material features present in the scene
    ({"coating", "translucency"}; loader-computed) — absent features compile
    to nothing. None = enable all (standalone/test use)."""
    m = jnp.maximum(mat_id, 0)
    kind = small_gather(materials.kind, m)
    color = small_gather(materials.color, m)
    metallic = small_gather(materials.metallic, m)
    ior = small_gather(materials.ior, m)
    roughness = small_gather(materials.roughness, m)
    emission_scale = None
    if textures is not None and uv is not None:
        from ..scene.textures import sample_bilinear, sample_stochastic

        # LinearStochastic is the reference's default sampler
        # (ref texture.zig:18): one jittered texel instead of four
        samp = (
            (lambda t, i, u: sample_stochastic(
                t, i, u, tex_xi, uv_alt=uv_alt, footprint=footprint))
            if tex_xi is not None
            else (lambda t, i, u: sample_bilinear(
                t, i, u, uv_alt=uv_alt, footprint=footprint))
        )
        ct = small_gather(materials.color_tex, m)
        color = jnp.where(
            (ct >= 0)[..., None], color * samp(textures, ct, uv)[..., :3], color
        )
        rt = small_gather(materials.roughness_tex, m)
        roughness = jnp.where(
            rt >= 0, roughness * samp(textures, rt, uv)[..., 0], roughness
        )
        # emission maps stay BILINEAR even under stochastic filtering: a
        # jittered one-texel read turns an HDR sun texel into rare
        # max-magnitude spikes on the MIS'd BSDF-hit estimator — measured
        # 15% low at 64 spp on a 200:1 env (test_env_sampling); the
        # footprint-smoothed value converges at production sample counts
        et = small_gather(materials.emission_tex, m)
        emission_scale = jnp.where(
            (et >= 0)[..., None],
            sample_bilinear(
                textures, et, uv, uv_alt=uv_alt, footprint=footprint
            )[..., :3],
            1.0,
        )
    roughness = jnp.maximum(roughness, MIN_ROUGHNESS)
    alpha = roughness * roughness
    ior_out = jnp.ones_like(ior) if medium_ior is None else medium_ior
    f0_scalar = ior_to_f0(ior, ior_out)
    f0 = vm.lerp(f0_scalar[..., None] * jnp.ones_like(color), color, metallic[..., None])
    albedo = (1.0 - metallic[..., None]) * color
    emission = small_gather(materials.emission, m)
    if emission_scale is not None:
        emission = emission * emission_scale
    coat_thick = small_gather(materials.coating_thickness, m)
    coat_rough = jnp.maximum(small_gather(materials.coating_roughness, m), MIN_ROUGHNESS)
    feats = (
        {
            "coating": True,
            "translucency": True,
            "ies": True,
            "rough_glass": True,
            "glass": True,
            "volumetric": True,
            "media": True,
        }
        if features is None
        else features
    )
    out_extra = {}
    if "ies" in feats and materials.ies is not None:
        out_extra["ies"] = small_gather(materials.ies, m)
    if "dispersion" in feats and materials.abbe is not None:
        out_extra["abbe"] = small_gather(materials.abbe, m)
    if "aniso" in feats:
        a = small_gather(materials.anisotropy, m)
        rv = jnp.maximum(roughness * (1.0 - jnp.maximum(a, 0.0)), MIN_ROUGHNESS)
        out_extra["alpha_v"] = rv * rv
        out_extra["aniso_rot"] = (
            small_gather(materials.anisotropy_rotation, m) * (2.0 * jnp.pi)
            if materials.anisotropy_rotation is not None
            else jnp.zeros_like(a)
        )
    if "hair" in feats and materials.hair is not None:
        out_extra["hair"] = small_gather(materials.hair, m)
        # azimuthal offset h = 2v-1 from the curve fragment's uv
        # (ref hair_sample.zig: h = 2*(rs.uvw[1]-0.5))
        if uv is not None:
            out_extra["hair_h"] = jnp.clip(2.0 * (uv[..., 1] - 0.5), -1.0, 1.0)
    if "flakes" in feats:
        # defaults; apply_flakes() (integrator, surface hits only)
        # replaces these for lanes that land on a flake
        out_extra["flake_on"] = jnp.zeros(kind.shape, bool)
        out_extra["flake_cos"] = jnp.ones(kind.shape, jnp.float32)
    return {
        "_features": feats,
        **out_extra,
        "kind": kind,
        "color": color,
        "albedo": albedo,
        "f0": f0,
        "alpha": alpha,
        "metallic": metallic,
        "ior": ior,
        "ior_outside": ior_out,
        "specular": small_gather(materials.specular, m),
        "emission": emission,
        "two_sided": small_gather(materials.two_sided, m),
        "attenuation_distance": small_gather(materials.attenuation_distance, m),
        # substitute extras (ref substitute_material.zig translucency/coating)
        "translucency": small_gather(materials.translucency, m),
        "coat_on": coat_thick > 0.0,
        "coat_f0": ior_to_f0(small_gather(materials.coating_ior, m), ior_out),
        "coat_alpha": coat_rough * coat_rough,
    }


_FLAKE_A2_LIMIT = (2.0 * np.pi * (1.0 - np.cos(np.deg2rad(7.0)))) / (
    4.0 * np.pi - 2.0 * np.pi * (1.0 - np.cos(np.deg2rad(7.0)))
)


def triplanar_uv(scene, frag):
    """Object-space triplanar uv of a fragment (ref material_helper.zig
    triplanarMapping): dominant-normal-axis planar projection, sign-fixed.
    Feeds textures with texcoord Triplanar/ObjectPos and the flake grid."""
    pr = jnp.maximum(frag.prop, 0)
    rot = small_gather(scene.prop_rot, pr)
    pos = small_gather(scene.prop_pos, pr)
    op = vm.world_to_object_normal(rot, frag.p - pos)
    on = vm.world_to_object_normal(rot, frag.n)
    an = jnp.abs(on)
    ax = (an[..., 0] > an[..., 1]) & (an[..., 0] > an[..., 2])
    ay = (an[..., 1] > an[..., 0]) & (an[..., 1] > an[..., 2]) & ~ax
    sgn = jnp.sign(jnp.where(ax, on[..., 0], jnp.where(ay, on[..., 1], on[..., 2])))
    u = jnp.where(
        ax, sgn * op[..., 2], jnp.where(ay, sgn * op[..., 0], -sgn * op[..., 0])
    ) + 0.5
    v = jnp.where(ax, -op[..., 1], jnp.where(ay, -op[..., 2], -op[..., 1])) + 0.5
    return jnp.stack([u, v], -1)


def apply_flakes(scene, params, frag, wo):
    """Metallic flakes (ref substitute_material.zig sample(): jittered-grid
    Voronoi flakes over a triplanar object-space uv). Lanes landing on a
    flake become mirror-metal with the flake's own fixed microfacet normal
    (sampled from the flake's deterministic xi) and a uniform-cone lobe.

    Returns (params', n') — n' replaces the shading normal for flake lanes.
    Statically gated: only compiled when 'flakes' in mat_features."""
    from ..core.rng import hash2_u32, hash_u32, u32_to_float

    mats = scene.materials
    m_id = jnp.maximum(frag.material, 0)
    cov = small_gather(mats.flakes_coverage, m_id)
    res = small_gather(mats.flakes_res, m_id)
    fa = small_gather(mats.flakes_alpha, m_id)
    fcol = small_gather(mats.flakes_color, m_id)
    is_sub = params["kind"] == int(MaterialKind.SUBSTITUTE)

    uv3 = triplanar_uv(scene, frag)
    u, v = uv3[..., 0], uv3[..., 1]
    suv_x = res * jnp.mod(u, 1.0)
    suv_y = res * jnp.mod(v, 1.0)
    bx = jnp.floor(suv_x).astype(jnp.int32)
    by = jnp.floor(suv_y).astype(jnp.int32)

    # nearest of 4 flakes per cell over the 3x3 neighborhood (ref
    # sampleFlake): flake attributes are pure hashes of the cell id, so
    # every lane/bounce sees the same flake field
    nearest_d = jnp.full(u.shape, 1e30, jnp.float32)
    nearest_r = jnp.zeros(u.shape, jnp.float32)
    nearest_x1 = jnp.zeros(u.shape, jnp.float32)
    nearest_x2 = jnp.zeros(u.shape, jnp.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ci = bx + dx
            cj = by + dy
            key = hash2_u32(
                ci.astype(jnp.uint32) * jnp.uint32(0x9E3779B1),
                cj.astype(jnp.uint32) ^ jnp.uint32(0x85EBCA77),
            )
            for _fl in range(4):
                r1 = u32_to_float(key)
                key = hash_u32(key ^ jnp.uint32(0x27D4EB2F))
                r2 = u32_to_float(key)
                key = hash_u32(key ^ jnp.uint32(0x165667B1))
                x1 = u32_to_float(key)
                key = hash_u32(key ^ jnp.uint32(0xC2B2AE35))
                x2 = u32_to_float(key)
                key = hash_u32(key ^ jnp.uint32(0x61C88647))
                rc = u32_to_float(key)
                key = hash_u32(key ^ jnp.uint32(0x738769B9))
                px = ci.astype(jnp.float32) + r1
                py = cj.astype(jnp.float32) + r2
                d2 = (suv_x - px) ** 2 + (suv_y - py) ** 2
                better = d2 < nearest_d
                nearest_d = jnp.where(better, d2, nearest_d)
                nearest_r = jnp.where(better, rc, nearest_r)
                nearest_x1 = jnp.where(better, x1, nearest_x1)
                nearest_x2 = jnp.where(better, x2, nearest_x2)

    flake_on = is_sub & (cov > 0.0) & (nearest_r < cov)

    # flake normal: GGX VNDF with the flake's deterministic xi at the
    # residual alpha (cone aperture absorbs the rest; ref flakesA2cone)
    a2c = jnp.minimum(jnp.float32(_FLAKE_A2_LIMIT), 0.5 * fa)
    cos_cone = 1.0 - (2.0 * a2c) / (1.0 + a2c)
    fa2 = jnp.maximum(fa - a2c, 1e-5)
    t, b = vm.orthonormal_basis(frag.n)
    wo_l = vm.world_to_frame(t, b, frag.n, wo)
    m_l = _vndf_sample(wo_l, fa2, jnp.stack([nearest_x1, nearest_x2], -1))
    m_w = vm.frame_to_world(t, b, frag.n, m_l)

    fm = flake_on[..., None]
    n_out = jnp.where(fm, m_w, frag.n)
    out = dict(params)
    out["flake_on"] = flake_on
    out["flake_cos"] = jnp.where(flake_on, cos_cone, 1.0)
    out["f0"] = jnp.where(fm, fcol, params["f0"])
    out["albedo"] = jnp.where(fm, 0.0, params["albedo"])
    out["metallic"] = jnp.where(flake_on, 1.0, params["metallic"])
    out["color"] = jnp.where(fm, fcol, params["color"])
    return out, n_out


def _flake_eval(params, wo, wi, ns):
    """Uniform-cone mirror lobe of a flake (ref substitute_sample.zig
    evaluate flakes branch). Returns (f [N,3], pdf [N])."""
    cos_cone = params["flake_cos"]
    r = 2.0 * vm.dot(ns, wo)[..., None] * ns - wo
    inside = vm.dot(wi, r) > cos_cone
    sa = 2.0 * jnp.pi * jnp.maximum(1.0 - cos_cone, 1e-7)
    fq = jnp.where(inside, 1.0 / sa, 0.0)
    n_dot_wi = _clamp(vm.dot(ns, wi))
    f = (n_dot_wi * fq * params["specular"])[..., None] * params["f0"]
    return f, fq


def _flake_sample(params, wo, ns, xi):
    """Uniform cone around the mirror direction (ref glossSample flakes)."""
    cos_cone = params["flake_cos"]
    r = vm.safe_normalize(2.0 * vm.dot(ns, wo)[..., None] * ns - wo)
    z = 1.0 - (1.0 - cos_cone) * xi[..., 0]
    phi = 2.0 * jnp.pi * xi[..., 1]
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    tr, br = vm.orthonormal_basis(r)
    wi = vm.frame_to_world(
        tr, br, r, jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)
    )
    sa = 2.0 * jnp.pi * jnp.maximum(1.0 - cos_cone, 1e-7)
    pdf = jnp.full(cos_cone.shape, 1.0, jnp.float32) / sa
    n_dot_wi = _clamp(vm.dot(ns, wi))
    weight = (n_dot_wi * params["specular"])[..., None] * params["f0"]
    ok = n_dot_wi > 1e-6
    return wi, weight, pdf, ok


def regularize_alpha(params, reg_alpha_prev, weight: float, caustics: bool):
    """Path-space regularization (ref renderstate.zig regularizeAlpha +
    take.zig regularize_roughness): after a rough bounce (reg_alpha_prev),
    widen this vertex's glossy/specular lobes toward 1 by
    ``1 - (1-a) * (1 - weight*reg_alpha_prev)``. Lobes already smoother than
    the specular threshold are left alone unless caustics are enabled.
    Returns updated params (alpha + coat_alpha)."""

    def reg(a):
        a_r = 1.0 - (1.0 - a) * (1.0 - weight * reg_alpha_prev)
        if caustics:
            return a_r
        return jnp.where(a <= MIN_ALPHA * 1.001, a, a_r)

    out = dict(params)
    out["alpha"] = reg(params["alpha"])
    out["coat_alpha"] = reg(params["coat_alpha"])
    return out


def apply_normal_map(materials: Materials, textures, mat_id, uv, n, t, b, tex_xi=None, uv_alt=None):
    """Perturb the shading normal by the material's tangent-space normal map
    (ref substitute material sample(): normal_map -> TBN rotate). No-op for
    lanes whose material has no map."""
    if textures is None:
        return n
    from ..scene.textures import sample_bilinear, sample_stochastic

    m = jnp.maximum(mat_id, 0)
    nt = small_gather(materials.normal_tex, m)
    if tex_xi is not None:
        nm = sample_stochastic(textures, jnp.maximum(nt, 0), uv, tex_xi, uv_alt=uv_alt)[..., :3] * 2.0 - 1.0
    else:
        nm = sample_bilinear(textures, jnp.maximum(nt, 0), uv, uv_alt=uv_alt)[..., :3] * 2.0 - 1.0
    n_pert = vm.safe_normalize(
        nm[..., 0:1] * t + nm[..., 1:2] * b + jnp.maximum(nm[..., 2:3], 0.1) * n
    )
    return jnp.where((nt >= 0)[..., None], n_pert, n)


def eval_ies(profile, cos_theta):
    """Lerp the [N,32] angular profile at theta = arccos(cos). Select-chain
    indexing (32 rows) instead of a per-lane gather (TPU perf rule)."""
    nb = profile.shape[-1]
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    x = theta * ((nb - 1) / jnp.pi)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nb - 2)
    frac = x - i0
    v0 = jnp.zeros_like(cos_theta)
    v1 = jnp.zeros_like(cos_theta)
    for k in range(nb - 1):
        sel = i0 == k
        v0 = jnp.where(sel, profile[..., k], v0)
        v1 = jnp.where(sel, profile[..., k + 1], v1)
    return v0 + frac * (v1 - v0)


def eval_radiance(params, wo, geo_n):
    """Emitted radiance toward wo (ref light_material.zig evaluateRadiance +
    emittance.zig IES profile factor). Volumetric emission is collected by
    the tracking loops / volume-light NEE, never at the boundary surface."""
    facing = vm.dot(wo, geo_n) > 0.0
    visible = (facing | params["two_sided"]) & (
        params["kind"] != int(MaterialKind.VOLUMETRIC)
    )
    emission = params["emission"]
    if "ies" in params:
        emission = emission * eval_ies(params["ies"], vm.dot(wo, geo_n))[..., None]
    return jnp.where(visible[..., None], emission, 0.0)


# ---------------------------------------------------------------------------
# GGX pieces (ref ggx.zig Iso + Aniso.sample)
# ---------------------------------------------------------------------------


def _ggx_distribution(n_dot_h, a2):
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-20)


def _visibility_and_g1wo(n_dot_wi, n_dot_wo, a2):
    t_wi = jnp.sqrt((1.0 - a2) * n_dot_wi * n_dot_wi + a2)
    t_wo = jnp.sqrt((1.0 - a2) * n_dot_wo * n_dot_wo + a2)
    vis = 0.5 / jnp.maximum(n_dot_wi * t_wo + n_dot_wo * t_wi, 1e-20)
    return vis, t_wo + n_dot_wo


def _aniso_frame(ns, t, b, rot):
    """Shading tangent frame for anisotropy: geometry tangent projected
    into the shading plane, rotated by anisotropy_rotation (ref
    substitute_material.zig rotation texture)."""
    t_s = vm.safe_normalize(t - ns * vm.dot(t, ns)[..., None])
    c, s = jnp.cos(rot), jnp.sin(rot)
    b_s = vm.cross(ns, t_s)
    t_r = c[..., None] * t_s + s[..., None] * b_s
    return t_r, vm.cross(ns, t_r)


def _aniso_lambda(wt, wb, wn, ax, ay):
    """Smith Lambda for anisotropic GGX (Heitz 2014)."""
    wn2 = jnp.maximum(wn * wn, 1e-9)
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + (ax * ax * wt * wt + ay * ay * wb * wb) / wn2))


def _aniso_spec_terms(params, wo, wi, ns, t_r, b_r):
    """Anisotropic GGX D, height-correlated visibility, VNDF pdf
    (ref ggx.zig Aniso reflect/reflectNoFresnel)."""
    ax = params["alpha"]
    ay = params["alpha_v"]
    h = vm.safe_normalize(wo + wi)
    ht = vm.dot(h, t_r)
    hb = vm.dot(h, b_r)
    hn = jnp.clip(vm.dot(h, ns), 0.0, 1.0)
    q = ht * ht / jnp.maximum(ax * ax, 1e-12) + hb * hb / jnp.maximum(ay * ay, 1e-12) + hn * hn
    d = 1.0 / jnp.maximum(jnp.pi * ax * ay * q * q, 1e-20)

    def comps(w):
        return vm.dot(w, t_r), vm.dot(w, b_r), jnp.abs(vm.dot(w, ns))

    ot, ob, on = comps(wo)
    it, ib, inn = comps(wi)
    lo = _aniso_lambda(ot, ob, on, ax, ay)
    li = _aniso_lambda(it, ib, inn, ax, ay)
    n_i = _clamp(inn)
    n_o = _clamp(on)
    g2 = 1.0 / jnp.maximum(1.0 + lo + li, 1e-9)
    g1o = 1.0 / jnp.maximum(1.0 + lo, 1e-9)
    vis = g2 / jnp.maximum(4.0 * n_i * n_o, 1e-12)
    pdf = d * g1o / jnp.maximum(4.0 * n_o, 1e-12)
    return d, vis, pdf


def _aniso_vndf_sample(wo_l, ax, ay, xi):
    """Anisotropic spherical-cap VNDF sample (local frame)."""
    v = vm.safe_normalize(
        jnp.stack([ax * wo_l[..., 0], ay * wo_l[..., 1], wo_l[..., 2]], -1)
    )
    phi = (2.0 * jnp.pi) * xi[..., 0]
    z = (1.0 - xi[..., 1]) * (1.0 + v[..., 2]) - v[..., 2]
    st = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    h = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), z], -1) + v
    return vm.safe_normalize(
        jnp.stack([ax * h[..., 0], ay * h[..., 1], h[..., 2]], -1)
    )


def _schlick(f0, cos):
    return f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - cos, 0.0), 5.0)[..., None]


def _vndf_sample(wo_l, alpha, xi):
    """Dupuy/Benyoub spherical-cap VNDF sample in the local frame."""
    v = vm.safe_normalize(
        jnp.stack([alpha * wo_l[..., 0], alpha * wo_l[..., 1], wo_l[..., 2]], -1)
    )
    phi = (2.0 * jnp.pi) * xi[..., 0]
    z = (1.0 - xi[..., 1]) * (1.0 + v[..., 2]) - v[..., 2]
    st = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    h = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), z], -1) + v
    m = vm.safe_normalize(jnp.stack([alpha * h[..., 0], alpha * h[..., 1], h[..., 2]], -1))
    return m


def _dspbr_micro_ec(f0, n_dot_wi, n_dot_wo, alpha):
    """Multi-scatter compensation term (ref ggx.zig dspbrMicroEc)."""
    e_wo = eval_e_m(alpha, n_dot_wo)
    e_wi = eval_e_m(alpha, n_dot_wi)
    e_avg = eval_e_m_avg(alpha)
    m = ((1.0 - e_wo) * (1.0 - e_wi)) / jnp.maximum(jnp.pi * (1.0 - e_avg), 1e-6)
    f_avg = (20.0 / 21.0) * f0 + (1.0 / 21.0)
    f = (f_avg * f_avg * e_avg[..., None]) / jnp.maximum(
        1.0 - f_avg * (1.0 - e_avg[..., None]), 1e-6
    )
    return m[..., None] * f


def _clamp(x, lo=1e-5):
    return jnp.maximum(x, lo)


def _substitute_lobes(params, wo, wi, ns, t=None, b=None):
    """Shared math: returns (f*cos [N,3], pdf [N]) of the substitute BSDF at wi.

    Mirrors ref substitute_sample.zig baseEvaluate; with the static "aniso"
    feature and a tangent frame, the specular lobe switches to anisotropic
    GGX (ref ggx.zig Aniso; energy-compensation fits keep the isotropic
    alpha — a standard approximation, exact at anisotropy 0)."""
    alpha = params["alpha"]
    a2 = alpha * alpha
    f0 = params["f0"]
    f0m = jnp.max(f0, axis=-1)
    albedo = params["albedo"]
    am = jnp.max(albedo, axis=-1)

    n_dot_wi = _clamp(vm.dot(ns, wi))
    n_dot_wo = _clamp(jnp.abs(vm.dot(ns, wo)))
    h = vm.safe_normalize(wo + wi)
    wo_dot_h = _clamp(vm.dot(wo, h))
    n_dot_h = jnp.clip(vm.dot(ns, h), 0.0, 1.0)

    # energy-conserving microfacet diffuse (ref diffuse.zig Micro)
    e_wo = eval_e_s(f0m, alpha, n_dot_wo)
    e_wi = eval_e_s(f0m, alpha, n_dot_wi)
    e_avg = eval_e_s_avg(f0m, alpha)
    inv_pi_1me = 1.0 / jnp.maximum(jnp.pi * (1.0 - e_avg), 1e-6)
    d_refl = ((1.0 - e_wo) * (1.0 - e_wi) * inv_pi_1me)[..., None] * albedo
    d_pdf = n_dot_wi * (1.0 / jnp.pi)
    # diffuse selection weight (ref diffuse.zig estimateContribution cand. B)
    b = am * inv_pi_1me
    dw = b / jnp.maximum(e_avg + b, 1e-12)
    dw = jnp.where(params["metallic"] >= 1.0, 0.0, dw)

    # GGX specular + Schlick + multi-scatter compensation
    fr = _schlick(f0, wo_dot_h)
    if "aniso" in params["_features"] and t is not None:
        t_r, b_r = _aniso_frame(ns, t, b, params["aniso_rot"])
        d_a, vis_a, pdf_a = _aniso_spec_terms(params, wo, wi, ns, t_r, b_r)
        gg_refl = (d_a * vis_a)[..., None] * fr
        gg_pdf = pdf_a
    else:
        d_ggx = _ggx_distribution(n_dot_h, a2)
        vis, g1_denom = _visibility_and_g1wo(n_dot_wi, n_dot_wo, a2)
        gg_refl = (d_ggx * vis)[..., None] * fr
        gg_pdf = (0.5 * d_ggx) / jnp.maximum(g1_denom, 1e-20)
    mms = _dspbr_micro_ec(f0, n_dot_wi, n_dot_wo, alpha)

    s = params["specular"][..., None]
    f_total = n_dot_wi[..., None] * (d_refl + s * (gg_refl + mms))
    pdf = dw * d_pdf + (1.0 - dw) * gg_pdf
    return f_total, pdf, dw


def _no_coating(params, wo):
    zero = jnp.zeros(wo.shape[:-1], jnp.float32)
    return jnp.zeros_like(wo), zero, zero, jnp.ones_like(zero)


def _coating_lobe(params, wo, wi, ns):
    """Clearcoat GGX lobe + base attenuation factors (ref
    substitute_coating.zig): returns (f_coat*cos [N,3], pdf [N], fc_wo [N],
    atten [N] = (1-Fc(wo))(1-Fc(wi)))."""
    a_c = params["coat_alpha"]
    a2 = a_c * a_c
    f0 = params["coat_f0"]
    n_dot_wi = _clamp(vm.dot(ns, wi))
    n_dot_wo = _clamp(jnp.abs(vm.dot(ns, wo)))
    h = vm.safe_normalize(wo + wi)
    wo_dot_h = _clamp(vm.dot(wo, h))
    n_dot_h = jnp.clip(vm.dot(ns, h), 0.0, 1.0)
    d_ggx = _ggx_distribution(n_dot_h, a2)
    vis, g1_denom = _visibility_and_g1wo(n_dot_wi, n_dot_wo, a2)
    fr_wo = f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - n_dot_wo, 0.0), 5.0)
    fr_wi = f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - n_dot_wi, 0.0), 5.0)
    fr_h = f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - wo_dot_h, 0.0), 5.0)
    on = params["coat_on"]
    f = jnp.where(on, n_dot_wi * d_ggx * vis * fr_h, 0.0)[..., None] * jnp.ones(
        wo.shape[:-1] + (3,), jnp.float32
    )
    pdf = jnp.where(on, (0.5 * d_ggx) / jnp.maximum(g1_denom, 1e-20), 0.0)
    atten = jnp.where(on, (1.0 - fr_wo) * (1.0 - fr_wi), 1.0)
    fc_wo = jnp.where(on, fr_wo, 0.0)
    return f, pdf, fc_wo, atten


def _substitute_eval(params, wo, wi, n, geo_n, t=None, b=None):
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    refl_side = vm.dot(wi, ns) > 0.0
    tl = params["translucency"]

    feats = params["_features"]
    f, pdf, _ = _substitute_lobes(params, wo, wi, ns, t, b)
    if "coating" in feats:
        fc, cpdf, fc_wo, atten = _coating_lobe(params, wo, wi, ns)
        f = atten[..., None] * f + fc
        pdf = fc_wo * cpdf + (1.0 - fc_wo) * pdf
    if "flakes" in feats:
        # flake lanes replace the whole base stack with the cone lobe
        # (ref substitute_sample.zig evaluate: properties.flakes branch)
        f_fl, pdf_fl = _flake_eval(params, wo, wi, ns)
        fl = params["flake_on"]
        f = jnp.where(fl[..., None], f_fl, f)
        pdf = jnp.where(fl, pdf_fl, pdf)
    if "translucency" not in feats:
        ok = refl_side
        return jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)
    f_r = (1.0 - tl)[..., None] * f
    pdf_r = (1.0 - tl) * pdf

    # diffuse transmission to the far side (thin translucency, ref
    # substitute translucent sample)
    n_dot_wi_t = _clamp(-vm.dot(ns, wi))
    f_t = (tl / jnp.pi)[..., None] * params["albedo"] * n_dot_wi_t[..., None]
    pdf_t = tl * n_dot_wi_t * (1.0 / jnp.pi)

    f_out = jnp.where(refl_side[..., None], f_r, jnp.where((tl > 0.0)[..., None], f_t, 0.0))
    pdf_out = jnp.where(refl_side, pdf_r, jnp.where(tl > 0.0, pdf_t, 0.0))
    return f_out, pdf_out


def _substitute_sample(params, wo, n, geo_n, p, xi, t_in=None, b_in=None):
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    aniso = "aniso" in params["_features"] and t_in is not None
    if aniso:
        # anisotropy needs the geometry's uv tangent frame (rotated)
        t, b = _aniso_frame(ns, t_in, b_in, params["aniso_rot"])
    else:
        t, b = vm.orthonormal_basis(ns)

    # candidate directions for every lobe
    d_local, _ = vm.sample_hemisphere_cosine(xi)
    wi_diffuse = vm.frame_to_world(t, b, ns, d_local)
    wi_trans = -wi_diffuse  # thin diffuse transmission (far hemisphere)

    wo_l = vm.world_to_frame(t, b, ns, wo)
    if aniso:
        m_l = _aniso_vndf_sample(wo_l, params["alpha"], params["alpha_v"], xi)
    else:
        m_l = _vndf_sample(wo_l, params["alpha"], xi)
    h = vm.frame_to_world(t, b, ns, m_l)
    wo_dot_h = _clamp(vm.dot(wo, h))
    wi_gloss = vm.safe_normalize(2.0 * wo_dot_h[..., None] * h - wo)

    feats = params["_features"]
    if "coating" in feats:
        mc_l = _vndf_sample(wo_l, params["coat_alpha"], xi)
        hc = vm.frame_to_world(t, b, ns, mc_l)
        wi_coat = vm.safe_normalize(2.0 * _clamp(vm.dot(wo, hc))[..., None] * hc - wo)
    else:
        wi_coat = wi_gloss

    # selection chain: translucency -> coat (Fc(wo)) -> diffuse/gloss (dw);
    # the probabilities MATCH the mixture pdf _substitute_eval reports
    f0m = jnp.max(params["f0"], axis=-1)
    am = jnp.max(params["albedo"], axis=-1)
    e_avg = eval_e_s_avg(f0m, params["alpha"])
    bsel = am / jnp.maximum(jnp.pi * (1.0 - e_avg), 1e-6)
    dw = bsel / jnp.maximum(e_avg + bsel, 1e-12)
    dw = jnp.where(params["metallic"] >= 1.0, 0.0, dw)
    n_dot_wo = _clamp(jnp.abs(vm.dot(ns, wo)))
    if "coating" in feats:
        fc_wo = jnp.where(
            params["coat_on"],
            params["coat_f0"]
            + (1.0 - params["coat_f0"]) * jnp.power(jnp.maximum(1.0 - n_dot_wo, 0.0), 5.0),
            0.0,
        )
    else:
        fc_wo = jnp.zeros_like(n_dot_wo)
    tl = params["translucency"] if "translucency" in feats else jnp.zeros_like(n_dot_wo)

    take_trans = p < tl
    p1 = jnp.clip((p - tl) / jnp.maximum(1.0 - tl, 1e-6), 0.0, 1.0)
    take_coat = ~take_trans & (p1 < fc_wo)
    p2 = jnp.clip((p1 - fc_wo) / jnp.maximum(1.0 - fc_wo, 1e-6), 0.0, 1.0)
    take_diffuse = ~take_trans & ~take_coat & (p2 < dw)

    wi = jnp.where(
        take_trans[..., None],
        wi_trans,
        jnp.where(
            take_coat[..., None],
            wi_coat,
            jnp.where(take_diffuse[..., None], wi_diffuse, wi_gloss),
        ),
    )
    # sampled-lobe alpha for path regularization (ref bxdf.zig Path:
    # diffuse/translucent lobes count as fully rough)
    reg_a = jnp.where(
        take_trans | take_diffuse,
        1.0,
        jnp.where(take_coat, params["coat_alpha"], params["alpha"]),
    )
    if not feats:
        # fast path: plain substitute — evaluate base lobes only
        f, pdf, _ = _substitute_lobes(params, wo, wi, ns, t_in, b_in)
        ok = (vm.dot(wi, ns) > 0.0) & (pdf > 1e-10)
        weight = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-10)[..., None], 0.0)
        return wi, weight, pdf, ok, reg_a
    if "flakes" in feats:
        # flake lanes sample the uniform cone around the flake mirror
        # direction instead of any base lobe
        wi_f, w_f, pdf_f, ok_f = _flake_sample(params, wo, ns, xi)
        fl = params["flake_on"]
        wi = jnp.where(fl[..., None], wi_f, wi)
        reg_a = jnp.where(fl, params["alpha"], reg_a)
        f, pdf = _substitute_eval(params, wo, wi, n, geo_n, t_in, b_in)
        ok = pdf > 1e-10
        weight = jnp.where(
            ok[..., None], f / jnp.maximum(pdf, 1e-10)[..., None], 0.0
        )
        weight = jnp.where(fl[..., None], w_f, weight)
        pdf = jnp.where(fl, pdf_f, pdf)
        ok = jnp.where(fl, ok_f, ok)
        return wi, weight, pdf, ok, reg_a
    f, pdf = _substitute_eval(params, wo, wi, n, geo_n, t_in, b_in)
    ok = pdf > 1e-10
    weight = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-10)[..., None], 0.0)
    return wi, weight, pdf, ok, reg_a


def _smith_g1(mu, a2):
    mu = jnp.clip(jnp.abs(mu), 1e-5, 1.0)
    return (2.0 * mu) / (mu + jnp.sqrt(a2 + (1.0 - a2) * mu * mu))


def _glass_rough_sample(params, wo, n, geo_n, p, xi, forced=None):
    """Rough dielectric via VNDF microfacet sampling (ref glass_sample.zig
    roughSample): sample h ~ VNDF, pick reflect/refract by the microfacet
    fresnel; the VNDF estimator weight is G2/G1(wo) for both events.

    forced: bool[N] — the reflect/refract choice was made DETERMINISTICALLY
    by the caller (BSDF path splitting, via p in {-1, 2}); the fresnel
    selection factor is dropped from the pdf and the caller applies
    f / (1-f) as the child's split weight (ref roughSample split path)."""
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    eta_i = jnp.where(same_side, params["ior_outside"], params["ior"])
    eta_t = jnp.where(same_side, params["ior"], 1.0)
    alpha = params["alpha"]
    a2 = alpha * alpha

    t, b = vm.orthonormal_basis(ns)
    wo_l = vm.world_to_frame(t, b, ns, wo)
    m_l = _vndf_sample(wo_l, alpha, xi)
    h = vm.frame_to_world(t, b, ns, m_l)
    wo_dot_h = _clamp(vm.dot(wo, h))

    eta = eta_i / jnp.maximum(eta_t, 1e-6)
    sint2 = (eta * eta) * (1.0 - wo_dot_h * wo_dot_h)
    tir = sint2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sint2, 0.0))
    r_p = (eta_t * wo_dot_h - eta_i * cos_t) / jnp.maximum(eta_t * wo_dot_h + eta_i * cos_t, 1e-12)
    r_o = (eta_i * wo_dot_h - eta_t * cos_t) / jnp.maximum(eta_i * wo_dot_h + eta_t * cos_t, 1e-12)
    f = jnp.where(tir, 1.0, 0.5 * (r_p * r_p + r_o * r_o))

    wi_refl = vm.safe_normalize(2.0 * wo_dot_h[..., None] * h - wo)
    wi_refr = vm.safe_normalize((eta * wo_dot_h - cos_t)[..., None] * h - eta[..., None] * wo)
    reflect_it = p <= f
    wi = jnp.where(reflect_it[..., None], wi_refl, wi_refr)

    n_dot_wo = _clamp(jnp.abs(vm.dot(ns, wo)))
    n_dot_wi = _clamp(jnp.abs(vm.dot(ns, wi)))
    g1 = _smith_g1(n_dot_wo, a2)

    def lam(mu):  # Smith Lambda for GGX
        t2 = (1.0 - mu * mu) / jnp.clip(mu * mu, 1e-10, None)
        return 0.5 * (jnp.sqrt(1.0 + a2 * t2) - 1.0)

    g2 = 1.0 / (1.0 + lam(n_dot_wo) + lam(n_dot_wi))
    # multi-scatter energy boost (ref ggx.zig ilmEpDielectric 1/E_s): the
    # expected single-scatter VNDF weight is E_m(alpha, mu), so dividing by
    # it restores the energy lost to microfacet shadowing on average
    ms_boost = 1.0 / jnp.maximum(eval_e_m(alpha, n_dot_wo), 0.5)
    weight = (g2 / jnp.maximum(g1, 1e-6) * ms_boost)[..., None] * params["specular"][..., None]

    # pdf for MIS: VNDF pdf with the jacobian of the chosen event
    n_dot_h = _clamp(vm.dot(ns, h))
    d_ggx = _ggx_distribution(n_dot_h, a2)
    pdf_h = g1 * wo_dot_h * d_ggx / jnp.maximum(n_dot_wo, 1e-6)
    wi_dot_h = jnp.abs(vm.dot(wi, h))
    # Walter 2007 eq. 17 jacobian: signed half-vector sum — with wo.h > 0 and
    # wi.h < 0 for transmission this is (eta_i*(wo.h) - eta_t*|wi.h|)^2
    denom = jnp.square(eta_i * wo_dot_h - eta_t * wi_dot_h)
    jac = jnp.where(
        reflect_it,
        1.0 / jnp.maximum(4.0 * wo_dot_h, 1e-6),
        (eta_t * eta_t * wi_dot_h) / jnp.maximum(denom, 1e-12),
    )
    sel_pdf = jnp.where(reflect_it, f, 1.0 - f)
    if forced is not None:
        sel_pdf = jnp.where(forced, 1.0, sel_pdf)
    pdf = pdf_h * jac * sel_pdf
    transmission = ~reflect_it
    return wi, weight, pdf, transmission, f


def _glass_rough_eval(params, wo, wi, n, geo_n, split=None):
    """Evaluate the rough dielectric at arbitrary wi for NEE/MIS (Walter 2007
    microfacet BTDF/BRDF; ref glass_sample.zig canEvaluate=true for the rough
    path). Returns (f*|cos| [N,3], pdf [N]) consistent with the VNDF
    estimator of _glass_rough_sample (f*cos/pdf == G2/G1 * ms_boost).

    split: None or bool[N] — lanes whose BSDF sample will SPLIT at this
    vertex report the no-fresnel-selection pdf (see comment below)."""
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    eta_i = jnp.where(same_side, params["ior_outside"], params["ior"])
    eta_t = jnp.where(same_side, params["ior"], 1.0)
    alpha = params["alpha"]
    a2 = alpha * alpha

    n_dot_wo = _clamp(jnp.abs(vm.dot(ns, wo)))
    n_dot_wi = _clamp(jnp.abs(vm.dot(ns, wi)))
    reflecting = vm.dot(ns, wi) > 0.0

    # half vector: reflection h ~ wo+wi; transmission h ~ -(eta_i wo+eta_t wi)
    h_r = vm.safe_normalize(wo + wi)
    ht_raw = -(eta_i[..., None] * wo + eta_t[..., None] * wi)
    h_t = vm.safe_normalize(ht_raw)
    h_t = jnp.where(vm.dot(h_t, ns)[..., None] < 0.0, -h_t, h_t)
    h = jnp.where(reflecting[..., None], h_r, h_t)

    wo_dot_h = vm.dot(wo, h)
    wi_dot_h = vm.dot(wi, h)
    n_dot_h = _clamp(vm.dot(ns, h))
    geom_ok = wo_dot_h > 1e-6
    wo_dot_h = _clamp(wo_dot_h)

    # microfacet fresnel at wo.h (same math as the sampler)
    eta = eta_i / jnp.maximum(eta_t, 1e-6)
    sint2 = (eta * eta) * (1.0 - wo_dot_h * wo_dot_h)
    tir = sint2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sint2, 0.0))
    r_p = (eta_t * wo_dot_h - eta_i * cos_t) / jnp.maximum(eta_t * wo_dot_h + eta_i * cos_t, 1e-12)
    r_o = (eta_i * wo_dot_h - eta_t * cos_t) / jnp.maximum(eta_i * wo_dot_h + eta_t * cos_t, 1e-12)
    f = jnp.where(tir, 1.0, 0.5 * (r_p * r_p + r_o * r_o))

    d_ggx = _ggx_distribution(n_dot_h, a2)
    g1 = _smith_g1(n_dot_wo, a2)

    def lam(mu):
        t2 = (1.0 - mu * mu) / jnp.clip(mu * mu, 1e-10, None)
        return 0.5 * (jnp.sqrt(1.0 + a2 * t2) - 1.0)

    g2 = 1.0 / (1.0 + lam(n_dot_wo) + lam(n_dot_wi))
    ms_boost = 1.0 / jnp.maximum(eval_e_m(alpha, n_dot_wo), 0.5)

    pdf_h = g1 * wo_dot_h * d_ggx / jnp.maximum(n_dot_wo, 1e-6)
    # BSDF path splitting drops the fresnel selection factor from the pdf
    # on BOTH the sample and eval sides (ref glass_sample.zig evaluate:
    # split_pdf = if (split) 1.0 else gg.f[0]) — MIS weights must pair the
    # same density convention or they stop summing to 1
    sel_r = f if split is None else jnp.where(split, 1.0, f)
    sel_t = (1.0 - f) if split is None else jnp.where(split, 1.0, 1.0 - f)
    # reflection branch
    f_refl = f * d_ggx * g2 / jnp.maximum(4.0 * n_dot_wo, 1e-6)
    pdf_refl = pdf_h * sel_r / jnp.maximum(4.0 * wo_dot_h, 1e-6)
    # transmission branch (Walter eq. 21 * |cos_i|, and eq. 17 jacobian)
    awih = jnp.abs(wi_dot_h)
    denom = jnp.square(eta_i * wo_dot_h - eta_t * awih)
    f_trans = (
        (1.0 - f) * d_ggx * g2 * (wo_dot_h * awih * eta_t * eta_t)
        / jnp.maximum(n_dot_wo * denom, 1e-10)
    )
    jac_t = (eta_t * eta_t * awih) / jnp.maximum(denom, 1e-12)
    pdf_trans = pdf_h * sel_t * jac_t

    trans_ok = ~reflecting & (wi_dot_h < 0.0) & ~tir
    valid = geom_ok & (reflecting | trans_ok)
    f_scalar = jnp.where(reflecting, f_refl, f_trans) * ms_boost
    f_out = jnp.where(valid, f_scalar, 0.0)[..., None] * params["specular"][..., None] * jnp.ones_like(wo)
    pdf = jnp.where(valid, jnp.where(reflecting, pdf_refl, pdf_trans), 0.0)
    return f_out, pdf


def _glass_sample(params, wo, n, geo_n, p):
    """Smooth dielectric (ref glass_sample.zig specularSample, thick path)."""
    same_side = vm.dot(wo, geo_n) > 0.0
    ns = jnp.where(same_side[..., None], n, -n)
    # entering: from the ray's medium into this material; exiting: into air
    # (single-level medium stack; nested-dielectric priorities come with the
    # full medium stack, ref prop/medium.zig)
    eta_i = jnp.where(same_side, params["ior_outside"], params["ior"])
    eta_t = jnp.where(same_side, params["ior"], 1.0)

    n_dot_wo = jnp.minimum(jnp.abs(vm.dot(ns, wo)), 1.0)
    eta = eta_i / jnp.maximum(eta_t, 1e-6)
    sint2 = (eta * eta) * (1.0 - n_dot_wo * n_dot_wo)
    tir = sint2 >= 1.0
    n_dot_t = jnp.sqrt(jnp.maximum(1.0 - sint2, 0.0))
    # dielectric fresnel (ref fresnel.zig dielectric)
    r_p = (eta_t * n_dot_wo - eta_i * n_dot_t) / jnp.maximum(eta_t * n_dot_wo + eta_i * n_dot_t, 1e-12)
    r_o = (eta_i * n_dot_wo - eta_t * n_dot_t) / jnp.maximum(eta_i * n_dot_wo + eta_t * n_dot_t, 1e-12)
    f = jnp.where(tir, 1.0, 0.5 * (r_p * r_p + r_o * r_o))

    wi_refl = vm.safe_normalize(2.0 * n_dot_wo[..., None] * ns - wo)
    wi_refr = vm.safe_normalize(
        (eta * n_dot_wo - n_dot_t)[..., None] * ns - eta[..., None] * wo
    )
    reflect_it = p <= f
    wi = jnp.where(reflect_it[..., None], wi_refl, wi_refr)
    s = params["specular"][..., None]
    weight = jnp.where(reflect_it[..., None], s * jnp.ones_like(wi), jnp.ones_like(wi))
    # index-matched: pass straight through
    matched = jnp.abs(eta_i - eta_t) < 1e-6
    wi = jnp.where(matched[..., None], -wo, wi)
    weight = jnp.where(matched[..., None], 1.0, weight)
    transmission = (~reflect_it) | matched
    return wi, weight, transmission, f


def sample_bsdf(
    params, wo, n, geo_n, s3, t=None, b=None, wavelength=None, glass_branch=None
) -> BsdfSample:
    """Sample the BSDF. s3: float[N,3] uniforms (lobe select + 2D).

    Scene-absent material kinds compile to nothing: glass sampling (two VNDF
    chains) and the volumetric null-interface path are gated on the static
    feature dict (loader mat_features) — measured ~10% of the Cornell bounce.

    glass_branch: None or int32[N] — BSDF path splitting (ref vertex.zig
    Pool / glass_sample.zig split): -1 = stochastic fresnel choice (normal),
    0 = force the reflection branch, 1 = force refraction. Forced lanes
    return the branch value WITHOUT the fresnel selection factor in weight
    or pdf; the integrator multiplies the child's split weight f / (1-f)."""
    feats = params["_features"]
    kind = params["kind"]
    p = s3[..., 0]
    xi = s3[..., 1:3]

    wi, weight, pdf, sub_ok, reg_a = _substitute_sample(params, wo, n, geo_n, p, xi, t, b)
    is_sub = kind == int(MaterialKind.SUBSTITUTE)
    valid = sub_ok & is_sub
    falses = jnp.zeros(valid.shape, bool)
    singular = falses
    transmission = falses
    passthrough = falses

    wl_out = (
        wavelength
        if wavelength is not None
        else jnp.zeros(wo.shape[:-1], jnp.float32)
    )
    fres_out = None
    if "glass" in feats:
        gparams = params
        spec_w = None
        if "dispersion" in feats:
            # hero-wavelength dispersion (ref glass_sample.zig:154-177):
            # pin the path's wavelength at the first dispersive interaction
            # and bend the IoR with the abbe number
            ab = params["abbe"]
            dispersive = (kind == int(MaterialKind.GLASS)) & (ab > 0.0)
            fresh = dispersive & (wl_out <= 0.0)
            # decorrelated uniform from the lobe/2D draws (the reference
            # draws a dedicated 1D; rescaling keeps it unbiased per lane)
            r_wl = jnp.mod(s3[..., 1] * 61.8034 + s3[..., 0] * 0.618034, 1.0)
            wl_new = jnp.where(
                fresh, WL_START + (WL_END - WL_START) * r_wl, wl_out
            )
            spec_w = jnp.where(
                fresh[..., None], spectrum_at_wavelength(wl_new) * 3.0, 1.0
            )
            ior_eff = jnp.where(
                dispersive & (wl_new > 0.0),
                dispersive_ior(params["ior"], ab, wl_new),
                params["ior"],
            )
            gparams = dict(params)
            gparams["ior"] = ior_eff
            wl_out = jnp.where(dispersive, wl_new, wl_out)
        if glass_branch is not None:
            # forcing rides the fresnel-comparison uniform: p=-1 always
            # reflects (p <= f, f > 0), p=2 always refracts (p > f)
            forced = glass_branch >= 0
            p_g = jnp.where(
                glass_branch == 0, -1.0, jnp.where(glass_branch == 1, 2.0, p)
            )
        else:
            forced = None
            p_g = p
        gl_wi, gl_w, gl_trans, gl_f = _glass_sample(gparams, wo, n, geo_n, p_g)
        gr_wi, gr_w, gr_pdf, gr_trans, gr_f = _glass_rough_sample(
            gparams, wo, n, geo_n, p_g, xi, forced=forced
        )
        if spec_w is not None:
            gl_w = gl_w * spec_w
            gr_w = gr_w * spec_w
        is_glass = kind == int(MaterialKind.GLASS)
        rough = params["alpha"] > MIN_ALPHA * 1.001
        gl_wi = jnp.where(rough[..., None], gr_wi, gl_wi)
        gl_w = jnp.where(rough[..., None], gr_w, gl_w)
        gl_pdf = jnp.where(rough, gr_pdf, 1.0)
        gl_trans = jnp.where(rough, gr_trans, gl_trans)
        gl_fres = jnp.where(rough, gr_f, gl_f)

        fres_out = gl_fres
        wi = jnp.where(is_glass[..., None], gl_wi, wi)
        weight = jnp.where(is_glass[..., None], gl_w, weight)
        pdf = jnp.where(is_glass, gl_pdf, pdf)
        valid = valid | is_glass
        singular = is_glass & ~rough  # rough glass participates in MIS
        transmission = is_glass & gl_trans
        # singular glass: reg_alpha 0; rough glass: its alpha
        reg_a = jnp.where(is_glass, jnp.where(rough, params["alpha"], 0.0), reg_a)

    if "hair" in feats and t is not None:
        is_hair = kind == int(MaterialKind.HAIR)
        h_wi, h_w, h_pdf, h_ok = hair_sample(params, wo, t, b, n, s3)
        wi = jnp.where(is_hair[..., None], h_wi, wi)
        weight = jnp.where(is_hair[..., None], h_w, weight)
        pdf = jnp.where(is_hair, h_pdf, pdf)
        valid = jnp.where(is_hair, h_ok, valid)
        # hair scatters through the fiber: mark transmission when wi
        # crosses to the far side so the offset goes the right way
        transmission = jnp.where(is_hair, vm.dot(h_wi, geo_n) < 0.0, transmission)
        reg_a = jnp.where(is_hair, 1.0, reg_a)

    if "volumetric" in feats:
        # volumetric materials are null interfaces: pass straight through,
        # the medium interior does the work (ref volumetric_material.zig)
        is_vol = kind == int(MaterialKind.VOLUMETRIC)
        wi = jnp.where(is_vol[..., None], -wo, wi)
        weight = jnp.where(is_vol[..., None], 1.0, weight)
        pdf = jnp.where(is_vol, 1.0, pdf)
        valid = valid | is_vol
        singular = singular | is_vol
        transmission = transmission | is_vol
        passthrough = is_vol

    return BsdfSample(
        wi=wi,
        weight=jnp.where(valid[..., None], weight, 0.0),
        pdf=jnp.where(valid, pdf, 0.0),
        valid=valid,
        singular=singular,
        transmission=transmission,
        passthrough=passthrough,
        reg_alpha=reg_a,
        wavelength=wl_out,
        fresnel=fres_out,
    )


def eval_bsdf(params, wo, wi, n, geo_n, t=None, b=None, glass_split=None):
    """Evaluate f(wo,wi)*|cos| and pdf for NEE/MIS.

    glass_split: None or bool[N] — lanes that will take BOTH fresnel
    branches at this vertex (BSDF path splitting); their MIS pdf drops the
    selection factor to stay consistent with the forced-branch sampler."""
    kind = params["kind"]
    f, pdf = _substitute_eval(params, wo, wi, n, geo_n, t, b)
    is_sub = kind == int(MaterialKind.SUBSTITUTE)
    f = jnp.where(is_sub[..., None], f, 0.0)
    pdf = jnp.where(is_sub, pdf, 0.0)
    if "rough_glass" in params["_features"]:
        gl = (kind == int(MaterialKind.GLASS)) & (params["alpha"] > MIN_ALPHA * 1.001)
        f_gl, pdf_gl = _glass_rough_eval(params, wo, wi, n, geo_n, split=glass_split)
        f = jnp.where(gl[..., None], f_gl, f)
        pdf = jnp.where(gl, pdf_gl, pdf)
    if "hair" in params["_features"] and t is not None:
        is_hair = kind == int(MaterialKind.HAIR)
        f_h, pdf_h = hair_eval(params, wo, wi, t, b, n)
        f = jnp.where(is_hair[..., None], f_h, f)
        pdf = jnp.where(is_hair, pdf_h, pdf)
    return f, pdf


def can_evaluate(params):
    """Delta-only materials (smooth glass) and emitters can't do NEE; rough
    dielectrics and hair can (ref glass_sample.zig:51, hair_sample.zig)."""
    ok = params["kind"] == int(MaterialKind.SUBSTITUTE)
    if "rough_glass" in params["_features"]:
        ok = ok | (
            (params["kind"] == int(MaterialKind.GLASS))
            & (params["alpha"] > MIN_ALPHA * 1.001)
        )
    if "hair" in params["_features"]:
        ok = ok | (params["kind"] == int(MaterialKind.HAIR))
    return ok


def medium_coefficients(materials: Materials, medium_mat, vol_depth=None):
    """(mu_t, mu_s, g) of the enclosing medium; zeros in air.

    ref collision_coefficients.zig: mu_t = -ln(clamp(attenuation color)) /
    attenuation_distance; the single-scatter albedo comes from the
    subsurface color via the van-de-Hulst-style inversion in scattering().

    vol_depth: int32[N] per-lane volume bounce count — applies the dense-
    SSS similarity relation (ref volumetric_material.zig
    similarityRelationScale / vanDeHulstAnisotropy): after SR_LOW volume
    bounces g lerps toward 0 by SR_HIGH, and mu_s scales by the van de
    Hulst factor (1-g)/(1-gs) so deep multiple scattering runs isotropic
    at equal transport — fewer, cheaper bounces inside dense media.
    """
    inside = medium_mat >= 0
    m = jnp.maximum(medium_mat, 0)
    att_color = jnp.clip(small_gather(materials.color, m), 0.01, 0.991102)
    att_dist = small_gather(materials.attenuation_distance, m)
    has = inside & (att_dist > 0.0)
    mu_t = -jnp.log(att_color) / jnp.maximum(att_dist, 1e-6)[..., None]
    mu_t = jnp.where(has[..., None], mu_t, 0.0)

    ssc = jnp.clip(small_gather(materials.subsurface_color, m), 0.0, 1.0)
    g = small_gather(materials.volumetric_anisotropy, m)
    root = jnp.sqrt(9.59217 + ssc * (41.6808 + ssc * 17.7126))
    factor = jnp.clip(4.097125 + 4.20863 * ssc - root, 0.0, 1.0)
    fsq = factor * factor
    pss = (1.0 - fsq) / jnp.maximum(1.0 - g[..., None] * fsq, 1e-6)
    mu_s = mu_t * pss
    # only volumetric media scatter; glass interiors absorb only
    is_volume = small_gather(materials.kind, m) == int(MaterialKind.VOLUMETRIC)
    mu_s = jnp.where((has & is_volume)[..., None], mu_s, 0.0)
    g = jnp.where(inside, g, 0.0)
    if vol_depth is not None:
        towards0 = jnp.clip(
            (vol_depth.astype(jnp.float32) - SR_LOW) / (SR_HIGH - SR_LOW), 0.0, 1.0
        )
        gs = g * (1.0 - towards0)
        scale = (1.0 - g) / jnp.maximum(1.0 - gs, 1e-6)
        mu_s = mu_s * scale[..., None]
        g = gs
    return mu_t, mu_s, g


# dense-SSS similarity relation bounds (ref volumetric_material.zig
# sr_low/sr_high defaults)
SR_LOW = 16.0
SR_HIGH = 48.0


def hg_phase(cos_theta, g):
    """Henyey-Greenstein phase value == pdf (perfect importance sampling).

    cos_theta is between the *forward* direction (-wo) and wi; g>0 peaks
    forward."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8
    )


def hg_sample(wo, g, xi):
    """Sample wi ~ HG around -wo (forward = ray direction). Returns wi."""
    # ref volumetric_sample.zig — note phase is about the incoming ray dir
    d = -wo
    gg = jnp.where(jnp.abs(g) < 1e-3, jnp.where(g < 0, -1e-3, 1e-3), g)
    sqr = (1.0 - g * g) / (1.0 + gg - 2.0 * gg * xi[..., 0])
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-3,
        1.0 - 2.0 * xi[..., 0],
        (1.0 + g * g - sqr * sqr) / (2.0 * gg),
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = (2.0 * jnp.pi) * xi[..., 1]
    t, b = vm.orthonormal_basis(d)
    return (
        sin_theta[..., None] * jnp.cos(phi)[..., None] * t
        + sin_theta[..., None] * jnp.sin(phi)[..., None] * b
        + cos_theta[..., None] * d
    )


def medium_absorption(materials: Materials, medium_mat, distance):
    """Beer-Lambert transmittance through the current medium over `distance`.

    mu_a derived as in ref collision_coefficients.zig attenuation():
    mu_t = -ln(color)/attenuation_distance (scattering-free glass interior).
    """
    inside = medium_mat >= 0
    m = jnp.maximum(medium_mat, 0)
    color = jnp.clip(small_gather(materials.color, m), 1e-4, 1.0)
    att_dist = small_gather(materials.attenuation_distance, m)
    has_att = att_dist > 0.0
    mu_t = -jnp.log(color) / jnp.maximum(att_dist, 1e-6)[..., None]
    d = jnp.minimum(distance, 1e12)
    tr = jnp.exp(-mu_t * d[..., None])
    return jnp.where((inside & has_att)[..., None], tr, 1.0)


def russian_roulette(throughput, r):
    """ref integrator/helper.zig russianRoulette: p = maxcomp/0.1."""
    mx = jnp.max(throughput, axis=-1)
    p = mx / 0.1
    kill = (p < 1.0) & (r >= p)
    scale = jnp.where(p < 1.0, 1.0 / jnp.maximum(p, 1e-12), 1.0)
    throughput = throughput * jnp.where(kill, 0.0, scale)[..., None]
    return throughput, kill


# ---------------------------------------------------------------------------
# Hair BSDF — Chiang et al. 2016 "A Practical and Controllable Hair and Fur
# Model for Production Path Tracing" (ref material/hair/hair_sample.zig).
# Fully vectorized: fixed p = 0..3 ports (R, TT, TRT, residual), logistic
# azimuthal lobes, von-Mises-like longitudinal lobes.
# The local frame is (t, b, n) with the TANGENT on x (hair axis).
# ---------------------------------------------------------------------------

_HAIR_MAX_P = 3


def _hair_i0(x):
    """Modified Bessel I0, 10-term series (ref hair_sample.zig I0)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    ifour = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (ifour * ifact * ifact)
        x2i = x2i * x * x
        ifour *= 4.0
    return val


def _hair_log_i0(x):
    return jnp.where(
        x > 12.0,
        x + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / jnp.maximum(x, 1e-9)) + 1.0 / (8.0 * jnp.maximum(x, 1e-9))),
        jnp.log(jnp.maximum(_hair_i0(x), 1e-30)),
    )


def _hair_mp(cos_i, cos_o, sin_i, sin_o, v):
    """Longitudinal scattering lobe (ref mp)."""
    v = jnp.maximum(v, 1e-5)
    a = cos_i * cos_o / v
    b = sin_i * sin_o / v
    small = v <= 0.1
    lo = jnp.exp(_hair_log_i0(a) - b - 1.0 / v + 0.6931 + jnp.log(1.0 / (2.0 * v)))
    hi = jnp.exp(-b) * _hair_i0(a) / (jnp.sinh(1.0 / v) * 2.0 * v)
    return jnp.where(small, lo, hi)


def _hair_logistic(x, s):
    ax = jnp.abs(x)
    e = jnp.exp(-ax / s)
    return e / (s * (1.0 + e) ** 2)


def _hair_logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _hair_trimmed_logistic(x, s, a, b):
    return _hair_logistic(x, s) / (_hair_logistic_cdf(b, s) - _hair_logistic_cdf(a, s))


def _hair_sample_trimmed_logistic(u, s, a, b):
    ka = _hair_logistic_cdf(a, s)
    kb = _hair_logistic_cdf(b, s)
    lu = ka + u * (kb - ka)
    x = -s * jnp.log(1.0 / jnp.clip(lu, 1e-6, 1.0 - 1e-6) - 1.0)
    return jnp.clip(x, a, b)


def _hair_fresnel(cos_theta, eta):
    """Dielectric Fresnel with orientation flip (ref hair fresnel)."""
    flip = cos_theta < 0.0
    eta_e = jnp.where(flip, 1.0 / eta, eta)
    ci = jnp.abs(cos_theta)
    s2i = 1.0 - ci * ci
    s2t = s2i / (eta_e * eta_e)
    tir = s2t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - s2t, 0.0))
    r_par = (eta_e * ci - ct) / jnp.maximum(eta_e * ci + ct, 1e-9)
    r_per = (ci - eta_e * ct) / jnp.maximum(ci + eta_e * ct, 1e-9)
    return jnp.where(tir, 1.0, 0.5 * (r_par * r_par + r_per * r_per))


def _hair_phi_fn(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * jnp.pi


def _hair_np(phi, p, s, gamma_o, gamma_t):
    dphi = phi - _hair_phi_fn(p, gamma_o, gamma_t)
    # wrap to [-pi, pi] (bounded phi values: mod instead of the ref's loop)
    dphi = jnp.mod(dphi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return _hair_trimmed_logistic(dphi, s, -jnp.pi, jnp.pi)


def _hair_setup(params, wo, t, b, n):
    """Per-lane hair state (ref hair_sample.zig Sample.init)."""
    hc = params["hair"]  # [N,6] mu_a(3), v0, s, alpha
    mu_a = hc[..., 0:3]
    v0 = hc[..., 3]
    s = jnp.maximum(hc[..., 4], 1e-4)
    alpha = hc[..., 5]
    eta = params["ior"]

    wo_x = vm.dot(wo, t)
    wo_y = vm.dot(wo, b)
    wo_z = vm.dot(wo, n)
    sin_theta_o = jnp.clip(wo_x, -1.0, 1.0)
    cos_theta_o = jnp.sqrt(jnp.maximum(1.0 - sin_theta_o**2, 1e-9))
    phi_o = jnp.arctan2(wo_z, wo_y)

    h = jnp.clip(params.get("hair_h", jnp.zeros_like(eta)), -1.0, 1.0)
    etap = jnp.sqrt(jnp.maximum(eta * eta - sin_theta_o**2, 1e-9)) / cos_theta_o
    sin_gamma_t = jnp.clip(h / etap, -1.0, 1.0)
    cos_gamma_t = jnp.sqrt(jnp.maximum(1.0 - sin_gamma_t**2, 0.0))
    gamma_t = jnp.arcsin(sin_gamma_t)
    gamma_o = jnp.arcsin(h)

    sin_theta_t = sin_theta_o / eta
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t**2, 1e-9))
    tr = jnp.exp(-mu_a * (2.0 * cos_gamma_t / cos_theta_t)[..., None])

    # attenuation ports ap[p] (ref apFunc)
    cos_gamma_o = jnp.sqrt(jnp.maximum(1.0 - h * h, 0.0))
    f = _hair_fresnel(cos_theta_o * cos_gamma_o, eta)
    refl = [jnp.broadcast_to(f[..., None], tr.shape)]
    refl.append(((1.0 - f) ** 2)[..., None] * tr)
    ftr = f[..., None] * tr
    for p in range(2, _HAIR_MAX_P):
        refl.append(refl[p - 1] * ftr)
    refl.append(refl[_HAIR_MAX_P - 1] * ftr / jnp.maximum(1.0 - ftr, 1.0 - 0.999))
    asum = sum(jnp.mean(r, axis=-1) for r in refl)
    pdfs = [jnp.mean(r, axis=-1) / jnp.maximum(asum, 1e-20) for r in refl]

    # angle-doubling series for the scale tilt (ref commit())
    s0, c0 = jnp.sin(alpha), jnp.cos(alpha)
    s1, c1 = 2.0 * c0 * s0, c0 * c0 - s0 * s0
    s2, c2 = 2.0 * c1 * s1, c1 * c1 - s1 * s1

    return {
        "mu_a": mu_a, "eta": eta, "h": h,
        "v": (v0, 0.25 * v0, 4.0 * v0),
        "s": s,
        "sin_theta_o": sin_theta_o, "cos_theta_o": cos_theta_o,
        "phi_o": phi_o, "gamma_o": gamma_o, "gamma_t": gamma_t,
        "sin2k": (s0, s1, s2), "cos2k": (c0, c1, c2),
        "ap_refl": refl, "ap_pdf": pdfs,
    }


def _hair_thetap_o(st, p):
    """Tilted outgoing angles per port (ref eval's per-p rotation)."""
    sin_o, cos_o = st["sin_theta_o"], st["cos_theta_o"]
    s2k, c2k = st["sin2k"], st["cos2k"]
    if p == 0:
        sp = sin_o * c2k[1] - cos_o * s2k[1]
        cp = cos_o * c2k[1] + sin_o * s2k[1]
    elif p == 1:
        sp = sin_o * c2k[0] + cos_o * s2k[0]
        cp = cos_o * c2k[0] - sin_o * s2k[0]
    elif p == 2:
        sp = sin_o * c2k[2] + cos_o * s2k[2]
        cp = cos_o * c2k[2] - sin_o * s2k[2]
    else:
        sp, cp = sin_o, cos_o
    return sp, jnp.abs(cp)


def _hair_eval_angles(st, cos_theta_i, sin_theta_i, phi):
    fsum = jnp.zeros(st["ap_refl"][0].shape, jnp.float32)
    pdf_sum = jnp.zeros(cos_theta_i.shape, jnp.float32)
    v = st["v"]
    for p in range(_HAIR_MAX_P):
        sp, cp = _hair_thetap_o(st, p)
        tmp = _hair_mp(cos_theta_i, cp, sin_theta_i, sp, v[min(p, 2)])
        tnp_ = _hair_np(phi, float(p), st["s"], st["gamma_o"], st["gamma_t"])
        mnp = tmp * tnp_
        fsum = fsum + mnp[..., None] * st["ap_refl"][p]
        pdf_sum = pdf_sum + mnp * st["ap_pdf"][p]
    # residual port: isotropic azimuth
    tmp = _hair_mp(cos_theta_i, st["cos_theta_o"], sin_theta_i, st["sin_theta_o"], v[2])
    fsum = fsum + (tmp / (2.0 * jnp.pi))[..., None] * st["ap_refl"][_HAIR_MAX_P]
    pdf_sum = pdf_sum + tmp * st["ap_pdf"][_HAIR_MAX_P] / (2.0 * jnp.pi)
    return fsum, pdf_sum


def hair_eval(params, wo, wi, t, b, n):
    """f (radiance response, no extra cos — hair convention) and pdf."""
    st = _hair_setup(params, wo, t, b, n)
    sin_theta_i = jnp.clip(vm.dot(wi, t), -1.0, 1.0)
    cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i**2, 1e-9))
    phi_i = jnp.arctan2(vm.dot(wi, n), vm.dot(wi, b))
    phi = phi_i - st["phi_o"]
    return _hair_eval_angles(st, cos_theta_i, sin_theta_i, phi)


def hair_sample(params, wo, t, b, n, s3):
    """Sample the hair BSDF (ref Sample.sample). s3: 3 uniforms — the first
    selects the port and is RESCALED for the longitudinal sample (the
    reference draws a 4th number; rescaling keeps it unbiased)."""
    st = _hair_setup(params, wo, t, b, n)
    r = s3[..., 0]
    u1 = s3[..., 1]
    u2 = s3[..., 2]

    # port selection by ap pdf CDF + conditional rescale of r
    pdfs = st["ap_pdf"]
    cdf0 = jnp.zeros_like(r)
    p_sel = jnp.full(r.shape, _HAIR_MAX_P, jnp.int32)
    u0 = jnp.zeros_like(r)
    acc = jnp.zeros_like(r)
    chosen = jnp.zeros(r.shape, bool)
    for p in range(_HAIR_MAX_P + 1):
        pd = pdfs[p]
        take = (~chosen) & (acc + pd >= r)
        p_sel = jnp.where(take, p, p_sel)
        u0 = jnp.where(take, jnp.clip((r - acc) / jnp.maximum(pd, 1e-9), 0.0, 1.0), u0)
        chosen = chosen | take
        acc = acc + pd
    u0 = jnp.where(chosen, u0, u1)  # degenerate: fall back

    # tilted angles for the chosen port
    sps, cps = [], []
    for p in range(_HAIR_MAX_P + 1):
        sp, cp = _hair_thetap_o(st, p)
        sps.append(sp)
        cps.append(cp)
    sp = jnp.select([p_sel == k for k in range(_HAIR_MAX_P + 1)], sps)
    cp = jnp.select([p_sel == k for k in range(_HAIR_MAX_P + 1)], cps)
    vs = st["v"]
    vp = jnp.select(
        [p_sel == k for k in range(_HAIR_MAX_P + 1)],
        [vs[0], vs[1], vs[2], vs[2]],
    )

    # longitudinal (ref: cos_theta sampled from the lobe)
    cos_t = 1.0 + vp * jnp.log(
        jnp.maximum(u0, 1e-5) + (1.0 - u0) * jnp.exp(-2.0 / jnp.maximum(vp, 1e-5))
    )
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cos_phi_l = jnp.cos(2.0 * jnp.pi * u1)
    sin_theta_i = jnp.clip(-cos_t * sp + sin_t * cos_phi_l * cp, -1.0, 1.0)
    cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i**2, 1e-9))

    # azimuthal
    dphi_logistic = _hair_sample_trimmed_logistic(u2, st["s"], -jnp.pi, jnp.pi)
    phi_p = _hair_phi_fn(p_sel.astype(jnp.float32), st["gamma_o"], st["gamma_t"])
    phi = jnp.where(
        p_sel < _HAIR_MAX_P, phi_p + dphi_logistic, 2.0 * jnp.pi * u2
    )

    phi_i = st["phi_o"] + phi
    wi = (
        sin_theta_i[..., None] * t
        + (cos_theta_i * jnp.cos(phi_i))[..., None] * b
        + (cos_theta_i * jnp.sin(phi_i))[..., None] * n
    )
    wi = vm.safe_normalize(wi)

    f, pdf = _hair_eval_angles(st, cos_theta_i, sin_theta_i, phi)
    ok = pdf > 1e-9
    weight = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-9)[..., None], 0.0)
    return wi, weight, pdf, ok


# ---------------------------------------------------------------------------
# Spectral dispersion (ref glass_sample.zig:154-177 + material_base.zig
# spectrumAtWavelength): hero-wavelength tracking through dispersive glass.
# A 32-band rainbow table (CIE response -> linear sRGB, normalized so a
# uniform wavelength expectation is white) is generated at import — the
# reference bakes the same kind of table offline (rainbow_integrate.zig).
# ---------------------------------------------------------------------------

WL_START = 380.0
WL_END = 720.0


def _build_rainbow(bands: int = 32) -> np.ndarray:
    from ..core.cie import CIE_WAVELENGTHS, CIE_X, CIE_Y, CIE_Z
    from ..core.spectrum import _XYZ_TO_SRGB

    wls = np.linspace(WL_START, WL_END, bands + 1)
    out = np.zeros((bands, 3), np.float64)
    for i in range(bands):
        sel = (CIE_WAVELENGTHS >= wls[i]) & (CIE_WAVELENGTHS < wls[i + 1])
        xyz = np.stack([CIE_X[sel].mean(), CIE_Y[sel].mean(), CIE_Z[sel].mean()])
        rgb = _XYZ_TO_SRGB @ xyz
        out[i] = np.clip(rgb, 0.0, None)
    # normalize: mean over bands == (1/3, 1/3, 1/3) so weight*3 keeps a
    # white path white in expectation (ref rainbow hack-normalize)
    out *= 1.0 / (3.0 * out.mean(axis=0, keepdims=True) * 3.0)
    return np.clip(out * 3.0, 0.0, None).astype(np.float32)


_RAINBOW = _build_rainbow()


def spectrum_at_wavelength(wl):
    """Linear-sRGB response of wavelength wl [nm] (bilinear over bands)."""
    table = jnp.asarray(_RAINBOW)
    nb = _RAINBOW.shape[0]
    u = (wl - WL_START) / (WL_END - WL_START) * nb
    i0 = jnp.clip(u.astype(jnp.int32), 0, nb - 1)
    i1 = jnp.clip(i0 + 1, 0, nb - 1)
    f = jnp.clip(u - i0.astype(jnp.float32), 0.0, 1.0)
    return table[i0] * (1.0 - f)[..., None] + table[i1] * f[..., None]


def dispersive_ior(ior, abbe, wl):
    """Cauchy-style ior shift (ref glass_sample.zig:192):
    ior + ((ior-1)/abbe) * (523655/wl^2 - 1.5168)."""
    return ior + ((ior - 1.0) / jnp.maximum(abbe, 1e-3)) * (
        523655.0 / jnp.maximum(wl * wl, 1.0) - 1.5168
    )
