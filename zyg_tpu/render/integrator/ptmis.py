"""Wavefront PTMIS: NEE + BSDF sampling combined by the power heuristic.

ref: src/core/rendering/integrator/surface/pathtracer_mis.zig. The recursive
vertex-pool loop becomes a masked ``lax.while_loop`` over the ray batch. Path
splitting (<=4 BSDF samples/bounce) is deferred: a single weighted sample
keeps the estimator unbiased (variance differs, not bias).

Radiance is tracked as the reference's IValue triple {emission, direct,
indirect} (ref integrator/helper.zig IValue.add): camera-visible emission,
low-depth/singular light, and the rest — so the sensor can clamp each class
separately.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import vecmath as vm
from ...core.rng import hash_u32, hash2_u32, u32_to_float
from ...core.sobol import SobolSampler, SobolArrays
from ...scene import shapes, light_sampling as ls_mod
from ...scene.types import SceneData, RAY_MAX_T
from .. import materials as mat
from . import volume as vol_mod
from ...core.gather import compact_indices, small_gather


class PtmisSettings(NamedTuple):
    max_depth: int = 16
    max_depth_volume: int = 256  # null-interface crossings + volume scatters
    caustics: bool = True
    # pixel-cone angular width (2*tan(fov/2)/width, driver-set): the
    # footprint proxy for the reference's screen-space ray differentials
    # (context.zig:139) — drives analytic-procedural filtering. 0 = off.
    pixel_spread: float = 0.0
    nee_only: bool = False  # PTDL mode: no MIS weight on BSDF light hits
    # photon gathering at every primary diffuse vertex instead of only after
    # specular chains (ref View.photons_not_only_through_specular)
    photons_not_only_through_specular: bool = False
    # NEE splitting (ref light_tree.zig randomLight with split_threshold,
    # take.zig light_sampling): STATIC pick budget 2^light_split_depth
    # finite picks (+1 infinite) per bounce; 0 = single pick. The driver
    # enables this only for many-light scenes — every lane pays the full
    # static width.
    light_split_depth: int = 0
    light_split_threshold: float = 0.0
    # path-space regularization (ref take.zig regularize_roughness,
    # renderstate.zig regularizeAlpha): widen glossy/specular lobes after
    # rough bounces to tame caustic variance. 0 = off (compiled away).
    regularize_roughness: float = 0.0
    # STATIC tuple of sensor AOV class names to collect at the primary hit
    # (ref sensor/aov/aov_value.zig Value.Class; () compiles to nothing):
    # subset of ("albedo","depth","material_id","geometric_normal",
    # "shading_normal","roughness","alpha")
    collect_aovs: tuple = ()
    # BSDF path splitting (ref vertex.zig Pool NumVertices=4 +
    # glass_sample.zig split): a qualifying glass vertex traces BOTH
    # fresnel branches (weights f / 1-f) instead of a stochastic pick.
    # TPU redesign: the wavefront serializes the binary tree per lane —
    # the untaken branch parks in a one-deep resume slot and the lane
    # continues it when the current path dies, before regenerating the
    # next sample (DFS with stack depth 1; splits re-arm after a resume,
    # so total leaves stay linear in depth). Compiled away when the scene
    # has no glass or the flag is off.
    bsdf_split: bool = False


# ref helper.zig LightSampling.splitThreshold: full threshold for the first
# 4 path vertices, effectively none below
_SPLIT_LOW_THRESHOLD = 1e-8


# sensor AOV classes captured at the primary hit (ref aov_value.zig Class):
# name -> (channels, accumulation mode). "sum" resolves to mean over
# samples, "min"/"max" keep extrema (depth / ids must not be averaged).
AOV_SPECS = {
    "albedo": (3, "sum"),
    "depth": (1, "min"),
    "material_id": (1, "max"),
    "geometric_normal": (3, "sum"),
    "shading_normal": (3, "sum"),
    "roughness": (1, "sum"),
    "alpha": (1, "sum"),  # coverage for the Transparent sensor buffer
    # IValue radiance classes, accumulated at sample flush (ref IValue)
    "emission": (3, "sum"),
    "direct": (3, "sum"),
    "indirect": (3, "sum"),
}


def aov_init(names, n):
    """Fresh accumulator dict for the enabled AOV classes."""
    out = {}
    for name in names:
        c, mode = AOV_SPECS[name]
        fill = {"sum": 0.0, "min": float(RAY_MAX_T), "max": -1.0}[mode]
        out[name] = jnp.full((n, c), fill, jnp.float32)
    return out


class IValue(NamedTuple):
    emission: jax.Array  # [N,3]
    direct: jax.Array  # [N,3]
    indirect: jax.Array  # [N,3]

    @staticmethod
    def zeros(n):
        z = jnp.zeros((n, 3), jnp.float32)
        return IValue(z, z, z)

    def add(self, value, depth, direct_cutoff: int, is_emission, singular):
        """ref helper.zig IValue.add semantics, vectorized."""
        to_direct = singular | (depth < direct_cutoff)
        em = jnp.where(is_emission[..., None], value, 0.0)
        di = jnp.where((~is_emission & to_direct)[..., None], value, 0.0)
        ind = jnp.where((~is_emission & ~to_direct)[..., None], value, 0.0)
        return IValue(self.emission + em, self.direct + di, self.indirect + ind)


class PathState(NamedTuple):
    o: jax.Array
    d: jax.Array
    throughput: jax.Array
    result: IValue
    alive: jax.Array
    bxdf_pdf: jax.Array  # [N] pdf of the previous BSDF sample
    singular: jax.Array  # bool[N] previous bounce was a delta event
    medium: jax.Array  # int32[N, K] nested-dielectric medium stack of
    # enclosing PROP ids (-1 = empty; ref prop/medium.zig Stack)
    depth: jax.Array  # int32[N] per-lane SURFACE bounce depth
    vol_depth: jax.Array  # int32[N] volume events: scatters + null-interface
    # crossings (ref probe.zig Depth{surface,volume} — grazing rays can cross
    # a volume boundary many times without consuming surface budget)
    rays: jax.Array  # int32 scalar
    sobol: SobolArrays
    vol_key: jax.Array  # uint32[N] evolving key for volume-tracking RNG
    # MIS state of the last REAL vertex (null interfaces continue the same
    # line, so o/pdf must persist across them; ref vertex.zig State)
    mis_o: jax.Array  # [N,3] origin of the last real scatter vertex
    mis_n: jax.Array  # [N,3] shading normal at the last real vertex
    from_volume: jax.Array  # bool[N] last real vertex was a volume scatter
    primary_chain: jax.Array  # bool[N] every bounce so far was singular
    # (ref vertex.state primary_ray — photon gathers happen on this chain)
    time: jax.Array  # float32[N] shutter time in [0,1) (ref probe.zig time)
    nee_thr: jax.Array  # float32[N] split threshold used at the last real
    # vertex's NEE (ref vertex.zig light_split_threshold) — the MIS-side
    # selection pdf must be computed under the same splitting policy
    reg_alpha: jax.Array  # float32[N] alpha of the previously sampled lobe
    # (ref vertex.zig reg_alpha / bxdf.zig Path.reg_alpha): diffuse = 1,
    # glossy = alpha, specular = 0; drives path-space regularization
    aov: dict  # STATIC-keyed dict of sensor AOV accumulators [N,C]
    # (ref sensor/aov/aov_buffer.zig); {} when collect_aovs is empty
    wavelength: jax.Array  # float32[N] hero wavelength (nm; 0 = unpinned,
    # ref probe.zig wavelength — set at the first dispersive glass hit)
    pid: jax.Array  # uint32[N] LOCAL pixel index of the lane's current
    # sample — the persistent wavefront shuffles lane->pixel per sample
    # (work balancing, see integrate_persistent), so accumulators scatter
    # by pid instead of lane
    split: dict  # STATIC-keyed BSDF-split resume slot ({} = feature off,
    # compiles to nothing): the untaken fresnel branch's full restart
    # state (see _split_init) + "pending" bool[N]
    sub_uv: jax.Array = None  # float32[N,2] subpixel offset of the lane's
    # CURRENT sample — carried only on the filtered UNSHUFFLED persistent
    # path (AOVs + reconstruction filter), None (compiles away) otherwise;
    # the shuffled path recomputes it from the Sobol law post-loop


def _split_init(n: int) -> dict:
    """Fresh (empty) one-deep BSDF-split resume slot (ref vertex.zig Pool:
    the serialized stand-in for the 4-vertex pool)."""
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return {
        "pending": jnp.zeros((n,), bool),
        # the lane's CURRENT split weight (ref vertex.zig split_weight):
        # multiplies contributions but NOT throughput, so russian roulette
        # never sees it (folding it into throughput RR-kills the small
        # fresnel branch and re-boosts it 1/q — measured 5-12x RMSE blowup
        # on a glass furnace)
        "w": jnp.ones((n,), jnp.float32),
        # parked branch's split weight at resume
        "w1": jnp.ones((n,), jnp.float32),
        "o": z3,
        "d": jnp.concatenate(
            [jnp.zeros((n, 2), jnp.float32), jnp.ones((n, 1), jnp.float32)], -1
        ),
        "thr": z3,
        "pdf": z1,
        "singular": jnp.zeros((n,), bool),
        "medium": vol_mod.stack_empty(n),
        "depth": jnp.zeros((n,), jnp.int32),
        "vol_depth": jnp.zeros((n,), jnp.int32),
        "mis_n": jnp.concatenate(
            [jnp.zeros((n, 2), jnp.float32), jnp.ones((n, 1), jnp.float32)], -1
        ),
        "primary": jnp.zeros((n,), bool),
        "nee_thr": z1,
        "reg_alpha": z1,
        "wavelength": z1,
        "vol_key": jnp.zeros((n,), jnp.uint32),
        "run_seed": jnp.zeros((n,), jnp.uint32),
    }


def _split_enabled(scene: SceneData, settings: PtmisSettings) -> bool:
    """Static: BSDF splitting compiles in only for scenes with glass."""
    return bool(settings.bsdf_split) and (
        scene.mat_features is None or "glass" in scene.mat_features
    )


def split_pending(s: PathState):
    """bool[N]: lanes holding an untraced BSDF-split branch."""
    if not s.split:
        return jnp.zeros_like(s.alive)
    return s.split["pending"]


def resume_split(s: PathState) -> PathState:
    """Revive dead lanes whose resume slot holds the untaken fresnel
    branch: restore the branch's restart state, keep the sample's result /
    aov / pid / time (the branch belongs to the SAME sample; its
    contributions accumulate into the same IValue before the flush)."""
    sp = s.split
    if not sp:
        return s
    res = (~s.alive) & sp["pending"]
    rm = res[..., None]
    a = s.sobol
    # branch sampler stream: same sample/start_seed, forked run_seed (the
    # dim counter re-enters at 5, so the next draw rebuilds the buffer)
    sob = SobolArrays(
        a.sample, a.start_seed, jnp.where(res, sp["run_seed"], a.run_seed), a.buffer
    )
    return s._replace(
        o=jnp.where(rm, sp["o"], s.o),
        d=jnp.where(rm, sp["d"], s.d),
        throughput=jnp.where(rm, sp["thr"], s.throughput),
        alive=s.alive | res,
        bxdf_pdf=jnp.where(res, sp["pdf"], s.bxdf_pdf),
        singular=jnp.where(res, sp["singular"], s.singular),
        medium=jnp.where(rm, sp["medium"], s.medium),
        depth=jnp.where(res, sp["depth"], s.depth),
        vol_depth=jnp.where(res, sp["vol_depth"], s.vol_depth),
        sobol=sob,
        vol_key=jnp.where(res, sp["vol_key"], s.vol_key),
        mis_o=jnp.where(rm, sp["o"], s.mis_o),
        mis_n=jnp.where(rm, sp["mis_n"], s.mis_n),
        from_volume=jnp.where(res, False, s.from_volume),
        primary_chain=jnp.where(res, sp["primary"], s.primary_chain),
        nee_thr=jnp.where(res, sp["nee_thr"], s.nee_thr),
        reg_alpha=jnp.where(res, sp["reg_alpha"], s.reg_alpha),
        wavelength=jnp.where(res, sp["wavelength"], s.wavelength),
        split={
            **sp,
            "pending": sp["pending"] & ~res,
            "w": jnp.where(res, sp["w1"], sp["w"]),
        },
    )


def _cp_offset(k: int):
    """R2 low-discrepancy offsets for Cranley-Patterson rotation of the
    shared NEE 2D sample across split picks."""
    a1, a2 = 0.7548776662466927, 0.5698402909980532
    return ((k * a1) % 1.0, (k * a2) % 1.0)


def power_heuristic(f_pdf, g_pdf):
    f2 = f_pdf * f_pdf
    return f2 / jnp.maximum(g_pdf * g_pdf + f2, 1e-20)


def predivided_power_heuristic(f_pdf, g_pdf):
    f2 = f_pdf * f_pdf
    return f_pdf / jnp.maximum(g_pdf * g_pdf + f2, 1e-20)


def integrate(scene: SceneData, o, d, sobol: SobolSampler, settings: PtmisSettings, photon_map=None, photon_max_per_cell=64, time=None):
    """Returns (IValue, sobol, num_rays)."""
    n = o.shape[0]
    state = PathState(
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        result=IValue.zeros(n),
        alive=jnp.ones((n,), bool),
        bxdf_pdf=jnp.zeros((n,), jnp.float32),
        singular=jnp.ones((n,), bool),  # camera rays count as singular
        medium=vol_mod.stack_empty(n),
        depth=jnp.zeros((n,), jnp.int32),
        vol_depth=jnp.zeros((n,), jnp.int32),
        rays=jnp.int32(0),
        sobol=sobol.arrays,
        vol_key=hash_u32(jnp.arange(n, dtype=jnp.uint32) ^ jnp.uint32(0x2545F491)),
        mis_o=o,
        mis_n=d,
        from_volume=jnp.zeros((n,), bool),
        primary_chain=jnp.ones((n,), bool),
        time=jnp.zeros((n,), jnp.float32) if time is None else time,
        nee_thr=jnp.zeros((n,), jnp.float32),
        reg_alpha=jnp.zeros((n,), jnp.float32),
        aov=aov_init(settings.collect_aovs, n),
        wavelength=jnp.zeros((n,), jnp.float32),
        pid=jnp.arange(n, dtype=jnp.uint32),
        split=_split_init(n) if _split_enabled(scene, settings) else {},
    )

    def cond(s: PathState):
        # parked split branches are pending work even when every lane died
        return jnp.any(s.alive | split_pending(s))

    body = _make_body(scene, settings, photon_map, photon_max_per_cell)

    def body2(s: PathState):
        # dead lanes holding a split branch resume it before the bounce
        return body(resume_split(s))

    final = jax.lax.while_loop(cond, body2, state)
    return final.result, SobolSampler(final.sobol, dim=5), final.rays


def _make_body(scene: SceneData, settings: PtmisSettings, photon_map=None, photon_max_per_cell=64):
    """One masked wavefront bounce over per-lane path state."""
    # Cornell-class analytic scenes run the whole bounce as ONE Pallas
    # kernel (ops/shade.py) — the general body below stays the semantic
    # reference for everything else (and for the CPU test suite)
    from ...ops import shade as shade_ops

    fused = shade_ops.make_fused_body(scene, settings, photon_map)
    if fused is not None:
        return fused
    # mesh scenes with plain substitute/light materials + rect lights run
    # the HYBRID bounce: XLA traversals around a Pallas shade kernel
    fused_mesh = shade_ops.make_mesh_fused_body(scene, settings, photon_map)
    if fused_mesh is not None:
        return fused_mesh
    # textured/env/many-light scenes run the GENERAL hybrid: XLA
    # traversal + gather stages (textures, light sampling/pdfs) around
    # the v2 Pallas shade core
    fused_v2 = shade_ops.make_mesh_fused_body_v2(scene, settings, photon_map)
    if fused_v2 is not None:
        return fused_v2
    has_lights = scene.lights.count > 0
    # static: scenes without glass/volumetric materials compile the whole
    # medium-transport path away (measured ~8% of the Cornell bounce)
    has_media = scene.mat_features is None or "media" in scene.mat_features
    split_on = _split_enabled(scene, settings)

    def body(s: PathState):
        smp = SobolSampler(s.sobol, dim=5)
        rays = s.rays + jnp.sum(s.alive, dtype=jnp.int32)
        # BSDF-split weight: contributions scale by it, throughput does NOT
        # (ref pathtracer_mis.zig:59 split_throughput = throughput * split_weight)
        sw = s.split["w"][..., None] if split_on else jnp.float32(1.0)

        primary = s.depth == 0
        # dead lanes get tmax=0: their stale rays fall out of the BVH
        # cascades immediately instead of re-tracing every iteration (the
        # persistent drain phase was paying full-width mesh traversals
        # for a handful of live lanes)
        ray_tmax = jnp.where(s.alive, jnp.float32(RAY_MAX_T), 0.0)
        hit = shapes.intersect_scene(
            scene, s.o, s.d, jnp.float32(0.0), ray_tmax,
            "reflection", primary=primary, time=s.time,
        )
        has_tex = scene.textures is not None
        has_hair = scene.mat_features is None or "hair" in (scene.mat_features or {})
        frag = shapes.build_fragment(
            scene, hit, s.o, s.d, need_tangents=has_tex or has_hair, time=s.time
        )
        tex_xi = None
        uv_alt = None
        if has_tex:
            # stochastic texture filtering (ref texture.zig:18
            # LinearStochastic is the reference default): jitter from the
            # counter RNG, NOT the Sobol stream (keeps QMC dims intact)
            kx = hash2_u32(s.vol_key ^ jnp.uint32(0xA511E9B3), s.depth.astype(jnp.uint32))
            ky = hash_u32(kx ^ jnp.uint32(0x85EBCA6B))
            tex_xi = jnp.stack([u32_to_float(kx), u32_to_float(ky)], -1)
            if scene.mat_features is not None and "triplanar" in scene.mat_features:
                # alternate coordinate set for Triplanar/ObjectPos
                # textures (ref renderstate.zig triplanarSt)
                uv_alt = mat.triplanar_uv(scene, frag)
            frag = frag._replace(
                n=mat.apply_normal_map(
                    scene.materials, scene.textures, frag.material, frag.uv,
                    frag.n, frag.t, frag.b, tex_xi=tex_xi, uv_alt=uv_alt,
                )
            )
        if has_media:
            # effective enclosing medium = highest-priority stack entry;
            # fresnel sees the surrounding medium EXCLUDING the hit prop
            # (ref medium.zig topIor + vertex.zig interfaceChange)
            eff_prop, _eff_ior = vol_mod.stack_effective(scene, s.medium)
            med_mat = vol_mod.medium_material(scene, eff_prop)
            medium_ior, max_prio_excl, _in_stack = vol_mod.stack_info_at_hit(
                scene, s.medium, jnp.maximum(hit.prop, 0)
            )
        else:
            eff_prop = None
            med_mat = None
            medium_ior = None
        # analytic-procedural footprint: pixel cone width at the hit (exact
        # for primary rays; later segments reuse the per-segment distance —
        # a cone proxy for the ref's screenspaceDifferentials)
        foot = None
        if (
            settings.pixel_spread > 0.0
            and scene.textures is not None
            and scene.textures.procedurals
        ):
            foot = (
                settings.pixel_spread
                * jnp.minimum(hit.t, 1e8)
                * shapes.uv_density(scene, hit, time=s.time)
            )
        params = mat.gather(
            scene.materials, frag.material, medium_ior, scene.textures, frag.uv,
            features=scene.mat_features, tex_xi=tex_xi, uv_alt=uv_alt,
            footprint=foot,
        )
        if settings.regularize_roughness > 0.0:
            # path-space regularization: widen lobes after rough bounces
            # (ref renderstate.zig regularizeAlpha; static no-op when the
            # take leaves regularize_roughness at 0)
            params = mat.regularize_alpha(
                params, s.reg_alpha, settings.regularize_roughness, settings.caustics
            )
        wo = -s.d

        # ---- metallic flakes (ref substitute_material.zig sample():
        # jittered-grid flake field; compiled away without coverage)
        if scene.mat_features is not None and "flakes" in scene.mat_features:
            params, n_fl = mat.apply_flakes(scene, params, frag, wo)
            frag = frag._replace(n=n_fl)

        # ---- stochastic opacity cutouts (ref material_base.zig
        # stochasticOpacity + triangle_tree.zig intersectOpacity): a hit on
        # a masked material survives with probability o(uv); rejected hits
        # pass straight through as null events. Compiled away without masks.
        has_mask = scene.materials.mask_tex is not None and (
            scene.mat_features is None or "mask" in scene.mat_features
        )
        if has_mask and has_tex:
            from ...scene.textures import sample_stochastic as _tex_stoch

            mt = small_gather(scene.materials.mask_tex, jnp.maximum(frag.material, 0))
            opac = _tex_stoch(scene.textures, jnp.maximum(mt, 0), frag.uv, tex_xi)[..., 0]
            ko = hash2_u32(s.vol_key ^ jnp.uint32(0xC2B2AE35), s.depth.astype(jnp.uint32))
            cutout = (
                s.alive & hit.valid() & (hit.t < RAY_MAX_T) & (mt >= 0)
                & ((opac <= 0.0) | (opac <= u32_to_float(ko)))
            )
        else:
            has_mask = False
            cutout = jnp.zeros_like(s.alive)

        # ---- medium transport: distance sampling in the enclosing medium
        # (homogeneous closed form / heterogeneous delta tracking; see
        # integrator/volume.py)
        # distance-sampling dim only exists in scenes with media (the ref's
        # volume integrator draws lazily inside the medium; a vacuum scene
        # never consumes it)
        u_dist = smp.sample_1d() if has_media else None
        if has_media:
            # dense-SSS similarity relation: the phase g and the distance
            # sampler must use the SAME depth-scaled coefficients
            _, _, g_med = mat.medium_coefficients(
                scene.materials, med_mat, vol_depth=s.vol_depth
            )
            ev = vol_mod.sample_interaction(
                scene, eff_prop, s.o, s.d, jnp.minimum(hit.t, jnp.float32(3.0e37)),
                u_dist, s.vol_key, vol_depth=s.vol_depth,
            )
            scatter = s.alive & ev.scatter & hit.valid()
            absorbed = s.alive & ev.absorb
            throughput0 = s.throughput * ev.weight
            p_scatter = ev.p
            # nested-dielectric false interface: the hit material's priority
            # loses to an enclosing medium -> null interface, pass through
            # (ref medium.zig priorities; Schmidt & Budge style)
            hit_prio = small_gather(
                scene.materials.priority, jnp.maximum(frag.material, 0)
            ).astype(jnp.float32)
            from ...scene.types import MaterialKind

            mkind = small_gather(scene.materials.kind, jnp.maximum(frag.material, 0))
            is_medium_b = (mkind == int(MaterialKind.GLASS)) | (
                mkind == int(MaterialKind.VOLUMETRIC)
            )
            false_if = (
                hit.valid() & (hit.t < RAY_MAX_T) & is_medium_b
                & (hit_prio < max_prio_excl) & ~scatter
            ) | (cutout & ~scatter)
        else:
            g_med = None
            scatter = jnp.zeros_like(s.alive)
            absorbed = jnp.zeros_like(s.alive)
            throughput0 = s.throughput
            p_scatter = frag.p
            false_if = cutout

        # ---- sensor AOV capture at the primary hit (ref sensor/aov):
        # every sample passes depth==0 && vol_depth==0 exactly once
        if settings.collect_aovs:
            # accumulators are PIXEL-indexed: scatter by the lane's pid
            # (identity without the persistent shuffle)
            fh = s.alive & (s.depth == 0) & (s.vol_depth == 0) & ~scatter
            finite0 = hit.valid() & (hit.t < RAY_MAX_T)
            fin_m = (fh & finite0)[..., None]
            pid = s.pid
            aov = dict(s.aov)
            if "albedo" in aov:
                aov["albedo"] = aov["albedo"].at[pid].add(
                    jnp.where(fin_m, params["color"], 0.0)
                )
            if "depth" in aov:
                aov["depth"] = aov["depth"].at[pid].min(
                    jnp.where(fin_m, hit.t[..., None], jnp.float32(RAY_MAX_T))
                )
            if "material_id" in aov:
                aov["material_id"] = aov["material_id"].at[pid].max(
                    jnp.where(
                        fin_m, frag.material.astype(jnp.float32)[..., None], -1.0
                    )
                )
            if "geometric_normal" in aov:
                aov["geometric_normal"] = aov["geometric_normal"].at[pid].add(
                    jnp.where(fin_m, frag.geo_n, 0.0)
                )
            if "shading_normal" in aov:
                aov["shading_normal"] = aov["shading_normal"].at[pid].add(
                    jnp.where(fin_m, frag.n, 0.0)
                )
            if "roughness" in aov:
                aov["roughness"] = aov["roughness"].at[pid].add(
                    jnp.where(
                        fin_m,
                        jnp.sqrt(jnp.maximum(params["alpha"], 0.0))[..., None],
                        0.0,
                    )
                )
            if "alpha" in aov:
                # coverage: 1 where the primary ray lands on geometry
                # (transparent-buffer semantics; transmission chains that
                # escape still count as covered — simplification vs ref
                # buffer_transparent.zig weight tracking)
                aov["alpha"] = aov["alpha"].at[pid].add(jnp.where(fin_m, 1.0, 0.0))
        else:
            aov = s.aov

        # ---- connectLight: BSDF-sampled emission with MIS (ref connectLight
        # + vertex.evaluateRadiance + scene.lightPdf)
        emission = mat.eval_radiance(params, wo, frag.geo_n)
        emission = jnp.where(
            (hit.valid() & ~scatter & ~cutout)[..., None], emission, 0.0
        )
        light_id = jnp.where(hit.valid(), small_gather(scene.prop_light, jnp.maximum(hit.prop, 0)), -1)
        is_light = light_id >= 0
        if has_lights and not settings.nee_only:
            # MIS pdfs are measured from the last REAL vertex (null medium
            # boundaries in between don't change the line, so the effective
            # distance is |hit - mis_o|)
            eff_t = jnp.where(
                hit.t >= RAY_MAX_T, hit.t, vm.length(frag.p - s.mis_o)
            )
            lp = ls_mod.light_hit_pdf(
                scene, hit.prop, s.mis_o, s.d, eff_t, frag.p, frag.geo_n, s.mis_n,
                total_sphere=s.from_volume, hit_prim=hit.prim, time=s.time,
            ) * ls_mod.light_select_pdf(
                scene, light_id, p=s.mis_o, n=s.mis_n, total_sphere=s.from_volume,
                split_threshold=(
                    s.nee_thr if settings.light_split_depth > 0 else None
                ),
                split_depth=settings.light_split_depth,
            )
            mis_w = jnp.where(
                s.singular | ~is_light, 1.0, power_heuristic(s.bxdf_pdf, lp)
            )
            if not settings.caustics:
                # caustic chains come from the lighttracer instead (ref
                # connectLight: skip specular-previous non-primary hits)
                mis_w = jnp.where(s.singular & (s.depth > 0) & is_light, 0.0, mis_w)
        elif settings.nee_only:
            # PTDL: only singular-previous hits count (no MIS)
            mis_w = jnp.where(s.singular, 1.0, jnp.where(is_light, 0.0, 1.0))
        else:
            mis_w = jnp.ones_like(hit.t)
        contrib = jnp.where(
            s.alive[..., None], sw * throughput0 * mis_w[..., None] * emission, 0.0
        )
        result = s.result.add(
            contrib, s.depth, 2, primary & jnp.ones_like(s.alive), s.singular
        )
        if has_media and ev.emission is not None:
            # volume emission collected along this segment (ref
            # pathtracer_mis: Absorb-event li added unweighted)
            vol_c = jnp.where(s.alive[..., None], sw * s.throughput * ev.emission, 0.0)
            result = result.add(
                vol_c, s.depth, 2, primary & jnp.ones_like(s.alive), s.singular
            )

        # ---- photon-map gather at primary-chain diffuse vertices
        # (ref pathtracer_mis.zig:101-104 worker.photonLi -> result.direct)
        if photon_map is not None:
            from . import photon as photon_mod

            gather_ok = (
                s.alive & hit.valid() & ~scatter & mat.can_evaluate(params)
                & s.primary_chain
                & (
                    jnp.asarray(settings.photons_not_only_through_specular)
                    | ((s.depth > 0) & s.singular)
                )
            )
            ph_li = photon_mod.gather(
                photon_map, params, frag.p, wo, frag.n, frag.geo_n, gather_ok,
                max_per_cell=photon_max_per_cell,
            )
            result = IValue(
                result.emission,
                result.direct + jnp.where(gather_ok[..., None], sw * throughput0 * ph_li, 0.0),
                result.indirect,
            )

        finite_hit = hit.valid() & (hit.t < RAY_MAX_T)
        cont = (
            s.alive & (finite_hit | scatter) & ~absorbed
            & (s.depth < settings.max_depth)
            & (s.vol_depth < settings.max_depth_volume)
        )

        # ---- russian roulette
        r = smp.sample_1d()
        throughput, kill = mat.russian_roulette(throughput0, r)
        cont = cont & ~kill

        # ---- BSDF path-splitting qualification (ref vertex.zig Pool
        # maxSplits: primary chains keep the full budget, secondary
        # vertices split while depth < NumVertices-1). Decided BEFORE NEE
        # so the NEE-side MIS pdf drops the fresnel selection factor for
        # exactly the lanes whose BSDF sample is deterministic.
        if split_on:
            from ...scene.types import MaterialKind as _MK

            k_mat = params["kind"]
            same_side_v = vm.dot(wo, frag.geo_n) > 0.0
            eta_i_v = jnp.where(same_side_v, params["ior_outside"], params["ior"])
            eta_t_v = jnp.where(same_side_v, params["ior"], 1.0)
            rough_v = params["alpha"] > mat.MIN_ALPHA * 1.001
            will_split = (
                cont
                & (k_mat == int(_MK.GLASS))
                & ~s.split["pending"]
                & (s.primary_chain | (s.depth < 3))
                & (jnp.abs(eta_i_v - eta_t_v) >= 1e-6)  # matched = null event
                & ~scatter
                & ~false_if
                # the rough refract branch only exists from outside
                # (ref roughSample: split requires same_side)
                & (same_side_v | ~rough_v)
            )
        else:
            will_split = None

        # ---- NEE (ref sampleLights/evaluateLight)
        if has_lights:
            u_sel = smp.sample_1d()
            xi_l = smp.sample_2d()
            # volume lights need a 3rd dim for the interior point (static:
            # only drawn when the scene has emissive volumes)
            has_vol_lights = (
                scene.light_shapes is not None and "volume" in scene.light_shapes
            )
            xi3_l = smp.sample_1d() if has_vol_lights else None
            nee_p = jnp.where(scatter[..., None], p_scatter, frag.p) if has_media else frag.p
            can_nee = cont & (scatter | mat.can_evaluate(params)) & ~false_if

            def nee_pick(light_idx, sel_pdf, xi, xi3=None):
                """One NEE estimator for one selected light.
                Returns (contribution[N,3], active[N])."""
                lsmp = ls_mod.sample_light(
                    scene, light_idx, nee_p, frag.geo_n, xi, total_sphere=scatter,
                    xi3=xi3, ns=frag.n, time=s.time,
                )
                radiance = ls_mod.light_radiance(
                    scene, light_idx, lsmp.wi, lsmp.light_n, lsmp.uv,
                    vol=(
                        (lsmp.vol_mask, lsmp.vol_radiance)
                        if lsmp.vol_mask is not None
                        else None
                    ),
                )
                f_srf, bpdf_srf = mat.eval_bsdf(
                    params, wo, lsmp.wi, frag.n, frag.geo_n, t=frag.t, b=frag.b,
                    glass_split=will_split,
                )
                if has_media:
                    ph = mat.hg_phase(vm.dot(s.d, lsmp.wi), g_med)
                    f = jnp.where(scatter[..., None], ph[..., None], f_srf)
                    bpdf = jnp.where(scatter, ph, bpdf_srf)
                else:
                    f = f_srf
                    bpdf = bpdf_srf
                light_pdf = lsmp.pdf * sel_pdf
                w = predivided_power_heuristic(light_pdf, bpdf)

                shadow_surf = shapes.offset_ray(
                    frag.p,
                    jnp.where(
                        vm.dot(lsmp.wi, frag.geo_n)[..., None] >= 0.0,
                        frag.geo_n, -frag.geo_n,
                    ),
                )
                shadow_o = (
                    jnp.where(scatter[..., None], p_scatter, shadow_surf)
                    if has_media
                    else shadow_surf
                )
                # finite lights: aim at the (offset) sampled point
                lp_off = shapes.offset_ray(lsmp.light_p, lsmp.light_n)
                shadow_axis = jnp.where(
                    lsmp.infinite[..., None], lsmp.wi, lp_off - shadow_o
                )
                slen = jnp.where(lsmp.infinite, jnp.float32(RAY_MAX_T), vm.length(shadow_axis))
                sdir = jnp.where(
                    lsmp.infinite[..., None],
                    lsmp.wi,
                    shadow_axis / jnp.maximum(slen, 1e-20)[..., None],
                )
                nee_active = (
                    can_nee & (light_idx >= 0) & (sel_pdf > 0.0)
                    & (lsmp.pdf > 0.0) & (jnp.max(f, axis=-1) > 0.0)
                )
                shadow_tmax = jnp.where(lsmp.infinite, jnp.float32(RAY_MAX_T) * 0.9, slen)
                # inactive lanes skip the shadow traversal (tmax=0 ->
                # mesh/curve cascades see them dead)
                shadow_tmax = jnp.where(nee_active, shadow_tmax, 0.0)
                if has_mask:
                    blocked = shapes.occluded_masked(
                        scene, shadow_o, sdir, jnp.float32(0.0), shadow_tmax,
                        key=hash_u32(s.vol_key ^ jnp.uint32(0x68BC21EB)),
                        time=s.time,
                    )
                else:
                    blocked = shapes.occluded(
                        scene, shadow_o, sdir, jnp.float32(0.0), shadow_tmax, time=s.time
                    )
                # participating media attenuate (not block) the shadow ray
                # (ref scene.zig visibility -> propTransmittance)
                if has_media:
                    shadow_tr = vol_mod.transmittance(
                        scene, shadow_o, sdir, shadow_tmax,
                        hash_u32(s.vol_key ^ jnp.uint32(0x1B873593)),
                    )
                else:
                    shadow_tr = jnp.float32(1.0)
                base = sw * throughput * radiance * f * w[..., None] * shadow_tr
                contrib = jnp.where((nee_active & ~blocked)[..., None], base, 0.0)
                # unoccluded variant for shadow catchers (ref sampleLights
                # occluded/unoccluded duals); same estimator minus the
                # occlusion test
                unocc = jnp.where(nee_active[..., None], base, 0.0)
                return contrib, nee_active, unocc

            if settings.light_split_depth > 0 and scene.light_tree is not None:
                # adaptive NEE splitting: static 2^S finite picks (+1
                # infinite), threshold decayed after the 4th path vertex
                # (ref helper.zig splitThreshold)
                st = jnp.float32(settings.light_split_threshold)
                thr = jnp.where(
                    s.depth + s.vol_depth < 4,
                    st,
                    jnp.float32(min(_SPLIT_LOW_THRESHOLD, settings.light_split_threshold)),
                )
                picks_l, picks_pdf = ls_mod.select_lights_split(
                    scene, u_sel, nee_p, frag.n, scatter, thr,
                    settings.light_split_depth,
                )
                nee = jnp.zeros_like(throughput)
                nee_unocc = jnp.zeros_like(throughput)
                for k in range(picks_l.shape[-1]):
                    # Cranley-Patterson rotation decorrelates picks sharing
                    # the single sampled 2D point
                    xi_k = jnp.mod(xi_l + jnp.asarray(_cp_offset(k), jnp.float32), 1.0) if k else xi_l
                    xi3_k = (
                        None if xi3_l is None
                        else (jnp.mod(xi3_l + 0.8191725133961645 * k, 1.0) if k else xi3_l)
                    )
                    c_k, a_k, u_k = nee_pick(picks_l[..., k], picks_pdf[..., k], xi_k, xi3_k)
                    nee = nee + c_k
                    nee_unocc = nee_unocc + u_k
                    rays = rays + jnp.sum(a_k, dtype=jnp.int32)
                new_nee_thr = thr
            else:
                light_idx, sel_pdf = ls_mod.select_light(
                    scene, u_sel, p=nee_p, n=frag.n, total_sphere=scatter
                )
                nee, nee_active, nee_unocc = nee_pick(light_idx, sel_pdf, xi_l, xi3_l)
                rays = rays + jnp.sum(nee_active, dtype=jnp.int32)
                new_nee_thr = jnp.zeros(u_sel.shape, jnp.float32)
            result = result.add(nee, s.depth, 1, jnp.zeros_like(cont), jnp.zeros_like(cont))

            if (
                scene.mat_features is not None
                and "shadow_catchers" in scene.mat_features
                and settings.collect_aovs
                and "alpha" in settings.collect_aovs
            ):
                # shadow catcher (ref vertex.zig flush: alpha +=
                # 1 - avg(occluded/unoccluded)): the beauty keeps the
                # normal occluded lighting; the alpha AOV records shadow
                # DENSITY at catcher primaries instead of coverage
                catcher = small_gather(
                    scene.prop_shadow_catcher, jnp.maximum(hit.prop, 0)
                )
                fh_c = (
                    s.alive & (s.depth == 0) & (s.vol_depth == 0) & ~scatter
                    & hit.valid() & (hit.t < RAY_MAX_T) & catcher
                )
                # no light reaches the catcher at all -> ratio 1 (no
                # shadow to record; ref: occluded < unoccluded select)
                ratio = jnp.where(
                    nee_unocc > 1e-12,
                    jnp.clip(nee / jnp.maximum(nee_unocc, 1e-20), 0.0, 1.0),
                    1.0,
                ).mean(axis=-1)
                density = jnp.where(fh_c, 1.0 - ratio, 0.0)
                # the capture block already added coverage 1 for these
                # lanes — replace it with the shadow density
                aov = dict(aov)
                aov["alpha"] = aov["alpha"].at[s.pid].add(
                    (density - jnp.where(fh_c, 1.0, 0.0))[..., None]
                )
        else:
            _ = smp.sample_1d()
            _ = smp.sample_2d()
            new_nee_thr = jnp.zeros(s.depth.shape, jnp.float32)

        # ---- BSDF / phase sample
        s3 = smp.sample_3d()
        bs = mat.sample_bsdf(
            params, wo, frag.n, frag.geo_n, s3, t=frag.t, b=frag.b,
            wavelength=s.wavelength,
            glass_branch=(
                jnp.where(will_split, 0, -1).astype(jnp.int32)
                if split_on
                else None
            ),
        )
        if has_media:
            # false interfaces override the BSDF with a straight-through
            # null event (the enclosing medium owns this boundary)
            bs = bs._replace(
                wi=jnp.where(false_if[..., None], -wo, bs.wi),
                weight=jnp.where(false_if[..., None], 1.0, bs.weight),
                valid=bs.valid | false_if,
                transmission=bs.transmission | false_if,
                passthrough=bs.passthrough | false_if,
            )
            wi_hg = mat.hg_sample(wo, g_med, s3[..., 1:3])
            ph_s = mat.hg_phase(vm.dot(s.d, wi_hg), g_med)
            wi = jnp.where(scatter[..., None], wi_hg, bs.wi)
            bsdf_weight = jnp.where(scatter[..., None], 1.0, bs.weight)
            # null interfaces (volume boundaries) keep the previous real
            # vertex's MIS state — the ray continues on the same line
            passthrough = bs.passthrough & ~scatter
            new_bxdf_pdf = jnp.where(
                scatter, ph_s, jnp.where(passthrough, s.bxdf_pdf, bs.pdf)
            )
            new_singular = jnp.where(
                scatter, False, jnp.where(passthrough, s.singular, bs.singular)
            )
            new_from_volume = jnp.where(
                scatter, True, jnp.where(passthrough, s.from_volume, False)
            )
        else:
            if has_mask:
                bs = bs._replace(
                    wi=jnp.where(cutout[..., None], -wo, bs.wi),
                    weight=jnp.where(cutout[..., None], 1.0, bs.weight),
                    valid=bs.valid | cutout,
                )
            wi = bs.wi
            bsdf_weight = bs.weight
            passthrough = cutout if has_mask else jnp.zeros_like(s.alive)
            new_bxdf_pdf = jnp.where(passthrough, s.bxdf_pdf, bs.pdf)
            new_singular = jnp.where(passthrough, s.singular, bs.singular)
            new_from_volume = jnp.zeros_like(s.alive)
        cont = cont & (bs.valid | scatter)
        thr_vertex = throughput  # pre-BSDF (both split children restart here)
        throughput = throughput * bsdf_weight
        # the continued (reflection) child carries split weight f, the parked
        # refraction child 1-f — applied to split["w"], NOT throughput (see
        # _split_init: RR must not see the branch weight)
        # next vertex's regularization driver: volume scatters count as
        # fully rough, null interfaces keep the previous value
        # (ref pathtracer_mis.zig:147 — only non-Straight events update)
        new_reg_alpha = jnp.where(
            scatter, 1.0, jnp.where(passthrough, s.reg_alpha, bs.reg_alpha)
        )

        surf_o = shapes.offset_ray(
            frag.p,
            jnp.where(vm.dot(wi, frag.geo_n)[..., None] >= 0.0, frag.geo_n, -frag.geo_n),
        )
        smp.increment_padding()
        if has_media:
            # medium interface change (ref vertex.zig interfaceChange):
            # entering pushes the prop onto the stack, exiting pops it.
            # Only medium-capable (glass/volumetric) boundaries count —
            # thin translucency transmits without enclosing a medium.
            entering = vm.dot(wo, frag.geo_n) > 0.0
            crossing = bs.transmission & cont & ~scatter & is_medium_b
            new_medium = vol_mod.stack_update(s.medium, frag.prop, entering, crossing)
            new_o = jnp.where(scatter[..., None], p_scatter, surf_o)
            new_mis_o = jnp.where(
                scatter[..., None],
                p_scatter,
                jnp.where(passthrough[..., None], s.mis_o, new_o),
            )
            new_mis_n = jnp.where(
                scatter[..., None],
                s.d,  # unused under total_sphere; keep something unit-length
                jnp.where(passthrough[..., None], s.mis_n, frag.n),
            )
            new_depth = jnp.where(cont & ~scatter & ~passthrough, s.depth + 1, s.depth)
            new_vol_depth = jnp.where(
                cont & (scatter | passthrough), s.vol_depth + 1, s.vol_depth
            )
        else:
            new_medium = s.medium
            new_o = surf_o
            new_mis_o = jnp.where(passthrough[..., None], s.mis_o, new_o)
            new_mis_n = jnp.where(passthrough[..., None], s.mis_n, frag.n)
            new_depth = jnp.where(cont & ~passthrough, s.depth + 1, s.depth)
            new_vol_depth = jnp.where(cont & passthrough, s.vol_depth + 1, s.vol_depth)

        # ---- park the untaken fresnel branch in the resume slot (ref
        # vertex.zig Pool.new; serialized per lane — see PtmisSettings)
        if split_on:
            bs1 = mat.sample_bsdf(
                params, wo, frag.n, frag.geo_n, s3, t=frag.t, b=frag.b,
                wavelength=s.wavelength,
                glass_branch=jnp.where(will_split, 1, -1).astype(jnp.int32),
            )
            fres = bs.fresnel
            do_split = will_split & ((1.0 - fres) > 1e-6) & cont & bs1.valid
            o1 = shapes.offset_ray(
                frag.p,
                jnp.where(
                    vm.dot(bs1.wi, frag.geo_n)[..., None] >= 0.0,
                    frag.geo_n, -frag.geo_n,
                ),
            )
            thr1 = thr_vertex * bs1.weight
            if has_media:
                entering1 = vm.dot(wo, frag.geo_n) > 0.0
                crossing1 = do_split & bs1.transmission & is_medium_b
                medium1 = vol_mod.stack_update(
                    s.medium, frag.prop, entering1, crossing1
                )
            else:
                medium1 = s.medium
            wl1 = bs1.wavelength if bs1.wavelength is not None else s.wavelength
            sp = s.split
            dm = do_split[..., None]
            sw1 = sw[..., 0]
            new_split = {
                "pending": do_split | sp["pending"],
                "w": jnp.where(will_split, sw1 * fres, sw1),
                "w1": jnp.where(do_split, sw1 * (1.0 - fres), sp["w1"]),
                "o": jnp.where(dm, o1, sp["o"]),
                "d": jnp.where(dm, bs1.wi, sp["d"]),
                "thr": jnp.where(dm, thr1, sp["thr"]),
                "pdf": jnp.where(do_split, bs1.pdf, sp["pdf"]),
                "singular": jnp.where(do_split, bs1.singular, sp["singular"]),
                "medium": jnp.where(dm, medium1, sp["medium"]),
                "depth": jnp.where(do_split, s.depth + 1, sp["depth"]),
                "vol_depth": jnp.where(do_split, s.vol_depth, sp["vol_depth"]),
                "mis_n": jnp.where(dm, frag.n, sp["mis_n"]),
                "primary": jnp.where(
                    do_split, s.primary_chain & bs1.singular, sp["primary"]
                ),
                "nee_thr": jnp.where(do_split, new_nee_thr, sp["nee_thr"]),
                "reg_alpha": jnp.where(do_split, bs1.reg_alpha, sp["reg_alpha"]),
                "wavelength": jnp.where(do_split, wl1, sp["wavelength"]),
                "vol_key": jnp.where(
                    do_split,
                    hash_u32(s.vol_key ^ jnp.uint32(0x85EBCA6B)),
                    sp["vol_key"],
                ),
                "run_seed": jnp.where(
                    do_split,
                    hash_u32(smp.arrays.run_seed ^ jnp.uint32(0x9E3779B9)),
                    sp["run_seed"],
                ),
            }
        else:
            new_split = s.split

        return PathState(
            o=jnp.where(cont[..., None], new_o, s.o),
            d=jnp.where(cont[..., None], wi, s.d),
            throughput=throughput,
            result=result,
            alive=cont,
            bxdf_pdf=new_bxdf_pdf,
            singular=new_singular,
            medium=new_medium,
            depth=new_depth,
            vol_depth=new_vol_depth,
            rays=rays,
            sobol=smp.arrays,
            vol_key=hash_u32(s.vol_key ^ jnp.uint32(0x27D4EB2F)),
            mis_o=jnp.where(cont[..., None], new_mis_o, s.mis_o),
            mis_n=jnp.where(cont[..., None], new_mis_n, s.mis_n),
            from_volume=new_from_volume,
            primary_chain=s.primary_chain & (new_singular | passthrough) & ~scatter,
            time=s.time,
            nee_thr=jnp.where(passthrough, s.nee_thr, new_nee_thr),
            reg_alpha=new_reg_alpha,
            aov=aov,
            wavelength=(
                bs.wavelength if bs.wavelength is not None else s.wavelength
            ),
            pid=s.pid,
            split=new_split,
            sub_uv=s.sub_uv,
        )

    return body


# ---------------------------------------------------------------------------
# Persistent wavefront: dead lanes immediately regenerate the next sample of
# their pixel inside ONE while_loop — near-100% lane utilization (the TPU
# analog of GPU "persistent threads" path regeneration; replaces the
# reference's tile loop over samples, worker.zig:130-166).
# ---------------------------------------------------------------------------


# smallest wavefront-drain stage width (tests lower it to exercise the
# cascade at tiny dispatch sizes)
_DRAIN_MIN = 1 << 13


class PersistentState(NamedTuple):
    path: PathState  # path.result holds the CURRENT sample's IValue sums
    acc: jax.Array  # [N,3] clamped, accumulated finished samples (by PIXEL)
    done: jax.Array  # int32[N] samples STARTED per lane
    iters: jax.Array  # int32 scalar: loop iterations (occupancy diagnostics)
    issued: jax.Array  # int32 scalar: samples started across all lanes


def _coprime_stride(n: int) -> int:
    """Golden-ratio stride coprime with n: the lane->pixel shuffle
    (lane + iteration*stride) mod n is a bijection per iteration and
    spreads each lane's samples across the frame."""
    import math as _math

    if n <= 2:
        return 1
    s = max(1, int(0.6180339887498949 * n))
    while _math.gcd(s, n) != 1:
        s += 1
    return s


def integrate_persistent(
    scene: SceneData,
    cam_arrays,
    pixel_xy,
    pixel_ids,
    first_iteration,
    num_samples: int,
    num_expected_samples: int,
    settings: PtmisSettings,
    clamp_max=(float("inf"), float("inf"), float("inf")),
    photon_map=None,
    photon_max_per_cell=64,
    frame_width: int = 0,
    oversample_slack: int = 0,
    filter_name: str = "Blackman",
    filter_radius: int = 0,
    resolution: tuple = (0, 0),
):
    """Render `num_samples` samples/pixel with lane regeneration AND
    per-sample lane->pixel shuffling.

    Reconstruction filters (filter_radius 1/2, ref sensor.zig addSample
    radius-1/2 splats) stay ON the persistent wavefront: every finished
    sample splats a (2r+1)^2 weighted footprint. The splat is pure dense
    math — a pixel-space neighbor at offset (dx, dy) is the lane/column at
    flat offset dy*W + dx, so each footprint tap is a static jnp.roll
    masked at the frame border (out-of-frame taps are dropped, and their
    weights with them, so border pixels renormalize exactly).
    - Shuffled dispatches (no AOVs) keep the 4-channel column flush; the
      per-sample subpixel offset is NOT carried or flushed — it is
      RECOMPUTED after the loop from the deterministic Sobol seeding law
      (sample_index = gpid*spp + iteration, dims 0-1), so filtering costs
      zero bytes of loop state. Drained samples record their sample slot
      and scatter-splat the same recomputed footprint.
    - Unshuffled dispatches (sensor AOVs ride) carry sub_uv in PathState
      and splat in-loop with 9/25 static rolls; AOV planes themselves
      accumulate box-filtered by pid (add/min/max AOV semantics do not
      compose with signed filter weights).

    Work balancing: a lane that always renders ONE pixel inherits that
    pixel's path-length statistics, and the while_loop runs until the
    SLOWEST lane's total finishes — measured 35% mean occupancy on the
    Cornell bench (174 iterations where perfect packing needs ~61).
    Shuffling sample k of lane i onto pixel (i + k*stride) mod n is a
    bijection per k, so every pixel still receives exactly its samples
    0..spp-1 with the reference seeding law, while each lane's total work
    becomes an average over n pixels — the loop length concentrates near
    the mean. Accumulation scatters by the sample's pixel id.

    CONTRACT: pixel_ids must be a contiguous ascending range (the driver's
    full frames and tiles are) — the pixel id is computed as
    pixel_ids[0] + shuffled_local_index. frame_width recovers x/y for the
    camera; 0 falls back to the un-shuffled identity mapping.

    Work stealing (oversample_slack > 0, shuffled only): the loop runs
    until n*num_samples samples have been ISSUED globally rather than
    num_samples per lane — lanes that drew short paths regenerate extra
    samples (per-lane cap num_samples + oversample_slack) while slow lanes
    still work, so the iteration count tracks the MEAN total path length
    instead of the slowest lane's quota. Pixels then receive unequal
    sample counts, returned as a per-pixel count plane the sensor uses as
    the filter weight (channel 3 of the flush buffer); the estimator stays
    unbiased. Issue overshoot (up to one regen round past the target) only
    adds extra samples.

    Returns (acc_radiance[N,3] summed over samples BY PIXEL, num_rays,
    aov_sums, loop_iterations, counts[N] by pixel or None when not
    shuffled).

    Accumulation (all alternatives measured on v5e, 512^2/2M lanes):
    a per-iteration scatter-add by pixel id costs ~80ms (XLA TPU scatter);
    an XLA one-hot [3K,N] column add compiles ~700s; per-iteration
    jnp.rolls with traced shifts inside the loop compile ~1400s. The
    shipping combination: finished samples flush into a per-lane [3K, N]
    column buffer via the Pallas kernel (ops/accum.py — ~1.8ms/iter at 2M
    lanes, fast compile), and ONE unpermute after the loop exploits the
    affine shuffle (pid = (lane + k*stride) mod n): sample k's column block
    is a CIRCULAR SHIFT, so jnp.roll (two dynamic slices — NOT a gather,
    which hits XLA's pathological minormost-axis path at ~600ms per k)."""
    from ..camera import generate_rays, sample_shutter_time
    from .. import sensor as sensor_mod

    n = pixel_ids.shape[0]
    zero3 = jnp.zeros((n, 3), jnp.float32)
    body = _make_body(scene, settings, photon_map, photon_max_per_cell)
    stride = jnp.uint32(_coprime_stride(n) if frame_width > 0 else 0)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    shuffled = frame_width > 0
    filtering = filter_radius > 0
    res_w, res_h = int(resolution[0]), int(resolution[1])
    taps = (
        [
            (dy, dx)
            for dy in range(-filter_radius, filter_radius + 1)
            for dx in range(-filter_radius, filter_radius + 1)
        ]
        if filtering
        else []
    )

    def tap_w(su, sv, dy, dx):
        return sensor_mod.filter_eval(
            filter_name, su - dx, float(filter_radius)
        ) * sensor_mod.filter_eval(filter_name, sv - dy, float(filter_radius))

    path0 = PathState(
        o=zero3,
        d=jnp.concatenate([jnp.zeros((n, 2), jnp.float32), jnp.ones((n, 1), jnp.float32)], -1),
        throughput=zero3,
        result=IValue.zeros(n),
        alive=jnp.zeros((n,), bool),
        bxdf_pdf=jnp.zeros((n,), jnp.float32),
        singular=jnp.ones((n,), bool),
        medium=vol_mod.stack_empty(n),
        depth=jnp.zeros((n,), jnp.int32),
        vol_depth=jnp.zeros((n,), jnp.int32),
        rays=jnp.int32(0),
        sobol=SobolSampler.start_pixel(pixel_ids, jnp.zeros_like(pixel_ids)).arrays,
        vol_key=hash_u32(pixel_ids.astype(jnp.uint32) ^ jnp.uint32(0x2545F491)),
        mis_o=zero3,
        mis_n=jnp.concatenate(
            [jnp.zeros((n, 2), jnp.float32), jnp.ones((n, 1), jnp.float32)], -1
        ),
        from_volume=jnp.zeros((n,), bool),
        primary_chain=jnp.ones((n,), bool),
        time=jnp.zeros((n,), jnp.float32),
        nee_thr=jnp.zeros((n,), jnp.float32),
        reg_alpha=jnp.zeros((n,), jnp.float32),
        aov=aov_init(settings.collect_aovs, n),
        wavelength=jnp.zeros((n,), jnp.float32),
        pid=lanes,
        split=_split_init(n) if _split_enabled(scene, settings) else {},
        sub_uv=jnp.zeros((n, 2), jnp.float32)
        if (filtering and not shuffled)
        else None,
    )
    # [4*kmax, n] (RGB + count planes): lane dim LAST — an [n, K, 4]
    # layout pads 42x under TPU tiling (T(8,128) on the trailing dims)
    # and OOMs at 1080p
    kmax = num_samples + (oversample_slack if shuffled else 0)
    target = jnp.int32(n) * jnp.int32(num_samples)
    acc0 = (
        jnp.zeros((4 * kmax, n), jnp.float32)
        if shuffled
        else (jnp.zeros((n, 4), jnp.float32) if filtering else zero3)
    )
    state = PersistentState(
        path=path0, acc=acc0, done=jnp.zeros((n,), jnp.int32),
        iters=jnp.int32(0), issued=jnp.int32(0),
    )

    def clamp_cur(cur: IValue):
        return (
            sensor_mod.clamp_radiance(cur.emission, clamp_max[0])
            + sensor_mod.clamp_radiance(cur.direct, clamp_max[1])
            + sensor_mod.clamp_radiance(cur.indirect, clamp_max[2])
        )

    # ---- drain cascade (the trimesh.traverse pattern applied to the whole
    # wavefront): once issuance ends, the loop pays full width for a
    # shrinking set of in-flight paths — the tail is ~max path length
    # (measured: 25 of 91 Cornell iterations, 14 of 21 on the trefoil).
    # Instead, exit the main loop when the in-flight count drops under
    # n/4, flatnonzero-compact the survivors into a 4x smaller PathState
    # and continue there, cascading down. Survivor contributions bypass
    # the column accumulator: each drained lane finishes exactly ONE
    # sample (no regen), collected at stage end by a single pid scatter.
    drain_stages = []
    if shuffled and not settings.collect_aovs:
        wd = n
        # stage entry at n/4: an n/2 first stage measured WORSE on Cornell
        # (extra full-width compaction gather outweighs 2-3 cheaper
        # decay iterations)
        while wd // 4 >= _DRAIN_MIN:
            wd = wd // 4
            drain_stages.append(wd)

    def inflight_count(p: PathState):
        return jnp.sum((p.alive | split_pending(p)).astype(jnp.int32))

    def cond(ps: PersistentState):
        can_start = (ps.issued < target) & jnp.any(ps.done < kmax)
        if drain_stages:
            return can_start | (inflight_count(ps.path) > drain_stages[0])
        return jnp.any(ps.path.alive | split_pending(ps.path)) | can_start

    def step(ps: PersistentState):
        # ---- dead lanes with a parked BSDF-split branch resume it FIRST
        # (same sample: the flush below must not fire between branches)
        s = resume_split(ps.path)
        # ---- regenerate finished lanes with the NEXT sample, shuffled
        # onto pixel (lane + iteration*stride) mod n
        regen = (~s.alive) & (ps.done < kmax) & (ps.issued < target)
        iteration = (first_iteration + ps.done).astype(jnp.uint32)
        pid_new = (lanes + iteration * stride) % jnp.uint32(n)
        gpid = pixel_ids[0] + pid_new  # contiguous-range contract
        if frame_width > 0:
            w = jnp.uint32(frame_width)
            xy_new = jnp.stack([(gpid % w), (gpid // w)], axis=-1).astype(jnp.int32)
        else:
            pid_new = lanes
            gpid = pixel_ids
            xy_new = pixel_xy
        sample_index = gpid * jnp.uint32(num_expected_samples) + iteration
        seed = (iteration // jnp.uint32(num_expected_samples))
        fresh = SobolSampler.start_pixel(sample_index, seed).arrays
        sob = jax.tree.map(
            lambda f, old: jnp.where(regen.reshape(regen.shape + (1,) * (old.ndim - 1)), f, old),
            fresh,
            s.sobol,
        )
        smp = SobolSampler(sob, dim=5)
        # camera block: consumed uniformly by every lane every iteration
        s4 = smp.sample_4d()
        _time = sample_shutter_time(cam_arrays, smp.sample_1d())
        smp.increment_padding()
        o_cam, d_cam = generate_rays(cam_arrays, xy_new, s4[..., 0:2], s4[..., 2:4])

        rm = regen[..., None]
        s = PathState(
            o=jnp.where(rm, o_cam, s.o),
            d=jnp.where(rm, d_cam, s.d),
            throughput=jnp.where(rm, 1.0, s.throughput),
            # result doubles as the current sample's accumulator
            result=IValue(*(jnp.where(rm, 0.0, c) for c in s.result)),
            alive=s.alive | regen,
            bxdf_pdf=jnp.where(regen, 0.0, s.bxdf_pdf),
            singular=jnp.where(regen, True, s.singular),
            medium=jnp.where(regen[..., None], -1, s.medium),
            depth=jnp.where(regen, 0, s.depth),
            vol_depth=jnp.where(regen, 0, s.vol_depth),
            rays=s.rays,
            sobol=smp.arrays,
            vol_key=jnp.where(
                regen, hash_u32(sample_index ^ jnp.uint32(0x2545F491)), s.vol_key
            ),
            mis_o=jnp.where(rm, o_cam, s.mis_o),
            mis_n=jnp.where(rm, d_cam, s.mis_n),
            from_volume=jnp.where(regen, False, s.from_volume),
            primary_chain=jnp.where(regen, True, s.primary_chain),
            time=jnp.where(regen, _time, s.time),
            nee_thr=jnp.where(regen, 0.0, s.nee_thr),
            reg_alpha=jnp.where(regen, 0.0, s.reg_alpha),
            aov=s.aov,  # accumulators persist across regenerated samples
            wavelength=jnp.where(regen, 0.0, s.wavelength),
            pid=jnp.where(regen, pid_new, s.pid),
            # resume slots are empty on regenerating lanes (pending lanes
            # were revived above); the lane split weight restarts at 1
            split=(
                {**s.split, "w": jnp.where(regen, 1.0, s.split["w"])}
                if s.split
                else s.split
            ),
            sub_uv=(
                jnp.where(rm, s4[..., 0:2], s.sub_uv)
                if s.sub_uv is not None
                else None
            ),
        )
        done = ps.done + regen.astype(jnp.int32)

        was_alive = s.alive
        s = body(s)

        # ---- flush samples that finished THIS iteration (clamped once);
        # a lane whose path died but parked a split branch is NOT finished
        finished = was_alive & ~s.alive & ~split_pending(s)
        fin_m = finished[..., None]
        acc_add = jnp.where(fin_m, clamp_cur(s.result), 0.0)
        if shuffled:
            # lane-local buffer row-block = the finished sample's index;
            # the one-hot column add runs as a Pallas kernel (the pure-XLA
            # formulations compile pathologically on Mosaic, see docstring)
            from ...ops import accum as accum_ops

            col = jnp.where(
                finished, jnp.clip(done - 1, 0, kmax - 1), -1
            ).astype(jnp.int32)
            acc = accum_ops.flush_columns(
                ps.acc, col, acc_add[:, 0], acc_add[:, 1], acc_add[:, 2],
                finished.astype(jnp.float32),
            )
        elif filtering:
            # unshuffled (AOV) filtered flush: splat the finishing sample's
            # (2r+1)^2 footprint with static rolls — lane j = i + dy*W + dx
            # IS pixel (x+dx, y+dy) because unshuffled lanes are the
            # dispatch's pixels in row-major order
            gx = pixel_xy[..., 0]
            gy = pixel_xy[..., 1]
            su = s.sub_uv[..., 0] - 0.5
            sv = s.sub_uv[..., 1] - 0.5
            li = jnp.arange(n, dtype=jnp.int32)
            acc = ps.acc
            for dy, dx in taps:
                w = tap_w(su, sv, dy, dx) * finished.astype(jnp.float32)
                off = dy * res_w + dx
                valid = (
                    (gx + dx >= 0) & (gx + dx < res_w)
                    & (gy + dy >= 0) & (gy + dy < res_h)
                    & (li + off >= 0) & (li + off < n)
                )
                w = jnp.where(valid, w, 0.0)
                c = jnp.concatenate([acc_add * w[..., None], w[..., None]], -1)
                acc = acc + (jnp.roll(c, off, axis=0) if off else c)
        else:
            acc = ps.acc + acc_add
        if settings.collect_aovs:
            aov = dict(s.aov)
            for name, field in (
                ("emission", s.result.emission),
                ("direct", s.result.direct),
                ("indirect", s.result.indirect),
            ):
                if name in aov:
                    aov[name] = aov[name].at[s.pid].add(jnp.where(fin_m, field, 0.0))
            s = s._replace(aov=aov)
        return PersistentState(
            path=s, acc=acc, done=done, iters=ps.iters + 1,
            issued=ps.issued + jnp.sum(regen.astype(jnp.int32)),
        )

    final = jax.lax.while_loop(cond, step, state)
    acc = final.acc
    num_rays = final.path.rays
    iters = final.iters
    drain_adds = []  # (pid, rgb, finished, sample_k) per stage
    if drain_stages:
        path = final.path
        done_cur = final.done  # compacted alongside: drained lanes never
        # regenerate, so done-1 stays the lane's current sample slot
        width_cur = n
        for si, wd in enumerate(drain_stages):
            sel = path.alive | split_pending(path)
            idx = compact_indices(sel, wd)
            safe = jnp.minimum(idx, width_cur - 1)
            valid = idx < width_cur

            def g(a):
                if a.ndim == 0 or a.shape[0] != width_cur:
                    return a
                return a[safe]

            path = jax.tree.map(g, path)
            done_cur = done_cur[safe]
            path = path._replace(alive=path.alive & valid)
            if path.split:
                path = path._replace(
                    split={
                        **path.split,
                        "pending": path.split["pending"] & valid,
                    }
                )
            nxt = drain_stages[si + 1] if si + 1 < len(drain_stages) else 0

            def dcond(c, _nxt=nxt):
                p, it = c
                return (inflight_count(p) > _nxt) & (it < jnp.int32(65536))

            def dstep(c):
                p, it = c
                p = resume_split(p)
                # replicate the full-width step's camera block EXACTLY:
                # it consumes one 5-dim Sobol block per iteration on every
                # lane (advancing run_seed) even when nothing regenerates —
                # skipping it here would put drained lanes on a different
                # (equally valid, but not bit-identical) stream
                smp_d = SobolSampler(p.sobol, dim=5)
                smp_d.sample_4d()
                smp_d.sample_1d()
                smp_d.increment_padding()
                p = p._replace(sobol=smp_d.arrays)
                p = body(p)
                return (p, it + 1)

            path, dit = jax.lax.while_loop(
                dcond, dstep, (path, jnp.int32(0))
            )
            iters = iters + dit
            fin = valid & ~(path.alive | split_pending(path))
            drain_adds.append(
                (
                    path.pid,
                    jnp.where(fin[..., None], clamp_cur(path.result), 0.0),
                    fin,
                    jnp.maximum(done_cur - 1, 0),
                )
            )
            width_cur = wd
        num_rays = path.rays
    counts = None
    if shuffled:
        # unpermute: pixel p's sample k lives in lane (p - (first_it+k)*S)
        # mod n — a circular shift per k, ONCE per dispatch
        out = jnp.zeros((4, n), jnp.float32)
        nn = jnp.uint32(n)
        if filtering:
            li = jnp.arange(n, dtype=jnp.int32)
            gpid_all = pixel_ids[0] + lanes
            gx = (gpid_all % jnp.uint32(res_w)).astype(jnp.int32)
            gy = (gpid_all // jnp.uint32(res_w)).astype(jnp.int32)
        for k in range(kmax):
            it_g = (first_iteration + k).astype(jnp.uint32)
            off = (it_g * stride) % nn
            blk = jnp.roll(
                acc[4 * k : 4 * k + 4, :], off.astype(jnp.int32), axis=1
            )
            if not filtering:
                out = out + blk
                continue
            # recompute this sample's subpixel offset from the seeding law
            # (zero loop-state bytes; identical draw to generate_rays')
            sample_index = gpid_all * jnp.uint32(num_expected_samples) + it_g
            seed = it_g // jnp.uint32(num_expected_samples)
            s4k = SobolSampler.start_pixel(sample_index, seed).sample_4d()
            su = s4k[..., 0] - 0.5
            sv = s4k[..., 1] - 0.5
            cnt = blk[3]
            for dy, dx in taps:
                w = tap_w(su, sv, dy, dx) * cnt
                toff = dy * res_w + dx
                valid = (
                    (gx + dx >= 0) & (gx + dx < res_w)
                    & (gy + dy >= 0) & (gy + dy < res_h)
                    & (li + toff >= 0) & (li + toff < n)
                )
                w = jnp.where(valid, w, 0.0)
                c = jnp.concatenate([blk[0:3] * w[None], w[None]], 0)
                out = out + (jnp.roll(c, toff, axis=1) if toff else c)
        acc = out[0:3].T
        counts = out[3]
        for pid_s, rgb_s, fin_s, k_s in drain_adds:
            if not filtering:
                tgt = jnp.where(fin_s, pid_s.astype(jnp.int32), jnp.int32(n))
                acc = acc.at[tgt].add(rgb_s, mode="drop")
                counts = counts.at[tgt].add(
                    fin_s.astype(jnp.float32), mode="drop"
                )
                continue
            # drained samples scatter-splat the same recomputed footprint
            gpid_s = pixel_ids[0] + pid_s
            it_g = (first_iteration + k_s).astype(jnp.uint32)
            sample_index = gpid_s * jnp.uint32(num_expected_samples) + it_g
            seed = it_g // jnp.uint32(num_expected_samples)
            s4s = SobolSampler.start_pixel(sample_index, seed).sample_4d()
            su = s4s[..., 0] - 0.5
            sv = s4s[..., 1] - 0.5
            gx_s = (gpid_s % jnp.uint32(res_w)).astype(jnp.int32)
            gy_s = (gpid_s // jnp.uint32(res_w)).astype(jnp.int32)
            pl_s = pid_s.astype(jnp.int32)
            for dy, dx in taps:
                w = tap_w(su, sv, dy, dx) * fin_s.astype(jnp.float32)
                toff = dy * res_w + dx
                valid = (
                    fin_s
                    & (gx_s + dx >= 0) & (gx_s + dx < res_w)
                    & (gy_s + dy >= 0) & (gy_s + dy < res_h)
                    & (pl_s + toff >= 0) & (pl_s + toff < n)
                )
                tgt = jnp.where(valid, pl_s + toff, n)
                acc = acc.at[tgt].add(rgb_s * w[..., None], mode="drop")
                counts = counts.at[tgt].add(
                    jnp.where(valid, w, 0.0), mode="drop"
                )
    elif filtering:
        counts = acc[:, 3]
        acc = acc[:, 0:3]
    return acc, num_rays, final.path.aov, iters, counts
