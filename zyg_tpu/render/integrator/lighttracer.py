"""Lighttracer (particle / backward pass).

ref: src/core/rendering/integrator/particle/lighttracer.zig — sample a point
+ direction from a light, walk the path, and at every surface vertex connect
to the camera, splatting through the sensor importance (camera.sampleTo).
The reference splats atomically; here the splats are a pure-functional
scatter-add, and normalization is splat_sum / particles_per_pixel
(ref driver.zig:269 resolve with ppp).

Light emission sampling (ref shape sampleFrom): finite area lights emit from
an area point with a cosine-distributed direction. Infinite lights are
skipped in the backward pass for now (weak caustic sources).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import vecmath as vm
from ...core.gather import small_gather
from ...core.sobol import SobolSampler
from ...scene import shapes, light_sampling as ls_mod
from ...scene.types import SceneData, ShapeType, RAY_MAX_T
from .. import materials as mat
from . import volume as vol_mod
from ..camera import camera_sample_to


class LighttracerSettings(NamedTuple):
    max_depth: int = 8
    full_light_path: bool = True


def sample_light_from(scene: SceneData, light_idx, xi4, u_side=None):
    """Emission sample: (p, n, dir, Le-weight 1/(pdf_area*pdf_dir)) for
    finite lights (ref rectangle/sphere sampleFrom).

    Two-sided plane emitters sample BOTH hemispheres (side chosen by u_side,
    weight doubled to match — the power CDF also doubles two-sided area) and
    IES-profiled lights weight the emitted direction by the profile, matching
    the forward path's eval_radiance/eval_ies exactly."""
    prop = small_gather(scene.lights.prop, jnp.clip(light_idx, 0, scene.lights.count - 1))
    shape = small_gather(scene.prop_shape, prop)
    rot = small_gather(scene.prop_rot, prop)
    pos = small_gather(scene.prop_pos, prop)
    scale = small_gather(scene.prop_scale, prop)
    r0, r1, r2 = rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]

    # rectangle: uniform area point
    u = xi4[..., 0] - 0.5
    v = xi4[..., 1] - 0.5
    rect_p = pos + (u * scale[..., 0])[..., None] * r0 + (v * scale[..., 1])[..., None] * r1
    rect_n = r2
    rect_area = scale[..., 0] * scale[..., 1]

    # sphere: uniform point on sphere
    sp_dir, _ = vm.sample_sphere_uniform(xi4[..., 0:2])
    sp_r = 0.5 * scale[..., 0]
    sph_p = pos + sp_r[..., None] * sp_dir
    sph_n = sp_dir
    sph_area = 4.0 * jnp.pi * sp_r * sp_r

    # disk
    dxy = vm.sample_disk_concentric(xi4[..., 0:2])
    dk_r = 0.5 * scale[..., 0]
    dk_p = pos + dk_r[..., None] * (dxy[..., 0:1] * r0 + dxy[..., 1:2] * r1)
    dk_area = jnp.pi * dk_r * dk_r

    is_sphere = shape == int(ShapeType.SPHERE)
    is_disk = shape == int(ShapeType.DISK)
    is_mesh = shape == int(ShapeType.TRIANGLE_MESH)
    finite = (
        (shape == int(ShapeType.RECTANGLE)) | is_sphere | is_disk | is_mesh
    )
    p = jnp.where(is_sphere[..., None], sph_p, jnp.where(is_disk[..., None], dk_p, rect_p))
    geo_n = jnp.where(is_sphere[..., None], sph_n, rect_n)
    area = jnp.where(is_sphere, sph_area, jnp.where(is_disk, dk_area, rect_area))

    if scene.meshes is not None and scene.lights.tri_offset is not None:
        # emissive meshes: area-uniform triangle point (ref triangle_mesh
        # sampleFrom; reuses the NEE per-light triangle CDFs)
        li = jnp.clip(light_idx, 0, scene.lights.count - 1)
        t_off = small_gather(scene.lights.tri_offset, li)
        t_cnt = small_gather(scene.lights.tri_count, li)
        u_tri = xi4[..., 0]
        lo = jnp.maximum(t_off, 0)
        hi = lo + jnp.maximum(t_cnt, 1)

        def bs_step(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            below = (
                scene.lights.tri_cdf[
                    jnp.clip(mid, 0, scene.lights.tri_cdf.shape[0] - 1)
                ]
                < u_tri
            )
            return jnp.where(below, mid + 1, lo), jnp.where(below, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 24, bs_step, (lo, hi))
        tri = scene.lights.tri_idx[jnp.clip(lo, 0, scene.lights.tri_idx.shape[0] - 1)]
        trow = scene.meshes.attr_rows[tri]  # one packed-row gather
        p0 = vm.object_to_world_point(rot, scale, pos, trow[..., 0:3])
        e1 = vm.object_to_world_vector(rot, scale, trow[..., 3:6])
        e2 = vm.object_to_world_vector(rot, scale, trow[..., 6:9])
        # fresh 2D point: the CDF pick consumed xi4[0], remap it
        bx = jnp.mod(u_tri * 64.0, 1.0)
        bc = vm.sample_triangle_uniform(
            jnp.stack([bx, xi4[..., 1]], axis=-1)
        )
        mesh_p = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        mesh_n = vm.safe_normalize(vm.cross(e1, e2))
        mesh_area = small_gather(scene.lights.area, li)
        p = jnp.where(is_mesh[..., None], mesh_p, p)
        geo_n = jnp.where(is_mesh[..., None], mesh_n, geo_n)
        area = jnp.where(is_mesh, mesh_area, area)

    m = small_gather(scene.prop_material, prop)
    radiance = small_gather(scene.materials.emission, m)
    two_sided = small_gather(scene.materials.two_sided, m) & ~is_sphere

    # two-sided plane emitters: pick a hemisphere; the 0.5 side probability
    # doubles the weight (matching the doubled emitting area in light power)
    if u_side is not None:
        flip = two_sided & (u_side < 0.5)
    else:
        flip = jnp.zeros_like(two_sided)
    n = jnp.where(flip[..., None], -geo_n, geo_n)

    # cosine-distributed emission direction around n (pdf cos/pi)
    t, b = vm.orthonormal_basis(n)
    local, dir_pdf = vm.sample_hemisphere_cosine(xi4[..., 2:4])
    d = vm.frame_to_world(t, b, n, local)

    # weight = Le * cos / (pdf_area * pdf_dir) = Le * area * pi ... with
    # pdf_dir = cos/pi the cosine cancels: weight = Le * area * pi
    weight = radiance * (area * jnp.pi)[..., None]
    weight = jnp.where(two_sided[..., None], 2.0 * weight, weight)
    if scene.mat_features and "ies" in scene.mat_features:
        # forward path applies eval_ies(profile, dot(wo, geo_n)) with the
        # UNflipped geometric normal — mirror it here (signed cos)
        profile = small_gather(scene.materials.ies, m)
        weight = weight * mat.eval_ies(profile, vm.dot(d, geo_n))[..., None]
    weight = jnp.where(finite[..., None], weight, 0.0)

    # portal lights emit the linked env map through the rect (ref
    # rectangle.zig sampleFrom: uvw = portalUvw(-dir)): modulate the
    # uniform emission by the env texture at the outward direction
    if scene.portals and scene.textures is not None:
        from ...scene import portal as portal_mod
        from ...scene.textures import sample_bilinear

        et = small_gather(scene.materials.emission_tex, m)
        for (l_const, _pp), pd in sorted(scene.portals.items()):
            m_l = light_idx == l_const
            uvp = portal_mod.dome_uv_of_dir(pd.dome_rot, -d)
            tex = sample_bilinear(scene.textures, jnp.maximum(et, 0), uvp)[..., :3]
            weight = jnp.where(
                (m_l & (et >= 0))[..., None], weight * tex, weight
            )

    # ---- infinite emitters (ref light.zig sampleFrom for Distant/Dome):
    # emit from a disk on the world bounding sphere toward the scene
    is_distant = shape == int(ShapeType.DISTANT)
    is_env = (shape == int(ShapeType.DOME)) | (shape == int(ShapeType.CANOPY))
    if True:
        wc = jnp.asarray(scene.world_center, jnp.float32)
        wr = jnp.float32(scene.world_radius)
        # distant: light TRAVELS along +r2 (the NEE direction to the light
        # is ~-r2, light_sampling.py DISTANT); emit from the upstream disk.
        # Le is radiance over the sun cone (solid angle
        # 2pi(1 - 1/sqrt(r^2+1)), same formula as the forward pdf), so the
        # flux through the scene disk is Le * Omega * pi R^2.
        dxy2 = vm.sample_disk_concentric(xi4[..., 2:4])
        dk_t, dk_b = vm.orthonormal_basis(r2)
        disk_off = wr[..., None] * (
            dxy2[..., 0:1] * dk_t + dxy2[..., 1:2] * dk_b
        )
        dist_p = wc - wr[..., None] * r2 + disk_off
        dist_d = r2
        ds_radius = scale[..., 0]
        omega = (2.0 * jnp.pi) * (
            1.0 - jnp.sqrt(1.0 / (ds_radius * ds_radius + 1.0))
        )
        dist_w = radiance * (omega * jnp.pi * wr * wr)[..., None]

        # dome/canopy: uniform direction toward the scene; weight folds the
        # direction pdf 1/(2pi) (canopy) or 1/(4pi)->2pi-hemisphere approx
        env_dir, _pdf_sph = vm.sample_sphere_uniform(xi4[..., 0:2])
        # emit inward from the bounding sphere along -env_dir
        env_p = wc + wr[..., None] * env_dir + wr[..., None] * (
            dxy2[..., 0:1] * vm.orthonormal_basis(env_dir)[0]
            + dxy2[..., 1:2] * vm.orthonormal_basis(env_dir)[1]
        )
        env_d = -env_dir
        # radiance of the env in that direction (emission maps apply)
        from ...scene import light_sampling as _ls

        env_rad = _ls.light_radiance(
            scene, light_idx, env_dir, -env_dir,
            jnp.zeros(env_dir.shape[:-1] + (2,), jnp.float32),
        )
        env_w = env_rad * (4.0 * jnp.pi * jnp.pi * wr * wr)[..., None]

        p = jnp.where(is_distant[..., None], dist_p, jnp.where(is_env[..., None], env_p, p))
        d = jnp.where(is_distant[..., None], dist_d, jnp.where(is_env[..., None], env_d, d))
        n = jnp.where((is_distant | is_env)[..., None], d, n)
        weight = jnp.where(
            is_distant[..., None], dist_w, jnp.where(is_env[..., None], env_w, weight)
        )
        finite = finite | is_distant | is_env
    return p, n, d, weight, finite


def trace(
    scene: SceneData,
    cam_arrays,
    resolution,
    ray_keys,  # uint32[N] per-path sample indices (seeding law)
    settings: LighttracerSettings,
):
    """Trace N light paths; returns (splat_image[W*H,3], num_rays)."""
    w, h = resolution
    n = ray_keys.shape[0]
    smp = SobolSampler.start_pixel(ray_keys, jnp.zeros_like(ray_keys))

    # light selection + emission sample (ref generateLightVertex)
    s2 = smp.sample_2d()
    light_idx, sel_pdf = ls_mod.select_light(scene, s2[..., 0])
    xi4 = smp.sample_4d()
    smp.increment_padding()
    p0, n0, d0, weight, finite = sample_light_from(scene, light_idx, xi4, u_side=s2[..., 1])
    throughput = weight / jnp.maximum(sel_pdf, 1e-12)[..., None]

    class LtState(NamedTuple):
        o: jax.Array
        d: jax.Array
        throughput: jax.Array
        alive: jax.Array
        medium: jax.Array
        depth: jax.Array
        specular_chain: jax.Array  # bool[N]: path passed a singular bounce
        splat: jax.Array  # [W*H, 3]
        rays: jax.Array
        sobol: object

    state = LtState(
        o=shapes.offset_ray(p0, n0),
        d=d0,
        throughput=throughput,
        alive=finite,
        medium=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        specular_chain=jnp.zeros((n,), bool),
        splat=jnp.zeros((w * h, 3), jnp.float32),
        rays=jnp.int32(0),
        sobol=smp.arrays,
    )

    def cond(s: LtState):
        return jnp.any(s.alive)

    def body(s: LtState):
        smp = SobolSampler(s.sobol, dim=5)
        rays = s.rays + jnp.sum(s.alive, dtype=jnp.int32)
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
        cont = s.alive & finite_hit & (s.depth < settings.max_depth)

        # ---- connect to the camera (ref directCamera)
        pix, dir_cam, t_cam, cam_pdf, cam_ok = camera_sample_to(cam_arrays, resolution, frag.p)
        vis_cam = small_gather(scene.prop_visible_camera, jnp.maximum(hit.prop, 0))
        f, _ = mat.eval_bsdf(params, wo, dir_cam, frag.n, frag.geo_n)
        shadow_o = shapes.offset_ray(
            frag.p,
            jnp.where(vm.dot(dir_cam, frag.geo_n)[..., None] >= 0.0, frag.geo_n, -frag.geo_n),
        )
        connect = cont & cam_ok & vis_cam & (cam_pdf > 0.0) & (jnp.max(f, axis=-1) > 0.0)
        if not settings.full_light_path:
            # caustics-only mode: only vertices reached through a specular
            # chain splat (the forward integrator handles the rest)
            connect = connect & s.specular_chain
        blocked = shapes.occluded(scene, shadow_o, dir_cam, jnp.float32(0.0), t_cam * 0.999)
        rays = rays + jnp.sum(connect, dtype=jnp.int32)
        contrib = jnp.where(
            (connect & ~blocked)[..., None],
            cam_pdf[..., None] * throughput * f,
            0.0,
        )
        ids = jnp.clip(pix[..., 1], 0, h - 1) * w + jnp.clip(pix[..., 0], 0, w - 1)
        splat = s.splat.at[ids].add(contrib)

        # ---- russian roulette + bounce
        r = smp.sample_1d()
        throughput, kill = mat.russian_roulette(throughput, r)
        cont = cont & ~kill
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
        return LtState(
            o=jnp.where(cont[..., None], new_o, s.o),
            d=jnp.where(cont[..., None], bs.wi, s.d),
            throughput=throughput,
            alive=cont,
            medium=new_medium,
            depth=s.depth + 1,
            specular_chain=s.specular_chain | (cont & bs.singular),
            splat=splat,
            rays=rays,
            sobol=smp.arrays,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.splat, final.rays
