"""Next-event estimation: light selection, per-shape sampleTo, and the
matching pdfs for MIS.

ref: src/core/scene/light/light.zig (sampleTo/evaluateTo/pdf) and the shape
sampleTo/pdf methods. Rectangle lights use the area-preserving spherical
rectangle parametrization (Ureña, Fajardo & King 2013) exactly like the
reference (rectangle.zig SphQuad); spheres use uniform cone sampling with the
small-angle stable path; disks convert area to solid angle; distant lights
sample a concentric disk over the sun cone; canopy/dome sample the (hemi)
sphere of directions.

All functions are vectorized over N lanes with gathers by light index.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from .types import SceneData, ShapeType, RAY_MAX_T
from ..core.gather import small_gather

DOT_MIN = 0.00001


def _present_shapes(light_shapes) -> set:
    """Shape types present among lights. Keys are strings ("3", "volume",
    "portal" — jax sorts pytree dict keys, so no mixed int/str); int keys
    from hand-built test scenes are accepted too."""
    out = set()
    for k in (light_shapes if light_shapes is not None else {int(t): True for t in ShapeType}):
        ks = str(k)
        if ks.isdigit():
            out.add(int(ks))
    return out


class LightSample(NamedTuple):
    wi: jax.Array  # [N,3] direction from shading point to light
    pdf: jax.Array  # [N] solid-angle pdf (0 = invalid)
    light_p: jax.Array  # [N,3] point on light (for shadow ray target)
    light_n: jax.Array  # [N,3] light surface normal
    t_max: jax.Array  # [N] shadow ray length (RAY_MAX_T for infinite)
    infinite: jax.Array  # bool[N]
    uv: jax.Array  # [N,2] texture uv at the sampled point — same mapping as
    # shapes.build_fragment, so NEE and BSDF-hit emission agree (MIS)
    # volume lights (ref light.zig volumeSampleTo): lanes whose light is an
    # emissive volume, with the radiance mu_a(x)*e*density(x) evaluated at
    # the sampled interior point (light_radiance substitutes it)
    vol_mask: jax.Array = None  # bool[N]
    vol_radiance: jax.Array = None  # [N,3]


# ---------------------------------------------------------------------------
# light selection by power distribution (ref scene.zig light_distribution)
# ---------------------------------------------------------------------------


def select_light(scene: SceneData, u, p=None, n=None, total_sphere=False):
    """u in [0,1) -> (light index[N], selection pdf[N]).

    With a light tree present and a shading point given, selection is
    position/orientation-adaptive (ref scene.zig randomLightSpatial ->
    light_tree.randomLight); otherwise the global power CDF."""
    if scene.light_tree is not None and p is not None:
        from . import light_tree as lt_mod

        return lt_mod.select(scene.light_tree, p, n, total_sphere, u)
    cdf = scene.lights.cdf
    nl = scene.lights.count
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, nl - 1)
    pdf = cdf[idx + 1] - cdf[idx]
    return idx.astype(jnp.int32), pdf


def light_select_pdf(
    scene: SceneData, light_idx, p=None, n=None, total_sphere=False,
    split_threshold=None, split_depth: int = 0,
):
    """Selection pdf of `light_idx` — must MATCH select_light's strategy
    (ref scene.zig lightPdfSpatial). With `split_depth > 0` the pdf is
    computed under adaptive splitting (ref light_tree.zig Tree.pdf with a
    positive split threshold)."""
    if scene.light_tree is not None and p is not None:
        from . import light_tree as lt_mod

        if split_depth > 0 and split_threshold is not None:
            return lt_mod.pdf_split(
                scene.light_tree, p, n, total_sphere, light_idx,
                split_threshold, split_depth,
            )
        return lt_mod.pdf(scene.light_tree, p, n, total_sphere, light_idx)
    cdf = scene.lights.cdf
    i = jnp.clip(light_idx, 0, scene.lights.count - 1)
    return cdf[i + 1] - cdf[i]


def select_lights_split(
    scene: SceneData, u, p, n, total_sphere, split_threshold, split_depth: int
):
    """Adaptive-split selection: (lights int32[N,P], pdfs float32[N,P]) with
    P = 2^split_depth (+1 infinite pick when the scene has infinite lights).
    Requires a light tree (the driver only enables splitting when one
    exists). Inactive picks have light = -1, pdf = 0."""
    from . import light_tree as lt_mod

    return lt_mod.select_split(
        scene.light_tree, p, n, total_sphere, u, split_threshold, split_depth
    )


# ---------------------------------------------------------------------------
# Spherical rectangle (Ureña et al.) — ref rectangle.zig SphQuad
# ---------------------------------------------------------------------------


class SphQuad(NamedTuple):
    x0: jax.Array
    y0: jax.Array
    x1: jax.Array
    y1: jax.Array
    z0: jax.Array
    z_sign: jax.Array  # +-1: local z axis orientation after the flip
    b0: jax.Array
    b1: jax.Array
    k: jax.Array
    S: jax.Array  # solid angle


def sphquad_init(scale_x, scale_y, o_local):
    """o_local: shading point in the rectangle's unscaled local frame."""
    ox, oy, oz = o_local[..., 0], o_local[..., 1], o_local[..., 2]
    dx = -0.5 * scale_x - ox
    dy = -0.5 * scale_y - oy
    z0 = -oz
    z_sign = jnp.where(z0 > 0.0, -1.0, 1.0)
    z0 = jnp.where(z0 > 0.0, -z0, z0)
    x0 = dx
    y0 = dy
    x1 = x0 + scale_x
    y1 = y0 + scale_y

    def vert(x, y):
        return jnp.stack([x, y, z0], axis=-1)

    v00, v01, v10, v11 = vert(x0, y0), vert(x0, y1), vert(x1, y0), vert(x1, y1)
    n0 = vm.safe_normalize(vm.cross(v00, v10))
    n1 = vm.safe_normalize(vm.cross(v10, v11))
    n2 = vm.safe_normalize(vm.cross(v11, v01))
    n3 = vm.safe_normalize(vm.cross(v01, v00))
    g0 = jnp.arccos(jnp.clip(-vm.dot(n0, n1), -1.0, 1.0))
    g1 = jnp.arccos(jnp.clip(-vm.dot(n1, n2), -1.0, 1.0))
    g2 = jnp.arccos(jnp.clip(-vm.dot(n2, n3), -1.0, 1.0))
    g3 = jnp.arccos(jnp.clip(-vm.dot(n3, n0), -1.0, 1.0))
    b0 = n0[..., 2]
    b1 = n2[..., 2]
    k = 2.0 * jnp.pi - g2 - g3
    S = g0 + g1 - k
    return SphQuad(x0, y0, x1, y1, z0, z_sign, b0, b1, k, S)


def sphquad_sample(q: SphQuad, uv):
    """Returns (xu, yv): offsets from the shading point along the local x/y
    axes; the sampled point is o_local + (xu, yv, z0*z_sign) which lands on
    the rectangle plane z=0."""
    u, v = uv[..., 0], uv[..., 1]
    au = u * q.S + q.k
    fu = (jnp.cos(au) * q.b0 - q.b1) / jnp.maximum(jnp.abs(jnp.sin(au)), 1e-12) * jnp.sign(jnp.sin(au))
    cu = jnp.where(fu > 0.0, 1.0, -1.0) / jnp.sqrt(fu * fu + q.b0 * q.b0)
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * q.z0) / jnp.sqrt(jnp.maximum(1.0 - cu * cu, 1e-12))
    xu = jnp.clip(xu, q.x0, q.x1)
    d = jnp.sqrt(xu * xu + q.z0 * q.z0)
    h0 = q.y0 / jnp.sqrt(d * d + q.y0 * q.y0)
    h1 = q.y1 / jnp.sqrt(d * d + q.y1 * q.y1)
    hv = h0 + v * (h1 - h0)
    hv2 = hv * hv
    eps = 9.5367431640625e-7
    yv = jnp.where(hv2 < 1.0 - eps, (hv * d) / jnp.sqrt(jnp.maximum(1.0 - hv2, eps)), q.y1)
    return xu, yv


def sphquad_pdf(q: SphQuad, o_local, scale_x, scale_y):
    """1/S solid angle, falling back to area-measure conversion when tiny
    (ref rectangle.zig SphQuad.pdf)."""
    sqr_dist = vm.dot(o_local, o_local)
    area = scale_x * scale_y
    numer = area * jnp.abs(o_local[..., 2])
    denom = sqr_dist * jnp.sqrt(sqr_dist)
    stable = numer > denom * DOT_MIN
    inv_s = 1.0 / jnp.maximum(q.S, 1e-12)
    return jnp.where(stable, inv_s, denom / jnp.maximum(numer, 1e-20))




def _animated_transforms(scene: SceneData, prop, rot, pos, scale, time):
    """Override per-lane (rot, pos, scale) for lanes whose selected/hit
    prop is an animated analytic light (ref light.zig sampleTo/pdf taking
    propTransformationAt(time)). Static scenes compile this away."""
    if not scene.animated_lights or time is None:
        return rot, pos, scale
    from . import shapes as sh

    for pk in scene.animated_lights.keys():
        rk, pp, ss = sh.prop_transform_at(scene, pk, time)
        m = prop == pk
        rot = jnp.where(m[..., None, None], rk, rot)
        pos = jnp.where(m[..., None], pp, pos)
        scale = jnp.where(m[..., None], ss, scale)
    return rot, pos, scale


# ---------------------------------------------------------------------------
# sample_light: dispatch over light shape types
# ---------------------------------------------------------------------------


def sample_light(scene: SceneData, light_idx, p, n, xi, total_sphere=False, xi3=None, ns=None, time=None) -> LightSample:
    """Sample a direction to light `light_idx` from shading point p.

    xi: [N,2] uniforms (+ xi3 [N] when the scene has volume lights — interior
    points need 3 dims, ref light.zig volumeSampleTo sample3D). Returns
    solid-angle pdf (number-of-samples weighting and splitting are handled
    by the integrator). Only the light shape types actually present in the
    scene (static scene.light_shapes) are computed.
    """
    present = _present_shapes(scene.light_shapes)
    has = lambda t: int(t) in present

    prop = small_gather(scene.lights.prop, jnp.clip(light_idx, 0, scene.lights.count - 1))
    shape = small_gather(scene.prop_shape, prop)
    rot = small_gather(scene.prop_rot, prop)
    pos = small_gather(scene.prop_pos, prop)
    scale = small_gather(scene.prop_scale, prop)
    rot, pos, scale = _animated_transforms(scene, prop, rot, pos, scale, time)

    r0, r1, r2 = rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]
    nshape = p.shape[:-1]
    ones_b = jnp.ones(nshape, bool)
    far_t = jnp.full(nshape, jnp.float32(RAY_MAX_T))

    wi_v, pdf_v, lp_v, ln_v, valid_v, t_v, uv_v = {}, {}, {}, {}, {}, {}, {}

    if has(ShapeType.RECTANGLE):
        lp_local = jnp.stack(
            [vm.dot(p - pos, r0), vm.dot(p - pos, r1), vm.dot(p - pos, r2)], axis=-1
        )
        q = sphquad_init(scale[..., 0], scale[..., 1], lp_local)
        xu, yv = sphquad_sample(q, xi)
        rect_p = (
            pos
            + (lp_local[..., 0] + xu)[..., None] * r0
            + (lp_local[..., 1] + yv)[..., None] * r1
        )
        rect_axis = rect_p - p
        rect_t = vm.length(rect_axis)
        k = int(ShapeType.RECTANGLE)
        wi_v[k] = rect_axis / jnp.maximum(rect_t, 1e-20)[..., None]
        pdf_v[k] = sphquad_pdf(q, lp_local, scale[..., 0], scale[..., 1])
        lp_v[k] = rect_p
        ln_v[k] = r2
        valid_v[k] = q.S > 1e-7
        t_v[k] = rect_t
        # uv matching rectangle_intersect: u = dot(-r0, p-pos)/(sx/2)
        ru = -(lp_local[..., 0] + xu) / (0.5 * scale[..., 0])
        rv = -(lp_local[..., 1] + yv) / (0.5 * scale[..., 1])
        uv_v[k] = jnp.stack([0.5 * (ru + 1.0), 0.5 * (rv + 1.0)], axis=-1)

    if has(ShapeType.SPHERE):
        v = pos - p
        l2 = jnp.maximum(vm.dot(v, v), 1e-20)
        l = jnp.sqrt(l2)
        sp_r = 0.5 * scale[..., 0]
        z_axis = v / l[..., None]
        tx, ty = vm.orthonormal_basis(z_axis)
        sin2_max = jnp.clip((sp_r * sp_r) / l2, 0.0, 0.9999)
        cos_max = jnp.sqrt(1.0 - sin2_max)
        small = sin2_max < 0.00068523
        cos_theta = (cos_max - 1.0) * xi[..., 0] + 1.0
        sin2_theta = 1.0 - cos_theta * cos_theta
        sin2_theta = jnp.where(small, sin2_max * xi[..., 0], sin2_theta)
        cos_theta = jnp.where(small, jnp.sqrt(1.0 - sin2_theta), cos_theta)
        one_minus_cos_max = jnp.where(small, 0.5 * sin2_max, 1.0 - cos_max)
        sin_max = jnp.sqrt(jnp.maximum(sin2_max, 1e-20))
        cos_alpha = jnp.minimum(
            sin2_theta / sin_max
            + cos_theta * jnp.sqrt(jnp.maximum(1.0 - jnp.minimum(sin2_theta / jnp.maximum(sin2_max, 1e-20), 1.0), 0.0)),
            1.0,
        )
        sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha * cos_alpha, 0.0))
        phi = xi[..., 1] * (2.0 * jnp.pi)
        w_local = jnp.stack([sin_alpha * jnp.cos(phi), sin_alpha * jnp.sin(phi), cos_alpha], axis=-1)
        sph_n = -(vm.frame_to_world(tx, ty, z_axis, w_local))
        sph_p = pos + sp_r[..., None] * sph_n
        sph_axis = sph_p - p
        sph_t = vm.length(sph_axis)
        k = int(ShapeType.SPHERE)
        wi_v[k] = sph_axis / jnp.maximum(sph_t, 1e-20)[..., None]
        pdf_v[k] = 1.0 / jnp.maximum(2.0 * jnp.pi * one_minus_cos_max, 1e-20)
        lp_v[k] = sph_p
        ln_v[k] = sph_n
        valid_v[k] = l > sp_r + 1e-7
        t_v[k] = sph_t
        # lat-long uv of the sampled normal (matches build_fragment sphere)
        sxyz = vm.safe_normalize(vm.world_to_object_normal(rot, sph_n))
        sphi = -jnp.arctan2(sxyz[..., 0], sxyz[..., 2]) + jnp.pi
        stheta = jnp.arccos(jnp.clip(sxyz[..., 1], -1.0, 1.0))
        uv_v[k] = jnp.stack([sphi * (0.5 / jnp.pi), stheta * (1.0 / jnp.pi)], axis=-1)

    if has(ShapeType.DISK):
        dk_r = 0.5 * scale[..., 0]
        dxy = vm.sample_disk_concentric(xi)
        dk_p = pos + dk_r[..., None] * (dxy[..., 0:1] * r0 + dxy[..., 1:2] * r1)
        dk_axis = dk_p - p
        dk_sl = jnp.maximum(vm.dot(dk_axis, dk_axis), 1e-20)
        dk_t = jnp.sqrt(dk_sl)
        dk_wi = dk_axis / dk_t[..., None]
        dk_c_abs = jnp.abs(-vm.dot(r2, dk_wi))
        dk_area = jnp.pi * dk_r * dk_r
        k = int(ShapeType.DISK)
        wi_v[k] = dk_wi
        pdf_v[k] = dk_sl / jnp.maximum(dk_c_abs * dk_area, 1e-20)
        lp_v[k] = dk_p
        ln_v[k] = r2
        valid_v[k] = dk_c_abs > DOT_MIN
        t_v[k] = dk_t
        # disk_intersect: u = dot(-r0, k/r) with k = p - pos = r*(dxy.axes)
        uv_v[k] = jnp.stack(
            [0.5 * (-dxy[..., 0] + 1.0), 0.5 * (-dxy[..., 1] + 1.0)], axis=-1
        )

    if has(ShapeType.DISTANT):
        ds_radius = scale[..., 0]
        ds_xy = vm.sample_disk_concentric(xi)
        ws = ds_radius[..., None] * (ds_xy[..., 0:1] * r0 + ds_xy[..., 1:2] * r1)
        ds_wi = vm.safe_normalize(ws - r2)
        ds_solid_angle = (2.0 * jnp.pi) * (1.0 - jnp.sqrt(1.0 / (ds_radius * ds_radius + 1.0)))
        k = int(ShapeType.DISTANT)
        wi_v[k] = ds_wi
        pdf_v[k] = 1.0 / jnp.maximum(ds_solid_angle, 1e-20)
        ln_v[k] = r2
        valid_v[k] = ds_radius > 0.0
        # distant_intersect: k = d - n, u = dot(r0, k/radius)
        dsk = (ds_wi - r2) / jnp.maximum(ds_radius, 1e-20)[..., None]
        uv_v[k] = jnp.stack(
            [0.5 * (vm.dot(r0, dsk) + 1.0), 0.5 * (vm.dot(r1, dsk) + 1.0)], axis=-1
        )

    if has(ShapeType.CANOPY):
        can_local, _ = vm.sample_hemisphere_uniform(xi)
        k = int(ShapeType.CANOPY)
        wi_v[k] = vm.frame_to_world(r0, r1, r2, can_local)
        pdf_v[k] = jnp.full(nshape, 1.0 / (2.0 * jnp.pi), jnp.float32)
        valid_v[k] = ones_b

    if has(ShapeType.DOME):
        ts = jnp.broadcast_to(jnp.asarray(total_sphere), nshape)
        dm_t, dm_b = vm.orthonormal_basis(n)
        dm_local, _ = vm.sample_hemisphere_uniform(xi)
        dm_wi_hemi = vm.frame_to_world(dm_t, dm_b, n, dm_local)
        dm_wi_full, _ = vm.sample_sphere_uniform(xi)
        k = int(ShapeType.DOME)
        wi_v[k] = jnp.where(ts[..., None], dm_wi_full, dm_wi_hemi)
        pdf_v[k] = jnp.where(ts, 1.0 / (4.0 * jnp.pi), 1.0 / (2.0 * jnp.pi))
        valid_v[k] = ones_b

    if has(ShapeType.TRIANGLE_MESH) and scene.meshes is not None:
        # emissive mesh: area-uniform triangle sampling via the per-light CDF
        # (ref shape_sampler.zig MeshImpl / triangle_mesh sampleTo)
        li = jnp.clip(light_idx, 0, scene.lights.count - 1)
        t_off = small_gather(scene.lights.tri_offset, li)
        t_cnt = small_gather(scene.lights.tri_count, li)
        # per-lane binary search in the cdf slice [t_off, t_off + t_cnt)
        u = xi[..., 0]
        lo = jnp.maximum(t_off, 0)
        hi = lo + jnp.maximum(t_cnt, 1)

        def bs_step(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            below = scene.lights.tri_cdf[jnp.clip(mid, 0, scene.lights.tri_cdf.shape[0] - 1)] < u
            return jnp.where(below, mid + 1, lo), jnp.where(below, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 24, bs_step, (lo, hi))
        tri = scene.lights.tri_idx[jnp.clip(lo, 0, scene.lights.tri_idx.shape[0] - 1)]
        area = small_gather(scene.lights.area, li)
        if scene.mesh_light_trees:
            # primitive light tree over large emitters (ref
            # light_tree.zig:520): position-aware triangle selection; the
            # selection pdf folds into an EFFECTIVE area (area_tri / psel)
            # so the shared pdf expression below stays sl / (cos * area)
            from . import light_tree as lt_mod

            ts_b = jnp.broadcast_to(jnp.asarray(total_sphere), u.shape)
            n_recv = ns if ns is not None else n  # must match the hit
            # side's n_at_origin (= mis_n, the SHADING normal)
            for (l_const, _base), (tr, aux) in sorted(
                scene.mesh_light_trees.items()
            ):
                m_l = light_idx == l_const
                loc, psel = lt_mod.select(tr, p, n_recv, ts_b, u)
                tri = jnp.where(m_l, aux["arena"][loc], tri)
                area = jnp.where(
                    m_l,
                    aux["area"][loc] / jnp.maximum(psel, 1e-20),
                    area,
                )
        # object-space triangle -> world via the light prop transform
        # (one packed-row gather: p0/e1/e2/uv all ride attr_rows)
        trow = scene.meshes.attr_rows[tri]
        p0 = vm.object_to_world_point(rot, scale, pos, trow[..., 0:3])
        e1 = vm.object_to_world_vector(rot, scale, trow[..., 3:6])
        e2 = vm.object_to_world_vector(rot, scale, trow[..., 6:9])
        bc = vm.sample_triangle_uniform(xi)
        mp = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        mn_raw = vm.cross(e1, e2)
        mn = vm.safe_normalize(mn_raw)
        axis = mp - p
        sl = jnp.maximum(vm.dot(axis, axis), 1e-20)
        mt = jnp.sqrt(sl)
        mwi = axis / mt[..., None]
        cosl = jnp.abs(vm.dot(mn, mwi))
        k = int(ShapeType.TRIANGLE_MESH)
        wi_v[k] = mwi
        pdf_v[k] = sl / jnp.maximum(cosl * area, 1e-20)
        lp_v[k] = mp
        ln_v[k] = mn
        valid_v[k] = (t_off >= 0) & (cosl > DOT_MIN) & (area > 0.0)
        t_v[k] = mt
        tuv = trow[..., 12:18].reshape(trow.shape[:-1] + (3, 2))
        w0m = (1.0 - bc[..., 0] - bc[..., 1])[..., None]
        uv_v[k] = (
            w0m * tuv[..., 0, :]
            + bc[..., 0:1] * tuv[..., 1, :]
            + bc[..., 1:2] * tuv[..., 2, :]
        )

    def sel(vals, default):
        out = None
        for st, val in vals.items():
            if out is None:
                out = val
                continue
            cond = shape == st
            if val.ndim > cond.ndim:
                cond = cond[..., None]
            out = jnp.where(cond, val, out)
        return default if out is None else out

    wi = sel(wi_v, jnp.zeros(nshape + (3,), jnp.float32))
    pdf = sel(pdf_v, jnp.zeros(nshape, jnp.float32))
    light_p = sel(lp_v, jnp.float32(RAY_MAX_T) * wi + p)
    light_n = sel(ln_v, -wi)
    valid = sel(valid_v, jnp.zeros(nshape, bool))
    t_max = sel(t_v, far_t)
    uv = sel(uv_v, jnp.zeros(nshape + (2,), jnp.float32))
    # finite shapes present but a lane is an infinite light -> fix positions
    infinite = jnp.zeros(nshape, bool)
    for t in (ShapeType.DISTANT, ShapeType.CANOPY, ShapeType.DOME):
        if has(t):
            infinite = infinite | (shape == int(t))
    if any(has(t) for t in (ShapeType.DISTANT, ShapeType.CANOPY, ShapeType.DOME)):
        light_p = jnp.where(infinite[..., None], jnp.float32(RAY_MAX_T) * wi + p, light_p)
        env = infinite & (shape != int(ShapeType.DISTANT))
        light_n = jnp.where(env[..., None], -wi, light_n)
        t_max = jnp.where(infinite, far_t, t_max)

    # env-mapped dome/canopy lights: importance-sample the emission map
    # instead of the uniform (hemi)sphere (ref shape_sampler.zig ImageImpl)
    is_env = jnp.zeros(nshape, bool)
    if scene.env is not None:
        from . import env_sampling as env_mod

        li = jnp.clip(light_idx, 0, scene.lights.count - 1)
        entry = env_mod._entry_of_light(scene.env, li)
        is_env = entry >= 0
        wi_env, pdf_env, uv_env = env_mod.sample(scene.env, entry, rot, xi)
        wi = jnp.where(is_env[..., None], wi_env, wi)
        pdf = jnp.where(is_env, pdf_env, pdf)
        uv = jnp.where(is_env[..., None], uv_env, uv)
        light_p = jnp.where(is_env[..., None], jnp.float32(RAY_MAX_T) * wi + p, light_p)
        light_n = jnp.where(is_env[..., None], -wi, light_n)
        t_max = jnp.where(is_env, far_t, t_max)
        infinite = infinite | is_env

    # volume lights (ref light.zig volumeSampleTo + cube.zig sampleVolumeTo):
    # sample an interior point, pdf = dist^2/volume (x grid-importance pdf)
    vol_mask = None
    vol_radiance = None
    has_vol = "volume" in (scene.light_shapes or {})
    if has_vol and xi3 is not None and scene.lights.volume is not None:
        li_v = jnp.clip(light_idx, 0, scene.lights.count - 1)
        is_vol = small_gather(scene.lights.volume, li_v)
        uvw_u = jnp.stack([xi[..., 0], xi[..., 1], xi3], axis=-1)
        xyz = uvw_u
        p3 = jnp.ones(nshape, jnp.float32)
        for lconst, dist in sorted((scene.vol_light_dist or {}).items()):
            x2, pd = dist.sample_continuous(uvw_u)
            m_l = light_idx == lconst
            xyz = jnp.where(m_l[..., None], x2, xyz)
            p3 = jnp.where(m_l, pd, p3)
        wp = vm.object_to_world_point(rot, scale, pos, xyz - 0.5)
        vaxis = wp - p
        sl = jnp.maximum(vm.dot(vaxis, vaxis), 1e-12)
        vt = jnp.sqrt(sl)
        vwi = vaxis / vt[..., None]
        vvol = jnp.maximum(scale[..., 0] * scale[..., 1] * scale[..., 2], 1e-20)
        vpdf = sl / vvol * p3
        # radiance = mu_a(x) * e * density(x) (ref volumetric_material
        # evaluateRadiance; lazy import avoids a scene<->render cycle)
        from ..render.materials import medium_coefficients

        mmat = small_gather(scene.prop_material, prop)
        mu_t, mu_s, _g = medium_coefficients(scene.materials, mmat)
        mu_a = jnp.maximum(mu_t - mu_s, 0.0)
        e = small_gather(scene.materials.emission, mmat)
        dens = jnp.ones(nshape, jnp.float32)
        if scene.grids is not None and scene.materials.density_grid is not None:
            from . import grids as grids_mod

            g = small_gather(scene.materials.density_grid, mmat)
            dens = jnp.where(
                g >= 0,
                grids_mod.sample_density_trilinear(
                    scene.grids, jnp.maximum(g, 0), xyz
                ),
                1.0,
            )
        vol_radiance = mu_a * e * dens[..., None]
        wi = jnp.where(is_vol[..., None], vwi, wi)
        pdf = jnp.where(is_vol, vpdf, pdf)
        light_p = jnp.where(is_vol[..., None], wp, light_p)
        light_n = jnp.where(is_vol[..., None], 0.0, light_n)
        t_max = jnp.where(is_vol, vt, t_max)
        infinite = infinite & ~is_vol
        valid = jnp.where(is_vol, vpdf > 0.0, valid)
        vol_mask = is_vol

    # portal lights (ref rectangle.zig samplePortalTo): windowed sample of
    # the baked portal-image distribution; radiance is the env map at the
    # sampled direction (uv already mapped to the dome parameterization)
    if scene.portals and "portal" in (scene.light_shapes or {}):
        from . import portal as portal_mod

        for (l_const, pp), pd in sorted(scene.portals.items()):
            prot = scene.prop_rot[pp]
            ppos = scene.prop_pos[pp]
            pscale = scene.prop_scale[pp]
            res = portal_mod.sample_to(pd, prot, ppos, pscale, p, xi)
            m_l = light_idx == l_const
            ok = m_l & res["ok"]
            wi = jnp.where(ok[..., None], res["wi"], wi)
            pdf = jnp.where(m_l, jnp.where(res["ok"], res["pdf"], 0.0), pdf)
            light_p = jnp.where(
                ok[..., None], p + res["t"][..., None] * res["wi"], light_p
            )
            light_n = jnp.where(
                ok[..., None], jnp.broadcast_to(prot[2], p.shape), light_n
            )
            t_max = jnp.where(ok, res["t"], t_max)
            uv = jnp.where(ok[..., None], res["uv"], uv)
            valid = jnp.where(m_l, res["ok"] & (res["pdf"] > 0.0), valid)
            infinite = infinite & ~m_l

    # facing the shading hemisphere unless translucent; env-sampled lanes
    # sample the full map and rely on f=0 below the horizon (keeps the NEE
    # density equal to the pdf the BSDF-hit MIS weight uses)
    front = vm.dot(wi, n) > 0.0
    valid = valid & (front | jnp.asarray(total_sphere) | is_env) & (pdf > 0.0)
    return LightSample(
        wi, jnp.where(valid, pdf, 0.0), light_p, light_n, t_max, infinite, uv,
        vol_mask, vol_radiance,
    )


def light_radiance(scene: SceneData, light_idx, wi, light_n, uv=None, vol=None):
    """Radiance emitted toward the shading point (ref light.evaluateTo):
    emission gated on facing unless two-sided; env lights (dome/canopy)
    modulate by their baked emission texture at the sampled direction;
    IES-profiled lights modulate by angle (ref emittance.zig profile) —
    the exact factor eval_radiance applies on the BSDF-hit side, keeping
    MIS consistent."""
    li = jnp.clip(light_idx, 0, scene.lights.count - 1)
    prop = small_gather(scene.lights.prop, li)
    m = small_gather(scene.prop_material, prop)
    emission = small_gather(scene.materials.emission, m)
    two_sided = small_gather(scene.materials.two_sided, m)
    if scene.mat_features and "ies" in scene.mat_features:
        from ..render.materials import eval_ies

        profile = small_gather(scene.materials.ies, m)
        emission = emission * eval_ies(profile, vm.dot(-wi, light_n))[..., None]

    if scene.textures is not None:
        from .textures import sample_bilinear

        et = small_gather(scene.materials.emission_tex, m)
        shape = small_gather(scene.prop_shape, prop)
        rot = small_gather(scene.prop_rot, prop)
        ldir = vm.safe_normalize(vm.world_to_object_normal(rot, wi))
        # dome: lat-long uv (matches shapes.build_fragment dome branch)
        phi = jnp.arctan2(ldir[..., 0], ldir[..., 2])
        dome_uv = jnp.stack(
            [phi * (0.5 / jnp.pi) + 0.5, jnp.arccos(jnp.clip(ldir[..., 1], -1, 1)) / jnp.pi],
            axis=-1,
        )
        # canopy: equidistant disk uv
        lz = jnp.clip(ldir[..., 2], -1.0, 1.0)
        r_eq = jnp.arccos(lz) * (2.0 / jnp.pi)
        lxy = jnp.sqrt(jnp.maximum(ldir[..., 0] ** 2 + ldir[..., 1] ** 2, 1e-20))
        can_uv = jnp.stack(
            [0.5 * (r_eq * ldir[..., 0] / lxy) + 0.5, 0.5 * (r_eq * ldir[..., 1] / lxy) + 0.5],
            axis=-1,
        )
        env_uv = jnp.where((shape == int(ShapeType.CANOPY))[..., None], can_uv, dome_uv)
        env = (shape == int(ShapeType.DOME)) | (shape == int(ShapeType.CANOPY))
        # finite emission-mapped lights: evaluate the emission texture at the
        # SAMPLED point's uv — exactly what eval_radiance does on the
        # BSDF-hit side, so both MIS estimators integrate the same radiance
        tex_uv = env_uv if uv is None else jnp.where(env[..., None], env_uv, uv)
        tex = sample_bilinear(scene.textures, et, tex_uv)[..., :3]
        mapped = env if uv is None else jnp.ones_like(env)
        emission = jnp.where((mapped & (et >= 0))[..., None], emission * tex, emission)

    facing = vm.dot(-wi, light_n) > 0.0
    out = jnp.where((facing | two_sided)[..., None], emission, 0.0)
    if vol is not None:
        # volume lights: interior points have no facing/normal — substitute
        # the sampled-point radiance mu_a*e*density (ref volumeSampleTo)
        vol_mask, vol_radiance = vol
        out = jnp.where(vol_mask[..., None], vol_radiance, out)
    return out


def light_hit_pdf(scene: SceneData, prop, ray_o, ray_d, hit_t, hit_p, hit_n, n_at_origin, total_sphere=False, hit_prim=None, time=None):
    """Solid-angle pdf that NEE from ray_o would have sampled this hit —
    the light side of the MIS weight for BSDF hits (ref shape pdf fns).
    Only light shape types present in the scene are evaluated.

    total_sphere: bool[N] — the previous real vertex was a volume scatter
    event, whose NEE samples env lights over the full sphere (ref
    light.zig pdf's total_sphere flag)."""
    present = _present_shapes(scene.light_shapes)
    has = lambda t: int(t) in present

    pm = jnp.maximum(prop, 0)
    shape = small_gather(scene.prop_shape, pm)
    rot = small_gather(scene.prop_rot, pm)
    pos = small_gather(scene.prop_pos, pm)
    scale = small_gather(scene.prop_scale, pm)
    rot, pos, scale = _animated_transforms(scene, pm, rot, pos, scale, time)
    r0, r1, r2 = rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]
    nshape = hit_t.shape

    vals = {}
    if has(ShapeType.RECTANGLE):
        lp_local = jnp.stack(
            [vm.dot(ray_o - pos, r0), vm.dot(ray_o - pos, r1), vm.dot(ray_o - pos, r2)], axis=-1
        )
        q = sphquad_init(scale[..., 0], scale[..., 1], lp_local)
        vals[int(ShapeType.RECTANGLE)] = sphquad_pdf(q, lp_local, scale[..., 0], scale[..., 1])

    if has(ShapeType.SPHERE):
        v = pos - ray_o
        l2 = jnp.maximum(vm.dot(v, v), 1e-20)
        r = 0.5 * scale[..., 0]
        sin2_max = jnp.clip((r * r) / l2, 0.0, 0.9999)
        one_minus_cos = jnp.where(
            sin2_max < 0.00068523, 0.5 * sin2_max, 1.0 - jnp.sqrt(1.0 - sin2_max)
        )
        vals[int(ShapeType.SPHERE)] = 1.0 / jnp.maximum(2.0 * jnp.pi * one_minus_cos, 1e-20)

    if has(ShapeType.DISK):
        sl = jnp.maximum(hit_t * hit_t, 1e-20)
        c = jnp.abs(vm.dot(hit_n, ray_d))
        dk_area = jnp.pi * (0.5 * scale[..., 0]) ** 2
        vals[int(ShapeType.DISK)] = sl / jnp.maximum(c * dk_area, 1e-20)

    if has(ShapeType.DISTANT):
        ds_radius = scale[..., 0]
        ds_solid = (2.0 * jnp.pi) * (1.0 - jnp.sqrt(1.0 / (ds_radius * ds_radius + 1.0)))
        vals[int(ShapeType.DISTANT)] = 1.0 / jnp.maximum(ds_solid, 1e-20)

    if has(ShapeType.CANOPY):
        vals[int(ShapeType.CANOPY)] = jnp.full(nshape, 1.0 / (2.0 * jnp.pi), jnp.float32)
    if has(ShapeType.DOME):
        ts = jnp.broadcast_to(jnp.asarray(total_sphere), nshape)
        vals[int(ShapeType.DOME)] = jnp.where(ts, 1.0 / (4.0 * jnp.pi), 1.0 / (2.0 * jnp.pi))

    if has(ShapeType.TRIANGLE_MESH) and scene.lights.area is not None:
        li = small_gather(scene.prop_light, pm)
        area = small_gather(scene.lights.area, jnp.clip(li, 0, scene.lights.count - 1))
        sl = jnp.maximum(hit_t * hit_t, 1e-20)
        c = jnp.abs(vm.dot(hit_n, ray_d))
        if scene.mesh_light_trees and hit_prim is not None:
            # primitive-tree lights: NEE picked the hit TRIANGLE with the
            # tree's descent pdf — the MIS density must match exactly
            # (effective area = tri_area / p_select, same fold as the
            # sample side)
            from . import light_tree as lt_mod

            ts_b = jnp.broadcast_to(jnp.asarray(total_sphere), hit_t.shape)
            for (l_const, base), (tr, aux) in sorted(
                scene.mesh_light_trees.items()
            ):
                lof = aux["local_of"]
                loc = lof[jnp.clip(hit_prim - base, 0, lof.shape[0] - 1)]
                okl = (li == l_const) & (hit_prim >= base) & (loc >= 0)
                psel = lt_mod.pdf(
                    tr, ray_o, n_at_origin, ts_b, jnp.maximum(loc, 0)
                )
                area_t = aux["area"][jnp.maximum(loc, 0)]
                area = jnp.where(
                    okl, area_t / jnp.maximum(psel, 1e-20), area
                )
        vals[int(ShapeType.TRIANGLE_MESH)] = jnp.where(
            area > 0.0, sl / jnp.maximum(c * area, 1e-20), 0.0
        )

    out = None
    for st, val in vals.items():
        out = val if out is None else jnp.where(shape == st, val, out)
    if out is None:
        out = jnp.zeros(nshape, jnp.float32)
    # env-mapped dome/canopy: the NEE strategy is the emission-map alias
    # table, so the MIS pdf must be the map's density at this direction
    if scene.env is not None:
        from . import env_sampling as env_mod

        li = small_gather(scene.prop_light, pm)
        entry = env_mod._entry_of_light(scene.env, li)
        p_env = env_mod.pdf(scene.env, li, rot, ray_d)
        out = jnp.where(entry >= 0, p_env, out)
    # portal lights: the NEE strategy is the windowed portal-image
    # distribution — the hit-side MIS pdf must match it exactly
    # (ref light.zig propPortalPdf)
    if scene.portals and "portal" in (scene.light_shapes or {}):
        from . import portal as portal_mod

        for (_l_const, pp), pd in sorted(scene.portals.items()):
            prot = scene.prop_rot[pp]
            ppos = scene.prop_pos[pp]
            pscale = scene.prop_scale[pp]
            p_port = portal_mod.pdf_to(pd, prot, ppos, pscale, ray_o, ray_d)
            out = jnp.where(prop == pp, p_port, out)
    # shapes NEE can't sample (cube emitters) contribute pdf 0 -> MIS weight 1
    unsupported = shape == int(ShapeType.CUBE)
    return jnp.where(unsupported, 0.0, out)
