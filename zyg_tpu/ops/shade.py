"""Fused full-bounce shade kernel for analytic substitute/light scenes.

The Cornell-class wavefront bounce (ref pathtracer_mis.zig vertex loop:
intersect -> connectLight -> sampleLights -> BSDF sample) compiles on XLA
to ~190 fusion kernels with ~2.4 GB of [N](,3) HBM tuple intermediates per
iteration (compiled-HLO audit, round 4) — an elementwise floor of ~27 ms at
2M lanes that many small VPU kernels cannot beat. This kernel runs the
ENTIRE bounce in registers over lane tiles:

  closest-hit over the analytic props (SMEM param rows, the ops/isect.py
  snippets) -> fragment -> BSDF-hit emission with MIS (sphquad light pdf,
  ref rectangle.zig SphQuad) -> russian roulette -> NEE (Urena spherical
  rectangle sample + substitute BSDF eval + predivided power heuristic +
  in-kernel shadow any-hit) -> substitute BSDF sample (VNDF + cosine
  lobes, dspbr energy compensation fits) -> PathState merge.

Traffic per iteration = read ~35 + write ~29 lane rows (~530 MB at 2M
lanes) instead of 2.4 GB across 190 dispatches.

Applicability (static, `make_fused_body` returns None otherwise): analytic
rect/cube/sphere/disk props only, rectangle lights, empty mat_features
(substitute/light materials, no textures/media/coating/...), no light
tree/env/portals, no photon map, no AOVs, no splitting/regularization.
Scenes outside this class keep the general XLA body (integrator/ptmis.py),
which remains the semantic reference: every formula here mirrors it 1:1
(materials.py, light_sampling.py, shapes.py) — divergence is float-level
only (Mosaic lowers sin/cos/rsqrt differently; arccos is an A&S 4.4.45
polynomial because Mosaic has no acos, |err| < 5e-7).

ref: src/core/rendering/integrator/surface/pathtracer_mis.zig,
src/core/scene/material/substitute/substitute_sample.zig,
src/core/scene/shape/rectangle.zig (SphQuad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import use_pallas
from .isect import _prop_hit, _static_layout

_FAR = 3.0e37
_RAY_MAX_T = 2.14748313e9
_LANE_TILE = 8192
_PI = 3.14159265358979
_DOT_MIN = 0.00001

# ptab row layout (one row per analytic prop, material columns joined in):
# 0:9 rot row-major | 9:12 pos | 12:15 scale | 15 vis_cam | 16 vis_refl |
# 17 vis_shadow | 18 mat kind | 19:22 albedo | 22 alpha | 23 metallic |
# 24:27 f0 | 27 specular | 28:31 emission | 31 two_sided | 32 light_id |
# 33 light_select_pdf
_PTAB_W = 34
# ltab row layout (one row per light, its prop geometry joined in):
# 0 cdf[l+1] | 1 select_pdf | 2:11 rot | 11:14 pos | 14:16 scale.xy |
# 16:19 emission | 19 two_sided
_LTAB_W = 20

_MIN_ROUGHNESS = 0.01314  # ref ggx.zig MinRoughness (materials.py)


# ---------------------------------------------------------------------------
# component-form vector math ((1,T) scalars; [T,3] arrays tile terribly)
# ---------------------------------------------------------------------------


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vneg(a):
    return (-a[0], -a[1], -a[2])


def _vwhere(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _vnormalize(a, eps=1e-20):
    l = jnp.sqrt(jnp.maximum(_vdot(a, a), 0.0))
    inv = 1.0 / jnp.maximum(l, eps)
    return _vscale(a, inv)


def _vlength(a):
    return jnp.sqrt(jnp.maximum(_vdot(a, a), 0.0))


def _vmax(a):
    return jnp.maximum(jnp.maximum(a[0], a[1]), a[2])


def _clampf(x, lo=1e-5):
    return jnp.maximum(x, lo)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


# Abramowitz & Stegun 4.4.45 arccos (|err| <= 5e-7 over [-1,1]; Mosaic has
# no acos/atan2 lowering — probed on v5e, round 4)
_ACOS_C = (
    1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
    0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911,
)


def _acos(x):
    ax = jnp.abs(x)
    p = jnp.float32(_ACOS_C[7])
    for c in _ACOS_C[6::-1]:
        p = p * ax + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0.0, jnp.float32(_PI) - r, r)


def _onb(n):
    """Duff et al. branch-free ONB (mirrors vm.orthonormal_basis)."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    bt = (b, sign + ny * ny * a, -ny)
    return t, bt


def _offset1(p, n):
    """One component of shapes.offset_ray (int-bit nudge)."""
    of_i = (256.0 * n).astype(jnp.int32)
    p_i = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_in = jax.lax.bitcast_convert_type(p_i - of_i, jnp.float32)
    p_ip = jax.lax.bitcast_convert_type(p_i + of_i, jnp.float32)
    p_adj = jnp.where(p < 0.0, p_in, p_ip)
    mad = (1.0 / 65536.0) * n + p
    return jnp.where(jnp.abs(p) < (1.0 / 32.0), mad, p_adj)


def _offset_ray(p, n):
    return tuple(_offset1(pc, nc) for pc, nc in zip(p, n))


def _power_heuristic(f_pdf, g_pdf):
    f2 = f_pdf * f_pdf
    return f2 / jnp.maximum(g_pdf * g_pdf + f2, 1e-20)


def _predivided_power_heuristic(f_pdf, g_pdf):
    f2 = f_pdf * f_pdf
    return f_pdf / jnp.maximum(g_pdf * g_pdf + f2, 1e-20)


# ---------------------------------------------------------------------------
# substitute BSDF (mirrors materials._substitute_lobes/_eval/_sample, the
# plain-feature path; the energy fits are the SAME Horner chains — the
# materials.py eval_e_* functions are pure jnp and lower under Mosaic)
# ---------------------------------------------------------------------------


def _schlick1(f0, cos):
    return f0 + (1.0 - f0) * _pow5(jnp.maximum(1.0 - cos, 0.0))


def _substitute_lobes(mat, wo, wi, ns):
    """(f*cos (3-tuple), pdf, dw) — materials._substitute_lobes 1:1."""
    from ..render import materials as M

    alpha = mat["alpha"]
    a2 = alpha * alpha
    f0 = mat["f0"]
    albedo = mat["albedo"]
    f0m = _vmax(f0)
    am = _vmax(albedo)

    n_dot_wi = _clampf(_vdot(ns, wi))
    n_dot_wo = _clampf(jnp.abs(_vdot(ns, wo)))
    h = _vnormalize(_vadd(wo, wi))
    wo_dot_h = _clampf(_vdot(wo, h))
    n_dot_h = jnp.clip(_vdot(ns, h), 0.0, 1.0)

    e_wo = M.eval_e_s(f0m, alpha, n_dot_wo)
    e_wi = M.eval_e_s(f0m, alpha, n_dot_wi)
    e_avg = M.eval_e_s_avg(f0m, alpha)
    inv_pi_1me = 1.0 / jnp.maximum(_PI * (1.0 - e_avg), 1e-6)
    d_scal = (1.0 - e_wo) * (1.0 - e_wi) * inv_pi_1me
    d_refl = _vscale(albedo, d_scal)
    d_pdf = n_dot_wi * (1.0 / _PI)
    bsel = am * inv_pi_1me
    dw = bsel / jnp.maximum(e_avg + bsel, 1e-12)
    dw = jnp.where(mat["metallic"] >= 1.0, 0.0, dw)

    d_ggx = a2 / jnp.maximum(
        _PI * (n_dot_h * n_dot_h * (a2 - 1.0) + 1.0) ** 2, 1e-20
    )
    t_wi = jnp.sqrt((1.0 - a2) * n_dot_wi * n_dot_wi + a2)
    t_wo = jnp.sqrt((1.0 - a2) * n_dot_wo * n_dot_wo + a2)
    vis = 0.5 / jnp.maximum(n_dot_wi * t_wo + n_dot_wo * t_wi, 1e-20)
    g1_denom = t_wo + n_dot_wo
    fr = tuple(_schlick1(c, wo_dot_h) for c in f0)
    gg_refl = tuple(d_ggx * vis * c for c in fr)
    gg_pdf = (0.5 * d_ggx) / jnp.maximum(g1_denom, 1e-20)

    # dspbr multi-scatter compensation (materials._dspbr_micro_ec)
    em_wo = M.eval_e_m(alpha, n_dot_wo)
    em_wi = M.eval_e_m(alpha, n_dot_wi)
    em_avg = M.eval_e_m_avg(alpha)
    mm = ((1.0 - em_wo) * (1.0 - em_wi)) / jnp.maximum(
        _PI * (1.0 - em_avg), 1e-6
    )
    mms = []
    for c in f0:
        f_avg = (20.0 / 21.0) * c + (1.0 / 21.0)
        fc = (f_avg * f_avg * em_avg) / jnp.maximum(
            1.0 - f_avg * (1.0 - em_avg), 1e-6
        )
        mms.append(mm * fc)

    s = mat["specular"]
    f_total = tuple(
        n_dot_wi * (dr + s * (gg + ms))
        for dr, gg, ms in zip(d_refl, gg_refl, mms)
    )
    pdf = dw * d_pdf + (1.0 - dw) * gg_pdf
    return f_total, pdf, dw


def _substitute_eval(mat, wo, wi, n, geo_n):
    """materials._substitute_eval, plain features."""
    same_side = _vdot(wo, geo_n) > 0.0
    ns = _vwhere(same_side, n, _vneg(n))
    refl_side = _vdot(wi, ns) > 0.0
    f, pdf, _ = _substitute_lobes(mat, wo, wi, ns)
    zero = jnp.zeros_like(pdf)
    f = tuple(jnp.where(refl_side, c, 0.0) for c in f)
    return f, jnp.where(refl_side, pdf, zero)


def _vndf_sample(wo_l, alpha, xi0, xi1):
    v = _vnormalize((alpha * wo_l[0], alpha * wo_l[1], wo_l[2]))
    phi = (2.0 * _PI) * xi0
    z = (1.0 - xi1) * (1.0 + v[2]) - v[2]
    st = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    h = (st * jnp.cos(phi) + v[0], st * jnp.sin(phi) + v[1], z + v[2])
    return _vnormalize((alpha * h[0], alpha * h[1], h[2]))


def _substitute_sample(mat, wo, n, geo_n, p_lobe, xi0, xi1):
    """materials._substitute_sample, plain-feature fast path. Returns
    (wi, weight(3), pdf, ok, reg_a)."""
    from ..render import materials as M

    same_side = _vdot(wo, geo_n) > 0.0
    ns = _vwhere(same_side, n, _vneg(n))
    t, b = _onb(ns)

    # cosine hemisphere (vm.sample_hemisphere_cosine) -> world
    r = jnp.sqrt(xi0)
    phi = (2.0 * _PI) * xi1
    dlx = r * jnp.cos(phi)
    dly = r * jnp.sin(phi)
    dlz = jnp.sqrt(jnp.maximum(1.0 - xi0, 0.0))
    wi_diffuse = _vadd(_vadd(_vscale(t, dlx), _vscale(b, dly)), _vscale(ns, dlz))

    wo_l = (_vdot(wo, t), _vdot(wo, b), _vdot(wo, ns))
    m_l = _vndf_sample(wo_l, mat["alpha"], xi0, xi1)
    h = _vadd(_vadd(_vscale(t, m_l[0]), _vscale(b, m_l[1])), _vscale(ns, m_l[2]))
    wo_dot_h = _clampf(_vdot(wo, h))
    wi_gloss = _vnormalize(_vsub(_vscale(h, 2.0 * wo_dot_h), wo))

    f0m = _vmax(mat["f0"])
    am = _vmax(mat["albedo"])
    e_avg = M.eval_e_s_avg(f0m, mat["alpha"])
    bsel = am / jnp.maximum(_PI * (1.0 - e_avg), 1e-6)
    dw = bsel / jnp.maximum(e_avg + bsel, 1e-12)
    dw = jnp.where(mat["metallic"] >= 1.0, 0.0, dw)

    take_diffuse = p_lobe < dw
    wi = _vwhere(take_diffuse, wi_diffuse, wi_gloss)
    reg_a = jnp.where(take_diffuse, 1.0, mat["alpha"])

    f, pdf, _ = _substitute_lobes(mat, wo, wi, ns)
    ok = (_vdot(wi, ns) > 0.0) & (pdf > 1e-10)
    inv_pdf = 1.0 / jnp.maximum(pdf, 1e-10)
    weight = tuple(jnp.where(ok, c * inv_pdf, 0.0) for c in f)
    return wi, weight, pdf, ok, reg_a


# ---------------------------------------------------------------------------
# Urena spherical rectangle (light_sampling.sphquad_* 1:1, acos -> _acos)
# ---------------------------------------------------------------------------


def _sphquad_init(scale_x, scale_y, ol):
    ox, oy, oz = ol
    x0 = -0.5 * scale_x - ox
    y0 = -0.5 * scale_y - oy
    z0 = -oz
    z_sign = jnp.where(z0 > 0.0, -1.0, 1.0)
    z0 = jnp.where(z0 > 0.0, -z0, z0)
    x1 = x0 + scale_x
    y1 = y0 + scale_y
    v00 = (x0, y0, z0)
    v01 = (x0, y1, z0)
    v10 = (x1, y0, z0)
    v11 = (x1, y1, z0)
    n0 = _vnormalize(_vcross(v00, v10))
    n1 = _vnormalize(_vcross(v10, v11))
    n2 = _vnormalize(_vcross(v11, v01))
    n3 = _vnormalize(_vcross(v01, v00))
    g0 = _acos(jnp.clip(-_vdot(n0, n1), -1.0, 1.0))
    g1 = _acos(jnp.clip(-_vdot(n1, n2), -1.0, 1.0))
    g2 = _acos(jnp.clip(-_vdot(n2, n3), -1.0, 1.0))
    g3 = _acos(jnp.clip(-_vdot(n3, n0), -1.0, 1.0))
    b0 = n0[2]
    b1 = n2[2]
    k = 2.0 * _PI - g2 - g3
    S = g0 + g1 - k
    return {"x0": x0, "y0": y0, "x1": x1, "y1": y1, "z0": z0,
            "b0": b0, "b1": b1, "k": k, "S": S}


def _sphquad_sample(q, u, v):
    au = u * q["S"] + q["k"]
    sau = jnp.sin(au)
    fu = (jnp.cos(au) * q["b0"] - q["b1"]) / jnp.maximum(
        jnp.abs(sau), 1e-12
    ) * jnp.sign(sau)
    cu = jnp.where(fu > 0.0, 1.0, -1.0) / jnp.sqrt(fu * fu + q["b0"] * q["b0"])
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * q["z0"]) / jnp.sqrt(jnp.maximum(1.0 - cu * cu, 1e-12))
    xu = jnp.clip(xu, q["x0"], q["x1"])
    d = jnp.sqrt(xu * xu + q["z0"] * q["z0"])
    h0 = q["y0"] / jnp.sqrt(d * d + q["y0"] * q["y0"])
    h1 = q["y1"] / jnp.sqrt(d * d + q["y1"] * q["y1"])
    hv = h0 + v * (h1 - h0)
    hv2 = hv * hv
    eps = 9.5367431640625e-7
    yv = jnp.where(
        hv2 < 1.0 - eps, (hv * d) / jnp.sqrt(jnp.maximum(1.0 - hv2, eps)), q["y1"]
    )
    return xu, yv


def _sphquad_pdf(q, ol, scale_x, scale_y):
    sqr_dist = _vdot(ol, ol)
    area = scale_x * scale_y
    numer = area * jnp.abs(ol[2])
    denom = sqr_dist * jnp.sqrt(sqr_dist)
    stable = numer > denom * _DOT_MIN
    inv_s = 1.0 / jnp.maximum(q["S"], 1e-12)
    return jnp.where(stable, inv_s, denom / jnp.maximum(numer, 1e-20))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _row_sel(tab, slot, col, P):
    """Per-lane select-chain gather of tab[slot, col] (slot: (1,T) i32)."""
    v = jnp.full(slot.shape, tab[0, col])
    for p in range(1, P):
        v = jnp.where(slot == p, tab[p, col], v)
    return v


def _make_kernel(kinds, L: int, max_depth: int, caustics: bool,
                 nee_only: bool):
    P = len(kinds)
    SUBSTITUTE = 0  # MaterialKind values (scene/types.py)
    rect_slots = [i for i, k in enumerate(kinds) if k == "rectangle"]
    cube_slots = [i for i, k in enumerate(kinds) if k == "cube"]
    sphere_slots = [i for i, k in enumerate(kinds) if k == "sphere"]
    disk_slots = [i for i, k in enumerate(kinds) if k == "disk"]

    def kernel(ptab, ltab, *refs):
        ins = refs[:35]
        outs = refs[35:]
        o = (ins[0][:, :], ins[1][:, :], ins[2][:, :])
        d = (ins[3][:, :], ins[4][:, :], ins[5][:, :])
        thr0 = (ins[6][:, :], ins[7][:, :], ins[8][:, :])
        alive = ins[9][:, :] > 0.5
        bxdf_pdf_in = ins[10][:, :]
        singular = ins[11][:, :] > 0.5
        depth = ins[12][:, :]  # int32
        mis_o = (ins[13][:, :], ins[14][:, :], ins[15][:, :])
        mis_n_in = (ins[16][:, :], ins[17][:, :], ins[18][:, :])
        res_em = (ins[19][:, :], ins[20][:, :], ins[21][:, :])
        res_di = (ins[22][:, :], ins[23][:, :], ins[24][:, :])
        res_in = (ins[25][:, :], ins[26][:, :], ins[27][:, :])
        u_rr = ins[28][:, :]
        u_sel = ins[29][:, :]
        xl0, xl1 = ins[30][:, :], ins[31][:, :]
        s0, s1, s2 = ins[32][:, :], ins[33][:, :], ins[34][:, :]
        wo = _vneg(d)
        primary = depth == 0

        # ---- closest hit over the SMEM prop rows (ops/isect snippets)
        tmin = jnp.float32(0.0)
        tmax = jnp.where(alive, jnp.float32(_RAY_MAX_T), 0.0)
        prim_f = jnp.where(primary, 1.0, 0.0)
        t_b = jnp.full_like(u_rr, _FAR)
        slot_b = jnp.full(u_rr.shape, -1, jnp.int32)
        for p, kind in enumerate(kinds):
            t, _u, _v, hit = _prop_hit(
                kind, ptab, p, o[0], o[1], o[2], d[0], d[1], d[2], tmin, tmax
            )
            lane_vis = jnp.where(prim_f > 0.5, ptab[p, 15], ptab[p, 16]) > 0.5
            hit = hit & lane_vis
            closer = hit & (t < t_b)
            t_b = jnp.where(closer, t, t_b)
            slot_b = jnp.where(closer, jnp.int32(p), slot_b)
        valid = slot_b >= 0
        slot = jnp.maximum(slot_b, 0)

        # ---- per-lane prop/material params (select chains over P rows)
        g = lambda c: _row_sel(ptab, slot, c, P)
        r0 = (g(0), g(1), g(2))
        r1 = (g(3), g(4), g(5))
        r2 = (g(6), g(7), g(8))
        pos = (g(9), g(10), g(11))
        scl = (g(12), g(13), g(14))
        kind_m = g(18)
        mat = {
            "albedo": (g(19), g(20), g(21)),
            "alpha": g(22),
            "metallic": g(23),
            "f0": (g(24), g(25), g(26)),
            "specular": g(27),
        }
        emission = (g(28), g(29), g(30))
        two_sided = g(31) > 0.5
        light_id = jnp.where(valid, g(32).astype(jnp.int32), -1)
        hit_sel_pdf = g(33)

        # ---- fragment (shapes.build_fragment, analytic branches)
        p_hit = _vadd(o, _vscale(d, t_b))
        geo_n = r2  # rectangle/disk
        if cube_slots:
            lp = _vsub(p_hit, pos)
            lx = _vdot(lp, r0) / scl[0]
            ly = _vdot(lp, r1) / scl[1]
            lz = _vdot(lp, r2) / scl[2]
            ax = 0.5 - jnp.abs(lx)
            ay = 0.5 - jnp.abs(ly)
            az = 0.5 - jnp.abs(lz)
            use_x = (ax <= ay) & (ax <= az)
            use_y = (~use_x) & (ay <= az)
            face_n = _vwhere(use_x, r0, _vwhere(use_y, r1, r2))
            comp = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
            cube_n = _vscale(face_n, jnp.sign(comp))
            is_cube = slot == cube_slots[0]
            for cs in cube_slots[1:]:
                is_cube = is_cube | (slot == cs)
            geo_n = _vwhere(is_cube, cube_n, geo_n)
        if sphere_slots:
            sph_n = _vnormalize(_vsub(p_hit, pos))
            is_sph = slot == sphere_slots[0]
            for cs in sphere_slots[1:]:
                is_sph = is_sph | (slot == cs)
            geo_n = _vwhere(is_sph, sph_n, geo_n)
        frag_n = geo_n  # analytic shapes: shading normal == geometric

        # ---- connectLight: BSDF-hit emission with MIS
        facing = _vdot(wo, geo_n) > 0.0
        em_vis = valid & (facing | two_sided)
        em = tuple(jnp.where(em_vis, c, 0.0) for c in emission)
        is_light = light_id >= 0
        if not nee_only:
            # light_hit_pdf: sphquad of the HIT rect from the last real
            # vertex (cube emitters: pdf 0 -> MIS weight 1)
            olh = (
                _vdot(_vsub(mis_o, pos), r0),
                _vdot(_vsub(mis_o, pos), r1),
                _vdot(_vsub(mis_o, pos), r2),
            )
            qh = _sphquad_init(scl[0], scl[1], olh)
            lp_rect = _sphquad_pdf(qh, olh, scl[0], scl[1])
            is_rect = jnp.zeros(u_rr.shape, bool)
            for rs in rect_slots:
                is_rect = is_rect | (slot == rs)
            lp = jnp.where(is_rect, lp_rect, 0.0) * hit_sel_pdf
            mis_w = jnp.where(
                singular | ~is_light, 1.0, _power_heuristic(bxdf_pdf_in, lp)
            )
            if not caustics:
                mis_w = jnp.where(
                    singular & (depth > 0) & is_light, 0.0, mis_w
                )
        else:
            mis_w = jnp.where(
                singular, 1.0, jnp.where(is_light, 0.0, 1.0)
            )
        is_em = primary
        to_dir = singular | (depth < 2)
        add_em = jnp.where(alive & is_em, mis_w, 0.0)
        add_di = jnp.where(alive & ~is_em & to_dir, mis_w, 0.0)
        add_in = jnp.where(alive & ~is_em & ~to_dir, mis_w, 0.0)
        res_em = _vadd(res_em, tuple(t * add_em * c for t, c in zip(thr0, em)))
        res_di = _vadd(res_di, tuple(t * add_di * c for t, c in zip(thr0, em)))
        res_in = _vadd(res_in, tuple(t * add_in * c for t, c in zip(thr0, em)))

        # ---- continuation + russian roulette
        cont = alive & valid & (depth < max_depth)
        mx = _vmax(thr0)
        p_rr = mx / 0.1
        kill = (p_rr < 1.0) & (u_rr >= p_rr)
        rr_scale = jnp.where(p_rr < 1.0, 1.0 / jnp.maximum(p_rr, 1e-12), 1.0)
        rr_mul = jnp.where(kill, 0.0, rr_scale)
        thr = tuple(c * rr_mul for c in thr0)
        cont = cont & ~kill

        # ---- NEE: select light by power CDF, Urena sphquad sample
        is_sub = kind_m == SUBSTITUTE
        can_nee = cont & is_sub
        lidx = jnp.zeros(u_rr.shape, jnp.int32)
        for l in range(L - 1):
            lidx = lidx + (u_sel >= ltab[l, 0]).astype(jnp.int32)
        gl = lambda c: _row_sel(ltab, lidx, c, L)
        sel_pdf = gl(1)
        lr0 = (gl(2), gl(3), gl(4))
        lr1 = (gl(5), gl(6), gl(7))
        lr2 = (gl(8), gl(9), gl(10))
        lpos = (gl(11), gl(12), gl(13))
        lsx, lsy = gl(14), gl(15)
        lem = (gl(16), gl(17), gl(18))
        l2s = gl(19) > 0.5

        dl = _vsub(p_hit, lpos)
        ol = (_vdot(dl, lr0), _vdot(dl, lr1), _vdot(dl, lr2))
        q = _sphquad_init(lsx, lsy, ol)
        xu, yv = _sphquad_sample(q, xl0, xl1)
        rect_p = _vadd(
            _vadd(lpos, _vscale(lr0, ol[0] + xu)), _vscale(lr1, ol[1] + yv)
        )
        axis = _vsub(rect_p, p_hit)
        rect_t = _vlength(axis)
        wi_n = _vscale(axis, 1.0 / jnp.maximum(rect_t, 1e-20))
        pdf_l = _sphquad_pdf(q, ol, lsx, lsy)
        valid_l = (
            (q["S"] > 1e-7) & (_vdot(wi_n, geo_n) > 0.0) & (pdf_l > 0.0)
        )
        pdf_l = jnp.where(valid_l, pdf_l, 0.0)
        l_facing = _vdot(_vneg(wi_n), lr2) > 0.0
        radiance = tuple(jnp.where(l_facing | l2s, c, 0.0) for c in lem)

        f_nee, bpdf = _substitute_eval(mat, wo, wi_n, frag_n, geo_n)
        f_nee = tuple(jnp.where(is_sub, c, 0.0) for c in f_nee)
        bpdf = jnp.where(is_sub, bpdf, 0.0)
        light_pdf = pdf_l * sel_pdf
        w_mis = _predivided_power_heuristic(light_pdf, bpdf)

        sh_side = _vdot(wi_n, geo_n) >= 0.0
        sh_n = _vwhere(sh_side, geo_n, _vneg(geo_n))
        shadow_o = _offset_ray(p_hit, sh_n)
        lp_off = _offset_ray(rect_p, lr2)
        sh_axis = _vsub(lp_off, shadow_o)
        slen = _vlength(sh_axis)
        sdir = _vscale(sh_axis, 1.0 / jnp.maximum(slen, 1e-20))
        nee_active = (
            can_nee & (sel_pdf > 0.0) & (pdf_l > 0.0) & (_vmax(f_nee) > 0.0)
        )
        shadow_tmax = jnp.where(nee_active, slen, 0.0)
        blocked = jnp.zeros(u_rr.shape, jnp.int32)
        for p, kind in enumerate(kinds):
            _t, _u, _v, hit = _prop_hit(
                kind, ptab, p, shadow_o[0], shadow_o[1], shadow_o[2],
                sdir[0], sdir[1], sdir[2], tmin, shadow_tmax,
            )
            blocked = blocked | (hit & (ptab[p, 17] > 0.5)).astype(jnp.int32)
        nee_ok = nee_active & (blocked == 0)
        nee = tuple(
            jnp.where(nee_ok, t * r * f * w_mis, 0.0)
            for t, r, f in zip(thr, radiance, f_nee)
        )
        nee_dir = depth < 1
        res_di = _vadd(res_di, _vwhere(nee_dir, nee, (0.0, 0.0, 0.0)))
        res_in = _vadd(res_in, _vwhere(nee_dir, (0.0, 0.0, 0.0), nee))

        # ---- BSDF sample + PathState merge
        wi_s, weight, pdf_s, ok_s, reg_a = _substitute_sample(
            mat, wo, frag_n, geo_n, s0, s1, s2
        )
        valid_s = ok_s & is_sub
        cont = cont & valid_s
        thr_out = tuple(
            t * jnp.where(valid_s, w, 0.0) for t, w in zip(thr, weight)
        )
        bxdf_pdf_out = jnp.where(valid_s, pdf_s, 0.0)
        b_side = _vdot(wi_s, geo_n) >= 0.0
        b_n = _vwhere(b_side, geo_n, _vneg(geo_n))
        new_o = _offset_ray(p_hit, b_n)
        o_out = _vwhere(cont, new_o, o)
        d_out = _vwhere(cont, wi_s, d)
        depth_out = jnp.where(cont, depth + 1, depth)
        mis_o_out = _vwhere(cont, new_o, mis_o)
        mis_n_out = _vwhere(cont, frag_n, mis_n_in)

        for i in range(3):
            outs[0 + i][:, :] = o_out[i]
            outs[3 + i][:, :] = d_out[i]
            outs[6 + i][:, :] = thr_out[i]
            outs[12 + i][:, :] = mis_o_out[i]
            outs[15 + i][:, :] = mis_n_out[i]
            outs[19 + i][:, :] = res_em[i]
            outs[22 + i][:, :] = res_di[i]
            outs[25 + i][:, :] = res_in[i]
        outs[9][:, :] = jnp.where(cont, 1.0, 0.0)
        outs[10][:, :] = bxdf_pdf_out
        outs[11][:, :] = depth_out
        outs[18][:, :] = reg_a  # bs.reg_alpha (unmasked, like BsdfSample)
        outs[28][:, :] = jnp.where(nee_active, 1.0, 0.0)

    return kernel


def _run(kinds, ptab, ltab, lane_rows, max_depth, caustics, nee_only,
         interpret=False):
    n = lane_rows[0].shape[0]
    tile = min(_LANE_TILE, -(-max(n, 1) // 128) * 128)
    np_pad = ((n + tile - 1) // tile) * tile
    grid = np_pad // tile

    def row(x):
        if np_pad != n:
            x = jnp.concatenate([x, jnp.zeros(np_pad - n, x.dtype)])
        return x.reshape(1, np_pad)

    ins = [ptab, ltab] + [row(x) for x in lane_rows]
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    lane = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct((1, np_pad), f32)] * 11 + [
        jax.ShapeDtypeStruct((1, np_pad), jnp.int32)
    ] + [jax.ShapeDtypeStruct((1, np_pad), f32)] * 17
    outs = pl.pallas_call(
        _make_kernel(kinds, ltab.shape[0], max_depth, caustics, nee_only),
        grid=(grid,),
        in_specs=[smem(ptab.shape), smem(ltab.shape)] + [lane] * 35,
        out_specs=[lane] * 29,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return [x[0, :n] for x in outs]


# ---------------------------------------------------------------------------
# applicability + table packing + the fused body
# ---------------------------------------------------------------------------

_SUPPORTED_KINDS = {"rectangle", "cube", "sphere", "disk"}


def applies(scene, settings, photon_map) -> bool:
    """Static check: can this scene/settings run the fused bounce?"""
    return use_pallas() and structural_ok(scene, settings, photon_map)


def structural_ok(scene, settings, photon_map) -> bool:
    """Backend-independent applicability (tests force interpret mode)."""
    from ..scene.types import ShapeType

    if photon_map is not None:
        return False
    if settings.collect_aovs or settings.light_split_depth > 0:
        return False
    if settings.regularize_roughness > 0.0:
        return False
    # the empty-features gate below also disarms BSDF splitting: the
    # integrator only splits at glass vertices (ptmis._split_enabled)
    if scene.mat_features is None or len(scene.mat_features) > 0:
        return False
    if scene.textures is not None or scene.meshes is not None:
        return False
    if scene.curves is not None or scene.points is not None:
        return False
    if scene.animated_props or scene.light_tree is not None:
        return False
    if scene.env is not None or scene.portals:
        return False
    if scene.lights.count < 1 or scene.lights.count > 8:
        return False
    # every light must be a rectangle (static light_shapes keys)
    shapes_present = {
        int(str(k)) for k in (scene.light_shapes or {}) if str(k).isdigit()
    }
    if shapes_present != {int(ShapeType.RECTANGLE)}:
        return False
    if set(scene.light_shapes or {}) - {str(int(ShapeType.RECTANGLE)), int(ShapeType.RECTANGLE)}:
        return False  # "volume"/"portal" entries
    lay = _static_layout(scene, scene.prop_groups or {})
    if lay is None:
        return False
    kinds, _ids = lay
    if not set(kinds) <= _SUPPORTED_KINDS or len(kinds) > 32:
        return False
    return True


def _pack_tables(scene):
    """(kinds, ptab [P,34], ltab [L,20]) — see module docstring layout."""
    kinds, ids = _static_layout(scene, scene.prop_groups or {})
    f32 = jnp.float32
    P = ids.shape[0]
    m = jnp.maximum(scene.prop_material[ids], 0)
    mats = scene.materials
    rough = jnp.maximum(mats.roughness[m], _MIN_ROUGHNESS)
    metallic = mats.metallic[m]
    color = mats.color[m]
    ior = mats.ior[m]
    t = (ior - 1.0) / (ior + 1.0)
    f0s = t * t
    f0 = f0s[:, None] * (1.0 - metallic[:, None]) + color * metallic[:, None]
    albedo = (1.0 - metallic[:, None]) * color
    li = scene.prop_light[ids]
    lc = jnp.clip(li, 0, scene.lights.count - 1)
    cdf = scene.lights.cdf
    selpdf = cdf[lc + 1] - cdf[lc]
    col1 = lambda x: x.astype(f32).reshape(P, 1)
    ptab = jnp.concatenate(
        [
            scene.prop_rot[ids].reshape(P, 9),
            scene.prop_pos[ids],
            scene.prop_scale[ids],
            col1(scene.prop_visible_camera[ids]),
            col1(scene.prop_visible_reflection[ids]),
            col1(scene.prop_visible_shadow[ids]),
            col1(mats.kind[m]),
            albedo,
            col1(rough * rough),
            col1(metallic),
            f0,
            col1(mats.specular[m]),
            mats.emission[m],
            col1(mats.two_sided[m]),
            col1(li),
            col1(selpdf),
        ],
        axis=1,
    )
    L = scene.lights.count
    lprop = scene.lights.prop
    lm = jnp.maximum(scene.prop_material[lprop], 0)
    ltab = jnp.concatenate(
        [
            cdf[1 : L + 1].reshape(L, 1),
            (cdf[1 : L + 1] - cdf[0:L]).reshape(L, 1),
            scene.prop_rot[lprop].reshape(L, 9),
            scene.prop_pos[lprop],
            scene.prop_scale[lprop][:, 0:2],
            mats.emission[lm],
            mats.two_sided[lm].astype(f32).reshape(L, 1),
        ],
        axis=1,
    )
    return kinds, ptab, ltab


def fused_bounce(scene, s, uniforms, settings, interpret=False):
    """One full wavefront bounce for PathState `s` (media-free analytic
    scene). uniforms: (u_rr, u_sel, xl0, xl1, s0, s1, s2). Returns the
    updated PathState fields as a dict (ptmis assembles the NamedTuple)."""
    kinds, ptab, ltab = _pack_tables(scene)
    f32 = jnp.float32
    b2f = lambda x: x.astype(f32)
    lane_rows = [
        s.o[:, 0], s.o[:, 1], s.o[:, 2],
        s.d[:, 0], s.d[:, 1], s.d[:, 2],
        s.throughput[:, 0], s.throughput[:, 1], s.throughput[:, 2],
        b2f(s.alive), s.bxdf_pdf, b2f(s.singular), s.depth,
        s.mis_o[:, 0], s.mis_o[:, 1], s.mis_o[:, 2],
        s.mis_n[:, 0], s.mis_n[:, 1], s.mis_n[:, 2],
        s.result.emission[:, 0], s.result.emission[:, 1], s.result.emission[:, 2],
        s.result.direct[:, 0], s.result.direct[:, 1], s.result.direct[:, 2],
        s.result.indirect[:, 0], s.result.indirect[:, 1], s.result.indirect[:, 2],
    ] + list(uniforms)
    outs = _run(
        kinds, ptab, ltab, lane_rows, int(settings.max_depth),
        bool(settings.caustics), bool(settings.nee_only), interpret=interpret,
    )
    v3 = lambda i: jnp.stack([outs[i], outs[i + 1], outs[i + 2]], axis=-1)
    return {
        "o": v3(0),
        "d": v3(3),
        "throughput": v3(6),
        "alive": outs[9] > 0.5,
        "bxdf_pdf": outs[10],
        "depth": outs[11],
        "mis_o": v3(12),
        "mis_n": v3(15),
        "reg_alpha": outs[18],
        "emission": v3(19),
        "direct": v3(22),
        "indirect": v3(25),
        "nee_active": outs[28] > 0.5,
    }


def make_fused_body(scene, settings, photon_map=None, force_interpret=False):
    """body(PathState) -> PathState running the whole bounce in one Pallas
    kernel, or None when the scene/settings need the general XLA body.
    force_interpret: tests run the kernel via the Mosaic interpreter on CPU."""
    if force_interpret:
        if not structural_ok(scene, settings, photon_map):
            return None
    elif not applies(scene, settings, photon_map):
        return None

    from ..render.integrator.ptmis import PathState, IValue
    from ..core.sobol import SobolSampler
    from ..core.rng import hash_u32

    def body(s: PathState) -> PathState:
        smp = SobolSampler(s.sobol, dim=5)
        u_rr = smp.sample_1d()
        u_sel = smp.sample_1d()
        xi_l = smp.sample_2d()
        s3 = smp.sample_3d()
        smp.increment_padding()
        r = fused_bounce(
            scene, s,
            (u_rr, u_sel, xi_l[:, 0], xi_l[:, 1], s3[:, 0], s3[:, 1], s3[:, 2]),
            settings, interpret=force_interpret,
        )
        rays = (
            s.rays
            + jnp.sum(s.alive, dtype=jnp.int32)
            + jnp.sum(r["nee_active"], dtype=jnp.int32)
        )
        falses = jnp.zeros_like(s.alive)
        return PathState(
            o=r["o"],
            d=r["d"],
            throughput=r["throughput"],
            result=IValue(r["emission"], r["direct"], r["indirect"]),
            alive=r["alive"],
            bxdf_pdf=r["bxdf_pdf"],
            singular=falses,  # substitute samples are never delta events
            medium=s.medium,
            depth=r["depth"],
            vol_depth=s.vol_depth,
            rays=rays,
            sobol=smp.arrays,
            vol_key=hash_u32(s.vol_key ^ jnp.uint32(0x27D4EB2F)),
            mis_o=r["mis_o"],
            mis_n=r["mis_n"],
            from_volume=falses,
            primary_chain=falses,  # first bounce always ends the chain
            time=s.time,
            nee_thr=jnp.zeros_like(s.nee_thr),
            reg_alpha=r["reg_alpha"],
            aov=s.aov,
            wavelength=s.wavelength,
            pid=s.pid,
            split=s.split,
            sub_uv=s.sub_uv,
        )

    return body


# ===========================================================================
# Mesh-scene surface-shade kernel: the HYBRID bounce.
#
# Mesh scenes cannot intersect inside a Mosaic kernel (BVH traversal needs
# per-lane HBM gathers, ops/gather limits — CLAUDE.md rule 14), so the
# bounce splits at the two traversal boundaries instead:
#
#   XLA    intersect_scene (TLAS/BLAS cascade) + build_fragment (attribute
#          gathers)                                           [gather-bound]
#   PALLAS everything between the hits: BSDF-hit emission with sphquad MIS,
#          russian roulette, NEE (light CDF pick + Urena sample + substitute
#          eval + predivided power heuristic), VNDF/cosine BSDF sample,
#          PathState merge — emitting the shadow ray + pending contribution
#          as lane rows                                        [VPU-bound]
#   XLA    occluded() shadow traversal, pending*visibility merge
#
# Same 1:1-vs-general-body contract as the full-bounce kernel above; the
# general XLA body stays the semantic reference (CI: per-lane interpreter
# comparison on a mesh scene, tests/test_shade_kernel.py).
# ref: pathtracer_mis.zig vertex loop (connectLight/sampleLights split).
# ===========================================================================

# mtab row layout (one row per scene material):
# 0 kind | 1:4 albedo | 4 alpha | 5 metallic | 6:9 f0 | 9 specular |
# 10:13 emission | 13 two_sided
_MTAB_W = 14


def _make_surface_kernel(M: int, L: int, max_depth: int, caustics: bool,
                         nee_only: bool):
    def kernel(mtab, ltab, *refs):
        ins = refs[:47]
        outs = refs[47:]
        o = (ins[0][:, :], ins[1][:, :], ins[2][:, :])
        d = (ins[3][:, :], ins[4][:, :], ins[5][:, :])
        thr0 = (ins[6][:, :], ins[7][:, :], ins[8][:, :])
        alive = ins[9][:, :] > 0.5
        bxdf_pdf_in = ins[10][:, :]
        singular = ins[11][:, :] > 0.5
        depth = ins[12][:, :]  # int32
        mis_o = (ins[13][:, :], ins[14][:, :], ins[15][:, :])
        mis_n_in = (ins[16][:, :], ins[17][:, :], ins[18][:, :])
        res_em = (ins[19][:, :], ins[20][:, :], ins[21][:, :])
        res_di = (ins[22][:, :], ins[23][:, :], ins[24][:, :])
        res_in = (ins[25][:, :], ins[26][:, :], ins[27][:, :])
        u_rr = ins[28][:, :]
        u_sel = ins[29][:, :]
        xl0, xl1 = ins[30][:, :], ins[31][:, :]
        s0, s1, s2 = ins[32][:, :], ins[33][:, :], ins[34][:, :]
        valid = ins[35][:, :] > 0.5  # finite scene hit
        p_hit = (ins[36][:, :], ins[37][:, :], ins[38][:, :])
        geo_n = (ins[39][:, :], ins[40][:, :], ins[41][:, :])
        frag_n = (ins[42][:, :], ins[43][:, :], ins[44][:, :])
        mslot = ins[45][:, :]  # int32 material id (clamped >= 0)
        light_id = ins[46][:, :]  # int32 (-1 = hit is not a light)
        wo = _vneg(d)
        primary = depth == 0

        # ---- per-lane material params (select chain over M SMEM rows)
        gm = lambda c: _row_sel(mtab, mslot, c, M)
        kind_m = gm(0)
        mat = {
            "albedo": (gm(1), gm(2), gm(3)),
            "alpha": gm(4),
            "metallic": gm(5),
            "f0": (gm(6), gm(7), gm(8)),
            "specular": gm(9),
        }
        emission = (gm(10), gm(11), gm(12))
        two_sided = gm(13) > 0.5

        # ---- connectLight: BSDF-hit emission with MIS (eval_radiance +
        # light_hit_pdf from the last real vertex mis_o)
        facing = _vdot(wo, geo_n) > 0.0
        em_vis = valid & (facing | two_sided)
        em = tuple(jnp.where(em_vis, c, 0.0) for c in emission)
        is_light = light_id >= 0
        lidh = jnp.clip(light_id, 0, L - 1)
        glh = lambda c: _row_sel(ltab, lidh, c, L)
        if not nee_only:
            hr0 = (glh(2), glh(3), glh(4))
            hr1 = (glh(5), glh(6), glh(7))
            hpos = (glh(11), glh(12), glh(13))
            hsx, hsy = glh(14), glh(15)
            dlh = _vsub(mis_o, hpos)
            olh = (_vdot(dlh, hr0), _vdot(dlh, hr1),
                   _vdot(dlh, (glh(8), glh(9), glh(10))))
            qh = _sphquad_init(hsx, hsy, olh)
            lp = _sphquad_pdf(qh, olh, hsx, hsy) * glh(1)
            mis_w = jnp.where(
                singular | ~is_light, 1.0, _power_heuristic(bxdf_pdf_in, lp)
            )
            if not caustics:
                mis_w = jnp.where(singular & (depth > 0) & is_light, 0.0, mis_w)
        else:
            mis_w = jnp.where(singular, 1.0, jnp.where(is_light, 0.0, 1.0))
        is_em = primary
        to_dir = singular | (depth < 2)
        add_em = jnp.where(alive & is_em, mis_w, 0.0)
        add_di = jnp.where(alive & ~is_em & to_dir, mis_w, 0.0)
        add_in = jnp.where(alive & ~is_em & ~to_dir, mis_w, 0.0)
        res_em = _vadd(res_em, tuple(t * add_em * c for t, c in zip(thr0, em)))
        res_di = _vadd(res_di, tuple(t * add_di * c for t, c in zip(thr0, em)))
        res_in = _vadd(res_in, tuple(t * add_in * c for t, c in zip(thr0, em)))

        # ---- continuation + russian roulette
        cont = alive & valid & (depth < max_depth)
        mx = _vmax(thr0)
        p_rr = mx / 0.1
        kill = (p_rr < 1.0) & (u_rr >= p_rr)
        rr_scale = jnp.where(p_rr < 1.0, 1.0 / jnp.maximum(p_rr, 1e-12), 1.0)
        rr_mul = jnp.where(kill, 0.0, rr_scale)
        thr = tuple(c * rr_mul for c in thr0)
        cont = cont & ~kill

        # ---- NEE: select light by power CDF, Urena sphquad sample
        is_sub = kind_m == 0.0  # MaterialKind.SUBSTITUTE
        can_nee = cont & is_sub
        lidx = jnp.zeros(u_rr.shape, jnp.int32)
        for l in range(L - 1):
            lidx = lidx + (u_sel >= ltab[l, 0]).astype(jnp.int32)
        gl = lambda c: _row_sel(ltab, lidx, c, L)
        sel_pdf = gl(1)
        lr0 = (gl(2), gl(3), gl(4))
        lr1 = (gl(5), gl(6), gl(7))
        lr2 = (gl(8), gl(9), gl(10))
        lpos = (gl(11), gl(12), gl(13))
        lsx, lsy = gl(14), gl(15)
        lem = (gl(16), gl(17), gl(18))
        l2s = gl(19) > 0.5

        dl = _vsub(p_hit, lpos)
        ol = (_vdot(dl, lr0), _vdot(dl, lr1), _vdot(dl, lr2))
        q = _sphquad_init(lsx, lsy, ol)
        xu, yv = _sphquad_sample(q, xl0, xl1)
        rect_p = _vadd(
            _vadd(lpos, _vscale(lr0, ol[0] + xu)), _vscale(lr1, ol[1] + yv)
        )
        axis = _vsub(rect_p, p_hit)
        rect_t = _vlength(axis)
        wi_n = _vscale(axis, 1.0 / jnp.maximum(rect_t, 1e-20))
        # sample_light validity: q.S and the `front` hemisphere test against
        # the GEOMETRIC normal (light_sampling.py:551 — n=frag.geo_n there;
        # the shading normal only steers f)
        valid_l = (q["S"] > 1e-7) & (_vdot(wi_n, geo_n) > 0.0)
        pdf_l = jnp.where(valid_l, _sphquad_pdf(q, ol, lsx, lsy), 0.0)
        l_facing = _vdot(_vneg(wi_n), lr2) > 0.0
        radiance = tuple(jnp.where(l_facing | l2s, c, 0.0) for c in lem)

        f_nee, bpdf = _substitute_eval(mat, wo, wi_n, frag_n, geo_n)
        f_nee = tuple(jnp.where(is_sub, c, 0.0) for c in f_nee)
        bpdf = jnp.where(is_sub, bpdf, 0.0)
        light_pdf = pdf_l * sel_pdf
        w_mis = _predivided_power_heuristic(light_pdf, bpdf)

        sh_side = _vdot(wi_n, geo_n) >= 0.0
        sh_n = _vwhere(sh_side, geo_n, _vneg(geo_n))
        shadow_o = _offset_ray(p_hit, sh_n)
        lp_off = _offset_ray(rect_p, lr2)
        sh_axis = _vsub(lp_off, shadow_o)
        slen = _vlength(sh_axis)
        sdir = _vscale(sh_axis, 1.0 / jnp.maximum(slen, 1e-20))
        nee_active = (
            can_nee & (sel_pdf > 0.0) & (pdf_l > 0.0) & (_vmax(f_nee) > 0.0)
        )
        shadow_tmax = jnp.where(nee_active, slen, 0.0)
        nee_base = tuple(
            jnp.where(nee_active, t * r * f * w_mis, 0.0)
            for t, r, f in zip(thr, radiance, f_nee)
        )

        # ---- BSDF sample + PathState merge
        wi_s, weight, pdf_s, ok_s, reg_a = _substitute_sample(
            mat, wo, frag_n, geo_n, s0, s1, s2
        )
        valid_s = ok_s & is_sub
        cont = cont & valid_s
        thr_out = tuple(
            t * jnp.where(valid_s, w, 0.0) for t, w in zip(thr, weight)
        )
        bxdf_pdf_out = jnp.where(valid_s, pdf_s, 0.0)
        b_side = _vdot(wi_s, geo_n) >= 0.0
        b_n = _vwhere(b_side, geo_n, _vneg(geo_n))
        new_o = _offset_ray(p_hit, b_n)
        o_out = _vwhere(cont, new_o, o)
        d_out = _vwhere(cont, wi_s, d)
        depth_out = jnp.where(cont, depth + 1, depth)
        mis_o_out = _vwhere(cont, new_o, mis_o)
        mis_n_out = _vwhere(cont, frag_n, mis_n_in)

        for i in range(3):
            outs[0 + i][:, :] = o_out[i]
            outs[3 + i][:, :] = d_out[i]
            outs[6 + i][:, :] = thr_out[i]
            outs[12 + i][:, :] = mis_o_out[i]
            outs[15 + i][:, :] = mis_n_out[i]
            outs[19 + i][:, :] = res_em[i]
            outs[22 + i][:, :] = res_di[i]
            outs[25 + i][:, :] = res_in[i]
            outs[29 + i][:, :] = shadow_o[i]
            outs[32 + i][:, :] = sdir[i]
            outs[36 + i][:, :] = nee_base[i]
        outs[9][:, :] = jnp.where(cont, 1.0, 0.0)
        outs[10][:, :] = bxdf_pdf_out
        outs[11][:, :] = depth_out
        outs[18][:, :] = reg_a
        outs[28][:, :] = jnp.where(nee_active, 1.0, 0.0)
        outs[35][:, :] = shadow_tmax

    return kernel


def _run_surface(mtab, ltab, lane_rows, max_depth, caustics, nee_only,
                 interpret=False):
    n = lane_rows[0].shape[0]
    tile = min(_LANE_TILE, -(-max(n, 1) // 128) * 128)
    np_pad = ((n + tile - 1) // tile) * tile
    grid = np_pad // tile

    def row(x):
        if np_pad != n:
            x = jnp.concatenate([x, jnp.zeros(np_pad - n, x.dtype)])
        return x.reshape(1, np_pad)

    ins = [mtab, ltab] + [row(x) for x in lane_rows]
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    lane = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct((1, np_pad), f32)] * 11
        + [jax.ShapeDtypeStruct((1, np_pad), jnp.int32)]
        + [jax.ShapeDtypeStruct((1, np_pad), f32)] * 27
    )
    outs = pl.pallas_call(
        _make_surface_kernel(
            mtab.shape[0], ltab.shape[0], max_depth, caustics, nee_only
        ),
        grid=(grid,),
        in_specs=[smem(mtab.shape), smem(ltab.shape)] + [lane] * 47,
        out_specs=[lane] * 39,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return [x[0, :n] for x in outs]


def structural_ok_mesh(scene, settings, photon_map) -> bool:
    """Applicability of the hybrid mesh bounce: mesh/analytic geometry with
    plain substitute/light materials and rectangle lights only."""
    from ..scene.types import ShapeType

    if photon_map is not None:
        return False
    if settings.collect_aovs or settings.light_split_depth > 0:
        return False
    if settings.regularize_roughness > 0.0:
        return False
    if scene.mat_features is None or len(scene.mat_features) > 0:
        return False
    if scene.meshes is None:
        return False  # analytic-only scenes take the full-bounce kernel
    if scene.textures is not None:
        return False
    if scene.curves is not None or scene.points is not None:
        return False
    if scene.animated_props or scene.light_tree is not None:
        return False
    if scene.env is not None or scene.portals:
        return False
    if scene.lights.count < 1 or scene.lights.count > 8:
        return False
    shapes_present = {
        int(str(k)) for k in (scene.light_shapes or {}) if str(k).isdigit()
    }
    if shapes_present != {int(ShapeType.RECTANGLE)}:
        return False
    if set(scene.light_shapes or {}) - {str(int(ShapeType.RECTANGLE)), int(ShapeType.RECTANGLE)}:
        return False
    if int(scene.materials.kind.shape[0]) > 64:
        return False  # SMEM select chain over all scene materials
    return True


def _pack_mtab(scene):
    """[M, _MTAB_W] per-material params (mat.gather, plain features)."""
    f32 = jnp.float32
    mats = scene.materials
    M = mats.kind.shape[0]
    rough = jnp.maximum(mats.roughness, _MIN_ROUGHNESS)
    metallic = mats.metallic
    color = mats.color
    ior = mats.ior
    t = (ior - 1.0) / (ior + 1.0)
    f0s = t * t
    f0 = f0s[:, None] * (1.0 - metallic[:, None]) + color * metallic[:, None]
    albedo = (1.0 - metallic[:, None]) * color
    col1 = lambda x: x.astype(f32).reshape(M, 1)
    return jnp.concatenate(
        [
            col1(mats.kind),
            albedo,
            col1(rough * rough),
            col1(metallic),
            f0,
            col1(mats.specular),
            mats.emission,
            col1(mats.two_sided),
        ],
        axis=1,
    )


def make_mesh_fused_body(scene, settings, photon_map=None,
                         force_interpret=False):
    """body(PathState) -> PathState for mesh scenes: XLA traversals around
    the Pallas surface-shade kernel, or None when out of scope."""
    if force_interpret:
        if not structural_ok_mesh(scene, settings, photon_map):
            return None
    elif not (use_pallas() and structural_ok_mesh(scene, settings, photon_map)):
        return None

    from ..render.integrator.ptmis import PathState, IValue
    from ..core.sobol import SobolSampler
    from ..core.rng import hash_u32
    from ..core.gather import small_gather
    from ..scene import shapes

    mtab = _pack_mtab(scene)
    # light table: reuse the full-bounce layout (_pack_tables ltab half)
    f32 = jnp.float32
    L = scene.lights.count
    lprop = scene.lights.prop
    lm = jnp.maximum(scene.prop_material[lprop], 0)
    cdf = scene.lights.cdf
    ltab = jnp.concatenate(
        [
            cdf[1 : L + 1].reshape(L, 1),
            (cdf[1 : L + 1] - cdf[0:L]).reshape(L, 1),
            scene.prop_rot[lprop].reshape(L, 9),
            scene.prop_pos[lprop],
            scene.prop_scale[lprop][:, 0:2],
            scene.materials.emission[lm],
            scene.materials.two_sided[lm].astype(f32).reshape(L, 1),
        ],
        axis=1,
    )
    RAY_MAX_T = 2.14748365e9  # shapes.RAY_MAX_T

    def body(s: PathState) -> PathState:
        smp = SobolSampler(s.sobol, dim=5)
        u_rr = smp.sample_1d()
        u_sel = smp.sample_1d()
        xi_l = smp.sample_2d()
        s3 = smp.sample_3d()
        smp.increment_padding()

        primary = s.depth == 0
        ray_tmax = jnp.where(s.alive, jnp.float32(shapes.RAY_MAX_T), 0.0)
        hit = shapes.intersect_scene(
            scene, s.o, s.d, jnp.float32(0.0), ray_tmax,
            "reflection", primary=primary, time=s.time,
        )
        frag = shapes.build_fragment(
            scene, hit, s.o, s.d, need_tangents=False, time=s.time
        )
        finite = hit.valid() & (hit.t < jnp.float32(shapes.RAY_MAX_T))
        light_id = jnp.where(
            hit.valid(),
            small_gather(scene.prop_light, jnp.maximum(hit.prop, 0)),
            -1,
        )
        b2f = lambda x: x.astype(f32)
        lane_rows = [
            s.o[:, 0], s.o[:, 1], s.o[:, 2],
            s.d[:, 0], s.d[:, 1], s.d[:, 2],
            s.throughput[:, 0], s.throughput[:, 1], s.throughput[:, 2],
            b2f(s.alive), s.bxdf_pdf, b2f(s.singular), s.depth,
            s.mis_o[:, 0], s.mis_o[:, 1], s.mis_o[:, 2],
            s.mis_n[:, 0], s.mis_n[:, 1], s.mis_n[:, 2],
            s.result.emission[:, 0], s.result.emission[:, 1], s.result.emission[:, 2],
            s.result.direct[:, 0], s.result.direct[:, 1], s.result.direct[:, 2],
            s.result.indirect[:, 0], s.result.indirect[:, 1], s.result.indirect[:, 2],
            u_rr, u_sel, xi_l[:, 0], xi_l[:, 1], s3[:, 0], s3[:, 1], s3[:, 2],
            b2f(finite),
            frag.p[:, 0], frag.p[:, 1], frag.p[:, 2],
            frag.geo_n[:, 0], frag.geo_n[:, 1], frag.geo_n[:, 2],
            frag.n[:, 0], frag.n[:, 1], frag.n[:, 2],
            jnp.maximum(frag.material, 0), light_id.astype(jnp.int32),
        ]
        outs = _run_surface(
            mtab, ltab, lane_rows, int(settings.max_depth),
            bool(settings.caustics), bool(settings.nee_only),
            interpret=force_interpret,
        )
        v3 = lambda i: jnp.stack([outs[i], outs[i + 1], outs[i + 2]], axis=-1)
        nee_active = outs[28] > 0.5
        shadow_o = v3(29)
        sdir = v3(32)
        stmax = outs[35]
        blocked = shapes.occluded(
            scene, shadow_o, sdir, jnp.float32(0.0), stmax, time=s.time
        )
        nee = jnp.where((nee_active & ~blocked)[..., None], v3(36), 0.0)
        nee_dir = (s.depth < 1)[..., None]
        direct = v3(22) + jnp.where(nee_dir, nee, 0.0)
        indirect = v3(25) + jnp.where(nee_dir, 0.0, nee)
        rays = (
            s.rays
            + jnp.sum(s.alive, dtype=jnp.int32)
            + jnp.sum(nee_active, dtype=jnp.int32)
        )
        falses = jnp.zeros_like(s.alive)
        return PathState(
            o=v3(0),
            d=v3(3),
            throughput=v3(6),
            result=IValue(v3(19), direct, indirect),
            alive=outs[9] > 0.5,
            bxdf_pdf=outs[10],
            singular=falses,  # substitute samples are never delta events
            medium=s.medium,
            depth=outs[11],
            vol_depth=s.vol_depth,
            rays=rays,
            sobol=smp.arrays,
            vol_key=hash_u32(s.vol_key ^ jnp.uint32(0x27D4EB2F)),
            mis_o=v3(12),
            mis_n=v3(15),
            from_volume=falses,
            primary_chain=falses,
            time=s.time,
            nee_thr=jnp.zeros_like(s.nee_thr),
            reg_alpha=outs[18],
            aov=s.aov,
            wavelength=s.wavelength,
            pid=s.pid,
            split=s.split,
            sub_uv=s.sub_uv,
        )

    return body


# ===========================================================================
# GENERAL surface-shade kernel (v2): textures, env/dome lights, any light
# shape, light tree, animation — the "fast path as the common path" form.
#
# v1 (_make_surface_kernel) fuses the NEE light SAMPLING into the kernel,
# which caps it at <= 8 untextured rectangle lights. v2 moves everything
# whose data lives in big arenas back to XLA — where gathers are cheap —
# and keeps only the register-resident shade core in Mosaic:
#
#   XLA    intersect_scene + build_fragment + materials.gather (textures,
#          normal maps) + eval_radiance (BSDF-hit emission, incl. dome/env
#          emission maps) + light_hit_pdf*select_pdf (any light type, tree
#          descent) + select_light/sample_light/light_radiance (the NEE
#          candidate: direction, radiance, pdf, shadow ray) [gather-bound]
#   PALLAS MIS emission weights + russian roulette + substitute NEE eval
#          (predivided power heuristic) + VNDF/cosine BSDF sample +
#          PathState merge                                      [VPU-bound]
#   XLA    occluded() shadow traversal + pending*visibility merge
#
# The Sobol draw ORDER mirrors the general XLA body exactly (u_rr, u_sel,
# xi_l, s3 — u_sel/xi_l consumed by the XLA light sampling here), so lane
# lifecycles match per-lane (CI: tests/test_shade_kernel.py textured/env
# cases). ref: pathtracer_mis.zig vertex loop.
# ===========================================================================

# features whose machinery runs entirely on the XLA side of the v2 split
_V2_XLA_SIDE_FEATURES = {"ies", "triplanar"}


def _make_surface_kernel_v2(max_depth: int, caustics: bool, nee_only: bool):
    def kernel(*refs):
        ins = refs[:66]
        outs = refs[66:]
        o = (ins[0][:, :], ins[1][:, :], ins[2][:, :])
        d = (ins[3][:, :], ins[4][:, :], ins[5][:, :])
        thr0 = (ins[6][:, :], ins[7][:, :], ins[8][:, :])
        alive = ins[9][:, :] > 0.5
        bxdf_pdf_in = ins[10][:, :]
        singular = ins[11][:, :] > 0.5
        depth = ins[12][:, :]  # int32
        mis_o = (ins[13][:, :], ins[14][:, :], ins[15][:, :])
        mis_n_in = (ins[16][:, :], ins[17][:, :], ins[18][:, :])
        res_em = (ins[19][:, :], ins[20][:, :], ins[21][:, :])
        res_di = (ins[22][:, :], ins[23][:, :], ins[24][:, :])
        res_in = (ins[25][:, :], ins[26][:, :], ins[27][:, :])
        u_rr = ins[28][:, :]
        s0, s1, s2 = ins[29][:, :], ins[30][:, :], ins[31][:, :]
        valid = ins[32][:, :] > 0.5  # finite scene hit
        p_hit = (ins[33][:, :], ins[34][:, :], ins[35][:, :])
        geo_n = (ins[36][:, :], ins[37][:, :], ins[38][:, :])
        frag_n = (ins[39][:, :], ins[40][:, :], ins[41][:, :])
        kind_m = ins[42][:, :]
        mat = {
            "albedo": (ins[43][:, :], ins[44][:, :], ins[45][:, :]),
            "alpha": ins[46][:, :],
            "metallic": ins[47][:, :],
            "f0": (ins[48][:, :], ins[49][:, :], ins[50][:, :]),
            "specular": ins[51][:, :],
        }
        em = (ins[52][:, :], ins[53][:, :], ins[54][:, :])  # pre-masked
        hit_lp = ins[55][:, :]
        is_light = ins[56][:, :] > 0.5
        nee_wi = (ins[57][:, :], ins[58][:, :], ins[59][:, :])
        nee_rad = (ins[60][:, :], ins[61][:, :], ins[62][:, :])
        nee_lpdf = ins[63][:, :]
        nee_pre = ins[64][:, :] > 0.5
        nee_pre_tmax = ins[65][:, :]
        wo = _vneg(d)
        primary = depth == 0

        # ---- connectLight: MIS weight for the BSDF-hit emission (the
        # radiance AND the hit light pdf come in per-lane — any light type)
        if not nee_only:
            mis_w = jnp.where(
                singular | ~is_light, 1.0, _power_heuristic(bxdf_pdf_in, hit_lp)
            )
            if not caustics:
                mis_w = jnp.where(singular & (depth > 0) & is_light, 0.0, mis_w)
        else:
            mis_w = jnp.where(singular, 1.0, jnp.where(is_light, 0.0, 1.0))
        is_em = primary
        to_dir = singular | (depth < 2)
        add_em = jnp.where(alive & is_em, mis_w, 0.0)
        add_di = jnp.where(alive & ~is_em & to_dir, mis_w, 0.0)
        add_in = jnp.where(alive & ~is_em & ~to_dir, mis_w, 0.0)
        res_em = _vadd(res_em, tuple(t * add_em * c for t, c in zip(thr0, em)))
        res_di = _vadd(res_di, tuple(t * add_di * c for t, c in zip(thr0, em)))
        res_in = _vadd(res_in, tuple(t * add_in * c for t, c in zip(thr0, em)))

        # ---- continuation + russian roulette (helper.zig russianRoulette)
        cont = alive & valid & (depth < max_depth)
        mx = _vmax(thr0)
        p_rr = mx / 0.1
        kill = (p_rr < 1.0) & (u_rr >= p_rr)
        rr_scale = jnp.where(p_rr < 1.0, 1.0 / jnp.maximum(p_rr, 1e-12), 1.0)
        rr_mul = jnp.where(kill, 0.0, rr_scale)
        thr = tuple(c * rr_mul for c in thr0)
        cont = cont & ~kill

        # ---- NEE: evaluate the XLA-sampled candidate (sampleLights side)
        is_sub = kind_m == 0.0  # MaterialKind.SUBSTITUTE
        can_nee = cont & is_sub
        f_nee, bpdf = _substitute_eval(mat, wo, nee_wi, frag_n, geo_n)
        f_nee = tuple(jnp.where(is_sub, c, 0.0) for c in f_nee)
        bpdf = jnp.where(is_sub, bpdf, 0.0)
        w_mis = _predivided_power_heuristic(nee_lpdf, bpdf)
        nee_active = can_nee & nee_pre & (_vmax(f_nee) > 0.0)
        shadow_tmax = jnp.where(nee_active, nee_pre_tmax, 0.0)
        nee_base = tuple(
            jnp.where(nee_active, t * r * f * w_mis, 0.0)
            for t, r, f in zip(thr, nee_rad, f_nee)
        )

        # ---- BSDF sample + PathState merge
        wi_s, weight, pdf_s, ok_s, reg_a = _substitute_sample(
            mat, wo, frag_n, geo_n, s0, s1, s2
        )
        valid_s = ok_s & is_sub
        cont = cont & valid_s
        thr_out = tuple(
            t * jnp.where(valid_s, w, 0.0) for t, w in zip(thr, weight)
        )
        bxdf_pdf_out = jnp.where(valid_s, pdf_s, 0.0)
        b_side = _vdot(wi_s, geo_n) >= 0.0
        b_n = _vwhere(b_side, geo_n, _vneg(geo_n))
        new_o = _offset_ray(p_hit, b_n)
        o_out = _vwhere(cont, new_o, o)
        d_out = _vwhere(cont, wi_s, d)
        depth_out = jnp.where(cont, depth + 1, depth)
        mis_o_out = _vwhere(cont, new_o, mis_o)
        mis_n_out = _vwhere(cont, frag_n, mis_n_in)

        for i in range(3):
            outs[0 + i][:, :] = o_out[i]
            outs[3 + i][:, :] = d_out[i]
            outs[6 + i][:, :] = thr_out[i]
            outs[12 + i][:, :] = mis_o_out[i]
            outs[15 + i][:, :] = mis_n_out[i]
            outs[19 + i][:, :] = res_em[i]
            outs[22 + i][:, :] = res_di[i]
            outs[25 + i][:, :] = res_in[i]
            outs[29 + i][:, :] = nee_base[i]
        outs[9][:, :] = jnp.where(cont, 1.0, 0.0)
        outs[10][:, :] = bxdf_pdf_out
        outs[11][:, :] = depth_out
        outs[18][:, :] = reg_a
        outs[28][:, :] = jnp.where(nee_active, 1.0, 0.0)
        outs[32][:, :] = shadow_tmax

    return kernel


def _run_surface_v2(lane_rows, max_depth, caustics, nee_only, interpret=False):
    n = lane_rows[0].shape[0]
    tile = min(_LANE_TILE, -(-max(n, 1) // 128) * 128)
    np_pad = ((n + tile - 1) // tile) * tile
    grid = np_pad // tile

    def row(x):
        if np_pad != n:
            x = jnp.concatenate([x, jnp.zeros(np_pad - n, x.dtype)])
        return x.reshape(1, np_pad)

    ins = [row(x) for x in lane_rows]
    lane = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = (
        [jax.ShapeDtypeStruct((1, np_pad), f32)] * 11
        + [jax.ShapeDtypeStruct((1, np_pad), jnp.int32)]
        + [jax.ShapeDtypeStruct((1, np_pad), f32)] * 21
    )
    outs = pl.pallas_call(
        _make_surface_kernel_v2(max_depth, caustics, nee_only),
        grid=(grid,),
        in_specs=[lane] * 66,
        out_specs=[lane] * 33,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return [x[0, :n] for x in outs]


def structural_ok_mesh_v2(scene, settings, photon_map) -> bool:
    """Applicability of the GENERAL hybrid bounce: any geometry/lights/
    textures, plain substitute + light materials (features that change the
    BSDF or the lane lifecycle stay on the XLA body)."""
    if photon_map is not None:
        return False
    if settings.collect_aovs or settings.light_split_depth > 0:
        return False
    if settings.regularize_roughness > 0.0:
        return False
    feats = scene.mat_features
    if feats is None or (set(feats) - _V2_XLA_SIDE_FEATURES):
        return False  # media/glass/coating/hair/mask/... -> XLA body
    if scene.light_shapes is not None and "volume" in scene.light_shapes:
        return False  # emissive volumes imply media anyway
    if scene.lights.count < 1:
        return False  # lightless scenes keep the plain body
    return True


def make_mesh_fused_body_v2(scene, settings, photon_map=None,
                            force_interpret=False):
    """body(PathState) -> PathState: XLA traversal/gather stages around the
    v2 Pallas shade core, or None when out of scope."""
    if force_interpret:
        if not structural_ok_mesh_v2(scene, settings, photon_map):
            return None
    elif not (use_pallas() and structural_ok_mesh_v2(scene, settings, photon_map)):
        return None

    from ..render.integrator.ptmis import PathState, IValue
    from ..render import materials as mat
    from ..core.sobol import SobolSampler
    from ..core.rng import hash_u32, hash2_u32, u32_to_float
    from ..core.gather import small_gather
    from ..core import vecmath as vm
    from ..scene import shapes
    from ..scene import light_sampling as ls_mod

    f32 = jnp.float32
    has_tex = scene.textures is not None

    def body(s: PathState) -> PathState:
        smp = SobolSampler(s.sobol, dim=5)

        primary = s.depth == 0
        ray_tmax = jnp.where(s.alive, jnp.float32(shapes.RAY_MAX_T), 0.0)
        hit = shapes.intersect_scene(
            scene, s.o, s.d, jnp.float32(0.0), ray_tmax,
            "reflection", primary=primary, time=s.time,
        )
        frag = shapes.build_fragment(
            scene, hit, s.o, s.d, need_tangents=has_tex, time=s.time
        )
        tex_xi = None
        uv_alt = None
        if has_tex:
            # same non-Sobol jitter stream as the XLA body (ptmis.py)
            kx = hash2_u32(s.vol_key ^ jnp.uint32(0xA511E9B3),
                           s.depth.astype(jnp.uint32))
            ky = hash_u32(kx ^ jnp.uint32(0x85EBCA6B))
            tex_xi = jnp.stack([u32_to_float(kx), u32_to_float(ky)], -1)
            if scene.mat_features is not None and "triplanar" in scene.mat_features:
                uv_alt = mat.triplanar_uv(scene, frag)
            frag = frag._replace(
                n=mat.apply_normal_map(
                    scene.materials, scene.textures, frag.material, frag.uv,
                    frag.n, frag.t, frag.b, tex_xi=tex_xi, uv_alt=uv_alt,
                )
            )
        params = mat.gather(
            scene.materials, frag.material, None, scene.textures, frag.uv,
            features=scene.mat_features, tex_xi=tex_xi, uv_alt=uv_alt,
        )
        wo = -s.d

        # ---- BSDF-hit emission radiance + hit-side light pdf (XLA: any
        # light type incl. env maps and tree-descent select pdfs)
        emission = mat.eval_radiance(params, wo, frag.geo_n)
        emission = jnp.where(hit.valid()[..., None], emission, 0.0)
        light_id = jnp.where(
            hit.valid(),
            small_gather(scene.prop_light, jnp.maximum(hit.prop, 0)),
            -1,
        )
        is_light = light_id >= 0
        if not settings.nee_only:
            eff_t = jnp.where(
                hit.t >= shapes.RAY_MAX_T, hit.t, vm.length(frag.p - s.mis_o)
            )
            hit_lp = ls_mod.light_hit_pdf(
                scene, hit.prop, s.mis_o, s.d, eff_t, frag.p, frag.geo_n,
                s.mis_n, total_sphere=s.from_volume, hit_prim=hit.prim,
                time=s.time,
            ) * ls_mod.light_select_pdf(
                scene, light_id, p=s.mis_o, n=s.mis_n,
                total_sphere=s.from_volume,
            )
        else:
            hit_lp = jnp.zeros_like(hit.t)

        # ---- Sobol draws in the XLA body's exact order
        u_rr = smp.sample_1d()
        u_sel = smp.sample_1d()
        xi_l = smp.sample_2d()

        # ---- NEE candidate (XLA light sampling; the kernel evaluates)
        light_idx, sel_pdf = ls_mod.select_light(
            scene, u_sel, p=frag.p, n=frag.n,
            total_sphere=jnp.zeros_like(s.alive),
        )
        lsmp = ls_mod.sample_light(
            scene, light_idx, frag.p, frag.geo_n, xi_l,
            total_sphere=jnp.zeros_like(s.alive), ns=frag.n, time=s.time,
        )
        radiance = ls_mod.light_radiance(
            scene, light_idx, lsmp.wi, lsmp.light_n, lsmp.uv,
        )
        nee_lpdf = lsmp.pdf * sel_pdf
        shadow_surf = shapes.offset_ray(
            frag.p,
            jnp.where(
                vm.dot(lsmp.wi, frag.geo_n)[..., None] >= 0.0,
                frag.geo_n, -frag.geo_n,
            ),
        )
        lp_off = shapes.offset_ray(lsmp.light_p, lsmp.light_n)
        shadow_axis = jnp.where(
            lsmp.infinite[..., None], lsmp.wi, lp_off - shadow_surf
        )
        slen = jnp.where(
            lsmp.infinite, jnp.float32(shapes.RAY_MAX_T), vm.length(shadow_axis)
        )
        sdir = jnp.where(
            lsmp.infinite[..., None],
            lsmp.wi,
            shadow_axis / jnp.maximum(slen, 1e-20)[..., None],
        )
        nee_pre = (light_idx >= 0) & (sel_pdf > 0.0) & (lsmp.pdf > 0.0)
        nee_pre_tmax = jnp.where(
            lsmp.infinite, jnp.float32(shapes.RAY_MAX_T) * 0.9, slen
        )

        s3 = smp.sample_3d()
        smp.increment_padding()

        b2f = lambda x: x.astype(f32)
        finite = hit.valid() & (hit.t < jnp.float32(shapes.RAY_MAX_T))
        lane_rows = [
            s.o[:, 0], s.o[:, 1], s.o[:, 2],
            s.d[:, 0], s.d[:, 1], s.d[:, 2],
            s.throughput[:, 0], s.throughput[:, 1], s.throughput[:, 2],
            b2f(s.alive), s.bxdf_pdf, b2f(s.singular), s.depth,
            s.mis_o[:, 0], s.mis_o[:, 1], s.mis_o[:, 2],
            s.mis_n[:, 0], s.mis_n[:, 1], s.mis_n[:, 2],
            s.result.emission[:, 0], s.result.emission[:, 1], s.result.emission[:, 2],
            s.result.direct[:, 0], s.result.direct[:, 1], s.result.direct[:, 2],
            s.result.indirect[:, 0], s.result.indirect[:, 1], s.result.indirect[:, 2],
            u_rr, s3[:, 0], s3[:, 1], s3[:, 2],
            b2f(finite),
            frag.p[:, 0], frag.p[:, 1], frag.p[:, 2],
            frag.geo_n[:, 0], frag.geo_n[:, 1], frag.geo_n[:, 2],
            frag.n[:, 0], frag.n[:, 1], frag.n[:, 2],
            params["kind"].astype(f32),
            params["albedo"][:, 0], params["albedo"][:, 1], params["albedo"][:, 2],
            params["alpha"], params["metallic"],
            params["f0"][:, 0], params["f0"][:, 1], params["f0"][:, 2],
            params["specular"],
            emission[:, 0], emission[:, 1], emission[:, 2],
            hit_lp, b2f(is_light),
            lsmp.wi[:, 0], lsmp.wi[:, 1], lsmp.wi[:, 2],
            radiance[:, 0], radiance[:, 1], radiance[:, 2],
            nee_lpdf, b2f(nee_pre), nee_pre_tmax,
        ]
        outs = _run_surface_v2(
            lane_rows, int(settings.max_depth),
            bool(settings.caustics), bool(settings.nee_only),
            interpret=force_interpret,
        )
        v3 = lambda i: jnp.stack([outs[i], outs[i + 1], outs[i + 2]], axis=-1)
        nee_active = outs[28] > 0.5
        stmax = outs[32]
        blocked = shapes.occluded(
            scene, shadow_surf, sdir, jnp.float32(0.0), stmax, time=s.time
        )
        nee = jnp.where((nee_active & ~blocked)[..., None], v3(29), 0.0)
        nee_dir = (s.depth < 1)[..., None]
        direct = v3(22) + jnp.where(nee_dir, nee, 0.0)
        indirect = v3(25) + jnp.where(nee_dir, 0.0, nee)
        rays = (
            s.rays
            + jnp.sum(s.alive, dtype=jnp.int32)
            + jnp.sum(nee_active, dtype=jnp.int32)
        )
        falses = jnp.zeros_like(s.alive)
        return PathState(
            o=v3(0),
            d=v3(3),
            throughput=v3(6),
            result=IValue(v3(19), direct, indirect),
            alive=outs[9] > 0.5,
            bxdf_pdf=outs[10],
            singular=falses,  # substitute samples are never delta events
            medium=s.medium,
            depth=outs[11],
            vol_depth=s.vol_depth,
            rays=rays,
            sobol=smp.arrays,
            vol_key=hash_u32(s.vol_key ^ jnp.uint32(0x27D4EB2F)),
            mis_o=v3(12),
            mis_n=v3(15),
            from_volume=falses,
            primary_chain=falses,
            time=s.time,
            nee_thr=jnp.zeros_like(s.nee_thr),
            reg_alpha=outs[18],
            aov=s.aov,
            wavelength=s.wavelength,
            pid=s.pid,
            split=s.split,
            sub_uv=s.sub_uv,
        )

    return body
