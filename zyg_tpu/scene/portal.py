"""Portal lights: importance-sample an env map through an opening.

ref: src/core/scene/shape/portal.zig (gnomonic image parameterization),
src/core/scene/shape/shape_sampler.zig PortalImpl (windowed 2D
distribution), src/core/scene/material/light/light_material.zig
preparePortalSampling (luminance grid bake over the portal image),
src/core/scene/shape/rectangle.zig samplePortalTo, and
src/util/scene_loader.zig loadPortal (dome light -> prototype, portal
rect takes over its material).

TPU-first divergence from the reference: the reference samples a
SummedAreaTable windowed distribution by bisection (log2(dim) SAT
integrals of 4 gathers each per axis). Per-lane gathers from a big table
are the one thing the VPU cannot do cheaply, so the distribution here is
a coarse DxD grid (importance only — MIS stays exact because pdf and
sample use the same grid) stored as per-row prefix sums. A windowed
sample then needs only four fat-row gathers of D floats ([N, D] takes)
for the y-marginal plus one row gather for the x-conditional; the
inversions are vectorized cumsum/compare ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm

D_GRID = 64  # portal-image luminance grid resolution


class PortalDist(NamedTuple):
    """Per-portal windowed distribution + link data (device leaves).

    aux (static, rides the treedef via the SceneData.portals dict key):
    the portal prop index and the linked dome prop index.
    """

    pfx: jax.Array  # [D, D+1] per-row prefix sums of the luminance grid
    pfx_t: jax.Array  # [D+1, D] transpose (column fetches become row takes)
    dome_rot: jax.Array  # [3,3] dome prop rotation (world->dome for env uv)


jax.tree_util.register_pytree_node(
    PortalDist,
    lambda pd: ((pd.pfx, pd.pfx_t, pd.dome_rot), None),
    lambda aux, ch: PortalDist(*ch),
)


def dome_uv_of_dir(dome_rot, wi):
    """Lat-long uv of world direction wi on the dome (matches the dome
    branch of light_sampling.light_radiance / shapes.build_fragment)."""
    ldir = vm.safe_normalize(vm.world_to_object_normal(dome_rot, wi))
    phi = jnp.arctan2(ldir[..., 0], ldir[..., 2])
    return jnp.stack(
        [
            phi * (0.5 / jnp.pi) + 0.5,
            jnp.arccos(jnp.clip(ldir[..., 1], -1.0, 1.0)) * (1.0 / jnp.pi),
        ],
        axis=-1,
    )


def build_portal_dist(
    env_img: np.ndarray,
    dome_rot: np.ndarray,
    portal_rot: np.ndarray,
    d: int = D_GRID,
    subsamples: int = 2,
) -> tuple[np.ndarray, float]:
    """Host bake of the DxD portal-image luminance grid (ref
    light_material.zig PortalLuminanceContext).

    Cell value = env radiance luminance at the outward direction through
    the portal x the uv->solid-angle jacobian, averaged over subsamples.
    Returns (lum[d,d], mean_power) — mean_power drives light selection.
    """
    h, w = env_img.shape[:2]
    pr = np.asarray(portal_rot, np.float64)
    dr = np.asarray(dome_rot, np.float64)

    n = d * subsamples
    step = 1.0 / n
    uv = (np.arange(n) + 0.5) * step
    uu, vv = np.meshgrid(uv, uv)  # vv rows = y
    ab_u = -np.pi / 2 + uu * np.pi
    ab_v = -np.pi / 2 + vv * np.pi
    x = np.tan(ab_u)
    y = np.tan(ab_v)
    inv_len = 1.0 / np.sqrt(x * x + y * y + 1.0)
    wx, wy, wz = x * inv_len, y * inv_len, inv_len
    weight = (np.pi**2) * (1.0 - wx**2) * (1.0 - wy**2) / wz

    # outward dir = -(object->world of w) (ref: dir = -ps.dir)
    dirs = -(
        wx[..., None] * pr[0] + wy[..., None] * pr[1] + wz[..., None] * pr[2]
    )
    ldir = dirs @ dr.T  # rows of dr are dome object axes in world
    phi = np.arctan2(ldir[..., 0], ldir[..., 2])
    u_env = phi * (0.5 / np.pi) + 0.5
    v_env = np.arccos(np.clip(ldir[..., 1], -1.0, 1.0)) * (1.0 / np.pi)
    xi = np.clip((u_env * w).astype(np.int64), 0, w - 1)
    yi = np.clip((v_env * h).astype(np.int64), 0, h - 1)
    rad = env_img[yi, xi, :3].astype(np.float64)
    lum_full = rad.max(axis=-1) * weight

    lum = lum_full.reshape(d, subsamples, d, subsamples).mean(axis=(1, 3))
    lum = np.maximum(lum, 1e-12).astype(np.float32)
    return lum, float(lum.mean())


def make_portal_dist(lum: np.ndarray, dome_rot: np.ndarray) -> PortalDist:
    d = lum.shape[0]
    pfx = np.zeros((d, d + 1), np.float32)
    pfx[:, 1:] = np.cumsum(lum, axis=1)
    return PortalDist(
        pfx=jnp.asarray(pfx),
        pfx_t=jnp.asarray(pfx.T.copy()),
        dome_rot=jnp.asarray(np.asarray(dome_rot, np.float32)),
    )


# ---------------------------------------------------------------------------
# device math (all shapes [N] / [N,3])
# ---------------------------------------------------------------------------


def world_to_image(w):
    """Portal-LOCAL direction (z>0 toward the interior) -> image uv
    (ref portal.zig worldToImage)."""
    u = jnp.arctan2(w[..., 0], w[..., 2]) * (1.0 / jnp.pi) + 0.5
    v = jnp.arctan2(w[..., 1], w[..., 2]) * (1.0 / jnp.pi) + 0.5
    return (
        jnp.clip(jnp.stack([u, v], axis=-1), 0.0, 1.0),
        w[..., 2] > 0.0,
    )


def image_to_world_local(uv):
    """Image uv -> portal-LOCAL direction + uv->solid-angle weight
    (ref portal.zig imageToWorld)."""
    ab = -jnp.pi * 0.5 + uv * jnp.pi
    xy = jnp.tan(ab)
    w = vm.safe_normalize(
        jnp.concatenate([xy, jnp.ones(uv.shape[:-1] + (1,), jnp.float32)], -1)
    )
    weight = (
        (jnp.pi**2)
        * (1.0 - w[..., 0] ** 2)
        * (1.0 - w[..., 1] ** 2)
        / jnp.maximum(w[..., 2], 1e-12)
    )
    return w, weight


def image_bounds(p, rot, pos, scale):
    """uv window of the portal rect as seen from p: the two diagonal
    corners projected to the image plane (ref portal.zig imageBounds)."""
    r0, r1, r2 = rot[0], rot[1], rot[2]
    ab = scale[0] * r0 + scale[1] * r1
    o = p - pos
    c0 = vm.safe_normalize(0.5 * ab + o)  # direction portal -> p side
    c1 = vm.safe_normalize(-0.5 * ab + o)
    w0 = jnp.stack([vm.dot(c0, r0), vm.dot(c0, r1), vm.dot(c0, r2)], -1)
    w1 = jnp.stack([vm.dot(c1, r0), vm.dot(c1, r1), vm.dot(c1, r2)], -1)
    uv0, ok0 = world_to_image(w0)
    uv1, ok1 = world_to_image(w1)
    lo = jnp.minimum(uv0, uv1)
    hi = jnp.maximum(uv0, uv1)
    return lo, hi, ok0 & ok1


def _interp_cols(pfx_t, xc):
    """Continuous column fetch: F(x)[y] for all y, x in cell units [0,D].
    pfx_t: [D+1, D]; xc: [N] -> [N, D]."""
    dmax = pfx_t.shape[0] - 1
    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, dmax - 1)
    f = (xc - x0.astype(jnp.float32))[..., None]
    a = jnp.take(pfx_t, x0, axis=0)
    b = jnp.take(pfx_t, x0 + 1, axis=0)
    return a + f * (b - a)


def _window_marginal(pd: PortalDist, lo, hi):
    """Row masses within the window + helpers.

    Returns (mm [N,D] per-row windowed mass, total [N], x0c, x1c cell
    coords, y0c, y1c cell coords)."""
    d = pd.pfx.shape[0]
    df = jnp.float32(d)
    x0c = jnp.clip(lo[..., 0] * df, 0.0, df)
    x1c = jnp.clip(hi[..., 0] * df, 0.0, df)
    y0c = jnp.clip(lo[..., 1] * df, 0.0, df)
    y1c = jnp.clip(hi[..., 1] * df, 0.0, df)
    m = _interp_cols(pd.pfx_t, x1c) - _interp_cols(pd.pfx_t, x0c)  # [N,D]
    yi = jnp.arange(d, dtype=jnp.float32)
    cov = jnp.clip(
        jnp.minimum(y1c[..., None], yi + 1.0) - jnp.maximum(y0c[..., None], yi),
        0.0,
        1.0,
    )
    mm = m * cov
    return mm, jnp.sum(mm, axis=-1), x0c, x1c, y0c, y1c


def sample_windowed(pd: PortalDist, lo, hi, r2):
    """Sample uv ~ lum restricted to the window [lo,hi] (uv units).

    Returns (uv [N,2], pdf_uv [N]) with pdf in 1/uv^2 over the window —
    the ref's WindowedDistribution2D.sampleContinuous contract."""
    d = pd.pfx.shape[0]
    df = jnp.float32(d)
    mm, total, x0c, x1c, y0c, y1c = _window_marginal(pd, lo, hi)
    ok = total > 0.0
    tot = jnp.maximum(total, 1e-30)

    # y: invert the per-row mass CDF
    cdf = jnp.cumsum(mm, axis=-1)
    ty = r2[..., 1] * tot
    yc = jnp.clip(
        jnp.sum((cdf < ty[..., None]).astype(jnp.int32), axis=-1), 0, d - 1
    )
    prev = jnp.where(yc > 0, jnp.take_along_axis(cdf, jnp.maximum(yc - 1, 0)[..., None], -1)[..., 0], 0.0)
    my = jnp.take_along_axis(mm, yc[..., None], -1)[..., 0]
    yi = yc.astype(jnp.float32)
    cov_y = jnp.clip(jnp.minimum(y1c, yi + 1.0) - jnp.maximum(y0c, yi), 0.0, 1.0)
    fy = jnp.clip((ty - prev) / jnp.maximum(my, 1e-30), 0.0, 1.0)
    v_cell = jnp.maximum(y0c, yi) + fy * cov_y
    v = v_cell / df

    # x: invert the row prefix within [x0c, x1c]
    row = jnp.take(pd.pfx, yc, axis=0)  # [N, D+1]
    f0 = _interp_row(row, x0c)
    f1 = _interp_row(row, x1c)
    tx = f0 + r2[..., 0] * (f1 - f0)
    xc = jnp.clip(
        jnp.sum((row[..., 1:] < tx[..., None]).astype(jnp.int32), axis=-1),
        0,
        d - 1,
    )
    ra = jnp.take_along_axis(row, xc[..., None], -1)[..., 0]
    rb = jnp.take_along_axis(row, (xc + 1)[..., None], -1)[..., 0]
    fcell = jnp.maximum(rb - ra, 1e-30)  # lum at (yc, xc)
    fx = jnp.clip((tx - ra) / fcell, 0.0, 1.0)
    u_cell = jnp.clip(xc.astype(jnp.float32) + fx, x0c, x1c)
    u = u_cell / df

    # pdf: f(u,v) / integral, integral in f x uv-area units = total / D^2
    pdf_uv = fcell * df * df / tot
    uv = jnp.stack([u, v], axis=-1)
    return uv, jnp.where(ok, pdf_uv, 0.0)


def _interp_row(row, xc):
    """row: [N, D+1] prefix values; xc: [N] cell coord -> F(xc)."""
    dmax = row.shape[-1] - 2
    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, dmax)
    f = xc - x0.astype(jnp.float32)
    a = jnp.take_along_axis(row, x0[..., None], -1)[..., 0]
    b = jnp.take_along_axis(row, (x0 + 1)[..., None], -1)[..., 0]
    return a + f * (b - a)


def pdf_windowed(pd: PortalDist, lo, hi, uv):
    """pdf (1/uv^2) of uv under the windowed distribution — the query the
    BSDF-hit MIS side needs (ref WindowedDistribution2D.pdf)."""
    d = pd.pfx.shape[0]
    df = jnp.float32(d)
    _, total, _, _, _, _ = _window_marginal(pd, lo, hi)
    ok = total > 0.0
    yc = jnp.clip((uv[..., 1] * df).astype(jnp.int32), 0, d - 1)
    xc = jnp.clip((uv[..., 0] * df).astype(jnp.int32), 0, d - 1)
    row = jnp.take(pd.pfx, yc, axis=0)
    ra = jnp.take_along_axis(row, xc[..., None], -1)[..., 0]
    rb = jnp.take_along_axis(row, (xc + 1)[..., None], -1)[..., 0]
    f = rb - ra
    return jnp.where(ok, f * df * df / jnp.maximum(total, 1e-30), 0.0)


def sample_to(pd: PortalDist, rot, pos, scale, p, r2):
    """NEE sample toward the portal (ref rectangle.zig samplePortalTo).

    Returns dict(wi, pdf (solid angle), t (plane distance), uv_env, ok)."""
    lo, hi, ok = image_bounds(p, rot, pos, scale)
    uv, pdf_uv = sample_windowed(pd, lo, hi, r2)
    w, weight = image_to_world_local(uv)
    r0, r1, r2_ = rot[0], rot[1], rot[2]
    ps_dir = vm.frame_to_world(r0, r1, r2_, w)  # toward the interior
    wi = -ps_dir  # from p out through the portal
    # plane hit: t = -(dot(n, p) - dot(n, pos)) / dot(n, wi)
    denom = vm.dot(r2_, wi)
    t = -(vm.dot(r2_, p) - vm.dot(r2_, jnp.broadcast_to(pos, p.shape))) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1e-12
    )
    pdf = pdf_uv / jnp.maximum(weight, 1e-12)
    ok = ok & (pdf_uv > 0.0) & (t > 0.0)
    uv_env = dome_uv_of_dir(pd.dome_rot, wi)
    return {"wi": wi, "pdf": pdf, "t": t, "uv": uv_env, "ok": ok}


def pdf_to(pd: PortalDist, rot, pos, scale, p, wi):
    """Solid-angle pdf that sample_to would have produced direction wi
    from p (ref portal light propPortalPdf)."""
    lo, hi, okb = image_bounds(p, rot, pos, scale)
    r0, r1, r2_ = rot[0], rot[1], rot[2]
    d_out = wi  # p -> env; portal-local of the INWARD param dir is -wi
    w = jnp.stack(
        [vm.dot(-d_out, r0), vm.dot(-d_out, r1), vm.dot(-d_out, r2_)], -1
    )
    uv, okw = world_to_image(w)
    pdf_uv = pdf_windowed(pd, lo, hi, uv)
    wn = vm.safe_normalize(w)
    weight = (
        (jnp.pi**2)
        * (1.0 - wn[..., 0] ** 2)
        * (1.0 - wn[..., 1] ** 2)
        / jnp.maximum(wn[..., 2], 1e-12)
    )
    return jnp.where(okb & okw, pdf_uv / jnp.maximum(weight, 1e-12), 0.0)
