"""Portal lights (ref portal.zig + shape_sampler.zig PortalImpl +
rectangle.zig samplePortalTo)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zyg_tpu.scene import portal as pm
from zyg_tpu.scene import light_sampling as ls_mod
from zyg_tpu.scene.loader import load_scene_file
from zyg_tpu.io.take import load_take_file

TAKES = os.path.join(os.path.dirname(__file__), "..", "examples", "takes")


def _rand_dist(seed=0, d=64):
    rng = np.random.default_rng(seed)
    lum = (rng.random((d, d)).astype(np.float32) ** 2) + 0.01
    return lum, pm.make_portal_dist(lum, np.eye(3))


def test_windowed_sample_expectation():
    """E[1/pdf] over the window = window area (the estimator integrates
    the constant 1)."""
    _, pd = _rand_dist()
    n = 100_000
    rng = np.random.default_rng(1)
    lo = jnp.tile(jnp.asarray([[0.13, 0.22]], jnp.float32), (n, 1))
    hi = jnp.tile(jnp.asarray([[0.77, 0.90]], jnp.float32), (n, 1))
    r2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    uv, pdf = jax.jit(pm.sample_windowed)(pd, lo, hi, r2)
    uv, pdf = np.asarray(uv), np.asarray(pdf)
    assert (pdf > 0).all()
    assert uv[:, 0].min() >= 0.13 - 1e-4 and uv[:, 0].max() <= 0.77 + 1e-4
    assert uv[:, 1].min() >= 0.22 - 1e-4 and uv[:, 1].max() <= 0.90 + 1e-4
    est = (1.0 / pdf).mean()
    area = (0.77 - 0.13) * (0.90 - 0.22)
    assert abs(est / area - 1.0) < 0.02


def test_windowed_pdf_matches_sample():
    """pdf_windowed at a sampled uv equals the pdf sample_windowed
    returned (MIS hit-side consistency)."""
    _, pd = _rand_dist(seed=2)
    n = 50_000
    rng = np.random.default_rng(3)
    lo = jnp.tile(jnp.asarray([[0.05, 0.4]], jnp.float32), (n, 1))
    hi = jnp.tile(jnp.asarray([[0.6, 0.95]], jnp.float32), (n, 1))
    r2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    uv, pdf = jax.jit(pm.sample_windowed)(pd, lo, hi, r2)
    pq = np.asarray(jax.jit(pm.pdf_windowed)(pd, lo, hi, uv))
    rel = np.abs(pq - np.asarray(pdf)) / np.maximum(np.asarray(pdf), 1e-6)
    # cell-boundary samples may land in the neighbor cell: median must be
    # exact, outliers rare
    assert np.median(rel) < 1e-5
    assert (rel > 1e-3).mean() < 2e-3


@pytest.fixture(scope="module")
def portal_scene():
    take = load_take_file(os.path.join(TAKES, "portal.take"))
    scene = load_scene_file(take.scene_filename)
    return take, scene


def test_portal_scene_structure(portal_scene):
    _, scene = portal_scene
    assert scene.portals is not None and len(scene.portals) == 1
    ((li, pp),) = scene.portals.keys()
    # dome light replaced: no DOME entry in light_shapes, portal key set
    from zyg_tpu.scene.types import ShapeType

    assert "portal" in scene.light_shapes
    assert str(int(ShapeType.DOME)) not in scene.light_shapes
    # the linked dome prop is fully invisible (prototype)
    dome = int(np.asarray(scene.lights.prop)[li])
    assert dome == pp  # portal prop IS the light's prop
    assert not bool(np.asarray(scene.prop_visible_shadow)[pp])


def test_portal_nee_matches_dense_integral(portal_scene):
    """Irradiance-through-the-window estimator: E[Le * cos / pdf] over
    portal NEE samples must match a dense quadrature of the env radiance
    over the portal image window (bounds x jacobian x dome uv lookup all
    exercised)."""
    _, scene = portal_scene
    ((li, pp),) = scene.portals.keys()
    pd = scene.portals[(li, pp)]

    p0 = np.array([0.3, 0.9, 0.4], np.float32)  # interior point
    n0 = np.array([0.0, 1.0, 0.0], np.float32)
    n = 200_000
    rng = np.random.default_rng(7)
    p = jnp.tile(jnp.asarray(p0)[None], (n, 1))
    nrm = jnp.tile(jnp.asarray(n0)[None], (n, 1))
    xi = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lidx = jnp.full((n,), li, jnp.int32)

    lsmp = jax.jit(ls_mod.sample_light, static_argnames=())(scene, lidx, p, nrm, xi)
    rad = jax.jit(ls_mod.light_radiance)(scene, lidx, lsmp.wi, lsmp.light_n, lsmp.uv)
    wi = np.asarray(lsmp.wi)
    pdf = np.asarray(lsmp.pdf)
    rad = np.asarray(rad)
    cosw = np.maximum((wi * n0).sum(-1), 0.0)
    ok = pdf > 0
    lum = rad[..., :3].mean(-1)
    est = np.where(ok, lum * cosw / np.maximum(pdf, 1e-20), 0.0).mean()

    # dense quadrature over the same uv window
    rot = np.asarray(scene.prop_rot)[pp]
    pos = np.asarray(scene.prop_pos)[pp]
    scale = np.asarray(scene.prop_scale)[pp]
    lo, hi, okb = pm.image_bounds(
        jnp.asarray(p0), jnp.asarray(rot), jnp.asarray(pos), jnp.asarray(scale)
    )
    assert bool(okb)
    lo, hi = np.asarray(lo), np.asarray(hi)
    d = 256
    us = lo[0] + (np.arange(d) + 0.5) / d * (hi[0] - lo[0])
    vs = lo[1] + (np.arange(d) + 0.5) / d * (hi[1] - lo[1])
    uu, vv = np.meshgrid(us, vs)
    uvg = jnp.asarray(np.stack([uu, vv], -1).reshape(-1, 2), jnp.float32)
    w_loc, weight = pm.image_to_world_local(uvg)
    w_loc, weight = np.asarray(w_loc), np.asarray(weight)
    dirs = -(w_loc @ rot)  # frame_to_world with rows
    uv_env = np.asarray(pm.dome_uv_of_dir(pd.dome_rot, jnp.asarray(dirs)))
    radg = np.asarray(
        jax.jit(ls_mod.light_radiance)(
            scene,
            jnp.full((d * d,), li, jnp.int32),
            jnp.asarray(dirs),
            jnp.asarray(-dirs),
            jnp.asarray(uv_env),
        )
    )
    cosg = np.maximum((dirs * n0).sum(-1), 0.0)
    lumg = radg[..., :3].mean(-1)
    cell = (hi[0] - lo[0]) * (hi[1] - lo[1]) / (d * d)
    ref = (lumg * cosg * weight).sum() * cell
    assert ref > 0
    assert abs(est / ref - 1.0) < 0.05


def test_portal_sample_pdf_roundtrip(portal_scene):
    """pdf_to of a sampled direction equals the sample's pdf."""
    _, scene = portal_scene
    ((li, pp),) = scene.portals.keys()
    pd = scene.portals[(li, pp)]
    rot = jnp.asarray(np.asarray(scene.prop_rot)[pp])
    pos = jnp.asarray(np.asarray(scene.prop_pos)[pp])
    scale = jnp.asarray(np.asarray(scene.prop_scale)[pp])
    n = 20_000
    rng = np.random.default_rng(11)
    p = jnp.asarray(
        np.array([0.0, 1.2, -0.5], np.float32)
        + rng.random((n, 3)).astype(np.float32) * np.array([1.0, 0.8, 1.0], np.float32)
    )
    r2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    res = jax.jit(pm.sample_to)(pd, rot, pos, scale, p, r2)
    pq = np.asarray(jax.jit(pm.pdf_to)(pd, rot, pos, scale, p, res["wi"]))
    pdf = np.asarray(res["pdf"])
    ok = np.asarray(res["ok"])
    rel = np.abs(pq - pdf) / np.maximum(pdf, 1e-6)
    assert ok.mean() > 0.95
    assert np.median(rel[ok]) < 1e-4
    assert (rel[ok] > 1e-2).mean() < 5e-3


def test_portal_take_renders(portal_scene):
    from zyg_tpu.render.driver import Driver

    take, scene = portal_scene
    take.num_samples_per_pixel = 2
    take.cameras[0].resolution = (64, 48)
    d = Driver(take=take, scene=scene)
    d.start_frame()
    d.render_iterations(2)
    img = np.asarray(d.resolve())
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # the window sees the sky
