"""Fused full-bounce shade kernel (ops/shade.py) vs the general XLA body.

The kernel mirrors the ptmis bounce 1:1 for analytic substitute/light
scenes (module docstring lists the exact scope). CPU CI runs it through
the Mosaic interpreter and checks per-lane agreement with the general
body on the Cornell scene:

- masks / depths / ray counts must be EXACT (the two paths must kill and
  continue the same lanes — lane lifecycles drive the persistent loop);
- live-lane geometry (o, d, bxdf pdf) to float noise;
- radiance accumulators statistically: the sphquad solid angle uses an
  arccos polynomial in-kernel (Mosaic has no acos), so per-lane NEE
  contributions differ at ~1e-2 relative worst-case while each path stays
  a consistent (sample, pdf) pair — column SUMS must agree tightly.

Dead/miss lanes are excluded from value comparisons: the two paths read
different garbage rows there (table order vs prop id 0) by design.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def cornell():
    from zyg_tpu.scene.loader import load_scene_file

    return load_scene_file("examples/scenes/cornell.scene")


def _state(n, seed=7):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.render.integrator import volume as vol_mod
    from zyg_tpu.core.sobol import SobolSampler
    from zyg_tpu.core.rng import hash_u32

    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.9
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = rng.integers(0, 3, n).astype(np.int32)
    singular = (depth == 0) | (rng.random(n) < 0.2)
    alive = rng.random(n) < 0.9
    thr = rng.random((n, 3)).astype(np.float32) * 0.9 + 0.05
    return ptmis.PathState(
        o=jnp.asarray(o), d=jnp.asarray(d), throughput=jnp.asarray(thr),
        result=ptmis.IValue.zeros(n),
        alive=jnp.asarray(alive),
        bxdf_pdf=jnp.asarray(rng.random(n).astype(np.float32) * 2.0),
        singular=jnp.asarray(singular),
        medium=vol_mod.stack_empty(n),
        depth=jnp.asarray(depth), vol_depth=jnp.zeros(n, jnp.int32),
        rays=jnp.int32(0),
        sobol=SobolSampler.start_pixel(
            jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32)
        ).arrays,
        vol_key=hash_u32(jnp.arange(n, dtype=jnp.uint32)),
        mis_o=jnp.asarray(o), mis_n=jnp.asarray(d),
        from_volume=jnp.zeros(n, bool), primary_chain=jnp.ones(n, bool),
        time=jnp.zeros(n, jnp.float32), nee_thr=jnp.zeros(n, jnp.float32),
        reg_alpha=jnp.zeros(n, jnp.float32), aov={},
        wavelength=jnp.zeros(n, jnp.float32),
        pid=jnp.arange(n, dtype=jnp.uint32), split={},
    )


def test_fused_bounce_matches_general_body(cornell):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    settings = ptmis.PtmisSettings(max_depth=16)
    assert shade_ops.structural_ok(cornell, settings, None)
    body_ref = ptmis._make_body(cornell, settings)  # CPU -> general body
    body_fused = shade_ops.make_fused_body(
        cornell, settings, force_interpret=True
    )
    assert body_fused is not None

    s = _state(2048)
    r1 = jax.jit(body_ref)(s)
    r2 = jax.jit(body_fused)(s)

    # lane lifecycles exact
    np.testing.assert_array_equal(np.asarray(r1.alive), np.asarray(r2.alive))
    np.testing.assert_array_equal(np.asarray(r1.depth), np.asarray(r2.depth))
    np.testing.assert_array_equal(
        np.asarray(r1.singular), np.asarray(r2.singular)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.primary_chain), np.asarray(r2.primary_chain)
    )
    assert int(r1.rays) == int(r2.rays)

    live = np.asarray(r1.alive)

    def livecmp(a, b, tol):
        a = np.asarray(a, np.float64)[live]
        b = np.asarray(b, np.float64)[live]
        rel = np.abs(a - b) / (np.abs(a) + 1e-3)
        assert rel.max() < tol, rel.max()

    livecmp(r1.o, r2.o, 1e-4)
    livecmp(r1.d, r2.d, 1e-5)
    livecmp(r1.bxdf_pdf, r2.bxdf_pdf, 1e-5)
    livecmp(r1.mis_n, r2.mis_n, 1e-5)
    livecmp(r1.throughput, r2.throughput, 5e-3)

    # radiance column sums (estimator totals; see module docstring)
    for f1, f2 in (
        (r1.result.emission, r2.result.emission),
        (r1.result.direct, r2.result.direct),
        (r1.result.indirect, r2.result.indirect),
    ):
        s1 = np.asarray(f1).sum(axis=0)
        s2 = np.asarray(f2).sum(axis=0)
        np.testing.assert_allclose(s1, s2, rtol=2e-3, atol=1e-4)


def test_fused_body_gates(cornell):
    """Scenes/settings outside the kernel's scope must fall back."""
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    ok = ptmis.PtmisSettings(max_depth=16)
    assert shade_ops.structural_ok(cornell, ok, None)
    assert not shade_ops.structural_ok(
        cornell, ok._replace(collect_aovs=("albedo",)), None
    )
    assert not shade_ops.structural_ok(
        cornell, ok._replace(light_split_depth=2), None
    )
    assert not shade_ops.structural_ok(cornell, ok, object())  # photon map
    assert not shade_ops.structural_ok(
        cornell._replace(mat_features={"glass": True}), ok, None
    )
    # on CPU the public gate must refuse even valid scenes
    assert not shade_ops.applies(cornell, ok, None)


# ---------------------------------------------------------------------------
# mesh-scene HYBRID bounce (XLA traversals around the surface-shade kernel)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh_scene():
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.loader import (
        MaterialDesc, PropDesc, SceneBuilder, Transformation,
    )
    import zyg_tpu.scene.types as st

    b = SceneBuilder()
    grey = b.add_material(
        MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.5)
    )
    lightm = b.add_material(
        MaterialDesc(kind=2, emission=np.full(3, 30.0, np.float32))
    )
    mid = b.add_mesh(trimesh.make_trefoil_mesh(48, 32))
    b.add_mesh_prop(
        mid, Transformation(scale=np.full(3, 0.35, np.float32)), grey
    )
    rot_down = np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32)
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(
            position=np.array([0, 4.0, 0], np.float32),
            rotation=rot_down,
            scale=np.array([3.0, 3.0, 1], np.float32),
        ),
        material=lightm,
        is_light=True,
        visible_shadow=False,
    ))
    return b.build()


def _mesh_state(n, seed=3):
    s = _state(n, seed=seed)
    rng = np.random.default_rng(seed + 1)
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return s._replace(
        o=jnp.asarray(o), d=jnp.asarray(d),
        mis_o=jnp.asarray(o), mis_n=jnp.asarray(d),
    )


def test_mesh_fused_bounce_matches_general_body(mesh_scene):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    settings = ptmis.PtmisSettings(max_depth=4)
    assert shade_ops.structural_ok_mesh(mesh_scene, settings, None)
    assert not shade_ops.structural_ok(mesh_scene, settings, None)
    body_ref = ptmis._make_body(mesh_scene, settings)  # CPU -> general body
    body_fused = shade_ops.make_mesh_fused_body(
        mesh_scene, settings, force_interpret=True
    )
    assert body_fused is not None

    s = _mesh_state(2048)
    r1 = jax.jit(body_ref)(s)
    r2 = jax.jit(body_fused)(s)

    # lane lifecycles exact
    np.testing.assert_array_equal(np.asarray(r1.alive), np.asarray(r2.alive))
    np.testing.assert_array_equal(np.asarray(r1.depth), np.asarray(r2.depth))
    np.testing.assert_array_equal(
        np.asarray(r1.singular), np.asarray(r2.singular)
    )
    assert int(r1.rays) == int(r2.rays)

    live = np.asarray(r1.alive)

    def livecmp(a, b, tol):
        a = np.asarray(a, np.float64)[live]
        b = np.asarray(b, np.float64)[live]
        rel = np.abs(a - b) / (np.abs(a) + 1e-3)
        assert rel.max() < tol, rel.max()

    livecmp(r1.o, r2.o, 1e-4)
    # interpolated mesh shading normals push slightly more float noise
    # through the interpreter's transcendentals than Cornell's axis-aligned
    # frames — 5e-5 instead of the analytic test's 1e-5
    livecmp(r1.d, r2.d, 5e-5)
    livecmp(r1.bxdf_pdf, r2.bxdf_pdf, 5e-5)
    livecmp(r1.mis_n, r2.mis_n, 5e-5)
    livecmp(r1.throughput, r2.throughput, 5e-3)

    for f1, f2 in (
        (r1.result.emission, r2.result.emission),
        (r1.result.direct, r2.result.direct),
        (r1.result.indirect, r2.result.indirect),
    ):
        s1 = np.asarray(f1).sum(axis=0)
        s2 = np.asarray(f2).sum(axis=0)
        np.testing.assert_allclose(s1, s2, rtol=2e-3, atol=1e-4)


def test_mesh_fused_body_gates(mesh_scene, cornell):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    ok = ptmis.PtmisSettings(max_depth=4)
    assert shade_ops.structural_ok_mesh(mesh_scene, ok, None)
    # analytic-only scenes stay on the full-bounce kernel
    assert not shade_ops.structural_ok_mesh(cornell, ok, None)
    assert not shade_ops.structural_ok_mesh(
        mesh_scene, ok._replace(collect_aovs=("albedo",)), None
    )
    assert not shade_ops.structural_ok_mesh(mesh_scene, ok, object())
    assert not shade_ops.structural_ok_mesh(
        mesh_scene._replace(mat_features={"glass": True}), ok, None
    )


# ---------------------------------------------------------------------------
# GENERAL hybrid bounce v2 (textures + env lights + any light shapes)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def textured_env_scene():
    """Small version of the bench textured-trefoil + sun/sky dome case."""
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.sky import bake_sky
    from zyg_tpu.scene.loader import (
        MaterialDesc, PropDesc, SceneBuilder, Transformation,
    )
    import zyg_tpu.scene.types as st

    b = SceneBuilder()
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    checker = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    albedo = np.stack(
        [0.15 + 0.6 * checker, 0.35 + 0.3 * (1 - checker), 0.25 + 0.1 * checker], -1
    )
    rough = np.clip(
        0.4 + 0.3 * np.sin(xx * 0.3) * np.cos(yy * 0.2), 0.05, 1.0
    ).astype(np.float32)[..., None]
    tex_c = b.add_texture_image(albedo.astype(np.float32))
    tex_r = b.add_texture_image(rough)
    matd = b.add_material(
        MaterialDesc(roughness=0.5, color_tex=tex_c, roughness_tex=tex_r)
    )
    grey = b.add_material(MaterialDesc(color=np.full(3, 0.4, np.float32), roughness=0.9))
    sun_dir = np.array([0.35, -0.65, 0.4], np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    sky_img = bake_sky(sun_dir, turbidity=2.8, width=32, height=16)
    tex_sky = b.add_texture_image(np.asarray(sky_img, np.float32))
    skym = b.add_material(MaterialDesc(kind=2, emission_tex=tex_sky,
                                       emission=np.ones(3, np.float32)))
    mid = b.add_mesh(trimesh.make_trefoil_mesh(48, 32))
    b.add_mesh_prop(mid, Transformation(scale=np.full(3, 0.35, np.float32)), matd)
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(
            position=np.array([0, -1.6, 0], np.float32),
            rotation=np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
            scale=np.array([10.0, 10.0, 1], np.float32),
        ),
        material=grey,
    ))
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.DOME),
        trafo=Transformation(),
        material=skym,
        is_light=True,
    ))
    return b.build()


def test_v2_fused_bounce_matches_general_body(textured_env_scene):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    scene = textured_env_scene
    settings = ptmis.PtmisSettings(max_depth=4)
    assert shade_ops.structural_ok_mesh_v2(scene, settings, None)
    # out of scope for the narrower kernels
    assert not shade_ops.structural_ok(scene, settings, None)
    assert not shade_ops.structural_ok_mesh(scene, settings, None)
    body_ref = ptmis._make_body(scene, settings)  # CPU -> general body
    body_v2 = shade_ops.make_mesh_fused_body_v2(
        scene, settings, force_interpret=True
    )
    assert body_v2 is not None

    s = _mesh_state(2048)
    r1 = jax.jit(body_ref)(s)
    r2 = jax.jit(body_v2)(s)

    np.testing.assert_array_equal(np.asarray(r1.alive), np.asarray(r2.alive))
    np.testing.assert_array_equal(np.asarray(r1.depth), np.asarray(r2.depth))
    np.testing.assert_array_equal(
        np.asarray(r1.singular), np.asarray(r2.singular)
    )
    assert int(r1.rays) == int(r2.rays)

    live = np.asarray(r1.alive)

    def livecmp(a, b, tol):
        a = np.asarray(a, np.float64)[live]
        b = np.asarray(b, np.float64)[live]
        rel = np.abs(a - b) / (np.abs(a) + 1e-3)
        assert rel.max() < tol, rel.max()

    livecmp(r1.o, r2.o, 1e-4)
    livecmp(r1.d, r2.d, 5e-5)
    # textured roughness reaches 0.05 (alpha 2.5e-3): grazing VNDF pdfs
    # amplify the interpreter's transcendental float noise ~100x vs the
    # roughness-0.5 scenes above (worst lane measured 5.4e-3 relative;
    # its direction and weight still match to 5e-5 — a consistent
    # (sample, pdf) pair)
    livecmp(r1.bxdf_pdf, r2.bxdf_pdf, 1e-2)
    livecmp(r1.mis_n, r2.mis_n, 5e-5)
    livecmp(r1.throughput, r2.throughput, 5e-3)

    for f1, f2 in (
        (r1.result.emission, r2.result.emission),
        (r1.result.direct, r2.result.direct),
        (r1.result.indirect, r2.result.indirect),
    ):
        s1 = np.asarray(f1).sum(axis=0)
        s2 = np.asarray(f2).sum(axis=0)
        np.testing.assert_allclose(s1, s2, rtol=2e-3, atol=1e-4)


def test_v2_fused_body_gates(textured_env_scene, mesh_scene):
    from zyg_tpu.render.integrator import ptmis
    from zyg_tpu.ops import shade as shade_ops

    ok = ptmis.PtmisSettings(max_depth=4)
    scene = textured_env_scene
    assert shade_ops.structural_ok_mesh_v2(scene, ok, None)
    # v1-scope scenes also qualify for v2 (dispatch order prefers v1)
    assert shade_ops.structural_ok_mesh_v2(mesh_scene, ok, None)
    assert not shade_ops.structural_ok_mesh_v2(
        scene, ok._replace(collect_aovs=("albedo",)), None
    )
    assert not shade_ops.structural_ok_mesh_v2(
        scene, ok._replace(light_split_depth=2), None
    )
    assert not shade_ops.structural_ok_mesh_v2(scene, ok, object())
    assert not shade_ops.structural_ok_mesh_v2(
        scene._replace(mat_features={"glass": True}), ok, None
    )
    assert not shade_ops.structural_ok_mesh_v2(
        scene._replace(mat_features={"media": True}), ok, None
    )
