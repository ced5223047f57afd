"""Multi-chip entry points: the driver-facing dryrun + sample sharding.

Round-1 regression: MULTICHIP_r01.json recorded rc=1 because
__graft_entry__.dryrun_multichip relied on the caller to force the CPU
platform. These tests call the *real* entry points the round driver uses.
Ref parallelism model: src/core/rendering/tile_queue.zig (tile queues) →
here shard_map over a 1-D pixel mesh (zyg_tpu/parallel/mesh.py).
"""

import functools
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_entry_point():
    """The exact function the round driver invokes must pass in-process."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    fb, _, _ = jax.jit(fn)(*args)
    img = np.asarray(fb.resolve())
    assert np.isfinite(img).all() and img.max() > 0.0


def test_sample_sharding_psum_matches_sequential():
    """Sample sharding (mesh.py sample_sharded=True): N devices each render a
    different sample offset; psum of their framebuffers must equal the
    sequential sum of the same offsets on one device."""
    from __graft_entry__ import _cornell
    from zyg_tpu.parallel.mesh import render_mesh, shard_render
    from zyg_tpu.render.driver import Driver, _render_samples

    n = 4
    take, scene = _cornell(res=8, spp=1)
    driver = Driver(take=take, scene=scene)

    render_impl = functools.partial(
        _render_samples,
        num_samples=1,
        num_expected_samples=2,
        integrator=take.integrator,
        clamp_max=(np.inf, np.inf, np.inf),
    )

    def render_one(scene, cam, fb, xy, ids, first_it):
        new_fb, _, _ = render_impl(scene, cam, fb, xy, ids, first_it)
        return jax.tree.map(lambda a, b: a - b, new_fb, fb)  # delta only

    args = (scene, driver.camera.arrays(), driver._fb, driver._pixel_xy, driver._pixel_ids)

    mesh = render_mesh(jax.devices()[:n])
    sharded = shard_render(render_one, mesh, sample_sharded=True)
    fb_psum = jax.jit(sharded)(*args, jnp.int32(0))

    seq = jax.tree.map(jnp.zeros_like, driver._fb)
    for i in range(n):
        delta = jax.jit(render_one)(*args, jnp.int32(i))
        seq = jax.tree.map(lambda a, b: a + b, seq, delta)

    for a, b in zip(jax.tree.leaves(fb_psum), jax.tree.leaves(seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Integrator breadth under the virtual 8-device mesh (ref tile_queue.zig
# work distribution): mesh BVH, volume tracking, photon map and lighttracer
# paths must all run sharded and agree with the single-device render.
# Persistent-wavefront shards shuffle with per-shard strides and oversample
# independently, so agreement is statistical (same estimator, different
# extra samples), not bit-exact.
# ---------------------------------------------------------------------------

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def _take(res=16, spp=4, depth=3, ppp=0, photons=0):
    take = Take()
    take.num_samples_per_pixel = spp
    take.num_particles_per_pixel = ppp
    take.photon.num_photons = photons
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=depth)
    cam = PerspectiveCamera(resolution=(res, res), fov=np.deg2rad(60))
    cam.position = np.array([0, 0.2, -3.2], np.float32)
    take.cameras = [cam]
    return take


def _box_entities(extra=()):
    return [
        {"type": "Prop", "shape": {"type": "Rectangle"}, "materials": ["white"],
         "transformation": {"position": [0, -1, 0], "rotation": [90, 0, 0], "scale": [4, 4, 1]}},
        {"type": "Prop", "shape": {"type": "Rectangle"}, "materials": ["white"],
         "transformation": {"position": [0, 0, 2], "rotation": [0, 180, 0], "scale": [4, 4, 1]}},
        {"type": "Light", "shape": {"type": "Rectangle"}, "materials": ["lamp"],
         "transformation": {"position": [0, 1.5, 0.5], "rotation": [-90, 0, 0], "scale": [1, 1, 1]}},
    ] + list(extra)


_MATS = [
    {"name": "white", "rendering": {"Substitute": {"color": [0.6, 0.6, 0.6], "roughness": 1.0}}},
    {"name": "lamp", "rendering": {"Light": {"emittance": {"value": 10.0}}}},
]


def _mesh_scene():
    """Diffuse box + a cube MESH prop (exercises TLAS->BLAS under shards)."""
    from zyg_tpu.scene.loader import MaterialDesc, SceneBuilder, Transformation
    from zyg_tpu.scene import trimesh
    import zyg_tpu.scene.types as st

    b = SceneBuilder()
    grey = b.add_material(MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.8))
    lightm = b.add_material(MaterialDesc(kind=2, emission=np.full(3, 12.0, np.float32)))
    mid = b.add_mesh(trimesh.make_cube_mesh())
    b.add_mesh_prop(mid, Transformation(position=np.array([0, -0.4, 0.3], np.float32)), grey)
    b.add_prop(__import__("zyg_tpu.scene.loader", fromlist=["PropDesc"]).PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(position=np.array([0, -1, 0], np.float32),
                             rotation=np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
                             scale=np.array([4.0, 4.0, 1], np.float32)),
        material=grey))
    b.add_prop(__import__("zyg_tpu.scene.loader", fromlist=["PropDesc"]).PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(position=np.array([0, 1.8, 0.3], np.float32),
                             rotation=np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32),
                             scale=np.array([1.5, 1.5, 1], np.float32)),
        material=lightm, is_light=True))
    return b.build()


def _volume_scene():
    return load_scene_dict({
        "materials": _MATS + [
            {"name": "vol", "rendering": {"Volumetric": {
                "attenuation_color": [0.7, 0.7, 0.7], "subsurface_color": [0.9, 0.9, 0.9],
                "attenuation_distance": 0.8,
                "density_map": {"procedural": {"type": "constant", "value": 0.6, "resolution": 4}}}}},
        ],
        "entities": _box_entities([
            {"type": "Prop", "shape": {"type": "Cube"}, "materials": ["vol"],
             "transformation": {"position": [0, 0, 0.3], "scale": [1, 1, 1]}},
        ]),
    })


def _box_scene():
    return load_scene_dict({"materials": _MATS, "entities": _box_entities()})


def _render_pair(take, scene_fn, **driver_kw):
    img1 = Driver(take=take, scene=scene_fn(), use_mesh=False, **driver_kw).render_frame()
    img8 = Driver(take=take, scene=scene_fn(), use_mesh=True, **driver_kw).render_frame()
    assert np.isfinite(img1).all() and np.isfinite(img8).all()
    assert img1.max() > 0 and img8.max() > 0
    return img1, img8


def test_mesh_scene_under_mesh():
    img1, img8 = _render_pair(_take(res=16, spp=8), _mesh_scene)
    assert abs(img8.mean() / img1.mean() - 1.0) < 0.08


def test_volume_scene_under_mesh():
    img1, img8 = _render_pair(_take(res=16, spp=8, depth=4), _volume_scene)
    assert abs(img8.mean() / img1.mean() - 1.0) < 0.10


def test_lighttracer_under_mesh():
    take = _take(res=16, spp=0, ppp=8)
    img1, img8 = _render_pair(take, _box_scene)
    # particle splats psum over the mesh with the SAME global keys ->
    # identical paths, float add-order tolerance only
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)


def test_photon_map_under_mesh():
    take = _take(res=16, spp=4, depth=3, photons=1024)
    img1, img8 = _render_pair(take, _box_scene)
    assert abs(img8.mean() / img1.mean() - 1.0) < 0.10


def test_ragged_pixel_count_falls_back():
    # 18x9 = 162 pixels, not divisible by 8: the tile guard must route the
    # ragged dispatch to a single device without erroring
    take = _take(res=16, spp=2)
    take.cameras[0].resolution = (18, 9)
    d = Driver(take=take, scene=_box_scene(), use_mesh=True)
    img = d.render_frame()
    assert img.shape == (9, 18, 3) and np.isfinite(img).all() and img.max() > 0


def test_checkpoint_resume_under_mesh(tmp_path):
    # unshuffled persistent path (AOVs force frame_width=0 -> no
    # oversampling): resume at a sample boundary is bit-identical
    def mk():
        take = _take(res=16, spp=4)
        take.aovs = ("albedo",)
        return take

    d_full = Driver(take=mk(), scene=_box_scene(), use_mesh=True)
    img_full = d_full.render_frame()

    d_a = Driver(take=mk(), scene=_box_scene(), use_mesh=True)
    d_a.start_frame()
    d_a.render_iterations(2)
    ckpt = str(tmp_path / "mid.npz")
    d_a.save_state(ckpt)

    d_b = Driver(take=mk(), scene=_box_scene(), use_mesh=True)
    d_b.start_frame()
    d_b.load_state(ckpt)
    d_b.render_iterations(2)
    img_res = d_b.resolve()
    np.testing.assert_allclose(img_res, img_full, rtol=1e-5, atol=1e-6)
    alb = d_b.resolve_aov("albedo")
    assert np.isfinite(alb).all() and alb.max() > 0
