"""Emissive volumes: tracking emission (ref tracking.zig trackingEmission),
volume lights (ref light.zig Class Volume/VolumeImage + cube.zig
sampleVolumeTo), and the Distribution3D shape sampler wiring."""

import numpy as np
import jax.numpy as jnp
import pytest

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import MaterialDesc, PropDesc, SceneBuilder, Transformation
import zyg_tpu.scene.types as st


def _emissive_cube_scene(e=4.0, att_dist=0.5, albedo=0.0, grid=None, floor=True):
    b = SceneBuilder()
    if floor:
        fl = b.add_material(MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.9))
        rot_floor = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
        b.add_prop(PropDesc(
            shape=int(st.ShapeType.RECTANGLE),
            trafo=Transformation(
                position=np.array([0, 0, 0], np.float32),
                rotation=rot_floor,
                scale=np.array([10, 10, 1], np.float32),
            ),
            material=fl,
        ))
    fire = MaterialDesc(
        kind=int(st.MaterialKind.VOLUMETRIC),
        color=np.full(3, 0.5, np.float32),  # attenuation color
        subsurface_color=np.full(3, albedo, np.float32),
        attenuation_distance=att_dist,
        emission=np.full(3, e, np.float32),
    )
    if grid is not None:
        fire.density_grid = b.add_density_grid(grid)
    fm = b.add_material(fire)
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.CUBE),
        trafo=Transformation(
            position=np.array([0, 1.5, 0], np.float32),
            scale=np.array([2.0, 2.0, 2.0], np.float32),
        ),
        material=fm,
    ))
    return b.build()


def _take(res=(64, 64), spp=16, pos=(0, 1.5, -6.0), look=(0, 1.5, 0)):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=6, max_depth_volume=64)
    cam = PerspectiveCamera(resolution=res, fov=np.deg2rad(45))
    cam.position = np.array(pos, np.float32)
    from zyg_tpu.core.vecmath import look_at_rotation

    cam.rotation = look_at_rotation(pos, look, (0, 1, 0))
    take.cameras = [cam]
    return take


class TestEmissiveVolumes:
    def test_scene_has_volume_light(self):
        scene = _emissive_cube_scene()
        assert "vol_emission" in scene.mat_features
        assert "volume" in scene.light_shapes
        assert bool(np.asarray(scene.lights.volume).any())

    def test_homogeneous_slab_matches_closed_form(self):
        """Camera stares through a purely absorbing emissive cube:
        L = e*mu_a/mu_t*(1-exp(-mu_t*L_thick)) exactly (no scattering,
        no other light)."""
        e = 3.0
        att = 0.5
        scene = _emissive_cube_scene(e=e, att_dist=att, albedo=0.0, floor=False)
        take = _take(res=(16, 16), spp=32)
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        # center pixels pass through the full 2.0 depth of the cube
        mu_t = -np.log(0.5) / att
        # albedo 0 -> mu_s = 0 -> mu_a = mu_t
        expect = e * (1.0 - np.exp(-mu_t * 2.0))
        got = img[6:10, 6:10].mean()
        assert abs(got - expect) / expect < 0.05, (got, expect)

    def test_volume_light_casts_onto_floor(self):
        """Floor lit ONLY by the emissive volume: NEE must transport it."""
        scene = _emissive_cube_scene(e=6.0, albedo=0.2)
        take = _take(res=(48, 48), spp=16, pos=(0, 3.0, -8.0), look=(0, 0.5, 0))
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        # bottom rows see the floor in front of the cube
        floor_part = img[40:, :, :]
        assert floor_part.mean() > 5e-3, floor_part.mean()

    def test_heterogeneous_emissive_smoke(self):
        """fbm-density emissive smoke: finite image, glow visible, and the
        Distribution3D-driven NEE is active (vol_light_dist wired)."""
        from zyg_tpu.scene.grids import make_fbm_grid

        g = make_fbm_grid(24, octaves=3, seed=3)
        scene = _emissive_cube_scene(e=8.0, albedo=0.3, grid=g)
        assert scene.vol_light_dist is not None and 0 in scene.vol_light_dist
        take = _take(res=(32, 32), spp=16)
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        assert img.mean() > 1e-3

    def test_boundary_not_surface_emissive(self):
        """The volumetric boundary must not emit like a surface light: a
        zero-density grid (empty medium) renders black."""
        g = np.zeros((8, 8, 8), np.float32)
        scene = _emissive_cube_scene(e=50.0, albedo=0.0, grid=g, floor=False)
        take = _take(res=(16, 16), spp=8)
        img = Driver(take=take, scene=scene).render_frame()
        assert img.max() < 1e-4, img.max()
