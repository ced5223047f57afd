"""Sky model + texture engine tests."""

import os

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene.sky import bake_sky, sun_radiance
from zyg_tpu.scene.textures import TextureBuilder, sample_bilinear
from zyg_tpu.scene.loader import load_scene_file, load_scene_dict
from zyg_tpu.io.take import load_take_file
from zyg_tpu.render.driver import Driver

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


class TestSkyModel:
    def test_bake_plausible(self):
        sun_dir = np.array([0.3, -0.8, 0.5])
        sun_dir /= np.linalg.norm(sun_dir)
        img = bake_sky(sun_dir, turbidity=2.5, width=64, height=32)
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all() and (img >= 0).all()
        upper = img[:16]
        # sky is blue-ish away from the sun: B channel dominates on average
        assert upper[..., 2].mean() > upper[..., 0].mean()
        # brightest upper-hemisphere texel is near the sun direction
        to_sun = -sun_dir
        iy, ix = np.unravel_index(np.argmax(upper.sum(-1)), upper.shape[:2])
        theta = (iy + 0.5) / 32 * np.pi
        phi = ((ix + 0.5) / 64 - 0.5) * 2 * np.pi
        d = np.array([np.sin(theta) * np.sin(phi), np.cos(theta), np.sin(theta) * np.cos(phi)])
        assert d @ to_sun > 0.8, f"brightest texel not near sun: {d} vs {to_sun}"

    def test_sun_radiance_reddens_at_horizon(self):
        high = sun_radiance(np.array([0.0, -1.0, 0.0]))
        low = sun_radiance(np.array([0.0, -0.1, 0.99]))
        assert (low <= high).all()
        assert low[0] / max(low[2], 1e-6) > high[0] / max(high[2], 1e-6)

    def test_scene_with_sky_renders(self):
        take = load_take_file(os.path.join(EXAMPLES, "takes", "sunsky.take"))
        take.cameras[0].resolution = (48, 32)
        take.num_samples_per_pixel = 8
        take.integrator.max_depth_surface = 4
        scene = load_scene_file(take.scene_filename)
        assert scene.lights.count == 2  # dome + sun
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # upper rows see sky: blue-ish
        sky_px = img[:6].reshape(-1, 3)
        assert sky_px[:, 2].mean() > sky_px[:, 0].mean()

    def test_sun_casts_shadow(self):
        """Direct sun: ground in the sphere's shadow is much darker than
        open ground."""
        take = load_take_file(os.path.join(EXAMPLES, "takes", "sunsky.take"))
        take.cameras[0].resolution = (96, 54)
        take.num_samples_per_pixel = 16
        take.integrator.max_depth_surface = 2
        scene = load_scene_file(take.scene_filename)
        img = Driver(take=take, scene=scene).render_frame()
        # shadow falls screen-right of the sphere (sun from +x overhead)
        shadow = img[38:42, 44:54].mean()
        lit = img[50, 10:30].mean()
        assert lit > 1.8 * shadow, f"no sun shadow: lit={lit} shadow={shadow}"


class TestTextures:
    def test_bilinear_roundtrip(self, rng_np):
        tb = TextureBuilder()
        img = rng_np.random((8, 16, 3)).astype(np.float32)
        tid = tb.add(img)
        arena = tb.build()
        # sample at texel centers -> exact values
        ys, xs = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
        uv = jnp.asarray(
            np.stack([(xs.ravel() + 0.5) / 16, (ys.ravel() + 0.5) / 8], -1), jnp.float32
        )
        out = np.asarray(sample_bilinear(arena, jnp.full(128, tid, jnp.int32), uv))
        np.testing.assert_allclose(out[:, :3], img.reshape(-1, 3), atol=1e-6)

    def test_textured_material_render(self, tmp_path, rng_np):
        # checkerboard emission texture on a dome: render sees both colors
        check = np.zeros((2, 4, 3), np.float32)
        check[:, ::2] = [4.0, 0.2, 0.2]
        check[:, 1::2] = [0.2, 0.2, 4.0]
        from zyg_tpu.scene.loader import SceneBuilder, MaterialDesc, PropDesc, Transformation
        from zyg_tpu.scene.types import ShapeType, MaterialKind
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera

        b = SceneBuilder()
        tid = b.add_texture_image(check)
        m = b.add_material(
            MaterialDesc(
                kind=int(MaterialKind.LIGHT),
                emission=np.ones(3, np.float32),
                emission_tex=tid,
            )
        )
        b.add_prop(
            PropDesc(shape=int(ShapeType.DOME), trafo=Transformation(), material=m, is_light=True, visible_shadow=False)
        )
        scene = b.build()
        take = Take()
        take.num_samples_per_pixel = 1
        take.integrator = IntegratorSettings(kind="PT", max_depth_surface=2)
        cam = PerspectiveCamera(resolution=(32, 16), fov=np.deg2rad(90))
        take.cameras = [cam]
        img = Driver(take=take, scene=scene).render_frame()
        reds = (img[..., 0] > img[..., 2]).mean()
        assert 0.2 < reds < 0.8, f"checker not visible: red fraction {reds}"
