"""Aperture shapes, autofocus, shutter slope (ref camera/aperture.zig,
rendering/shaper.zig, camera_perspective.zig updateFocus,
camera_base.zig setShutter)."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.render import camera as cam_mod
from zyg_tpu.render.camera import PerspectiveCamera


class TestApertureShape:
    def test_blade_raster(self):
        cam = PerspectiveCamera(
            aperture_radius=0.1, aperture_blades=6, aperture_roundness=0.0
        )
        r = cam._aperture_raster()
        assert r.shape == (128, 128)
        # hexagon area / bounding square = (3*sqrt(3)/2) / 4 ~ 0.6495
        cov = float(r.mean())
        assert abs(cov - 3 * np.sqrt(3) / 8) < 0.02, cov
        # full roundness recovers the disk
        cam2 = PerspectiveCamera(
            aperture_radius=0.1, aperture_blades=6, aperture_roundness=1.0
        )
        cov2 = float(cam2._aperture_raster().mean())
        assert abs(cov2 - np.pi / 4) < 0.02, cov2

    def test_sample_matches_raster_density(self):
        """Alias-table aperture samples land only inside the opening and
        track its density."""
        cam = PerspectiveCamera(
            aperture_radius=1.0, aperture_blades=5, aperture_roundness=0.2
        )
        arrays = cam.arrays()
        assert arrays.ap_prob is not None
        n = 100_000
        rng = np.random.default_rng(3)
        uv = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
        pts = np.asarray(cam_mod.sample_aperture(arrays, uv))
        assert np.abs(pts).max() <= 1.0 + 1e-5
        # every sample must fall on a raster texel with weight > 0
        raster = cam._aperture_raster()
        xi = np.clip(((pts[:, 0] * 0.5 + 0.5) * 128).astype(int), 0, 127)
        yi = np.clip(((pts[:, 1] * 0.5 + 0.5) * 128).astype(int), 0, 127)
        w = raster[yi, xi]
        assert (w > 0).mean() > 0.999
        # density ~ raster weight: compare mass in the center quarter
        mask_c = (np.abs(pts[:, 0]) < 0.5) & (np.abs(pts[:, 1]) < 0.5)
        want = raster[32:96, 32:96].sum() / raster.sum()
        assert abs(mask_c.mean() - want) < 0.01

    def test_image_aperture(self):
        img = np.zeros((64, 64), np.float32)
        img[20:40, 10:50] = 1.0  # rectangular cat-eye
        cam = PerspectiveCamera(aperture_radius=1.0, aperture_image=img)
        arrays = cam.arrays()
        n = 20_000
        rng = np.random.default_rng(4)
        uv = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
        pts = np.asarray(cam_mod.sample_aperture(arrays, uv))
        # all inside the rect (in [-1,1] coords)
        assert (pts[:, 0] >= 10 / 64 * 2 - 1 - 0.01).all()
        assert (pts[:, 0] <= 50 / 64 * 2 - 1 + 0.01).all()
        assert (pts[:, 1] >= 20 / 64 * 2 - 1 - 0.01).all()
        assert (pts[:, 1] <= 40 / 64 * 2 - 1 + 0.01).all()


class TestShutterSlope:
    def test_uniform_is_identity(self):
        cam = PerspectiveCamera()
        arrays = cam.arrays()
        assert arrays.shutter_icdf is None
        u = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(cam_mod.sample_shutter_time(arrays, u)), [0.1, 0.5, 0.9]
        )

    def test_trapezoid_density(self):
        """open=0.5/close=1: half ramp, half plateau — sampled times must
        follow f(t) = t/0.5 clamped at 1 (mean = 11/18 under that pdf)."""
        cam = PerspectiveCamera(shutter_open=0.5, shutter_close=1.0)
        arrays = cam.arrays()
        n = 200_000
        rng = np.random.default_rng(5)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        t = np.asarray(cam_mod.sample_shutter_time(arrays, u))
        assert t.min() >= 0.0 and t.max() <= 1.0
        # pdf ~ ramp then flat: P(t < 0.5) = (0.5*0.5) / (0.25 + 0.5) = 1/3
        assert abs((t < 0.5).mean() - 1.0 / 3.0) < 0.01
        want_mean = (0.25 * 2 / 3 * 0.5 + 0.5 * 0.75) / 0.75
        assert abs(t.mean() - want_mean) < 0.01

    def test_bezier_slope_monotone(self):
        cam = PerspectiveCamera(
            shutter_open=0.3,
            shutter_close=0.7,
            shutter_slope=(0.1, 0.0, 0.2, 0.9, 0.8, 0.9, 0.9, 0.1),
        )
        icdf = cam._shutter_icdf()
        assert icdf is not None
        assert (np.diff(icdf) >= -1e-6).all(), "inverse CDF must be monotone"
        assert icdf[0] >= 0.0 and icdf[-1] <= 1.0


class TestAutofocus:
    def test_focus_point_sets_distance(self):
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_dict

        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "d", "rendering": {"Substitute": {"color": [0.5, 0.5, 0.5]}}},
                    {"name": "sky", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
                ],
                "entities": [
                    {
                        "type": "Prop",
                        "shape": {"type": "Sphere"},
                        "materials": ["d"],
                        "transformation": {"position": [0, 0, 3.0]},
                    },
                    {"type": "Light", "shape": {"type": "Dome"}, "materials": ["sky"]},
                ],
            }
        )
        take = Take()
        take.num_samples_per_pixel = 1
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
        cam = PerspectiveCamera(resolution=(16, 16), fov=np.deg2rad(40.0))
        cam.position = np.array([0, 0, -2.0], np.float32)
        cam.aperture_radius = 0.05
        cam.focus_point = (0.5, 0.5)
        cam.focus_distance = 99.0
        take.cameras = [cam]
        d = Driver(take=take, scene=scene)
        d.start_frame()
        # sphere front face at z=2.5, camera at z=-2 -> distance 4.5
        assert abs(cam.focus_distance - 4.5) < 0.05, cam.focus_distance
