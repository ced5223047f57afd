"""End-to-end wavefront PT tests: Cornell box + white furnace."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from zyg_tpu.io.take import load_take_file, Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_file, load_scene_dict

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def small_cornell_driver(res=48, spp=4, integrator="PT"):
    take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
    take.cameras[0].resolution = (res, res)
    take.num_samples_per_pixel = spp
    take.integrator.kind = integrator
    take.integrator.max_depth_surface = 6
    scene = load_scene_file(take.scene_filename)
    return Driver(take=take, scene=scene)


class TestCornellPT:
    def test_render_statistics(self):
        d = small_cornell_driver()
        img = d.render_frame()
        assert img.shape == (48, 48, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        # light region at top center should be the brightest area
        mean = img.mean()
        assert 0.05 < mean < 5.0, f"mean radiance {mean} out of plausible range"
        # left third red-dominant bounce tint, right third green-dominant
        left = img[16:32, 2:8].mean(axis=(0, 1))
        right = img[16:32, 40:46].mean(axis=(0, 1))
        assert left[0] > left[1], f"left wall should be red-tinted, got {left}"
        assert right[1] > right[0], f"right wall should be green-tinted, got {right}"

    def test_deterministic(self):
        d1 = small_cornell_driver(res=24, spp=2)
        d2 = small_cornell_driver(res=24, spp=2)
        img1 = d1.render_frame()
        img2 = d2.render_frame()
        np.testing.assert_array_equal(img1, img2)

    def test_progressive_accumulation_matches_batch(self):
        d1 = small_cornell_driver(res=24, spp=4)
        img_batch = d1.render_frame()
        d2 = small_cornell_driver(res=24, spp=4)
        d2.start_frame()
        d2.render_iterations(2)
        d2.render_iterations(2)
        img_prog = d2.resolve()
        np.testing.assert_allclose(img_prog, img_batch, atol=1e-5)


class TestFurnace:
    def test_white_furnace_single_bounce(self):
        """Convex sphere (albedo a) in a uniform radiance-1 dome: pixels on the
        sphere must equal `a` in expectation; background equals 1."""
        albedo = 0.75
        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "diffuse", "rendering": {"Substitute": {"color": [albedo] * 3}}},
                    {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
                ],
                "entities": [
                    {
                        "type": "Prop",
                        "shape": {"type": "Sphere"},
                        "materials": ["diffuse"],
                        "transformation": {"position": [0, 0, 0], "scale": [1, 1, 1]},
                    },
                    {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"]},
                ],
            }
        )
        take = Take()
        take.num_samples_per_pixel = 64
        take.integrator = IntegratorSettings(kind="PT", max_depth_surface=8)
        cam = PerspectiveCamera(resolution=(32, 32), fov=np.deg2rad(30.0))
        cam.position = np.array([0, 0, -4.0], np.float32)
        take.cameras = [cam]
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        # centre 8x8 block fully covers the sphere
        centre = img[12:20, 12:20].mean()
        assert abs(centre - albedo) < 0.02, f"furnace: expected {albedo}, got {centre}"
        corner = img[:4, :4].mean()
        assert abs(corner - 1.0) < 1e-4, f"background should see env=1, got {corner}"
