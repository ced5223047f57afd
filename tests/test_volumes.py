"""Volumetric transport tests: scattering furnace, absorption, HG phase."""

import numpy as np
import jax.numpy as jnp
import pytest

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render import materials as mat
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def volume_furnace_scene(att_color, ssc, distance, g=0.0):
    return load_scene_dict(
        {
            "materials": [
                {
                    "name": "vol",
                    "rendering": {
                        "Volumetric": {
                            "attenuation_color": att_color,
                            "subsurface_color": ssc,
                            "attenuation_distance": distance,
                            "anisotropy": g,
                        }
                    },
                },
                {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop",
                    "shape": {"type": "Sphere"},
                    "materials": ["vol"],
                    "transformation": {"scale": [1, 1, 1]},
                },
                {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"]},
            ],
        }
    )


def render_centre(scene, spp=128, depth=32, res=16):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=depth)
    cam = PerspectiveCamera(resolution=(res, res), fov=np.deg2rad(16.0))
    cam.position = np.array([0, 0, -4.0], np.float32)
    take.cameras = [cam]
    img = Driver(take=take, scene=scene).render_frame()
    c = res // 2
    return float(img[c - 3 : c + 3, c - 3 : c + 3].mean())


class TestVolumeFurnace:
    @pytest.mark.parametrize("g", [0.0, 0.4])
    def test_white_scattering_volume(self, g):
        """Unit-albedo scattering medium in a radiance-1 dome is invisible."""
        scene = volume_furnace_scene([0.4, 0.4, 0.4], [1.0, 1.0, 1.0], 0.35, g)
        v = render_centre(scene)
        assert abs(v - 1.0) < 0.06, f"volume furnace (g={g}): {v}"

    def test_pure_absorption_volume(self):
        """Non-scattering medium attenuates the background by exp(-mu_t*2r)."""
        scene = volume_furnace_scene([0.5, 0.5, 0.5], [0.0, 0.0, 0.0], 1.0)
        v = render_centre(scene, spp=64, depth=8)
        # mu_t = -ln(0.5)/1.0; path through centre = diameter 1.0 (sphere
        # scale 1 -> radius 0.5): transmittance = 0.5
        assert abs(v - 0.5) < 0.04, f"absorption: {v}"


class TestHgPhase:
    def test_phase_normalizes(self, rng_np):
        for g in (0.0, 0.3, -0.7):
            mu = jnp.linspace(-1.0, 1.0, 20001)
            p = np.asarray(mat.hg_phase(mu, jnp.float32(g)))
            integral = np.trapezoid(p, np.asarray(mu)) * 2 * np.pi
            assert abs(integral - 1.0) < 1e-3, f"g={g}: {integral}"

    def test_sample_matches_distribution(self, rng_np):
        g = 0.5
        n = 1 << 15
        wo = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))  # ray dir +z
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        wi = mat.hg_sample(wo, jnp.full((n,), g, jnp.float32), xi)
        cos = np.asarray(wi[:, 2])  # forward = -wo = +z
        # mean cosine of HG = g
        assert abs(cos.mean() - g) < 0.01
        assert np.abs(np.linalg.norm(np.asarray(wi), axis=-1) - 1.0).max() < 1e-3
