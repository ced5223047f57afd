"""Nested-dielectric medium stack tests (ref src/core/scene/prop/medium.zig).

The observable contract: inside overlapping media the HIGHEST-priority one
owns the volume (absorption/ior), and boundaries whose material loses the
priority contest are false (null) interfaces — no fresnel, no refraction.
"""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.render.integrator import volume as vol_mod
from zyg_tpu.scene.loader import load_scene_dict


class TestStackOps:
    def _scene(self):
        return load_scene_dict(
            {
                "materials": [
                    {"name": "glass", "rendering": {"Glass": {"ior": 1.5, "priority": 1}}},
                    {"name": "water", "rendering": {"Glass": {"ior": 1.33, "priority": 0}}},
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["glass"],
                     "transformation": {"scale": [1.6, 1.6, 1.6]}},
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["water"],
                     "transformation": {"scale": [1.0, 1.0, 1.0]}},
                ],
            }
        )

    def test_push_pop_and_priority(self):
        scene = self._scene()
        n = 4
        st = vol_mod.stack_empty(n)
        glass_prop = jnp.zeros((n,), jnp.int32)
        water_prop = jnp.ones((n,), jnp.int32)
        tr = jnp.ones((n,), bool)
        st = vol_mod.stack_update(st, glass_prop, tr, tr)  # enter glass
        st = vol_mod.stack_update(st, water_prop, tr, tr)  # enter water
        eff, ior = vol_mod.stack_effective(scene, st)
        # glass (priority 1) owns the overlap even though water is newer
        np.testing.assert_array_equal(np.asarray(eff), 0)
        np.testing.assert_allclose(np.asarray(ior), 1.5)
        # interface info at the water boundary: surrounded by glass
        ior_x, maxp, in_st = vol_mod.stack_info_at_hit(scene, st, water_prop)
        assert np.asarray(in_st).all()
        np.testing.assert_allclose(np.asarray(ior_x), 1.5)
        # water (prio 0) < glass (prio 1): false interface
        assert (np.asarray(maxp) > 0.5).all()
        # exit water, exit glass -> vacuum
        st = vol_mod.stack_update(st, water_prop, ~tr, tr)
        st = vol_mod.stack_update(st, glass_prop, ~tr, tr)
        eff, ior = vol_mod.stack_effective(scene, st)
        np.testing.assert_array_equal(np.asarray(eff), -1)
        np.testing.assert_allclose(np.asarray(ior), 1.0)

    def test_equal_priority_newest_wins(self):
        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "a", "rendering": {"Glass": {"ior": 1.2}}},
                    {"name": "b", "rendering": {"Glass": {"ior": 1.8}}},
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["a"],
                     "transformation": {"scale": [2, 2, 2]}},
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["b"],
                     "transformation": {"scale": [1, 1, 1]}},
                ],
            }
        )
        n = 2
        st = vol_mod.stack_empty(n)
        tr = jnp.ones((n,), bool)
        st = vol_mod.stack_update(st, jnp.zeros((n,), jnp.int32), tr, tr)
        st = vol_mod.stack_update(st, jnp.ones((n,), jnp.int32), tr, tr)
        _, ior = vol_mod.stack_effective(scene, st)
        # same priority: the newest entry wins (ref medium.zig `>=` scan)
        np.testing.assert_allclose(np.asarray(ior), 1.8)


def nested_scene(water_priority: int):
    """Index-matched nested spheres: outer clear glass, inner absorbing
    'water' of the same ior (so rays never bend; only priorities matter)."""
    return load_scene_dict(
        {
            "materials": [
                {"name": "glass", "rendering": {"Glass": {"ior": 1.5, "priority": 1}}},
                {
                    "name": "water",
                    "rendering": {
                        "Glass": {
                            "ior": 1.5,
                            "priority": water_priority,
                            "attenuation_color": [0.25, 0.25, 0.25],
                            "attenuation_distance": 1.0,
                        }
                    },
                },
                {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
            ],
            "entities": [
                {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["glass"],
                 "transformation": {"scale": [1.6, 1.6, 1.6]}},
                {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["water"],
                 "transformation": {"scale": [1.0, 1.0, 1.0]}},
                {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"],
                 "visibility": {"in_shadow": False}},
            ],
        }
    )


def render_centre(scene, spp=160, res=16):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=24, max_depth_volume=64)
    cam = PerspectiveCamera(resolution=(res, res), fov=np.deg2rad(8.0))
    cam.position = np.array([0, 0, -5.0], np.float32)
    take.cameras = [cam]
    img = Driver(take=take, scene=scene).render_frame()
    c = res // 2
    return float(img[c - 2 : c + 2, c - 2 : c + 2].mean())


class TestWaterInGlass:
    def test_high_priority_water_absorbs(self):
        """Water wins the overlap: the chord through the inner sphere (1.0)
        absorbs exp(-ln4) = 0.25; glass adds ~4% fresnel per outer face."""
        v = render_centre(nested_scene(water_priority=2))
        # transmitted fraction ~ 0.96^2 * 0.25 plus small multibounce
        expect = 0.96**2 * 0.25
        assert abs(v - expect) < 0.05, f"water-wins: {v} vs {expect}"

    def test_low_priority_water_is_null_interface(self):
        """Glass owns the overlap: water's boundary is a false interface —
        no absorption anywhere (glass is clear), only outer fresnel."""
        v = render_centre(nested_scene(water_priority=0))
        expect = 0.96**2  # + internal reflections recovering a bit
        assert v > 0.88, f"glass-wins should be clear: {v} vs ~{expect}"
