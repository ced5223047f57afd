"""Metallic flakes (ref substitute_material.zig flakes_* + the flakes
branches of substitute_sample.zig)."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def flake_scene(coverage):
    return load_scene_dict(
        {
            "materials": [
                {
                    "name": "paint",
                    "rendering": {
                        "Substitute": {
                            "color": [0.1, 0.1, 0.5],
                            "roughness": 0.6,
                            "flakes": {
                                "coverage": coverage,
                                "color": [0.9, 0.8, 0.3],
                                "roughness": 0.3,
                                "size": 0.02,
                            },
                        }
                    },
                },
                {"name": "sky", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
            ],
            "entities": [
                {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["paint"]},
                {
                    "type": "Light",
                    "shape": {"type": "Dome"},
                    "materials": ["sky"],
                    "visibility": {"in_shadow": False},
                },
            ],
        }
    )


def render(scene, spp=64, res=(32, 32)):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=6)
    cam = PerspectiveCamera(resolution=res, fov=np.deg2rad(30.0))
    cam.position = np.array([0, 0, -4.0], np.float32)
    take.cameras = [cam]
    return Driver(take=take, scene=scene).render_frame()


class TestFlakes:
    def test_feature_gated(self):
        assert "flakes" in flake_scene(0.5).mat_features
        assert "flakes" not in flake_scene(0.0).mat_features

    def test_field_deterministic_and_covering(self):
        """apply_flakes: flake hits are deterministic per position and
        their frequency tracks the coverage parameter."""
        from zyg_tpu.render import materials as mat
        from zyg_tpu.scene import shapes

        scene = flake_scene(0.3)
        n = 20_000
        rng = np.random.default_rng(2)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.asarray(d * 3.0, jnp.float32)
        dirs = jnp.asarray(-d, jnp.float32)
        hit = shapes.intersect_scene(
            scene, o, dirs, jnp.float32(0.0), jnp.float32(100.0)
        )
        frag = shapes.build_fragment(scene, hit, o, dirs)
        params = mat.gather(
            scene.materials, frag.material, None, scene.textures, frag.uv,
            features=scene.mat_features,
        )
        p1, n1 = mat.apply_flakes(scene, params, frag, -dirs)
        p2, n2 = mat.apply_flakes(scene, params, frag, -dirs)
        on = np.asarray(p1["flake_on"])
        np.testing.assert_array_equal(on, np.asarray(p2["flake_on"]))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2))
        frac = float(on.mean())
        assert 0.15 < frac < 0.45, f"flake fraction {frac} vs coverage 0.3"
        # flake normals are perturbed but stay roughly aligned
        cosang = np.sum(np.asarray(n1) * np.asarray(frag.n), axis=-1)
        assert (cosang[on] > 0.2).mean() > 0.95

    def test_render_energy_sane(self):
        """A flaked furnace sphere stays energy-bounded and the flakes
        change the appearance vs the base paint."""
        base = render(flake_scene(0.0), spp=32)
        flaked = render(flake_scene(0.6), spp=32)
        assert np.isfinite(flaked).all()
        assert flaked.max() < 20.0
        c = slice(10, 22)
        diff = np.abs(flaked[c, c] - base[c, c]).mean()
        assert diff > 0.01, "flakes should visibly change the sphere"
