"""PTMIS integrator tests: consistency with PT, variance reduction, NEE math."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import load_take_file
from zyg_tpu.scene.loader import load_scene_file, load_scene_dict
from zyg_tpu.scene import light_sampling as lsm
from zyg_tpu.render.driver import Driver

import os

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def render_cornell(kind, spp, res=32, depth=6):
    take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
    take.cameras[0].resolution = (res, res)
    take.num_samples_per_pixel = spp
    take.integrator.kind = kind
    take.integrator.max_depth_surface = depth
    scene = load_scene_file(take.scene_filename)
    return Driver(take=take, scene=scene).render_frame()


class TestPtmisConsistency:
    def test_pt_and_ptmis_agree_in_mean(self):
        pt = render_cornell("PT", 192)
        mis = render_cornell("PTMIS", 48)
        ratio = mis.mean() / pt.mean()
        assert abs(ratio - 1.0) < 0.03, f"PT/PTMIS mean mismatch: ratio={ratio}"

    def test_ptmis_reduces_variance(self):
        ref = render_cornell("PTMIS", 256)
        pt = render_cornell("PT", 8)
        mis = render_cornell("PTMIS", 8)
        rmse_pt = np.sqrt(np.mean((pt - ref) ** 2))
        rmse_mis = np.sqrt(np.mean((mis - ref) ** 2))
        assert rmse_mis < 0.5 * rmse_pt, f"MIS RMSE {rmse_mis} not << PT {rmse_pt}"


class TestSphQuad:
    def test_solid_angle_matches_numeric(self, rng_np):
        """SphQuad.S == numerically integrated solid angle of the rectangle."""
        sx, sy = 2.0, 1.0
        o = jnp.asarray([[0.3, -0.2, 1.5]], jnp.float32)  # above the plane
        q = lsm.sphquad_init(jnp.float32(sx), jnp.float32(sy), o)
        # monte-carlo the solid angle by area sampling
        n = 200_000
        xy = rng_np.random((n, 2)).astype(np.float32)
        px = (xy[:, 0] - 0.5) * sx
        py = (xy[:, 1] - 0.5) * sy
        d = np.stack([px - 0.3, py + 0.2, np.full(n, -1.5)], -1)
        r2 = (d**2).sum(-1)
        cos = 1.5 / np.sqrt(r2)
        omega = (cos / r2).mean() * sx * sy
        assert abs(float(q.S[0]) - omega) < 0.01 * omega

    def test_samples_on_rectangle(self, rng_np):
        sx, sy = 2.0, 1.0
        o = jnp.asarray([[0.3, -0.2, 1.5]], jnp.float32)
        q = lsm.sphquad_init(jnp.float32(sx), jnp.float32(sy), o)
        uv = jnp.asarray(rng_np.random((1, 2048, 2)).astype(np.float32))
        q_b = lsm.SphQuad(*[jnp.broadcast_to(f, (1, 2048)) for f in q])
        xu, yv = lsm.sphquad_sample(q_b, uv)
        px = 0.3 + np.asarray(xu)
        py = -0.2 + np.asarray(yv)
        assert px.min() >= -sx / 2 - 1e-3 and px.max() <= sx / 2 + 1e-3
        assert py.min() >= -sy / 2 - 1e-3 and py.max() <= sy / 2 + 1e-3


class TestLightSelection:
    def test_power_weighting(self):
        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "dim", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
                    {"name": "bright", "rendering": {"Light": {"emittance": {"value": 3.0}}}},
                ],
                "entities": [
                    {
                        "type": "Light",
                        "shape": {"type": "Rectangle"},
                        "materials": ["dim"],
                        "transformation": {"position": [0, 1, 0], "scale": [1, 1, 1]},
                    },
                    {
                        "type": "Light",
                        "shape": {"type": "Rectangle"},
                        "materials": ["bright"],
                        "transformation": {"position": [0, 2, 0], "scale": [1, 1, 1]},
                    },
                ],
            }
        )
        u = jnp.linspace(0, 0.999, 1000)
        idx, pdf = lsm.select_light(scene, u)
        frac_bright = float((idx == 1).mean())
        assert abs(frac_bright - 0.75) < 0.01
        np.testing.assert_allclose(
            np.asarray(lsm.light_select_pdf(scene, jnp.asarray([0, 1]))), [0.25, 0.75], atol=1e-5
        )
