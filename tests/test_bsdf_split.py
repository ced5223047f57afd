"""BSDF path splitting at glass vertices (ref src/core/scene/vertex.zig
Pool / glass_sample.zig split paths).

The wavefront serializes the reference's 4-slot vertex pool: the untaken
fresnel branch parks in a one-deep per-lane resume slot (PathState.split)
and the lane continues it when the current path dies, before regenerating
the next sample. Contract under test:

1. Unbiasedness: split on/off agree in the mean (both smooth and rough
   glass, with the medium stack active).
2. Variance: at equal spp the deterministic f/(1-f) branching beats the
   stochastic fresnel pick on glass pixels.
3. The feature compiles away for glass-free scenes (split dict empty).
"""

import numpy as np
import pytest

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def glass_scene(rough=False):
    gl = {"ior": 1.5}
    if rough:
        gl["roughness"] = 0.35
    return load_scene_dict(
        {
            "materials": [
                {"name": "glass", "rendering": {"Glass": gl}},
                {
                    "name": "diff",
                    "rendering": {
                        "Substitute": {"color": [0.6, 0.5, 0.4], "roughness": 0.8}
                    },
                },
                {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop",
                    "shape": {"type": "Sphere"},
                    "materials": ["glass"],
                    "transformation": {"scale": [0.9, 0.9, 0.9]},
                },
                {
                    "type": "Prop",
                    "shape": {"type": "Plane"},
                    "materials": ["diff"],
                    "transformation": {"position": [0, -1.0, 0]},
                },
                {
                    "type": "Light",
                    "shape": {"type": "Dome"},
                    "materials": ["env"],
                    "visibility": {"in_shadow": False},
                },
            ],
        }
    )


def render(scene, split, spp, res=(32, 24)):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(
        kind="PTMIS", max_depth_surface=12, bsdf_split=split
    )
    cam = PerspectiveCamera(resolution=res, fov=np.deg2rad(45.0))
    cam.position = np.array([0, 0.3, -5.0], np.float32)
    take.cameras = [cam]
    return Driver(take=take, scene=scene).render_frame()


class TestSplitUnbiased:
    @pytest.mark.parametrize("rough", [False, True])
    def test_mean_matches_stochastic(self, rough):
        scene = glass_scene(rough)
        img_off = render(scene, False, 192)
        img_on = render(scene, True, 192)
        m_off, m_on = float(img_off.mean()), float(img_on.mean())
        assert abs(m_on - m_off) / m_off < 0.02, f"off {m_off} vs on {m_on}"
        # dome furnace: everything non-absorbing under a unit dome -> ~1
        assert abs(m_on - 1.0) < 0.05, f"furnace mean {m_on}"


def contrast_scene():
    """Glass sphere between a dim dome and a small bright rect light: the
    fresnel reflect/refract choice picks between very different radiances,
    so the stochastic pick carries real variance (the furnace scene does
    not — every branch sees 1.0)."""
    return load_scene_dict(
        {
            "materials": [
                {"name": "glass", "rendering": {"Glass": {"ior": 1.5}}},
                {
                    "name": "diff",
                    "rendering": {
                        "Substitute": {"color": [0.4, 0.4, 0.4], "roughness": 0.7}
                    },
                },
                {"name": "sky", "rendering": {"Light": {"emittance": {"value": 0.05}}}},
                {"name": "lamp", "rendering": {"Light": {"emittance": {"value": 60.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop",
                    "shape": {"type": "Sphere"},
                    "materials": ["glass"],
                    "transformation": {"scale": [0.9, 0.9, 0.9]},
                },
                {
                    "type": "Prop",
                    "shape": {"type": "Plane"},
                    "materials": ["diff"],
                    "transformation": {"position": [0, -1.0, 0]},
                },
                {
                    "type": "Light",
                    "shape": {"type": "Rectangle"},
                    "materials": ["lamp"],
                    "transformation": {
                        "position": [-2.0, 3.0, -1.0],
                        "rotation": [60, 30, 0],
                    },
                },
                {
                    "type": "Light",
                    "shape": {"type": "Dome"},
                    "materials": ["sky"],
                    "visibility": {"in_shadow": False},
                },
            ],
        }
    )


class TestSplitVariance:
    def test_glass_variance_reduction(self):
        """Whole-image RMSE at low spp drops when both fresnel branches
        are traced deterministically (f / 1-f) instead of picked
        stochastically — the VERDICT r2 item-7 'equal-time variance
        reduction' gate, measured at equal spp (split traces ~1 extra
        suffix per glass sample)."""
        scene = contrast_scene()
        ref = render(scene, True, 512)

        def err(split, spp):
            img = render(scene, split, spp)
            return float(np.sqrt(np.mean((img - ref) ** 2)))

        e_on = err(True, 8)
        e_off = err(False, 8)
        assert e_on < 0.8 * e_off, f"split {e_on} vs stochastic {e_off}"


class TestStaticGating:
    def test_no_glass_compiles_empty_slot(self):
        from zyg_tpu.render.integrator import ptmis as ptmis_mod

        scene = load_scene_dict(
            {
                "materials": [
                    {
                        "name": "d",
                        "rendering": {"Substitute": {"color": [0.5, 0.5, 0.5]}},
                    },
                    {
                        "name": "env",
                        "rendering": {"Light": {"emittance": {"value": 1.0}}},
                    },
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["d"]},
                    {
                        "type": "Light",
                        "shape": {"type": "Dome"},
                        "materials": ["env"],
                        "visibility": {"in_shadow": False},
                    },
                ],
            }
        )
        settings = ptmis_mod.PtmisSettings(bsdf_split=True)
        assert not ptmis_mod._split_enabled(scene, settings)
        gl = glass_scene()
        assert ptmis_mod._split_enabled(gl, settings)


class TestDrainWithSplits:
    """The wavefront drain compaction must carry the one-deep BSDF-split
    resume slot intact: a lane whose parked fresnel branch survives
    compaction resumes it in the narrow stage (same sample, same result
    accumulator). Equal-seed images must match the undrained loop."""

    def test_drain_matches_full_width_with_glass(self, monkeypatch):
        import jax.numpy as jnp
        from zyg_tpu.render.integrator import ptmis

        scene = glass_scene(rough=False)
        w, h = 32, 24
        n = w * h
        ids = jnp.arange(n, dtype=jnp.uint32)
        ys, xs = np.divmod(np.arange(n), w)
        pxy = jnp.asarray(np.stack([xs, ys], -1), jnp.int32)
        take = Take()
        take.integrator = IntegratorSettings(
            kind="PTMIS", max_depth_surface=12, bsdf_split=True
        )
        cam = PerspectiveCamera(resolution=(w, h), fov=np.deg2rad(45.0))
        cam.position = np.array([0, 0.3, -5.0], np.float32)
        st = ptmis.PtmisSettings(max_depth=12, bsdf_split=True)

        def run():
            acc, rays, _, iters, counts = ptmis.integrate_persistent(
                scene, cam.arrays(0), pxy, ids, jnp.int32(0), 8, 8, st,
                frame_width=w, oversample_slack=4,
            )
            return np.asarray(acc), int(rays), np.asarray(counts)

        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 1 << 30)
        acc0, rays0, c0 = run()
        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 16)
        acc1, rays1, c1 = run()
        assert rays1 == rays0
        np.testing.assert_array_equal(c1, c0)
        np.testing.assert_allclose(acc1, acc0, rtol=1e-5, atol=1e-6)
