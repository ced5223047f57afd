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


class TestEmissionMapMIS:
    def test_sampled_uv_matches_hit_uv(self, rng_np):
        """NEE's sampled-point uv must equal the uv a BSDF ray hitting that
        point would shade with — the precondition for MIS-consistent
        emission maps on finite lights (ref light.zig evaluateTo uses the
        same uv as evaluateRadiance)."""
        from zyg_tpu.scene.loader import (
            SceneBuilder, MaterialDesc, PropDesc, Transformation,
        )
        from zyg_tpu.scene.types import ShapeType, MaterialKind
        from zyg_tpu.scene import shapes
        from zyg_tpu.core import vecmath as vm

        grad = np.zeros((4, 4, 3), np.float32)
        grad[..., 0] = np.linspace(0.5, 4.0, 4)[None, :]
        grad[..., 1] = np.linspace(0.5, 4.0, 4)[:, None]
        grad[..., 2] = 1.0

        b = SceneBuilder()
        tid = b.add_texture_image(grad)
        m = b.add_material(
            MaterialDesc(
                kind=int(MaterialKind.LIGHT),
                emission=np.ones(3, np.float32),
                emission_tex=tid,
            )
        )
        from zyg_tpu.scene.loader import rotation_matrix_from_euler_degrees

        t = Transformation(
            position=np.array([0.2, 1.5, -0.3], np.float32),
            scale=np.array([1.4, 0.9, 1.0], np.float32),
            rotation=rotation_matrix_from_euler_degrees(
                np.array([160.0, 25.0, 10.0], np.float32)
            ),
        )
        b.add_prop(PropDesc(shape=int(ShapeType.RECTANGLE), trafo=t, material=m, is_light=True))
        scene = b.build()

        n = 512
        p = jnp.asarray(
            np.tile([[0.0, -1.0, 0.0]], (n, 1)).astype(np.float32)
        )
        nrm = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)).astype(np.float32))
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        li = jnp.zeros((n,), jnp.int32)
        smp = lsm.sample_light(scene, li, p, nrm, xi)
        ok = np.asarray(smp.pdf) > 0
        assert ok.mean() > 0.9

        hit = shapes.intersect_scene(
            scene, p, smp.wi, jnp.float32(1e-4), jnp.float32(1e8)
        )
        frag = shapes.build_fragment(scene, hit, p, smp.wi, need_uv=True)
        hv = np.asarray(hit.valid()) & ok
        assert hv.mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(smp.uv)[hv], np.asarray(frag.uv)[hv], atol=2e-3
        )
        # and the NEE radiance equals the BSDF-hit radiance at that point
        from zyg_tpu.render import materials as mat

        rad_nee = np.asarray(
            lsm.light_radiance(scene, li, smp.wi, smp.light_n, smp.uv)
        )
        params = mat.gather(
            scene.materials, frag.material, None, scene.textures, frag.uv,
            features=scene.mat_features,
        )
        rad_hit = np.asarray(mat.eval_radiance(params, -smp.wi, frag.geo_n))
        np.testing.assert_allclose(rad_nee[hv], rad_hit[hv], rtol=2e-2, atol=1e-3)


class TestNeeSplitting:
    """End-to-end NEE splitting in the wavefront (ref pathtracer_mis.zig
    sampleLights with light_sampling split): the split estimator must agree
    with the single-pick estimator in the mean and converge faster."""

    def _integrate(self, scene, split_depth, n=40_000, seed=0):
        from zyg_tpu.core.sobol import SobolSampler
        from zyg_tpu.render.integrator import ptmis as pm

        rng = np.random.default_rng(seed)
        x = rng.uniform(-3, 3, n)
        z = rng.uniform(-3, 3, n)
        o = jnp.asarray(np.stack([x, np.full(n, 1.2), z], -1), jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        smp = SobolSampler.start_pixel(
            jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32)
        )
        iv, _, _ = pm.integrate(
            scene, o, d, smp,
            pm.PtmisSettings(
                max_depth=3,
                light_split_depth=split_depth,
                light_split_threshold=0.5**4,
            ),
        )
        return np.asarray(iv.emission + iv.direct + iv.indirect)

    def test_split_matches_single_mean_and_reduces_variance(self):
        from tests.test_light_tree import grid_light_scene

        scene = grid_light_scene(4, 4)
        single = self._integrate(scene, 0)
        split = self._integrate(scene, 2)
        m_single = single.mean()
        m_split = split.mean()
        assert m_single > 1e-3
        assert abs(m_split / m_single - 1.0) < 0.03, (
            f"split mean {m_split} vs single {m_single}"
        )
        # 4 finite picks: per-lane radiance spread must shrink (the exact
        # factor is scene-dependent — BSDF-sampling variance remains)
        assert split.var() < 0.9 * single.var(), (
            f"split var {split.var():.5f} vs single {single.var():.5f}"
        )


class TestOversampling:
    """Persistent-wavefront quota relaxation (oversample_slack): fast lanes
    regenerate past their per-lane quota; pixels get unequal sample counts
    weighted by the count plane. Estimator must stay unbiased."""

    def test_slack_matches_quota_mean(self):
        from zyg_tpu.io.take import load_take_file
        from zyg_tpu.render.integrator import ptmis
        import jax.numpy as jnp

        take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
        take.cameras[0].resolution = (32, 32)
        scene = load_scene_file(take.scene_filename)
        n = 32 * 32
        ids = jnp.arange(n, dtype=jnp.uint32)
        ys, xs = np.divmod(np.arange(n), 32)
        pxy = jnp.asarray(np.stack([xs, ys], -1), jnp.int32)
        cam = take.cameras[0].arrays(0)
        st = ptmis.PtmisSettings(max_depth=4)

        def run(slack):
            acc, _, _, iters, counts = ptmis.integrate_persistent(
                scene, cam, pxy, ids, jnp.int32(0), 32, 32, st,
                frame_width=32, oversample_slack=slack,
            )
            img = np.asarray(acc) / np.maximum(np.asarray(counts)[:, None], 1)
            return img, np.asarray(counts), int(iters)

        img0, c0, it0 = run(0)
        img1, c1, it1 = run(16)
        # quota path: every pixel exactly 32 samples
        np.testing.assert_array_equal(c0, 32.0)
        # slack path: at least the target total was issued, every pixel
        # got at least one sample, and the loop is no longer than quota's
        assert c1.sum() >= 32 * n
        assert c1.min() >= 1
        assert it1 <= it0
        # unbiased: means agree within MC noise
        ratio = img1.mean() / img0.mean()
        assert abs(ratio - 1.0) < 0.05, f"oversample bias: {ratio}"


class TestDrainCascade:
    """Compacted wavefront drain: once issuance ends, in-flight survivors
    cascade into 4x-narrower PathStates (the trimesh.traverse pattern on
    the whole wavefront). Per-lane arithmetic is untouched, so the image
    must match the undrained loop to float tolerance."""

    def test_drain_matches_full_width(self, monkeypatch):
        from zyg_tpu.io.take import load_take_file
        from zyg_tpu.render.integrator import ptmis
        import jax.numpy as jnp

        take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
        take.cameras[0].resolution = (32, 32)
        scene = load_scene_file(take.scene_filename)
        n = 32 * 32
        ids = jnp.arange(n, dtype=jnp.uint32)
        ys, xs = np.divmod(np.arange(n), 32)
        pxy = jnp.asarray(np.stack([xs, ys], -1), jnp.int32)
        cam = take.cameras[0].arrays(0)
        st = ptmis.PtmisSettings(max_depth=4)

        def run():
            acc, rays, _, iters, counts = ptmis.integrate_persistent(
                scene, cam, pxy, ids, jnp.int32(0), 8, 8, st,
                frame_width=32, oversample_slack=4,
            )
            return np.asarray(acc), int(rays), int(iters), np.asarray(counts)

        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 1 << 30)
        acc0, rays0, it0, c0 = run()
        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 16)
        acc1, rays1, it1, c1 = run()
        assert rays1 == rays0  # same per-lane work, relocated
        np.testing.assert_array_equal(c1, c0)
        np.testing.assert_allclose(acc1, acc0, rtol=1e-5, atol=1e-6)
