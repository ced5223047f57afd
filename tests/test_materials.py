"""Material model tests: GGX energy conservation (white furnace), sample/eval
consistency, glass refraction sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render import materials as mat
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def furnace_scene(mat_body: dict):
    return load_scene_dict(
        {
            "materials": [
                {"name": "m", "rendering": mat_body},
                {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop",
                    "shape": {"type": "Sphere"},
                    "materials": ["m"],
                    "transformation": {"scale": [1, 1, 1]},
                },
                {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"]},
            ],
        }
    )


def render_furnace(scene, spp=96, depth=12, res=24):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=depth)
    cam = PerspectiveCamera(resolution=(res, res), fov=np.deg2rad(24.0))
    cam.position = np.array([0, 0, -4.0], np.float32)
    take.cameras = [cam]
    d = Driver(take=take, scene=scene)
    img = d.render_frame()
    c = res // 2
    return float(img[c - 4 : c + 4, c - 4 : c + 4].mean())


class TestFurnace:
    @pytest.mark.parametrize("roughness", [0.15, 0.5, 1.0])
    def test_white_substitute(self, roughness):
        """color=1 substitute in a radiance-1 dome should stay ~1 (energy
        conservation incl. multi-scatter compensation)."""
        scene = furnace_scene(
            {"Substitute": {"color": [1.0, 1.0, 1.0], "roughness": roughness}}
        )
        v = render_furnace(scene)
        assert abs(v - 1.0) < 0.05, f"furnace roughness={roughness}: {v}"

    def test_white_metal(self):
        scene = furnace_scene(
            {"Substitute": {"color": [1.0, 1.0, 1.0], "roughness": 0.7, "metallic": 1.0}}
        )
        v = render_furnace(scene)
        assert abs(v - 1.0) < 0.07, f"metal furnace: {v}"

    def test_glass_furnace(self):
        """Clear glass in a uniform furnace must be invisible (~1)."""
        scene = furnace_scene({"Glass": {"ior": 1.5}})
        v = render_furnace(scene, depth=24)
        assert abs(v - 1.0) < 0.05, f"glass furnace: {v}"


class TestSampleEvalConsistency:
    def _params(self, n, roughness=0.4, metallic=0.0):
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table

        table = materials_to_table(
            [MaterialDesc(color=np.array([0.7, 0.5, 0.3], np.float32), roughness=roughness, metallic=metallic)]
        )
        return mat.gather(table, jnp.zeros(n, jnp.int32))

    def test_weight_equals_f_over_pdf(self, rng_np):
        n = 4096
        params = self._params(n)
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        wo = jnp.tile(jnp.asarray([0.3, 0.1, 0.95]) / np.linalg.norm([0.3, 0.1, 0.95]), (n, 1))
        s3 = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = mat.sample_bsdf(params, wo, normal, normal, s3)
        f, pdf = mat.eval_bsdf(params, wo, bs.wi, normal, normal)
        valid = np.asarray(bs.valid)
        ratio = np.asarray(f)[valid] / np.maximum(np.asarray(pdf)[valid, None], 1e-9)
        w = np.asarray(bs.weight)[valid]
        np.testing.assert_allclose(ratio, w, rtol=2e-3, atol=1e-4)

    def test_sampled_integral_matches_albedo_bound(self, rng_np):
        """E[weight] (white albedo, rough) must stay <= 1 + eps and be close
        to 1 for roughness 1 (energy conserving)."""
        n = 1 << 15
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table

        table = materials_to_table(
            [MaterialDesc(color=np.ones(3, np.float32), roughness=1.0, metallic=0.0)]
        )
        params = mat.gather(table, jnp.zeros(n, jnp.int32))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        s3 = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = mat.sample_bsdf(params, wo, normal, normal, s3)
        mean_w = float(np.asarray(bs.weight).mean())
        assert 0.9 < mean_w < 1.02, f"white rough albedo {mean_w}"


class TestGlass:
    def test_tir_no_nan(self, rng_np):
        """Grazing rays from the dense side must TIR without NaNs."""
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table
        from zyg_tpu.scene.types import MaterialKind

        n = 1024
        d = MaterialDesc(kind=int(MaterialKind.GLASS), ior=1.5)
        table = materials_to_table([d])
        # inside the glass: medium ior = 1.5, shading from below
        params = mat.gather(table, jnp.zeros(n, jnp.int32), medium_ior=jnp.full(n, 1.5))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        # wo pointing from inside at grazing angle (same side as -n)
        wo = jnp.tile(jnp.asarray([0.9, 0.0, -0.43]) / np.linalg.norm([0.9, 0, -0.43]), (n, 1))
        s3 = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = mat.sample_bsdf(params, wo, normal, normal, s3)
        assert np.isfinite(np.asarray(bs.wi)).all()
        assert np.isfinite(np.asarray(bs.weight)).all()
        # TIR for wo at > critical angle: most lanes must be reflections
        assert float(np.asarray(bs.transmission).mean()) < 0.5

    def test_beer_absorption(self):
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table
        from zyg_tpu.scene.types import MaterialKind

        d = MaterialDesc(kind=int(MaterialKind.GLASS), ior=1.5, attenuation_distance=1.0)
        d.color = np.array([0.5, 0.7, 0.9], np.float32)
        table = materials_to_table([d])
        tr = mat.medium_absorption(table, jnp.zeros(4, jnp.int32), jnp.full(4, 1.0))
        np.testing.assert_allclose(np.asarray(tr)[0], [0.5, 0.7, 0.9], rtol=1e-4)
        tr_air = mat.medium_absorption(table, jnp.full(4, -1, jnp.int32), jnp.full(4, 1.0))
        np.testing.assert_allclose(np.asarray(tr_air), 1.0)


class TestRoughGlass:
    def test_rough_glass_furnace(self):
        """Clear rough dielectric in a furnace: near 1 (single-scatter
        microfacet loses a little energy at higher roughness)."""
        # KNOWN LIMITATION: ~13% single-scatter loss at roughness 0.25 —
        # needs the dielectric E_s table (ref ggx_integral.zig) instead of
        # the E_m approximation; tracked for the next round.
        scene = furnace_scene({"Glass": {"ior": 1.5, "roughness": 0.25}})
        v = render_furnace(scene, depth=24)
        assert 0.84 < v < 1.03, f"rough glass furnace: {v}"
        scene2 = furnace_scene({"Glass": {"ior": 1.5, "roughness": 0.1}})
        v2 = render_furnace(scene2, depth=24)
        assert 0.95 < v2 < 1.03, f"rough glass furnace r=0.1: {v2}"

    def test_rough_glass_scatters(self, rng_np):
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table
        from zyg_tpu.scene.types import MaterialKind
        import jax.numpy as jnp

        n = 4096
        d = MaterialDesc(kind=int(MaterialKind.GLASS), ior=1.5, roughness=0.4)
        table = materials_to_table([d])
        params = mat.gather(table, jnp.zeros(n, jnp.int32))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        s3 = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = mat.sample_bsdf(params, wo, normal, normal, s3)
        wi = np.asarray(bs.wi)
        assert np.isfinite(wi).all() and np.isfinite(np.asarray(bs.weight)).all()
        # directions spread out (not a delta): angular std of transmitted lobe
        trans = np.asarray(bs.transmission)
        assert trans.any() and (~trans).any()
        spread = wi[trans][:, :2].std()
        assert spread > 0.05, f"rough transmission not spread: {spread}"
        assert not np.asarray(bs.singular).any()

    def test_rough_glass_eval_matches_sample(self, rng_np):
        """NEE path: eval_bsdf on rough glass must be consistent with the
        VNDF sampler — f*cos/pdf == sample weight at sampled directions
        (ref glass_sample.zig canEvaluate=true for rough dielectrics)."""
        from zyg_tpu.scene.loader import MaterialDesc, materials_to_table
        from zyg_tpu.scene.types import MaterialKind

        n = 8192
        d = MaterialDesc(kind=int(MaterialKind.GLASS), ior=1.5, roughness=0.4)
        table = materials_to_table([d])
        params = mat.gather(table, jnp.zeros(n, jnp.int32))
        assert bool(np.asarray(mat.can_evaluate(params))[0])
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        wo = jnp.tile(jnp.asarray([0.3, 0.1, 0.95]) / np.linalg.norm([0.3, 0.1, 0.95]), (n, 1))
        s3 = jnp.asarray(rng_np.random((n, 3)).astype(np.float32))
        bs = mat.sample_bsdf(params, wo, normal, normal, s3)
        f, pdf = mat.eval_bsdf(params, wo, bs.wi, normal, normal)
        f, pdf, w = np.asarray(f), np.asarray(pdf), np.asarray(bs.weight)
        spdf = np.asarray(bs.pdf)
        ok = pdf > 1e-4  # skip near-grazing numerical edge lanes
        assert ok.mean() > 0.95
        ratio = f[ok] / pdf[ok, None]
        rel_w = np.abs(ratio - w[ok]) / np.maximum(np.abs(w[ok]), 1e-3)
        assert (rel_w < 3e-2).mean() > 0.995, f"f/pdf vs weight: {rel_w.max()}"
        # the claimed sample pdf must equal the eval pdf (MIS consistency);
        # a <=0.5% tail of near-TIR half-vector reconstructions may diverge
        rel_p = np.abs(pdf[ok] - spdf[ok]) / np.maximum(spdf[ok], 1e-4)
        assert (rel_p < 3e-2).mean() > 0.995, f"pdf consistency: {rel_p.max()}"


class TestSubstituteExtras:
    """Translucency + clearcoat (ref substitute_material.zig extras)."""

    def _params(self, n, **over):
        import jax.numpy as jnp
        from zyg_tpu.scene.types import default_materials
        from zyg_tpu.render import materials as mat

        m = default_materials(1)._replace(
            color=jnp.asarray([[1.0, 1.0, 1.0]]),
            roughness=jnp.full((1,), 0.6),
            metallic=jnp.zeros((1,)),
        )
        m = m._replace(**{k: jnp.asarray([v]) for k, v in over.items()})
        return mat.gather(m, jnp.zeros((n,), jnp.int32))

    def test_translucent_furnace(self, rng_np):
        """White thin-translucent surface conserves energy (reflect+transmit)."""
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat

        n = 60000
        params = self._params(n, translucency=0.5)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        nrm = wo
        s3 = jnp.asarray(rng_np.uniform(0, 1, (n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nrm, nrm, s3)
        w = np.asarray(bs.weight)[np.asarray(bs.valid)]
        total = w.mean(0)
        assert np.all(total > 0.85) and np.all(total < 1.02), total

    def test_translucency_crosses_surface(self, rng_np):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat

        n = 20000
        params = self._params(n, translucency=0.7)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        s3 = jnp.asarray(rng_np.uniform(0, 1, (n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, wo, wo, s3)
        below = np.asarray(bs.wi[:, 2] < 0.0) & np.asarray(bs.valid)
        frac = below.mean()
        assert 0.6 < frac < 0.8, frac

    def test_coating_adds_specular_and_conserves(self, rng_np):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat

        n = 60000
        params = self._params(
            n, coating_thickness=0.01, coating_ior=1.5, coating_roughness=0.05
        )
        wo = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (n, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        s3 = jnp.asarray(rng_np.uniform(0, 1, (n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nrm, nrm, s3)
        w = np.asarray(bs.weight)[np.asarray(bs.valid)]
        total = w.mean(0)
        # single-scatter clearcoat loses a little energy but must stay sane
        assert np.all(total > 0.7) and np.all(total < 1.05), total
        # mirror-ish directions present (coat lobe)
        wi = np.asarray(bs.wi)[np.asarray(bs.valid)]
        mirror = np.asarray([0.0, -0.6, 0.8])
        close = (wi @ mirror > 0.995).mean()
        assert close > 0.02, close

    def test_eval_sample_pdf_consistency(self, rng_np):
        """eval() at sampled directions reproduces the sample's pdf."""
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat

        n = 4096
        params = self._params(
            n, translucency=0.3, coating_thickness=0.01, coating_roughness=0.3
        )
        wo = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        s3 = jnp.asarray(rng_np.uniform(0, 1, (n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nrm, nrm, s3)
        f, pdf = mat.eval_bsdf(params, wo, bs.wi, nrm, nrm)
        v = np.asarray(bs.valid)
        np.testing.assert_allclose(
            np.asarray(pdf)[v], np.asarray(bs.pdf)[v], rtol=1e-4, atol=1e-7
        )


class TestPathRegularization:
    """ref renderstate.zig regularizeAlpha + take.zig regularize_roughness."""

    def test_regularize_alpha_formula(self):
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat

        a = jnp.asarray([0.04, 0.25, mat.MIN_ALPHA], jnp.float32)
        params = {"alpha": a, "coat_alpha": a}
        # no previous roughness -> unchanged
        out = mat.regularize_alpha(params, jnp.zeros(3), 0.5, caustics=False)
        np.testing.assert_allclose(np.asarray(out["alpha"]), np.asarray(a), rtol=1e-5)
        # fully rough previous bounce, weight 0.5: a' = 1 - (1-a)*0.5,
        # but the near-specular lobe is exempt without caustics
        out = mat.regularize_alpha(params, jnp.ones(3), 0.5, caustics=False)
        want = 1.0 - (1.0 - np.asarray(a)) * 0.5
        np.testing.assert_allclose(np.asarray(out["alpha"])[:2], want[:2], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["alpha"])[2], float(mat.MIN_ALPHA))
        # with caustics enabled the specular lobe regularizes too
        out = mat.regularize_alpha(params, jnp.ones(3), 0.5, caustics=True)
        np.testing.assert_allclose(np.asarray(out["alpha"]), want, rtol=1e-6)

    def test_sample_reports_lobe_reg_alpha(self):
        """Diffuse lobes report 1, glossy report their alpha (ref bxdf.zig
        Path.reg_alpha)."""
        import jax.numpy as jnp
        from zyg_tpu.render import materials as mat
        from zyg_tpu.scene.loader import load_scene_dict

        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "m", "rendering": {"Substitute": {
                        "color": [0.7, 0.7, 0.7], "roughness": 0.5, "metallic": 1.0}}},
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["m"]},
                ],
            }
        )
        n = 512
        rng = np.random.default_rng(2)
        nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        params = mat.gather(
            scene.materials, jnp.ones((n,), jnp.int32), features=scene.mat_features
        )
        bs = mat.sample_bsdf(params, wo, nrm, nrm, s3)
        # fully metallic: every sample is the glossy lobe -> alpha = 0.25
        np.testing.assert_allclose(np.asarray(bs.reg_alpha), 0.25, rtol=1e-5)


class TestAnisotropicGGX:
    """Anisotropic GGX (ref ggx.zig Aniso + substitute anisotropicAlpha)."""

    def _params(self, n, roughness=0.4, aniso=0.6, rot=0.0):
        from zyg_tpu.render import materials as mat
        from zyg_tpu.scene.types import MaterialKind

        r = max(roughness, mat.MIN_ROUGHNESS)
        rv = max(r * (1.0 - aniso), mat.MIN_ROUGHNESS)
        base = {
            "_features": {"aniso": True},
            "kind": jnp.full((n,), int(MaterialKind.SUBSTITUTE), jnp.int32),
            "color": jnp.full((n, 3), 0.8, jnp.float32),
            "albedo": jnp.zeros((n, 3), jnp.float32),  # metallic: spec only
            "f0": jnp.full((n, 3), 0.9, jnp.float32),
            "alpha": jnp.full((n,), r * r, jnp.float32),
            "alpha_v": jnp.full((n,), rv * rv, jnp.float32),
            "aniso_rot": jnp.full((n,), rot * 2.0 * np.pi, jnp.float32),
            "metallic": jnp.ones((n,), jnp.float32),
            "ior": jnp.full((n,), 1.5, jnp.float32),
            "ior_outside": jnp.ones((n,), jnp.float32),
            "specular": jnp.ones((n,), jnp.float32),
            "emission": jnp.zeros((n, 3), jnp.float32),
            "two_sided": jnp.zeros((n,), bool),
            "attenuation_distance": jnp.zeros((n,), jnp.float32),
            "translucency": jnp.zeros((n,), jnp.float32),
            "coat_on": jnp.zeros((n,), bool),
            "coat_f0": jnp.full((n,), 0.04, jnp.float32),
            "coat_alpha": jnp.full((n,), 0.04, jnp.float32),
        }
        return base

    def test_zero_anisotropy_matches_isotropic(self):
        """ax == ay must reproduce the isotropic lobe bit-for-bit in both
        value and pdf (the formulas reduce exactly)."""
        from zyg_tpu.render import materials as mat

        n = 1024
        rng = np.random.default_rng(7)
        params_a = self._params(n, roughness=0.4, aniso=0.0)
        params_i = dict(params_a)
        params_i["_features"] = {}
        nn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
        b = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        wo = rng.normal(size=(n, 3))
        wo[:, 2] = np.abs(wo[:, 2]) + 0.1
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rng.normal(size=(n, 3))
        wi[:, 2] = np.abs(wi[:, 2]) + 0.1
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        wo = jnp.asarray(wo.astype(np.float32))
        wi = jnp.asarray(wi.astype(np.float32))
        f_a, pdf_a = mat.eval_bsdf(params_a, wo, wi, nn, nn, t=t, b=b)
        f_i, pdf_i = mat.eval_bsdf(params_i, wo, wi, nn, nn)
        np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_i), rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf_a), np.asarray(pdf_i), rtol=2e-4, atol=1e-7)

    def test_sample_eval_consistency(self):
        from zyg_tpu.render import materials as mat

        n = 4096
        rng = np.random.default_rng(3)
        params = self._params(n, aniso=0.7)
        nn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
        b = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        wo = np.tile(np.asarray([[0.3, -0.2, 0.93]], np.float32), (n, 1))
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        wo = jnp.asarray(wo)
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nn, nn, s3, t=t, b=b)
        ok = np.asarray(bs.valid)
        assert ok.mean() > 0.9
        f_e, pdf_e = mat.eval_bsdf(params, wo, bs.wi, nn, nn, t=t, b=b)
        np.testing.assert_allclose(
            np.asarray(bs.pdf)[ok], np.asarray(pdf_e)[ok], rtol=2e-3
        )

    def test_highlight_elongated_along_bitangent(self):
        """aniso > 0 smooths along the tangent: sampled half-vectors spread
        MORE along t than along b (ax > ay)."""
        from zyg_tpu.render import materials as mat

        n = 8192
        rng = np.random.default_rng(5)
        params = self._params(n, roughness=0.5, aniso=0.8)
        nn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
        b = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nn, nn, s3, t=t, b=b)
        h = np.asarray(bs.wi) + np.asarray(wo)
        h /= np.linalg.norm(h, axis=-1, keepdims=True)
        ok = np.asarray(bs.valid)
        var_t = h[ok, 0].var()
        var_b = h[ok, 1].var()
        assert var_t > 4.0 * var_b, f"t-var {var_t} vs b-var {var_b}"
        # rotation by a quarter turn swaps the axes
        params_r = dict(params)
        params_r["aniso_rot"] = jnp.full((n,), 0.5 * np.pi, jnp.float32)
        bs2 = mat.sample_bsdf(params_r, wo, nn, nn, s3, t=t, b=b)
        h2 = np.asarray(bs2.wi) + np.asarray(wo)
        h2 /= np.linalg.norm(h2, axis=-1, keepdims=True)
        ok2 = np.asarray(bs2.valid)
        assert h2[ok2, 1].var() > 4.0 * h2[ok2, 0].var()


class TestDispersion:
    """Hero-wavelength glass dispersion (ref glass_sample.zig:154-177)."""

    def _glass_params(self, n, abbe=30.0):
        from zyg_tpu.scene.types import MaterialKind
        from zyg_tpu.render import materials as mat

        return {
            "_features": {"glass": True, "dispersion": True},
            "kind": jnp.full((n,), int(MaterialKind.GLASS), jnp.int32),
            "color": jnp.ones((n, 3), jnp.float32),
            "albedo": jnp.zeros((n, 3), jnp.float32),
            "f0": jnp.full((n, 3), 0.04, jnp.float32),
            "alpha": jnp.full((n,), mat.MIN_ALPHA, jnp.float32),
            "abbe": jnp.full((n,), abbe, jnp.float32),
            "metallic": jnp.zeros((n,), jnp.float32),
            "ior": jnp.full((n,), 1.5, jnp.float32),
            "ior_outside": jnp.ones((n,), jnp.float32),
            "specular": jnp.ones((n,), jnp.float32),
            "emission": jnp.zeros((n, 3), jnp.float32),
            "two_sided": jnp.zeros((n,), bool),
            "attenuation_distance": jnp.zeros((n,), jnp.float32),
            "translucency": jnp.zeros((n,), jnp.float32),
            "coat_on": jnp.zeros((n,), bool),
            "coat_f0": jnp.full((n,), 0.04, jnp.float32),
            "coat_alpha": jnp.full((n,), 0.04, jnp.float32),
        }

    def test_wavelength_pinned_and_energy_neutral(self):
        from zyg_tpu.render import materials as mat

        n = 50_000
        rng = np.random.default_rng(1)
        params = self._glass_params(n)
        nn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        wo = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]], jnp.float32), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        bs = mat.sample_bsdf(params, wo, nn, nn, s3)
        wl = np.asarray(bs.wavelength)
        assert ((wl >= mat.WL_START) & (wl <= mat.WL_END)).all()
        # spectral tint averages to white (weight*3 normalization)
        w = np.asarray(bs.weight)[np.asarray(bs.valid)]
        mean = w.mean(axis=0)
        assert np.abs(mean - mean.mean()).max() < 0.05 * mean.mean(), mean
        # an already-pinned wavelength must persist, no double tint
        wl_fixed = jnp.full((n,), 550.0, jnp.float32)
        bs2 = mat.sample_bsdf(params, wo, nn, nn, s3, wavelength=wl_fixed)
        np.testing.assert_allclose(np.asarray(bs2.wavelength), 550.0)
        w2 = np.asarray(bs2.weight)[np.asarray(bs2.valid)]
        assert np.abs(w2 - w2[:, :1]).max() < 1e-5  # untinted (grey)

    def test_blue_bends_more(self):
        from zyg_tpu.render import materials as mat

        ior = jnp.full((2,), 1.5, jnp.float32)
        abbe = jnp.full((2,), 30.0, jnp.float32)
        wl = jnp.asarray([420.0, 680.0], jnp.float32)
        iors = np.asarray(mat.dispersive_ior(ior, abbe, wl))
        assert iors[0] > iors[1], iors
        assert abs(iors.mean() - 1.5) < 0.05
