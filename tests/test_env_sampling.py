"""Env-map importance sampling tests (ref shape_sampler.zig ImageImpl)."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene import env_sampling as env_mod
from zyg_tpu.scene.loader import (
    SceneBuilder, MaterialDesc, PropDesc, Transformation, load_scene_dict,
)
from zyg_tpu.scene.types import ShapeType, MaterialKind
from zyg_tpu.scene import light_sampling as lsm
from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver


def spot_image(h=32, w=64, bright=200.0):
    """Dark sky with one bright texel block (a 'sun')."""
    img = np.full((h, w, 3), 0.05, np.float32)
    img[h // 4, w // 3] = bright
    return img


class TestAliasTable:
    def test_alias_distribution(self, rng_np):
        w = rng_np.random(64) + 0.01
        prob, alias = env_mod._alias_table(w.astype(np.float64))
        # exact probabilities: P(k) = (prob[k] + sum over alias==k of 1-prob) / K
        p = prob.astype(np.float64).copy()
        for i in range(64):
            p[alias[i]] += 1.0 - prob[i]
        np.testing.assert_allclose(p / 64.0, w / w.sum(), rtol=1e-5)


class TestEnvSampler:
    def _sampler(self, canopy=False):
        return env_mod.build_env_sampler([(spot_image(), canopy, 0)])

    def test_sample_pdf_consistency(self, rng_np):
        """pdf() at sampled directions == the pdf sample() returned."""
        env = self._sampler()
        n = 4096
        rot = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        entry = jnp.zeros((n,), jnp.int32)
        wi, pdf_s, uv = env_mod.sample(env, entry, rot, xi)
        wi_n = np.asarray(wi)
        assert np.allclose(np.linalg.norm(wi_n, axis=-1), 1.0, atol=1e-4)
        pdf_e = env_mod.pdf(env, jnp.zeros((n,), jnp.int32), rot, wi)
        np.testing.assert_allclose(np.asarray(pdf_e), np.asarray(pdf_s), rtol=2e-2)

    def test_sampling_concentrates_on_bright_texel(self, rng_np):
        env = self._sampler()
        n = 8192
        rot = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        wi, pdf_s, uv = env_mod.sample(env, jnp.zeros((n,), jnp.int32), rot, xi)
        uv_n = np.asarray(uv)
        # the bright texel is at (x=w/3, y=h/4): most samples land there
        on_spot = (np.abs(uv_n[:, 0] - (64 // 3 + 0.5) / 64) < 1.5 / 64) & (
            np.abs(uv_n[:, 1] - (32 // 4 + 0.5) / 32) < 1.5 / 32
        )
        # analytic share: spot weight 200*sin(theta_spot) vs background
        # 0.05 * sum(sin(theta)) over all texels
        th = (np.arange(32) + 0.5) / 32 * np.pi
        spot_w = 200.0 * np.sin(th[8])
        bg_w = 0.05 * np.sin(th).sum() * 64
        expect = spot_w / (spot_w + bg_w)
        assert abs(on_spot.mean() - expect) < 0.05, (
            f"{on_spot.mean():.2f} on the spot, expected {expect:.2f}"
        )

    def test_mc_integral_matches_uniform(self, rng_np):
        """E[L(wi)/pdf(wi)] over the importance sampler == the true integral
        (computed by uniform sphere MC over the same map)."""
        img = spot_image()
        env = env_mod.build_env_sampler([(img, False, 0)])
        n = 1 << 15
        rot = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        wi, pdf_s, uv = env_mod.sample(env, jnp.zeros((n,), jnp.int32), rot, xi)
        # radiance lookup: nearest texel of the full-res map at sampled uv
        uv_n = np.asarray(uv)
        tx = np.clip((uv_n[:, 0] * 64).astype(int), 0, 63)
        ty = np.clip((uv_n[:, 1] * 32).astype(int), 0, 31)
        lum = img[ty, tx, 0]
        est = (lum / np.maximum(np.asarray(pdf_s), 1e-12)).mean()
        # ground truth: integral of L over sphere = sum texel L * solid angle
        ys = (np.arange(32) + 0.5) / 32
        dsolid = (2 * np.pi / 64) * (np.pi / 32) * np.sin(ys * np.pi)
        truth = (img[..., 0] * dsolid[:, None]).sum()
        assert abs(est - truth) < 0.05 * truth, f"{est} vs {truth}"
        # variance must be far below uniform sampling's
        var_is = (lum / np.asarray(pdf_s)).std()
        u_sph = rng_np.normal(size=(n, 3))
        u_sph /= np.linalg.norm(u_sph, axis=-1, keepdims=True)
        phi = np.arctan2(u_sph[:, 0], u_sph[:, 2])
        uu = np.clip(((phi / (2 * np.pi) + 0.5) * 64).astype(int), 0, 63)
        vv = np.clip((np.arccos(np.clip(u_sph[:, 1], -1, 1)) / np.pi * 32).astype(int), 0, 31)
        var_uni = (img[vv, uu, 0] * 4 * np.pi).std()
        assert var_is < 0.2 * var_uni, f"IS std {var_is} vs uniform {var_uni}"

    def test_canopy_entry(self, rng_np):
        env = self._sampler(canopy=True)
        n = 4096
        rot = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        xi = jnp.asarray(rng_np.random((n, 2)).astype(np.float32))
        wi, pdf_s, uv = env_mod.sample(env, jnp.zeros((n,), jnp.int32), rot, xi)
        wi_n = np.asarray(wi)
        # canopy = upper hemisphere of the light frame (local z = world z here)
        assert (wi_n[:, 2] >= -1e-3).all()
        pdf_e = env_mod.pdf(env, jnp.zeros((n,), jnp.int32), rot, wi)
        ok = np.asarray(pdf_s) > 0
        np.testing.assert_allclose(
            np.asarray(pdf_e)[ok], np.asarray(pdf_s)[ok], rtol=5e-2
        )


class TestEnvSceneIntegration:
    def _scene(self):
        b = SceneBuilder()
        tid = b.add_texture_image(spot_image())
        m_env = b.add_material(
            MaterialDesc(
                kind=int(MaterialKind.LIGHT),
                emission=np.ones(3, np.float32),
                emission_tex=tid,
            )
        )
        m_diff = b.add_material(
            MaterialDesc(color=np.array([0.8, 0.8, 0.8], np.float32), roughness=0.9)
        )
        b.add_prop(
            PropDesc(
                shape=int(ShapeType.DOME), trafo=Transformation(), material=m_env,
                is_light=True, visible_shadow=False,
            )
        )
        b.add_prop(
            PropDesc(
                shape=int(ShapeType.SPHERE),
                trafo=Transformation(scale=np.ones(3, np.float32)),
                material=m_diff,
            )
        )
        return b.build()

    def test_scene_builds_env_sampler(self):
        scene = self._scene()
        assert scene.env is not None
        assert scene.env.table.shape[0] == 1

    def _render(self, scene, kind, spp, seed_res=24):
        take = Take()
        take.num_samples_per_pixel = spp
        take.integrator = IntegratorSettings(kind=kind, max_depth_surface=3)
        cam = PerspectiveCamera(resolution=(seed_res, seed_res), fov=np.deg2rad(30.0))
        cam.position = np.array([0, 0, -4.0], np.float32)
        take.cameras = [cam]
        return Driver(take=take, scene=scene).render_frame()

    def test_ptmis_matches_pt_mean(self):
        """Env importance sampling must stay unbiased: PTMIS (NEE via the
        alias table + MIS) agrees with plain PT in the mean."""
        scene = self._scene()
        pt = self._render(scene, "PT", 1024)
        mis = self._render(scene, "PTMIS", 64)
        c = 12
        m_pt = pt[c - 6 : c + 6, c - 6 : c + 6].mean()
        m_mis = mis[c - 6 : c + 6, c - 6 : c + 6].mean()
        ratio = m_mis / m_pt
        assert abs(ratio - 1.0) < 0.1, f"PT {m_pt} vs PTMIS {m_mis} ratio {ratio}"

    def test_env_nee_reduces_variance(self):
        """At equal low spp, env-importance-sampled NEE beats uniform dome
        NEE by a wide RMSE margin (the point of VERDICT item 3)."""
        scene = self._scene()
        scene_uni = scene._replace(env=None)
        ref = self._render(scene, "PTMIS", 256)
        mis_env = self._render(scene, "PTMIS", 8)
        mis_uni = self._render(scene_uni, "PTMIS", 8)
        rmse_env = np.sqrt(np.mean((mis_env - ref) ** 2))
        rmse_uni = np.sqrt(np.mean((mis_uni - ref) ** 2))
        assert rmse_env < 0.45 * rmse_uni, f"env {rmse_env} vs uniform {rmse_uni}"
