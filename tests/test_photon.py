"""Photon map tests: hashed-grid gather vs brute force + e2e caustics."""

import numpy as np
import jax
import jax.numpy as jnp

from zyg_tpu.render.integrator import photon as ph
from zyg_tpu.render import materials as mat
from zyg_tpu.scene.types import default_materials


def diffuse_params(n):
    m = default_materials(1)
    m = m._replace(
        color=jnp.asarray([[0.7, 0.7, 0.7]]),
        metallic=jnp.zeros((1,)),
        roughness=jnp.full((1,), 0.9),
    )
    return mat.gather(m, jnp.zeros((n,), jnp.int32))


class TestPhotonGather:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(11)
        M = 300
        R = 0.05
        # photons scattered in a 0.4-unit square on the z=0 plane
        p = np.zeros((M, 3), np.float32)
        p[:, 0:2] = rng.uniform(-0.2, 0.2, (M, 2))
        wi = np.tile([0.0, 0.0, 1.0], (M, 1)).astype(np.float32)
        alpha = np.abs(rng.uniform(0.5, 1.5, (M, 3))).astype(np.float32)
        valid = np.ones(M, bool)
        pmap = ph.build_map(
            jnp.asarray(p), jnp.asarray(wi), jnp.asarray(alpha), jnp.asarray(valid),
            search_radius=R, num_paths=1000,
        )

        Q = 64
        q = np.zeros((Q, 3), np.float32)
        q[:, 0:2] = rng.uniform(-0.15, 0.15, (Q, 2))
        qj = jnp.asarray(q)
        params = diffuse_params(Q)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (Q, 1))
        ns = wo
        got = np.asarray(
            ph.gather(pmap, params, qj, wo, ns, ns, jnp.ones((Q,), bool))
        )

        # brute force with the same estimator: FULL BSDF response per
        # photon (gather now matches ref photon_grid.zig:575), f = eval/cos
        from zyg_tpu.render import materials as mat

        f_cos, _ = mat.eval_bsdf(params[0:1] if isinstance(params, tuple) else params, wo, wo, ns, ns)
        f = np.asarray(f_cos)[0] / 1.0  # cos(ns, wi)=1 for these photons
        expect = np.zeros((Q, 3), np.float32)
        for i in range(Q):
            d2 = ((p - q[i]) ** 2).sum(-1)
            m_ = d2 < R * R
            k = (1.0 - d2[m_] / (R * R)) ** 2
            expect[i] = (k[:, None] * alpha[m_] * np.asarray(f_cos)[i][None, :]).sum(0)
        expect /= (np.pi / 3.0) * 1000 * R * R
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-5)

    def test_bake_deposits_photons(self):
        """Bake in a box with a diffuse floor: photons land on surfaces."""
        from zyg_tpu.scene.loader import load_scene_dict

        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "white", "rendering": {"Substitute": {"color": [0.7, 0.7, 0.7]}}},
                    {"name": "lamp", "rendering": {"Light": {"emittance": {"value": 20.0}}}},
                ],
                "entities": [
                    {
                        "type": "Prop",
                        "shape": {"type": "Rectangle"},
                        "materials": ["white"],
                        "transformation": {"rotation": [90, 0, 0], "scale": [4, 4, 1]},
                    },
                    {
                        "type": "Light",
                        "shape": {"type": "Rectangle"},
                        "materials": ["lamp"],
                        "transformation": {"position": [0, 3, 0], "rotation": [-90, 0, 0], "scale": [1, 1, 1]},
                    },
                ],
            }
        )
        settings = ph.PhotonSettings(num_photons=2048, max_bounces=2, full_light_path=True)
        keys = jnp.arange(2048, dtype=jnp.uint32)
        p, wi, alpha, valid = jax.jit(
            lambda s, k: ph.bake(s, k, settings)
        )(scene, keys)
        nv = int(np.asarray(valid).sum())
        assert nv > 500, f"only {nv} photons deposited"
        pv = np.asarray(p)[np.asarray(valid)]
        # all photons on the floor plane y=0
        assert np.abs(pv[:, 1]).max() < 1e-2
        # downward incoming direction recorded (wi points toward the light)
        wiv = np.asarray(wi)[np.asarray(valid)]
        assert wiv[:, 1].min() > 0.0

        pmap = ph.build_map(p, wi, alpha, valid, 0.25, 2048)
        # gather in the middle of the floor: positive irradiance
        params = diffuse_params(4)
        pos = jnp.asarray([[0.0, 0.001, 0.0]] * 4)
        up = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
        li = np.asarray(ph.gather(pmap, params, pos, up, up, up, jnp.ones((4,), bool)))
        assert np.all(np.isfinite(li)) and li.mean() > 0.0
