"""Light-tree tests: select/pdf consistency + unbiasedness vs power CDF.

ref light_tree.zig Tree.randomLight / Tree.pdf must agree; here `select`'s
descent probability and `pdf`'s upward walk must match exactly, and the
selection distribution must integrate to 1.
"""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene.loader import load_scene_dict
from zyg_tpu.scene import light_sampling as lsm


def many_light_scene(num=6, with_dome=True):
    mats = [
        {"name": f"l{i}", "rendering": {"Light": {"emittance": {"value": 5.0 + 3.0 * i}}}}
        for i in range(num)
    ]
    ents = [
        {
            "type": "Light",
            "shape": {"type": "Rectangle" if i % 2 == 0 else "Sphere"},
            "materials": [f"l{i}"],
            "transformation": {
                "position": [2.0 * (i % 3) - 2.0, 1.0 + (i // 3), 2.0 * (i % 2)],
                "rotation": [90, 30 * i, 0],
                "scale": [0.5, 0.4, 0.5],
            },
        }
        for i in range(num)
    ]
    if with_dome:
        mats.append({"name": "sky", "rendering": {"Light": {"emittance": {"value": 0.5}}}})
        ents.append({"type": "Light", "shape": {"type": "Dome"}, "materials": ["sky"]})
    mats.append({"name": "floor", "rendering": {"Substitute": {"color": [0.5, 0.5, 0.5]}}})
    ents.append(
        {
            "type": "Prop",
            "shape": {"type": "Rectangle"},
            "materials": ["floor"],
            "transformation": {"rotation": [90, 0, 0], "scale": [10, 10, 1]},
        }
    )
    return load_scene_dict({"materials": mats, "entities": ents})


class TestLightTree:
    def test_tree_built(self):
        scene = many_light_scene()
        assert scene.light_tree is not None
        assert scene.light_tree.inf_weight > 0.0

    def test_pdf_sums_to_one(self):
        scene = many_light_scene()
        L = scene.lights.count
        n = 64
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
        nrm = jnp.asarray(
            rng.standard_normal((n, 3)) / np.linalg.norm(rng.standard_normal((n, 3)), axis=-1, keepdims=True),
            jnp.float32,
        )
        total = np.zeros(n, np.float64)
        for li in range(L):
            total += np.asarray(
                lsm.light_select_pdf(
                    scene, jnp.full((n,), li, jnp.int32), p=p, n=nrm, total_sphere=False
                )
            )
        np.testing.assert_allclose(total, 1.0, atol=1e-4)

    def test_select_matches_pdf(self):
        """Empirical selection frequencies track the analytic pdf."""
        scene = many_light_scene(num=4, with_dome=False)
        L = scene.lights.count
        n = 200_000
        rng = np.random.default_rng(9)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        p = jnp.tile(jnp.asarray([[0.5, 0.2, -1.0]], jnp.float32), (n, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        idx, pdf = lsm.select_light(scene, u, p=p, n=nrm, total_sphere=False)
        idx = np.asarray(idx)
        pdf = np.asarray(pdf)
        for li in range(L):
            freq = float((idx == li).mean())
            ana = float(
                np.asarray(
                    lsm.light_select_pdf(
                        scene, jnp.full((1,), li, jnp.int32), p=p[:1], n=nrm[:1]
                    )
                )[0]
            )
            assert abs(freq - ana) < 0.01, f"light {li}: freq {freq} vs pdf {ana}"
            if freq > 0:
                got = pdf[idx == li]
                np.testing.assert_allclose(got, ana, rtol=1e-3)

    def test_cdf_fallback_without_point(self):
        scene = many_light_scene()
        u = jnp.asarray([0.1, 0.9], jnp.float32)
        idx, pdf = lsm.select_light(scene, u)
        assert idx.shape == (2,)
        np.testing.assert_allclose(
            np.asarray(lsm.light_select_pdf(scene, idx)), np.asarray(pdf)
        )
