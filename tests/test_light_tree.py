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


def grid_light_scene(nx=6, ny=6, with_dome=False, spread=4.0):
    """nx*ny rect lights on a plane with power growing across the grid."""
    mats, ents = [], []
    for i in range(nx * ny):
        mats.append(
            {"name": f"g{i}", "rendering": {"Light": {"emittance": {"value": 1.0 + 0.5 * i}}}}
        )
        x = spread * ((i % nx) / max(nx - 1, 1) - 0.5)
        z = spread * ((i // nx) / max(ny - 1, 1) - 0.5)
        ents.append(
            {
                "type": "Light",
                "shape": {"type": "Rectangle"},
                "materials": [f"g{i}"],
                "transformation": {
                    "position": [x, 2.0, z],
                    "rotation": [-90, 0, 0],
                    "scale": [0.15, 0.15, 1.0],
                },
            }
        )
    if with_dome:
        mats.append({"name": "sky", "rendering": {"Light": {"emittance": {"value": 0.3}}}})
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


class TestLightTreeSplitting:
    """Adaptive NEE splitting (ref light_tree.zig randomLight with
    split_threshold > 0): static 2^S finite picks + 1 infinite pick."""

    THR = 0.5**4  # take.zig DefaultSplitThreshold after the st^4 remap

    def test_split_estimator_unbiased(self):
        """For EVERY light, E[sum_k 1{pick_k == li} / pdf_k] == 1 — the
        split estimator covers each light with weight one in expectation."""
        scene = grid_light_scene(4, 4, with_dome=True)
        tree = scene.light_tree
        n = 100_000
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        p = jnp.tile(jnp.asarray([[0.3, 0.0, 0.1]], jnp.float32), (n, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        thr = jnp.full((n,), self.THR, jnp.float32)
        picks, pdfs = lsm.select_lights_split(scene, u, p, nrm, False, thr, 2)
        picks = np.asarray(picks)
        pdfs = np.asarray(pdfs)
        assert picks.shape == (n, 5)  # 4 finite + 1 infinite
        for li in range(scene.lights.count):
            mask = picks == li
            est = np.where(mask, 1.0 / np.maximum(pdfs, 1e-20), 0.0).sum(axis=1)
            mean = est.mean()
            assert abs(mean - 1.0) < 0.05, f"light {li}: coverage {mean}"

    def test_split_pdf_matches_recorded(self):
        """pdf_split must reproduce the pdf recorded by select_split for
        whichever pick chose that light (the MIS contract)."""
        scene = grid_light_scene(4, 4, with_dome=True)
        n = 4_000
        rng = np.random.default_rng(11)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        p = jnp.tile(jnp.asarray([[-0.4, 0.0, 0.6]], jnp.float32), (n, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        thr = jnp.full((n,), self.THR, jnp.float32)
        picks, pdfs = lsm.select_lights_split(scene, u, p, nrm, False, thr, 2)
        picks_np = np.asarray(picks)
        pdfs_np = np.asarray(pdfs)
        for li in range(scene.lights.count):
            ana = np.asarray(
                lsm.light_select_pdf(
                    scene,
                    jnp.full((n,), li, jnp.int32),
                    p=p, n=nrm, total_sphere=False,
                    split_threshold=thr, split_depth=2,
                )
            )
            mask = picks_np == li
            rows = mask.any(axis=1)
            if not rows.any():
                continue
            got = pdfs_np[mask]
            want = np.repeat(ana, mask.sum(axis=1))
            np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_tree_beats_power_cdf_variance(self):
        """VERDICT item 6 'done' criterion: on a 36-light grid the spatial
        tree's single-sample direct-light estimator has lower variance than
        the global power CDF at equal sample count."""
        spread = 16.0
        scene = grid_light_scene(6, 6, spread=spread)
        n = 60_000
        rng = np.random.default_rng(17)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        # shading point directly under the weakest corner of the grid:
        # power-proportional selection almost never picks the near light
        p = jnp.tile(jnp.asarray([[-spread / 2, 0.0, -spread / 2]], jnp.float32), (n, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))

        centers = np.asarray(
            [[spread * ((i % 6) / 5 - 0.5), 2.0, spread * ((i // 6) / 5 - 0.5)]
             for i in range(36)],
            np.float32,
        )
        powers = np.asarray([1.0 + 0.5 * i for i in range(36)], np.float32)

        def estimator(idx, pdf):
            idx = np.asarray(idx)
            pdf = np.asarray(pdf)
            d2 = ((centers[idx] - np.asarray(p[0])[None, :]) ** 2).sum(axis=1)
            f = powers[idx] / d2  # unshadowed point-light proxy integrand
            return f / np.maximum(pdf, 1e-20)

        idx_t, pdf_t = lsm.select_light(scene, u, p=p, n=nrm, total_sphere=False)
        est_t = estimator(idx_t, pdf_t)
        idx_c, pdf_c = lsm.select_light(scene, u)  # power CDF
        est_c = estimator(idx_c, pdf_c)
        # equal means (both unbiased), tree variance strictly better
        assert abs(est_t.mean() - est_c.mean()) / est_c.mean() < 0.05
        assert est_t.var() < 0.5 * est_c.var(), (
            f"tree var {est_t.var():.4f} vs cdf var {est_c.var():.4f}"
        )


class TestManyLights:
    """1000+ light scalability (VERDICT r2 weak item 4): the vectorized
    SAOH build must finish in seconds and keep select/pdf consistency."""

    def _tree(self, n=1024):
        import time

        from zyg_tpu.scene.light_tree import build_light_tree

        rng = np.random.default_rng(11)
        centers = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        radii = rng.uniform(0.05, 0.8, n).astype(np.float32)
        dirs = rng.standard_normal((n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        cones = np.concatenate(
            [dirs, rng.uniform(-0.2, 0.9, (n, 1))], -1
        ).astype(np.float32)
        powers = rng.uniform(0.05, 20.0, n).astype(np.float32)
        t0 = time.time()
        tree = build_light_tree(
            centers, radii, cones, powers,
            np.zeros(n, bool), np.ones(n, bool),
        )
        return tree, time.time() - t0, powers

    def test_build_scales(self):
        tree, dt, powers = self._tree(1024)
        assert dt < 30.0, f"1024-light build took {dt:.1f}s"
        assert tree.num_finite == 1024
        np.testing.assert_allclose(
            float(tree.power[0]), powers.sum(), rtol=1e-3
        )
        # every light reachable via its leaf, parents chain to the root
        leaf = np.asarray(tree.light_leaf)
        parent = np.asarray(tree.parent)
        assert (leaf >= 0).all()
        for li in (0, 511, 1023):
            node, hops = int(leaf[li]), 0
            while node != 0:
                node = int(parent[node])
                hops += 1
                assert hops <= tree.depth + 1
        assert tree.depth < 64

    def test_select_pdf_consistent_at_scale(self):
        """Descent probability == upward pdf walk for sampled leaves."""
        from zyg_tpu.scene import light_tree as lt_mod

        tree, _, _ = self._tree(1024)
        n = 4096
        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.uniform(-40, 40, (n, 3)), jnp.float32)
        nv = rng.standard_normal((n, 3))
        nv /= np.linalg.norm(nv, axis=-1, keepdims=True)
        nrm = jnp.asarray(nv, jnp.float32)
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        idx, pdf = lt_mod.select(tree, p, nrm, jnp.zeros((n,), bool), u)
        pdf_up = lt_mod.pdf(tree, p, nrm, jnp.zeros((n,), bool), idx)
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(pdf_up), rtol=1e-4, atol=1e-7
        )
