"""Primitive light trees over large emissive meshes (ref
light_tree.zig:520; VERDICT r2 missing item 13): position-aware NEE
triangle selection replaces the flat area CDF above _PRIM_TREE_MIN
triangles, with an exactly matching hit-side MIS pdf."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import load_scene_dict


def scene_with_big_emitter(sphere_res=40):
    """A large emissive sphere MESH (~3k tris) next to a diffuse plane."""
    return load_scene_dict(
        {
            "materials": [
                {"name": "lamp", "rendering": {"Light": {"emittance": {"value": 8.0}}}},
                {"name": "diff", "rendering": {"Substitute": {"color": [0.6, 0.6, 0.6], "roughness": 0.8}}},
            ],
            "entities": [
                {"type": "Light", "shape": {"file": "proc:sphere"},
                 "materials": ["lamp"],
                 "transformation": {"position": [0, 2.0, 0]}},
                {"type": "Prop", "shape": {"type": "Plane"}, "materials": ["diff"],
                 "transformation": {"position": [0, -1.0, 0]}},
            ],
        }
    )


class TestMeshLightTree:
    def test_tree_built_for_large_emitter(self):
        scene = scene_with_big_emitter()
        assert scene.mesh_light_trees, "primitive tree expected"
        ((li, base), (tree, aux)), = scene.mesh_light_trees.items()
        assert tree.num_finite >= 512
        assert aux["arena"].shape == aux["area"].shape
        # local_of maps every arena id back to its local index
        lof = np.asarray(aux["local_of"])
        ar = np.asarray(aux["arena"])
        np.testing.assert_array_equal(
            lof[ar - base], np.arange(len(ar))
        )

    def test_sample_pdf_matches_hit_pdf(self):
        """The NEE sample's pdf and the BSDF-hit-side pdf must agree for
        the same (point, direction) — the MIS weights' core invariant."""
        from zyg_tpu.scene import light_sampling as lsm

        scene = scene_with_big_emitter()
        nl = 256
        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.uniform(-2, 2, (nl, 3)) * [1, 0, 1] + [0, -1, 0], jnp.float32)
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (nl, 1))
        xi = jnp.asarray(rng.uniform(0, 1, (nl, 2)), jnp.float32)
        li = jnp.zeros((nl,), jnp.int32)
        smp = lsm.sample_light(scene, li, p, nrm, xi, ns=nrm)
        ok = np.asarray(smp.pdf) > 0
        assert ok.mean() > 0.9
        # hit side: same origin, the sampled direction, hitting the light
        prop = jnp.zeros((nl,), jnp.int32)
        # reconstruct the hit prim: intersect the scene along wi
        from zyg_tpu.scene import shapes

        hit = shapes.intersect_scene(
            scene, p + 1e-4 * smp.wi, smp.wi, jnp.float32(0.0), jnp.float32(100.0)
        )
        hit_light = np.asarray(hit.prop) == 0
        pdf_hit = lsm.light_hit_pdf(
            scene, hit.prop, p, smp.wi, hit.t,
            p + hit.t[..., None] * smp.wi, smp.light_n, nrm,
            hit_prim=hit.prim,
        )
        # only lanes whose ray reaches the SAMPLED point count (grazing
        # rays enter through a nearer triangle of the same sphere; the
        # estimator handles those via occlusion, not this identity)
        hp = np.asarray(p) + np.asarray(hit.t)[:, None] * np.asarray(smp.wi)
        same_pt = np.linalg.norm(hp - np.asarray(smp.light_p), axis=-1) < 1e-3
        sel = ok & hit_light & same_pt
        assert sel.mean() > 0.5
        a = np.asarray(pdf_hit)[sel]
        b = np.asarray(smp.pdf)[sel]
        rel = np.abs(a - b) / np.maximum(b, 1e-20)
        # a point within tolerance of a triangle EDGE can intersect the
        # adjacent triangle — different descent pdf; allow a sliver
        assert (rel < 0.08).mean() > 0.99, rel.max()

    def test_equal_spp_variance_beats_flat_cdf(self):
        """Close to a big emitter, tree-driven triangle selection beats
        the flat area CDF at equal spp."""
        scene_tree = scene_with_big_emitter()
        scene_flat = scene_tree._replace(mesh_light_trees=None)

        def render(scene, spp):
            take = Take()
            take.num_samples_per_pixel = spp
            take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
            cam = PerspectiveCamera(resolution=(24, 24), fov=np.deg2rad(60.0))
            cam.position = np.array([0, 0.0, -3.0], np.float32)
            take.cameras = [cam]
            return Driver(take=take, scene=scene).render_frame()

        ref = render(scene_tree, 256)
        e_tree = float(np.sqrt(np.mean((render(scene_tree, 8) - ref) ** 2)))
        e_flat = float(np.sqrt(np.mean((render(scene_flat, 8) - ref) ** 2)))
        assert np.isfinite(e_tree) and np.isfinite(e_flat)
        assert e_tree < 1.2 * e_flat, f"tree {e_tree} vs flat {e_flat}"
        # means agree (unbiasedness across both strategies)
        m1, m2 = render(scene_tree, 64).mean(), render(scene_flat, 64).mean()
        assert abs(m1 - m2) / m2 < 0.05, (m1, m2)
