"""Scene TLAS over mesh instances: correctness vs the per-instance walk
(ref src/core/scene/prop/prop_tree.zig) and rigid-motion transform rows."""

import jax.numpy as jnp
import numpy as np
import pytest

from zyg_tpu.core import vecmath as vm
from zyg_tpu.scene import trimesh


def _instances_grid(k=3, spacing=2.0):
    rng = np.random.default_rng(7)
    ins = []
    for i in range(k):
        for j in range(k):
            ang = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            ins.append(
                dict(
                    prop=len(ins),
                    mesh=0,
                    rot=rot,
                    pos=np.array([i * spacing, 0.0, j * spacing], np.float32),
                    scale=np.array([1.0, 1.0, 1.0], np.float32) * rng.uniform(0.5, 1.5),
                    vis=(True, True, True),
                )
            )
    return ins


def _rays(n=2048, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1, 5, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestTlas:
    def test_matches_per_instance_walk(self):
        arena = trimesh.build_arena([trimesh.make_sphere_mesh(8, 16)])
        instances = _instances_grid()
        tlas = trimesh.build_tlas(arena, instances)
        arena = arena._replace(node_rows=tlas.node_rows)
        o, d = _rays()
        tmin, tmax = jnp.float32(0.0), jnp.float32(1e30)

        th = trimesh.traverse_tlas(arena, tlas, o, d, tmin, tmax)

        # reference: per-instance object-space walks, closest kept
        t_ref = jnp.full(o.shape[0], 1e30)
        prim_ref = jnp.full(o.shape[0], -1, jnp.int32)
        prop_ref = jnp.full(o.shape[0], -1, jnp.int32)
        for ins in instances:
            rot = jnp.asarray(ins["rot"])
            o_l = vm.world_to_object_point(rot, jnp.asarray(ins["scale"]), jnp.asarray(ins["pos"]), o)
            d_l = vm.world_to_object_vector(rot, jnp.asarray(ins["scale"]), d)
            root = jnp.zeros(o.shape[0], jnp.int32)
            mh = trimesh.traverse(arena, root, o_l, d_l, tmin, t_ref)
            closer = (mh.prim >= 0) & (mh.t < t_ref)
            t_ref = jnp.where(closer, mh.t, t_ref)
            prim_ref = jnp.where(closer, mh.prim, prim_ref)
            prop_ref = jnp.where(closer, ins["prop"], prop_ref)

        hit = np.asarray(prim_ref) >= 0
        assert hit.sum() > 30
        # the TLAS path reconstructs rotations from quats (1-2 ulp off the
        # matrix path) — allow a tiny grazing-hit disagreement fraction
        prim_eq = np.asarray(th.prim) == np.asarray(prim_ref)
        assert prim_eq.mean() > 0.995
        np.testing.assert_array_equal(
            np.asarray(th.prop)[prim_eq], np.asarray(prop_ref)[prim_eq]
        )
        both = hit & prim_eq
        np.testing.assert_allclose(
            np.asarray(th.t)[both], np.asarray(t_ref)[both], rtol=1e-3
        )

    def test_any_hit_shadow(self):
        arena = trimesh.build_arena([trimesh.make_cube_mesh()])
        instances = _instances_grid(k=2)
        tlas = trimesh.build_tlas(arena, instances)
        arena = arena._replace(node_rows=tlas.node_rows)
        o, d = _rays(256, seed=5)
        th = trimesh.traverse_tlas(
            arena, tlas, o, d, jnp.float32(0.0), jnp.float32(1e30), any_hit=True
        )
        th_closest = trimesh.traverse_tlas(
            arena, tlas, o, d, jnp.float32(0.0), jnp.float32(1e30)
        )
        # any-hit blocks exactly where closest-hit found something
        np.testing.assert_array_equal(
            np.asarray(th.prim >= 0), np.asarray(th_closest.prim >= 0)
        )

    def test_visibility_bits(self):
        arena = trimesh.build_arena([trimesh.make_cube_mesh()])
        instances = _instances_grid(k=1)
        instances[0]["vis"] = (False, True, True)  # camera-invisible
        tlas = trimesh.build_tlas(arena, instances)
        arena = arena._replace(node_rows=tlas.node_rows)
        o = jnp.asarray(np.array([[0.0, 0.0, -5.0]] * 4, np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, 1.0]] * 4, np.float32))
        prim_mask = jnp.asarray([True, True, False, False])
        th = trimesh.traverse_tlas(
            arena, tlas, o, d, jnp.float32(0.0), jnp.float32(1e30),
            ray_class="reflection", primary=prim_mask,
        )
        got = np.asarray(th.prim)
        assert (got[:2] == -1).all()  # primary lanes use camera visibility
        assert (got[2:] >= 0).all()

    def test_animated_transform_rows(self):
        """A translating instance: lane time interpolates the transform
        exactly (two-keyframe rigid motion, ref scene/space.zig)."""
        arena = trimesh.build_arena([trimesh.make_cube_mesh()])
        ins = dict(
            prop=0, mesh=0,
            rot=np.eye(3, dtype=np.float32),
            pos=np.array([0.0, 0.0, 0.0], np.float32),
            scale=np.ones(3, np.float32),
            vis=(True, True, True),
            rot1=np.eye(3, dtype=np.float32),
            pos1=np.array([2.0, 0.0, 0.0], np.float32),
            scale1=np.ones(3, np.float32),
        )
        tlas = trimesh.build_tlas(arena, [ins])
        arena = arena._replace(node_rows=tlas.node_rows)
        times = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
        # ray along -z through where the cube is at each time
        o = jnp.asarray(
            np.array([[0.0, 0, -5], [1.0, 0, -5], [2.0, 0, -5]], np.float32)
        )
        d = jnp.asarray(np.array([[0.0, 0, 1]] * 3, np.float32))
        th = trimesh.traverse_tlas(
            arena, tlas, o, d, jnp.float32(0.0), jnp.float32(1e30), time=times
        )
        assert (np.asarray(th.prim) >= 0).all()
        np.testing.assert_allclose(np.asarray(th.t), [4.5] * 3, atol=1e-5)
        # and the cube is NOT at the origin at t=1
        th2 = trimesh.traverse_tlas(
            arena, tlas, o, d, jnp.float32(0.0), jnp.float32(1e30),
            time=jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        )
        got = np.asarray(th2.prim)
        assert got[0] == -1 and got[2] == -1 and got[1] == -1
