"""Triangle mesh + BVH tests: traversal vs brute force, render integration."""

import numpy as np
import jax
import jax.numpy as jnp

from zyg_tpu.scene import trimesh
from zyg_tpu.scene.bvh import build_bvh
from zyg_tpu.scene.loader import SceneBuilder, MaterialDesc, Transformation
from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver


def brute_force_hit(o, d, p0, e1, e2, tmax=1e30):
    """numpy reference closest-hit."""
    best_t = np.full(o.shape[0], tmax, np.float32)
    best_p = np.full(o.shape[0], -1, np.int32)
    for i in range(p0.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(-1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
        tvec = o - p0[i]
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1[i])
        v = (d * qvec).sum(-1) * inv
        t = (e2[i] * qvec).sum(-1) * inv
        hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < best_t) & (np.abs(det) > 1e-12)
        best_t = np.where(hit, t, best_t)
        best_p = np.where(hit, i, best_p)
    return best_t, best_p


class TestBVH:
    def test_traversal_matches_brute_force(self, rng_np):
        # random triangle soup
        nt = 200
        centers = rng_np.random((nt, 3)).astype(np.float32) * 4 - 2
        tri = centers[:, None, :] + (rng_np.random((nt, 3, 3)).astype(np.float32) - 0.5) * 0.6
        mesh = trimesh.HostMesh(
            positions=tri.reshape(-1, 3), indices=np.arange(nt * 3, dtype=np.int32).reshape(-1, 3)
        )
        arena = trimesh.build_arena([mesh])

        nr = 512
        o = (rng_np.random((nr, 3)).astype(np.float32) * 8 - 4).astype(np.float32)
        d = rng_np.normal(size=(nr, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        mh = trimesh.traverse(
            arena,
            jnp.zeros(nr, jnp.int32),
            jnp.asarray(o),
            jnp.asarray(d),
            jnp.float32(1e-4),
            jnp.float32(1e30),
        )
        p0 = np.asarray(arena.tri_p0)
        e1 = np.asarray(arena.tri_e1)
        e2 = np.asarray(arena.tri_e2)
        bt, bp = brute_force_hit(o, d, p0, e1, e2)
        got_t = np.asarray(mh.t)
        hit_mask = bp >= 0
        assert (np.asarray(mh.prim >= 0) == hit_mask).all(), "hit/miss mismatch"
        np.testing.assert_allclose(got_t[hit_mask], bt[hit_mask], rtol=1e-4)

    def test_any_hit(self, rng_np):
        mesh = trimesh.make_cube_mesh()
        arena = trimesh.build_arena([mesh])
        nr = 64
        o = np.tile(np.array([0, 0, -3], np.float32), (nr, 1))
        # half the rays aim at the cube, half away
        d = np.tile(np.array([0, 0, 1.0], np.float32), (nr, 1))
        d[nr // 2 :] = [0, 1, 0]
        mh = trimesh.traverse(
            arena,
            jnp.zeros(nr, jnp.int32),
            jnp.asarray(o),
            jnp.asarray(d),
            jnp.float32(1e-4),
            jnp.float32(1e30),
            any_hit=True,
        )
        hits = np.asarray(mh.prim >= 0)
        assert hits[: nr // 2].all() and not hits[nr // 2 :].any()

    def test_bvh_structure(self, rng_np):
        nt = 64
        centers = rng_np.random((nt, 3)).astype(np.float32)
        pmin = centers - 0.01
        pmax = centers + 0.01
        bvh = build_bvh(pmin, pmax)
        m = bvh.nodes_min.shape[0]
        # leaves cover every primitive exactly once
        covered = np.zeros(nt, bool)
        for i in range(m):
            if bvh.first_prim[i] >= 0:
                for j in range(bvh.prim_count[i]):
                    prim = bvh.prim_order[bvh.first_prim[i] + j]
                    assert not covered[prim]
                    covered[prim] = True
        assert covered.all()
        # links in range
        assert ((bvh.hit_link >= -1) & (bvh.hit_link < m)).all()
        assert ((bvh.miss_link >= -1) & (bvh.miss_link < m)).all()


class TestMeshRender:
    def _scene_with_mesh_cornell(self):
        b = SceneBuilder()
        white = b.add_material(MaterialDesc(color=np.full(3, 0.73, np.float32)))
        lightm = b.add_material(
            MaterialDesc(kind=2, emission=np.full(3, 15.0, np.float32))
        )
        import zyg_tpu.scene.types as st

        # floor rectangle
        rot_floor = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
        b.add_prop(
            __import__("zyg_tpu.scene.loader", fromlist=["PropDesc"]).PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([0, -1, 0], np.float32),
                    rotation=rot_floor,
                    scale=np.array([4, 4, 1], np.float32),
                ),
                material=white,
            )
        )
        # mesh sphere (smooth normals) instead of analytic
        mid = b.add_mesh(trimesh.make_sphere_mesh(24, 48, radius=0.5))
        b.add_mesh_prop(
            mid,
            Transformation(position=np.array([0, -0.5, 0], np.float32)),
            white,
        )
        # area light
        rot_down = np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32)
        b.add_prop(
            __import__("zyg_tpu.scene.loader", fromlist=["PropDesc"]).PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([0, 2.0, 0], np.float32),
                    rotation=rot_down,
                    scale=np.array([1.5, 1.5, 1], np.float32),
                ),
                material=lightm,
                is_light=True,
                visible_shadow=False,
            )
        )
        return b.build()

    def test_render_mesh_sphere(self):
        scene = self._scene_with_mesh_cornell()
        take = Take()
        take.num_samples_per_pixel = 16
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=4)
        cam = PerspectiveCamera(resolution=(48, 48), fov=np.deg2rad(45))
        cam.position = np.array([0, 0.3, -3.0], np.float32)
        take.cameras = [cam]
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        # sphere projects to roughly rows 22..38, cols 16..32 and is lit
        assert img[22:38, 16:32].mean() > 0.15
        assert img.mean() > 0.01


class TestMeshLight:
    def _scene(self):
        b = SceneBuilder()
        white = b.add_material(MaterialDesc(color=np.full(3, 0.7, np.float32)))
        lightm = b.add_material(
            MaterialDesc(kind=2, emission=np.full(3, 25.0, np.float32))
        )
        import zyg_tpu.scene.types as st
        from zyg_tpu.scene.loader import PropDesc

        rot_floor = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
        b.add_prop(
            PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([0, 0, 0], np.float32),
                    rotation=rot_floor,
                    scale=np.array([6, 6, 1], np.float32),
                ),
                material=white,
            )
        )
        # emissive mesh sphere hovering above the floor
        mid = b.add_mesh(trimesh.make_sphere_mesh(12, 24, radius=0.5))
        pid = b.add_mesh_prop(
            mid,
            Transformation(position=np.array([0, 1.5, 0], np.float32)),
            lightm,
        )
        b.props[pid].is_light = True
        b.props[pid].visible_shadow = False
        return b.build()

    def test_mesh_light_registered(self):
        scene = self._scene()
        assert scene.lights.count == 1
        assert float(scene.lights.area[0]) > 0.0
        assert int(scene.lights.tri_offset[0]) == 0
        assert int(scene.lights.tri_count[0]) > 100

    def test_nee_matches_bsdf_sampling(self):
        scene = self._scene()
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver

        def render(kind, spp):
            take = Take()
            take.num_samples_per_pixel = spp
            take.integrator = IntegratorSettings(kind=kind, max_depth_surface=3)
            cam = PerspectiveCamera(resolution=(32, 32), fov=np.deg2rad(50))
            cam.position = np.array([0, 1.2, -4.0], np.float32)
            take.cameras = [cam]
            return Driver(take=take, scene=scene).render_frame()

        pt = render("PT", 128)
        mis = render("PTMIS", 16)
        ratio = mis.mean() / pt.mean()
        assert abs(ratio - 1.0) < 0.06, f"mesh light NEE biased: ratio {ratio}"


class TestSubMesh:
    """SUB binary mesh container (ref shape_provider.zig loadBinary)."""

    def test_roundtrip(self, tmp_path):
        from zyg_tpu.io.sub_mesh import read_sub_mesh, write_sub_mesh
        from zyg_tpu.scene.trimesh import make_sphere_mesh

        mesh = make_sphere_mesh(n_theta=6, n_phi=8)
        p = str(tmp_path / "sphere.sub")
        write_sub_mesh(p, mesh)
        with open(p, "rb") as f:
            back = read_sub_mesh(f)
        np.testing.assert_allclose(back.positions, mesh.positions, rtol=1e-6)
        np.testing.assert_allclose(back.normals, mesh.normals, rtol=1e-6)
        np.testing.assert_allclose(back.uvs, mesh.uvs, rtol=1e-6)
        np.testing.assert_array_equal(back.indices, mesh.indices)

    def test_loads_as_shape_file(self, tmp_path):
        from zyg_tpu.io.sub_mesh import write_sub_mesh
        from zyg_tpu.io.mesh import load_mesh_file
        from zyg_tpu.scene.trimesh import make_cube_mesh

        p = str(tmp_path / "cube.sub")
        write_sub_mesh(p, make_cube_mesh())
        mesh = load_mesh_file(p)
        assert mesh is not None
        assert len(mesh.indices) == 12

    def test_delta_indices_decode(self, tmp_path):
        """Int32 encoding: index values are deltas (cumsum decode)."""
        import json, struct
        from zyg_tpu.io.sub_mesh import read_sub_mesh

        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
        nrm = np.tile(np.array([0, 0, 1], "<f4"), (3, 1))
        idx_abs = np.array([0, 1, 2], np.int64)
        deltas = np.diff(np.concatenate([[0], idx_abs]))  # cumsum(deltas) == idx_abs
        v_blob = pos.tobytes() + nrm.tobytes()
        i_blob = deltas.astype("<i4").tobytes()
        header = {"geometry": {
            "vertices": {"binary": {"offset": 0, "size": len(v_blob)},
                         "num_vertices": 3,
                         "layout": [{"semantic_name": "Position"},
                                    {"semantic_name": "Normal"}]},
            "indices": {"binary": {"offset": len(v_blob), "size": len(i_blob)},
                        "num_indices": 3, "encoding": "Int32"}}}
        js = json.dumps(header).encode()
        p = str(tmp_path / "delta.sub")
        with open(p, "wb") as f:
            f.write(b"SUB\x00"); f.write(struct.pack("<Q", len(js)))
            f.write(js); f.write(v_blob); f.write(i_blob)
        with open(p, "rb") as f:
            mesh = read_sub_mesh(f)
        np.testing.assert_array_equal(mesh.indices, [[0, 1, 2]])
