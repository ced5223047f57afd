"""it/sow companion tool tests."""

import json
import os

import numpy as np

from zyg_tpu.tools import it, sow
from zyg_tpu.io.exr import write_exr
from zyg_tpu.scene.trimesh import make_cube_mesh


class TestIt:
    def _write(self, tmp_path, name, img):
        p = str(tmp_path / name)
        write_exr(p, {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}, half=False)
        return p

    def test_diff(self, tmp_path, rng_np):
        a = rng_np.random((16, 16, 3)).astype(np.float32)
        b = a + 0.1
        pa = self._write(tmp_path, "a.exr", a)
        pb = self._write(tmp_path, "b.exr", b)
        out, stats = it.op_diff([pa, pb])
        assert abs(stats[0]["rmse"] - 0.1) < 1e-3
        assert abs(stats[0]["max"] - 0.1) < 1e-3

    def test_cli_diff(self, tmp_path, rng_np, capsys):
        a = rng_np.random((8, 8, 3)).astype(np.float32)
        pa = self._write(tmp_path, "a.exr", a)
        pb = self._write(tmp_path, "b.exr", a)
        rc = it.main(["--diff", pa, pb, "-o", str(tmp_path / "d.png")])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats[0]["rmse"] == 0.0

    def test_downsample(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4, 1).repeat(3, -1)
        out = it.op_downsample(img, 2)
        assert out.shape == (2, 2, 3)
        assert abs(out[0, 0, 0] - np.mean([0, 1, 4, 5])) < 1e-6

    def test_denoise_reduces_noise(self, rng_np):
        clean = np.ones((24, 24, 3), np.float32) * 0.5
        noisy = clean + rng_np.normal(0, 0.2, clean.shape).astype(np.float32)
        albedo = np.ones_like(clean)
        out = it.op_denoise(noisy, albedo=albedo)
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.5

    def test_add_average_mul(self, rng_np):
        # ref it/operator.zig .Add/.Average/.Mul over the full input list
        a = rng_np.random((8, 8, 3)).astype(np.float32)
        b = rng_np.random((8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(it.op_add([a, b]), a + b, rtol=1e-6)
        np.testing.assert_allclose(it.op_average([a, b]), (a + b) / 2, rtol=1e-6)
        np.testing.assert_allclose(it.op_mul([a, b]), a * b, rtol=1e-6)

    def test_max_value(self):
        img = np.zeros((4, 4, 3), np.float32)
        out = it.op_max_value(img, (0.1, 0.2, 0.3))
        assert np.allclose(out[0, 0], [0.1, 0.2, 0.3])

    def test_over(self):
        # front image half-transparent: result = front + back*(1-alpha)
        front = np.full((4, 4, 3), 0.2, np.float32)
        back = np.full((4, 4, 3), 1.0, np.float32)
        alpha = np.full((4, 4, 1), 0.5, np.float32)
        out = it.op_over([front, back], [alpha, None])
        assert np.allclose(out, 0.2 + 1.0 * 0.5)
        # opaque front ignores the back layer
        out2 = it.op_over([front, back], [None, None])
        assert np.allclose(out2, front)

    def test_anaglyph(self):
        left = np.zeros((4, 4, 3), np.float32)
        left[..., 0] = 0.7
        right = np.zeros((4, 4, 3), np.float32)
        right[..., 1] = 0.3
        right[..., 2] = 0.9
        out = it.op_anaglyph(left, right, tonemapper="Linear")
        assert np.allclose(out[..., 0], 0.7)
        assert np.allclose(out[..., 1], 0.3)
        assert np.allclose(out[..., 2], 0.9)

    def test_cli_operator_flags(self, tmp_path, rng_np):
        a = rng_np.random((8, 8, 3)).astype(np.float32)
        b = rng_np.random((8, 8, 3)).astype(np.float32)
        pa = self._write(tmp_path, "a.exr", a)
        pb = self._write(tmp_path, "b.exr", b)
        out = str(tmp_path / "sum.exr")
        assert it.main([pa, pb, "--add", "-o", out]) == 0
        got = it.load_image(out)
        np.testing.assert_allclose(got, a + b, atol=1e-3)


class TestAgxLooks:
    def test_looks_differ_and_default_matches_reference_cli(self):
        import jax.numpy as jnp

        from zyg_tpu.render import sensor

        c = jnp.asarray(
            np.linspace(0.01, 4.0, 48, dtype=np.float32).reshape(4, 4, 3)
        )
        outs = {
            look: np.asarray(sensor.tonemap_agx(c, look))
            for look in sensor.AGX_LOOKS
        }
        # every look produces a distinct grade
        names = list(outs)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                assert np.abs(outs[a] - outs[b]).max() > 1e-3, (a, b)
        # the CDL grade itself matches the reference formula
        # (ref agx.zig:38: luma + sat * (pow(val*slope, power) - luma))
        v = np.array([[0.3, 0.5, 0.2]], np.float32)
        got = np.asarray(sensor._agx_look(jnp.asarray(v), "Punchy"))
        luma = 0.2126 * v[..., 0] + 0.7152 * v[..., 1] + 0.072 * v[..., 2]
        want = luma[..., None] + 1.4 * (v**1.35 - luma[..., None])
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # the bare tonemap() entry point defaults to Substitute
        # (ref cli/take_loader.zig:267)
        via_entry = np.asarray(sensor.tonemap(c, "AgX"))
        np.testing.assert_allclose(via_entry, outs["Substitute"], atol=1e-6)
        # all outputs clamped to [0,1]
        for o in outs.values():
            assert o.min() >= 0.0 and o.max() <= 1.0


class TestSow:
    def test_scatter_on_surface(self, tmp_path):
        mesh = make_cube_mesh()
        pts, rots, scales = sow.scatter_on_mesh(mesh, 500, seed=1)
        assert pts.shape == (500, 3)
        # all points on the cube surface: one coordinate at +-0.5
        on_face = (np.abs(np.abs(pts) - 0.5) < 1e-5).any(axis=-1)
        assert on_face.all()
        # rotations orthonormal
        eye = rots @ np.transpose(rots, (0, 2, 1))
        assert np.abs(eye - np.eye(3)).max() < 1e-4

    def test_instancer_roundtrip(self, tmp_path):
        mesh = make_cube_mesh()
        pts, rots, scales = sow.scatter_on_mesh(mesh, 10, seed=2)
        p = str(tmp_path / "x.instancer")
        sow.write_instancer(p, "proc:sphere", pts, rots, scales)
        data = json.load(open(p))
        assert len(data["instances"]) == 10
        assert data["prototype"]["shape"]["file"] == "proc:sphere"


class TestInstancer:
    def test_sow_to_scene_roundtrip(self, tmp_path):
        """Bake instances with sow, load them back as an Instancer entity."""
        import jax.numpy as jnp
        from zyg_tpu.scene.loader import load_scene_dict
        from zyg_tpu.scene.types import ShapeType

        mesh = make_cube_mesh()
        pts, rots, scales = sow.scatter_on_mesh(mesh, 20, seed=3)
        p = str(tmp_path / "f.instancer")
        sow.write_instancer(p, "proc:sphere", pts, rots, scales)
        scene = load_scene_dict(
            {
                "materials": [{"name": "m", "rendering": {"Substitute": {}}}],
                "entities": [
                    {"type": "Instancer", "source": "f.instancer", "materials": ["m"]}
                ],
            },
            base_dir=str(tmp_path),
        )
        assert scene.num_props == 20
        assert (np.asarray(scene.prop_shape) == int(ShapeType.TRIANGLE_MESH)).all()
        # ALL instances share one mesh (arena has a single root)
        assert scene.meshes.mesh_root.shape[0] == 1
        assert (np.asarray(scene.prop_mesh) == 0).all()


class TestCheckpointResume:
    def _take(self, filter_radius, aovs=()):
        import numpy as np
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera

        take = Take()
        take.num_samples_per_pixel = 8
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=4)
        take.sensor.filter_radius = filter_radius
        take.aovs = tuple(aovs)
        cam = PerspectiveCamera(resolution=(24, 16), fov=np.deg2rad(60.0))
        cam.position = np.array([0, 1.0, -3.8], np.float32)
        take.cameras = [cam]
        return take

    def _roundtrip(self, take, tmp_path):
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_file

        scene = load_scene_file("examples/scenes/cornell.scene")
        d1 = Driver(take=take, scene=scene)
        d1.start_frame()
        d1.render_iterations(8)
        ref = d1.resolve()

        cp = str(tmp_path / "state.npz")
        d2 = Driver(take=take, scene=scene)
        d2.start_frame()
        d2.render_iterations(4)
        d2.save_state(cp)
        d3 = Driver(take=take, scene=scene)
        d3.start_frame()
        d3.load_state(cp)
        assert d3._iteration == 4
        d3.render_iterations(4)
        return d3.resolve(), ref

    def test_deterministic_path_roundtrips_exactly(self, tmp_path):
        """On the deterministic path (AOVs force the UNSHUFFLED persistent
        wavefront — no oversampling), 4 spp + save/load + 4 spp reproduces
        the uninterrupted 8 spp run exactly: the seeding law depends only
        on (pixel, sample index). Filtered splats ride this path too."""
        import numpy as np

        out, ref = self._roundtrip(
            self._take(filter_radius=1.0, aovs=("albedo",)), tmp_path
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_persistent_path_roundtrips_statistically(self, tmp_path):
        """The persistent wavefront oversamples at the end of every
        dispatch (quota relaxation), so a split run lays samples out
        differently — the estimator must still agree in the mean."""
        import numpy as np

        out, ref = self._roundtrip(self._take(filter_radius=0.0), tmp_path)
        assert abs(out.mean() - ref.mean()) / ref.mean() < 0.03
        assert np.abs(out - ref).mean() < 0.05 * ref.mean() + 0.01


class TestSowParticles:
    """Ballistic particle generator/exporter (ref particle_generator.zig,
    particle_exporter.zig) + the point-motion render path."""

    def test_burst_ballistics(self):
        pos, rad = sow.simulate_burst(64, 24, seed=3)
        assert pos.shape == (24, 64, 3) and rad is None
        # all particles start on the r=0.01 sphere
        np.testing.assert_allclose(
            np.linalg.norm(pos[0], axis=-1), 0.01, atol=1e-5
        )
        # under gravity the mean height drops over time
        assert pos[-1][:, 1].mean() < pos[1][:, 1].mean()
        # speed stays near launch speed after one step (drag ~ cancels
        # gravity except for the net (g - 1) m/s^2 on down-fliers)
        step_d = np.linalg.norm(pos[2] - pos[1], axis=-1) * sow._PARTICLE_FPS
        assert step_d.max() <= 2.0 + 8.8 / sow._PARTICLE_FPS + 1e-3

    def test_sparks_lifecycle(self):
        pos, rad = sow.simulate_sparks(128, 80, radius=0.004, seed=1)
        assert rad.shape == (80, 128)
        # frame 0 is all hidden; later frames have visible flying sparks
        assert rad[0].max() == 0.0
        assert (rad[40] > 0).sum() > 10
        # visible sparks sit above the emitter (cone opens around +y)
        vis = rad[20] > 0
        if vis.any():
            assert pos[20][vis][:, 1].mean() > 0.0

    def test_rain_falls_from_rect(self):
        pos, rad = sow.simulate_rain(64, 60, radius=0.002, seed=2)
        vis = rad[50] > 0
        assert vis.sum() > 5
        # drops are below the y=0 emitter plane and inside the rect extent
        assert (pos[50][vis][:, 1] <= 0.0).all()
        assert np.abs(pos[50][vis][:, 0]).max() <= 0.27 + 1e-5

    def test_export_load_resolve_roundtrip(self, tmp_path):
        from zyg_tpu.io.mesh import load_point_cloud_file
        from zyg_tpu.scene.points import resolve_motion

        pos, rad = sow.simulate_sparks(32, 16, radius=0.004, seed=5)
        out = str(tmp_path / "sparks.json")
        sow.write_particles(out, pos, rad, 0.004)
        cloud = load_point_cloud_file(out)
        assert cloud.position_frames.shape == (16, 32, 3)
        assert cloud.radius_frames.shape == (16, 32)
        assert cloud.fps == 120.0
        # resolve at a mid-frame time: lerp of the bracketing frames
        t0 = 5.25 / 120.0
        flat = resolve_motion(cloud, t0, t0)
        want = 0.75 * pos[5] + 0.25 * pos[6]
        np.testing.assert_allclose(flat.positions, want, atol=1e-5)
        np.testing.assert_allclose(flat.radii, rad[5], atol=1e-7)
        assert flat.positions_end is None
        # a shutter span returns both endpoints
        span = resolve_motion(cloud, 5.0 / 120.0, 6.0 / 120.0)
        np.testing.assert_allclose(span.positions, pos[5], atol=1e-5)
        np.testing.assert_allclose(span.positions_end, pos[6], atol=1e-5)

    def test_cli_and_render_with_motion_blur(self, tmp_path):
        import json as _json

        from zyg_tpu.io.take import Take
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_file

        part = str(tmp_path / "rain.json")
        rc = sow.main([
            "particles", "--kind", "rain", "--count", "200", "--frames", "48",
            "--radius", "0.02", "-o", part,
        ])
        assert rc == 0
        scene_doc = {
            "materials": [
                {"name": "drop", "rendering": {"Substitute": {
                    "color": [0.7, 0.7, 0.9], "roughness": 0.3}}},
                {"name": "glow", "rendering": {"Light": {
                    "emittance": {"spectrum": [1, 1, 1], "value": 40.0}}}},
            ],
            "entities": [
                {"type": "Prop", "shape": {"file": "rain.json"},
                 "materials": ["drop"]},
                {"type": "Light", "shape": {"type": "Rectangle"},
                 "materials": ["glow"],
                 "transformation": {"position": [0, 1.5, 0],
                                    "rotation": [-90, 0, 0],
                                    "scale": [1, 1, 1]}},
            ],
        }
        spath = str(tmp_path / "rain.scene")
        with open(spath, "w") as f:
            _json.dump(scene_doc, f)
        # shutter spans sim frames 36..38 (0.3s..0.316s)
        scene = load_scene_file(spath, time0=36 / 120.0, time1=38 / 120.0)
        assert scene.points is not None
        take = Take()
        take.num_samples_per_pixel = 4
        cam = PerspectiveCamera(resolution=(24, 24))
        cam.position = np.array([0, -0.3, -1.6], np.float32)
        take.cameras = [cam]
        take.integrator.kind = "PTMIS"
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        assert img.mean() > 1e-4  # drops + light visible


class TestSowGrid:
    """Grid scatter + density maps + prototypes (ref sow/main.zig
    scatter(); VERDICT r2 missing item 12)."""

    def _terrain(self):
        from zyg_tpu.scene import trimesh

        # flat quad in the XZ plane, 10x10 around the origin
        import numpy as np

        pos = np.array(
            [[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]], np.float32
        )
        # wound so face normals point +y
        idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        return trimesh.HostMesh(positions=pos, indices=idx)

    def test_density_controls_count(self):
        import numpy as np

        m = self._terrain()
        p1, *_ = sow.scatter_grid(m, density=1.0, seed=3)
        p2, *_ = sow.scatter_grid(m, density=2.0, seed=3)
        assert len(p2) > 2.5 * len(p1)
        # everything lands on the quad at y ~= 0
        assert np.abs(p1[:, 1]).max() < 1e-4
        assert np.abs(p1[:, (0, 2)]).max() <= 5.001

    def test_density_map_masks_half(self):
        import numpy as np

        m = self._terrain()
        img = np.zeros((8, 8), np.float32)
        img[:, 4:] = 1.0  # only the +x half scatters
        pts, *_ = sow.scatter_grid(m, density=4.0, seed=5, density_image=img)
        assert len(pts) > 20
        assert (pts[:, 0] > -0.01).all(), "masked half must stay empty"

    def test_prototypes_and_depth_offset(self):
        import numpy as np

        m = self._terrain()
        protos = [
            {"file": "a.sub", "probability": 3.0, "scale_range": [0.5, 0.5]},
            {"file": "b.sub", "probability": 1.0, "scale_range": [2.0, 2.0]},
        ]
        pts, rots, scales, pids = sow.scatter_grid(
            m, density=4.0, seed=7, prototypes=protos,
            depth_offset_range=(0.5, 0.5),
        )
        frac_a = (pids == 0).mean()
        assert 0.65 < frac_a < 0.85
        np.testing.assert_allclose(
            np.unique(np.round(scales, 3)), [0.5, 2.0]
        )
        # depth offset pushes along the (up) normal
        assert np.allclose(pts[:, 1], 0.5, atol=1e-4)

    def test_merge_motion_roundtrip(self, tmp_path):
        import numpy as np

        from zyg_tpu.io.sub_mesh import read_sub_mesh, write_sub_mesh
        from zyg_tpu.scene import trimesh

        m = self._terrain()
        f1 = np.asarray(m.positions) + np.array([0, 1.0, 0], np.float32)
        out = str(tmp_path / "anim.sub")
        write_sub_mesh(out, m, position_frames=[m.positions, f1])
        with open(out, "rb") as f:
            back = read_sub_mesh(f)
        np.testing.assert_allclose(back.positions, m.positions)
        np.testing.assert_array_equal(back.indices, m.indices)
