"""Motion blur / animation tests (ref scene/space.zig keyframed transforms,
util/animation_loader.zig, camera_base.zig shutter)."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene.loader import (
    Transformation, eval_animation, parse_animation, load_scene_dict,
    rotation_matrix_from_euler_degrees,
)
from zyg_tpu.io.take import Take, IntegratorSettings, load_take_dict
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.integrator import ptmis
from zyg_tpu.scene import shapes


def anim_scene_dict(color=(0.9, 0.05, 0.05)):
    return {
        "materials": [
            {"name": "m", "rendering": {"Substitute": {"color": list(color), "roughness": 0.9}}},
            {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
        ],
        "entities": [
            {
                "type": "Prop", "shape": {"type": "Sphere"}, "materials": ["m"],
                "transformation": {"scale": [0.5, 0.5, 0.5]},
                "animation": {
                    "keyframes": [
                        {"time": 0.0, "transformation": {"position": [-1.0, 0, 0]}},
                        {"time": 1.0, "transformation": {"position": [1.0, 0, 0]}},
                    ]
                },
            },
            {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"]},
        ],
    }


class TestKeyframes:
    def test_two_keyframe_interpolation_exact(self):
        a = Transformation(position=np.array([0, 0, 0], np.float32))
        b = Transformation(
            position=np.array([2, 4, 6], np.float32),
            rotation=rotation_matrix_from_euler_degrees(np.array([0.0, 90.0, 0.0])),
            scale=np.array([3, 3, 3], np.float32),
        )
        anim = [(0.0, a), (1.0, b)]
        mid = eval_animation(anim, 0.5)
        np.testing.assert_allclose(mid.position, [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(mid.scale, [2, 2, 2], atol=1e-6)
        # slerp of identity -> 90deg about y == 45deg about y
        expect = rotation_matrix_from_euler_degrees(np.array([0.0, 45.0, 0.0]))
        np.testing.assert_allclose(mid.rotation, expect, atol=1e-5)
        # clamped outside the track
        np.testing.assert_allclose(eval_animation(anim, -1.0).position, a.position)
        np.testing.assert_allclose(eval_animation(anim, 9.0).position, b.position)

    def test_parse_schema_variants(self):
        parent = Transformation()
        default = Transformation()
        kf = parse_animation(
            {"keyframes": [
                {"time": 0.0, "transformation": {"position": [1, 0, 0]}},
                {"time": 2.0, "transformation": {"position": [0, 1, 0]}},
            ]}, parent, default,
        )
        assert len(kf) == 2 and kf[1][0] == 2.0
        tt = parse_animation(
            {"frames_per_second": 30,
             "transformations": [{"position": [0, 0, 0]}, {"position": [1, 0, 0]}]},
            parent, default,
        )
        assert len(tt) == 2
        assert abs(tt[1][0] - 1.0 / 30.0) < 1e-9

    def test_static_build_has_no_motion(self):
        scene = load_scene_dict(anim_scene_dict(), time0=0.5)
        assert scene.animated_props is None
        np.testing.assert_allclose(np.asarray(scene.prop_pos[0]), [0, 0, 0], atol=1e-6)

    def test_moving_build_resolves_endpoints(self):
        scene = load_scene_dict(anim_scene_dict(), time0=0.25, time1=0.75)
        assert scene.animated_props == {(0, 6): True}
        np.testing.assert_allclose(np.asarray(scene.prop_pos[0]), [-0.5, 0, 0], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(scene.prop_keys[0, -1, 4:7]), [0.5, 0, 0], atol=1e-6
        )


class TestMotionTrace:
    def _scene(self):
        return load_scene_dict(anim_scene_dict(), time0=0.1, time1=0.9)

    def test_intersection_follows_time(self):
        scene = self._scene()
        o = jnp.asarray([[-0.8, 0, -3], [0.8, 0, -3]], jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        h0 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.zeros((2,), jnp.float32),
        )
        h1 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.ones((2,), jnp.float32),
        )
        # at t=0 the sphere (radius .25 at x=-.8..-..) is under ray 0 only
        assert int(h0.prop[0]) == 0 and int(h0.prop[1]) != 0
        assert int(h1.prop[0]) != 0 and int(h1.prop[1]) == 0

    def test_render_shows_smear(self):
        """The persistent wavefront integrates over the shutter: the moving
        sphere covers ~3-4x its static footprint."""
        scene = self._scene()
        static = load_scene_dict(anim_scene_dict(), time0=0.5)
        cam = PerspectiveCamera(resolution=(64, 24), fov=np.deg2rad(80))
        cam.position = np.array([0, 0, -3.0], np.float32)
        n = 64 * 24
        ids = jnp.arange(n, dtype=jnp.uint32)
        ys, xs = np.divmod(np.arange(n), 64)
        pxy = jnp.asarray(np.stack([xs, ys], -1), jnp.int32)

        def span(sc):
            acc, _, _, _, _ = ptmis.integrate_persistent(
                sc, cam.arrays(0), pxy, ids, jnp.int32(0), 48, 48,
                ptmis.PtmisSettings(max_depth=3),
            )
            img = np.asarray(acc).reshape(24, 64, 3) / 48
            red = (img[12, :, 0] - img[12, :, 2]) > 0.05
            idx = np.flatnonzero(red)
            return (idx.max() - idx.min() + 1) if red.any() else 0

        s_blur = span(scene)
        s_static = span(static)
        assert s_static > 0 and s_blur > 2.5 * s_static, (
            f"blur span {s_blur} vs static {s_static}"
        )


class TestShutterTake:
    def test_take_shutter_keys(self):
        take = load_take_dict(
            {
                "scene": "x.scene",
                "camera": {
                    "Perspective": {
                        "parameters": {
                            "fov": 50,
                            "shutter": {"frames_per_second": 24, "open": 0.25, "close": 0.75},
                        },
                        "resolution": [8, 8],
                    }
                },
            }
        )
        cam = take.cameras[0]
        assert abs(cam.frame_step - 1 / 24) < 1e-9
        t0, t1 = cam.frame_interval(3)
        assert abs(t0 - (3 / 24 + 0.25 / 24)) < 1e-9
        assert abs(t1 - (3 / 24 + 0.75 / 24)) < 1e-9


class TestMotionMeshes:
    """Per-vertex deforming meshes (ref triangle_motion_tree.zig;
    VERDICT r2 missing item 3): two-endpoint vertex lerp during
    traversal with union-bounded node AABBs."""

    def _moving_quad(self, dy=2.0):
        import numpy as np
        from zyg_tpu.scene.trimesh import HostMesh

        pos = np.array(
            [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
        )
        idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        return HostMesh(
            positions=pos, indices=idx,
            positions_end=pos + np.array([0, dy, 0], np.float32),
        )

    def test_traverse_lerps_vertices(self):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.scene import trimesh

        arena = trimesh.build_arena([self._moving_quad(dy=2.0)])
        assert arena.tri_rows_d is not None
        n = 8
        times = jnp.asarray(np.linspace(0.0, 1.0, n), jnp.float32)
        o = jnp.tile(jnp.asarray([[0.2, 5.0, 0.3]], jnp.float32), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        root = jnp.zeros((n,), jnp.int32)
        hit = trimesh.traverse(
            arena, root, o, d, jnp.float32(0.0), jnp.float32(100.0),
            time=times,
        )
        assert (np.asarray(hit.prim) >= 0).all()
        # quad plane at y = 2t -> hit distance 5 - 2t
        np.testing.assert_allclose(
            np.asarray(hit.t), 5.0 - 2.0 * np.asarray(times), rtol=1e-5
        )

    def test_static_mesh_in_motion_arena_unmoved(self):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.scene import trimesh

        arena = trimesh.build_arena(
            [self._moving_quad(), trimesh.make_cube_mesh()]
        )
        n = 4
        o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        root = jnp.full((n,), int(arena.mesh_root[1]), jnp.int32)
        times = jnp.asarray([0.0, 0.3, 0.7, 1.0], jnp.float32)
        hit = trimesh.traverse(
            arena, root, o, d, jnp.float32(0.0), jnp.float32(100.0),
            time=times,
        )
        np.testing.assert_allclose(np.asarray(hit.t), 2.5, rtol=1e-5)

    def test_render_blur_smears_along_motion(self, tmp_path):
        """A fast-moving quad under a full shutter renders a smeared
        band: coverage extends over the swept area."""
        import numpy as np
        from zyg_tpu.io.sub_mesh import write_sub_mesh
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_dict

        import os

        m = self._moving_quad(dy=0.0)
        # vertical quad sliding +x by 2 over the shutter
        pos = np.array(
            [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
            np.float32,
        )
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        from zyg_tpu.scene.trimesh import HostMesh

        write_sub_mesh(
            str(tmp_path / "slide.sub"),
            HostMesh(positions=pos, indices=idx),
            position_frames=[pos, pos + np.array([2.0, 0, 0], np.float32)],
        )
        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "white", "rendering": {"Substitute": {"color": [0.9, 0.9, 0.9]}}},
                    {"name": "sky", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
                ],
                "entities": [
                    {"type": "Prop", "shape": {"file": "slide.sub"}, "materials": ["white"]},
                    {"type": "Light", "shape": {"type": "Dome"}, "materials": ["sky"],
                     "visibility": {"in_shadow": False}},
                ],
            },
            base_dir=str(tmp_path),
        )
        take = Take()
        take.num_samples_per_pixel = 48
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
        cam = PerspectiveCamera(resolution=(48, 16), fov=np.deg2rad(60.0))
        cam.position = np.array([1.0, 0, -3.0], np.float32)
        take.cameras = [cam]
        img = Driver(take=take, scene=scene).render_frame()
        row = img[8, :, 0]
        # static quad spans x in [-1..0] of a [-2.4..4.4] frustum slice...
        # instead of exact extents: the swept region (center columns) is
        # partially covered (blur), start and end regions differ from a
        # static render
        assert np.isfinite(img).all()
        # the quad's sweep covers x in [-0.5, 2.5] -> wide partial band
        # vs an 8-column static quad; count columns with partial coverage
        sky = np.median(row[:4])
        partial = ((row > sky * 1.05) | (row < sky * 0.95)).sum()
        assert partial > 16, f"blurred band too narrow: {partial} columns"


class TestMultiKeyframe:
    """Keyframes INSIDE the shutter resample at K=8 (ref space.zig:163
    tick-granularity keyframe chains)."""

    def _arc_scene(self):
        # three keyframes inside one shutter: the sphere arcs UP then
        # returns — an endpoint lerp would keep it at y=0 the whole time
        d = anim_scene_dict()
        d["entities"][0]["animation"]["keyframes"] = [
            {"time": 0.0, "transformation": {"position": [-1.0, 0, 0]}},
            {"time": 0.5, "transformation": {"position": [0.0, 1.0, 0]}},
            {"time": 1.0, "transformation": {"position": [1.0, 0, 0]}},
        ]
        return load_scene_dict(d, time0=0.0, time1=1.0)

    def test_keyframe_count_and_shape(self):
        scene = self._arc_scene()
        assert scene.prop_keys.shape[1] == 9  # K=8 -> 9 frames
        # frame 4 (t=0.5) sits at the arc apex
        np.testing.assert_allclose(
            np.asarray(scene.prop_keys[0, 4, 4:7]), [0.0, 1.0, 0.0], atol=1e-6
        )

    def test_arc_renders_curved(self):
        scene = self._arc_scene()
        # at lane time 0.5 the sphere must be at the APEX (0,1,0), which an
        # endpoint chord (lerp(-1,1)=(0,0,0) at y=0) would miss
        o = jnp.asarray([[0.0, 1.0, -3.0], [0.0, 0.0, -3.0]], jnp.float32)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        t_mid = jnp.full(2, 0.5, jnp.float32)
        hit = shapes.intersect_scene(
            scene, o, dirs, jnp.float32(0.0), jnp.float32(1e9), time=t_mid
        )
        assert int(hit.prop[0]) == 0  # apex ray hits
        assert int(hit.prop[1]) != 0  # chord ray misses the sphere

    def test_two_keyframe_animation_keeps_k1(self):
        scene = load_scene_dict(anim_scene_dict(), time0=0.0, time1=1.0)
        assert scene.prop_keys.shape[1] == 2  # endpoint slerp unchanged


class TestAnimatedLight:
    """ref light.zig sampleTo with propTransformationAt: an animated area
    light motion-blurs (NEE + hit pdfs follow the shutter transform)."""

    def _scene(self):
        d = {
            "materials": [
                {"name": "m", "rendering": {"Substitute": {"color": [0.7, 0.7, 0.7], "roughness": 0.8}}},
                {"name": "l", "rendering": {"Light": {"emittance": {"value": 50.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop", "shape": {"type": "Rectangle"}, "materials": ["m"],
                    "transformation": {"rotation": [90, 0, 0], "scale": [8, 8, 1]},
                },
                {
                    "type": "Light", "shape": {"type": "Rectangle"}, "materials": ["l"],
                    "transformation": {
                        "position": [-2.0, 2.0, 0],
                        "rotation": [-90, 0, 0],
                        "scale": [0.5, 0.5, 1],
                    },
                    "animation": {
                        "keyframes": [
                            {"time": 0.0, "transformation": {"position": [-2.0, 2.0, 0], "rotation": [-90, 0, 0]}},
                            {"time": 1.0, "transformation": {"position": [2.0, 2.0, 0], "rotation": [-90, 0, 0]}},
                        ]
                    },
                },
            ],
        }
        return load_scene_dict(d, time0=0.0, time1=1.0)

    def test_animated_light_is_tracked(self):
        scene = self._scene()
        assert scene.animated_lights == {1: True}
        from zyg_tpu.scene.types import ShapeType
        assert (1, int(ShapeType.RECTANGLE)) in scene.animated_props

    def test_nee_follows_light_motion(self):
        from zyg_tpu.scene import light_sampling as ls

        scene = self._scene()
        n = 2
        p = jnp.zeros((n, 3), jnp.float32)
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
        xi = jnp.full((n, 2), 0.5, jnp.float32)
        li = jnp.zeros(n, jnp.int32)
        t01 = jnp.asarray([0.0, 1.0], jnp.float32)
        smp = ls.sample_light(scene, li, p, nrm, xi, time=t01)
        # the sampled light point tracks the shutter position: x ~ -2 at
        # t=0 and ~ +2 at t=1
        lx = np.asarray(smp.light_p[:, 0])
        assert abs(lx[0] - (-2.0)) < 0.5
        assert abs(lx[1] - 2.0) < 0.5
        assert float(smp.pdf[0]) > 0 and float(smp.pdf[1]) > 0

    def test_hit_pdf_follows_light_motion(self):
        from zyg_tpu.scene import light_sampling as ls

        scene = self._scene()
        # rays from just above the floor toward each shutter-time light
        n = 2
        o = jnp.tile(jnp.asarray([[0.0, 0.1, 0.0]], jnp.float32), (n, 1))
        d = jnp.asarray(
            [[-2.0, 1.9, 0.0], [2.0, 1.9, 0.0]], jnp.float32
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t01 = jnp.asarray([0.0, 1.0], jnp.float32)
        hit = shapes.intersect_scene(
            scene, o, d, jnp.float32(0.0), jnp.float32(1e9), time=t01
        )
        # each ray hits the light at ITS lane time
        np.testing.assert_array_equal(np.asarray(hit.prop), [1, 1])
        frag = shapes.build_fragment(scene, hit, o, d, time=t01)
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
        lp = ls.light_hit_pdf(
            scene, hit.prop, o, d, hit.t, frag.p, frag.geo_n, nrm, time=t01
        )
        assert float(lp[0]) > 0 and float(lp[1]) > 0

    def test_animated_light_renders(self):
        # end-to-end: PTMIS render with the moving light completes and the
        # floor is lit (the streak integrates over the shutter)
        scene = self._scene()
        take = Take()
        take.num_samples_per_pixel = 8
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=3)
        cam = PerspectiveCamera(resolution=(24, 24), fov=np.deg2rad(60))
        cam.position = np.array([0, 2.5, -6.0], np.float32)
        take.cameras = [cam]
        from zyg_tpu.render.driver import Driver

        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestAnimatedCurvePointProps:
    """Entity animation on curve / point-cloud props (ref space.zig — any
    prop type takes keyframed transforms; was warned-off before round 5)."""

    def test_animated_point_prop_follows_time(self):
        from zyg_tpu.scene.loader import MaterialDesc, SceneBuilder
        from zyg_tpu.scene.points import HostPoints

        b = SceneBuilder()
        cloud = HostPoints(
            positions=np.zeros((1, 3), np.float32),
            radii=np.full(1, 0.4, np.float32),
        )
        pid = b.add_points(cloud)
        mat = b.add_material(MaterialDesc(color=np.full(3, 0.5, np.float32)))
        anim = [
            (0.0, Transformation(position=np.array([-1.0, 0, 0], np.float32))),
            (1.0, Transformation(position=np.array([1.0, 0, 0], np.float32))),
        ]
        b.add_point_prop(pid, Transformation(), mat, animation=anim)
        scene = b.build(time0=0.0, time1=1.0)
        assert scene.animated_points == {0: True}
        assert int(scene.point_props.shape[0]) == 0  # left the static scan

        o = jnp.asarray([[-1.0, 0, -3.0], [1.0, 0, -3.0]], jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        h0 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.zeros(2, jnp.float32),
        )
        h1 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.ones(2, jnp.float32),
        )
        assert int(h0.prop[0]) == 0 and int(h0.prop[1]) < 0
        assert int(h1.prop[0]) < 0 and int(h1.prop[1]) == 0
        # shadow rays see the moving cloud too
        b0 = shapes.occluded(
            scene, o, d, jnp.float32(0.0), jnp.float32(10.0),
            time=jnp.zeros(2, jnp.float32),
        )
        assert bool(b0[0]) and not bool(b0[1])

    def test_animated_curve_prop_follows_time(self):
        from zyg_tpu.scene.loader import MaterialDesc, SceneBuilder
        from zyg_tpu.scene import curves as cv
        from zyg_tpu.scene.types import MaterialKind

        b = SceneBuilder()
        ball = cv.make_hair_ball(num_strands=40, width=0.05, radius=0.3)
        cid = b.add_curves(ball)
        mat = b.add_material(MaterialDesc(
            kind=int(MaterialKind.HAIR), color=np.full(3, 0.4, np.float32),
        ))
        anim = [
            (0.0, Transformation(position=np.array([-1.0, 0, 0], np.float32))),
            (1.0, Transformation(position=np.array([1.0, 0, 0], np.float32))),
        ]
        b.add_curve_prop(cid, Transformation(), mat, animation=anim)
        scene = b.build(time0=0.0, time1=1.0)
        assert scene.animated_curves == {0: True}

        o = jnp.asarray([[-1.0, 0, -3.0], [1.0, 0, -3.0]], jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        h0 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.zeros(2, jnp.float32),
        )
        h1 = shapes.intersect_scene(
            scene, o, d, jnp.float32(0), jnp.float32(3e9),
            time=jnp.ones(2, jnp.float32),
        )
        assert int(h0.prop[0]) == 0 and int(h0.prop[1]) < 0
        assert int(h1.prop[0]) < 0 and int(h1.prop[1]) == 0
