"""Curve (hair) shape tests: rounded-cone intersection, BVH traversal vs
brute force, HAIR IO round-trip, end-to-end hair rendering."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene import curves as cv


def brute_force_hit(o, d, segs, tmin=0.0, tmax=1e9):
    """Reference hit via dense sampling of each rounded cone."""
    best_t = np.full(len(o), np.inf)
    best_i = np.full(len(o), -1)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ts = np.linspace(tmin, tmax, 20000)
    ss = np.linspace(0.0, 1.0, 64)
    for i, (pa, ra, pb, rb) in enumerate(segs):
        ba = pb - pa
        centers = pa[None] + ss[:, None] * ba[None]  # [S,3]
        radii = ra * (1 - ss) + rb * ss  # [S]
        for li in range(len(o)):
            p = o[li][None] + ts[:, None] * dn[li][None]  # [T,3]
            # rounded cone = union of the swept sphere family
            d2 = ((p[:, None, :] - centers[None]) ** 2).sum(-1)  # [T,S]
            inside = (d2 <= (radii[None] ** 2)).any(axis=1)
            if inside.any():
                t = ts[inside.argmax()]
                if t < best_t[li]:
                    best_t[li] = t
                    best_i[li] = i
    return best_t, best_i


class TestConeIntersect:
    def test_single_segment_matches_brute_force(self):
        rng = np.random.default_rng(3)
        pa = np.array([0.0, 0.0, 0.0], np.float32)
        pb = np.array([0.0, 1.0, 0.2], np.float32)
        ra, rb = 0.2, 0.05
        n = 64
        o = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-0.5, 1.5, n), np.full(n, -3.0)],
            axis=-1,
        ).astype(np.float32)
        target = np.stack(
            [rng.uniform(-0.3, 0.3, n), rng.uniform(0, 1, n), rng.uniform(-0.1, 0.3, n)],
            axis=-1,
        )
        d = (target - o).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        t, s, hit = cv._cone_test(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(np.tile(pa, (n, 1))), jnp.full((n,), ra, jnp.float32),
            jnp.asarray(np.tile(pb, (n, 1))), jnp.full((n,), rb, jnp.float32),
            jnp.float32(0.0), jnp.float32(100.0),
        )
        bt, bi = brute_force_hit(o, d, [(pa, ra, pb, rb)], 0.0, 8.0)
        hit = np.asarray(hit)
        t = np.asarray(t)
        # hit classification agrees (sampling tolerance at grazing angles)
        agree = hit == (bi >= 0)
        assert agree.mean() > 0.95, f"hit agreement {agree.mean()}"
        both = hit & (bi >= 0)
        np.testing.assert_allclose(t[both], bt[both], atol=2e-3)
        # axial parameter is sane
        assert (np.asarray(s)[both] >= 0).all() and (np.asarray(s)[both] <= 1).all()

    def test_traversal_matches_linear_scan(self):
        """BVH traversal == exhaustive per-segment cone test (the cone
        formula itself is validated against geometry above)."""
        ball = cv.make_hair_ball(num_strands=40, width=0.02)
        arena = cv.build_arena([ball])
        pa, ra, pb, rb, u0, u1, sid = cv.flatten_curves(ball)

        rng = np.random.default_rng(11)
        n = 512
        o = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, -3.0)], -1
        ).astype(np.float32)
        d = np.stack(
            [rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n), np.ones(n)], -1
        ).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        root = jnp.zeros((n,), jnp.int32)
        h = cv.traverse(
            arena, root, jnp.asarray(o), jnp.asarray(d), jnp.float32(0.0),
            jnp.float32(100.0),
        )
        # linear scan over UNORDERED segments, broadcast [S,N]
        t, s, hit = cv._cone_test(
            jnp.asarray(o)[None], jnp.asarray(d)[None],
            jnp.asarray(pa)[:, None], jnp.asarray(ra)[:, None],
            jnp.asarray(pb)[:, None], jnp.asarray(rb)[:, None],
            jnp.float32(0.0), jnp.float32(100.0),
        )
        tn = np.where(np.asarray(hit), np.asarray(t), 100.0)
        best_t = tn.min(axis=0).astype(np.float32)
        got_hit = np.asarray(h.prim) >= 0
        want_hit = best_t < 100.0
        np.testing.assert_array_equal(got_hit, want_hit)
        # f32 quadratic noise at grazing angles on 0.01-radius hairs
        np.testing.assert_allclose(np.asarray(h.t)[got_hit], best_t[got_hit], atol=1e-3)

    def test_any_hit_consistent(self):
        ball = cv.make_hair_ball(num_strands=30, width=0.02)
        arena = cv.build_arena([ball])
        rng = np.random.default_rng(5)
        n = 64
        o = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, -2.0)], -1
        ).astype(np.float32)
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        root = jnp.zeros((n,), jnp.int32)
        closest = cv.traverse(arena, root, jnp.asarray(o), jnp.asarray(d), jnp.float32(0.0), jnp.float32(10.0))
        any_h = cv.traverse(arena, root, jnp.asarray(o), jnp.asarray(d), jnp.float32(0.0), jnp.float32(10.0), any_hit=True)
        np.testing.assert_array_equal(np.asarray(closest.prim) >= 0, np.asarray(any_h.prim) >= 0)


class TestHairIO:
    def test_roundtrip(self, tmp_path):
        from zyg_tpu.io.hair import read_hair, write_hair

        rng = np.random.default_rng(2)
        strands = [
            np.cumsum(rng.normal(0, 0.01, (7, 3)), axis=0).astype(np.float32),
            np.cumsum(rng.normal(0, 0.01, (10, 3)), axis=0).astype(np.float32),
        ]
        p = str(tmp_path / "test.hair")
        write_hair(p, strands, thickness=0.002)
        with open(p, "rb") as f:
            hc = read_hair(f)
        # strand 1: 6 segments -> 2 cubics; strand 2: 9 segments -> 3 cubics
        assert len(hc.curve_starts) == 5
        assert (np.asarray(hc.strand_ids) == [0, 0, 1, 1, 1]).all()
        np.testing.assert_allclose(hc.widths, 0.002, rtol=1e-5)
        # first point of strand 0 survives the space round-trip
        np.testing.assert_allclose(hc.points[0], strands[0][0], atol=1e-6)


def hair_params(n, beta_m=0.3, beta_n=0.3, color=(0.5, 0.3, 0.1), h=None):
    import jax.numpy as jnp
    from zyg_tpu.scene.loader import MaterialDesc, _hair_constants
    from zyg_tpu.scene.types import MaterialKind

    d = MaterialDesc(kind=int(MaterialKind.HAIR), roughness=beta_m,
                     hair_beta_n=beta_n, color=np.asarray(color, np.float32))
    hc = jnp.tile(jnp.asarray(_hair_constants(d))[None], (n, 1))
    rng = np.random.default_rng(4)
    return {
        "_features": {"hair": True},
        "kind": jnp.full((n,), int(MaterialKind.HAIR), jnp.int32),
        "ior": jnp.full((n,), 1.55, jnp.float32),
        "hair": hc,
        "hair_h": jnp.asarray(
            h if h is not None else rng.uniform(-0.95, 0.95, n), jnp.float32
        ),
    }


class TestHairBsdf:
    """Chiang hair model (ref material/hair/hair_sample.zig)."""

    def _frame(self, n, seed=0):
        rng = np.random.default_rng(seed)
        t = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
        b = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
        nn = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        wo = rng.normal(size=(n, 3))
        wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
        return jnp.asarray(t), jnp.asarray(b), jnp.asarray(nn), jnp.asarray(wo.astype(np.float32))

    def test_sample_eval_pdf_consistency(self):
        from zyg_tpu.render import materials as mat

        n = 2048
        t, b, nn, wo = self._frame(n)
        params = hair_params(n)
        rng = np.random.default_rng(9)
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        wi, w, pdf_s, ok = mat.hair_sample(params, wo, t, b, nn, s3)
        f_e, pdf_e = mat.hair_eval(params, wo, wi, t, b, nn)
        okn = np.asarray(ok)
        assert okn.mean() > 0.95
        np.testing.assert_allclose(
            np.asarray(pdf_s)[okn], np.asarray(pdf_e)[okn], rtol=1e-4
        )
        assert np.isfinite(np.asarray(w)).all()
        assert (np.asarray(w)[okn] >= 0).all()

    def test_white_furnace_bounded(self):
        """With zero absorption the sampled weight must not create energy:
        E[f/pdf] <= ~1 (the model loses a little to the residual port)."""
        from zyg_tpu.render import materials as mat
        from zyg_tpu.scene.loader import MaterialDesc, _hair_constants
        from zyg_tpu.scene.types import MaterialKind

        n = 8192
        t, b, nn, wo = self._frame(n, seed=3)
        params = hair_params(n, color=(0.999, 0.999, 0.999))
        # zero out absorption entirely
        hc = np.asarray(params["hair"]).copy()
        hc[:, 0:3] = 0.0
        params["hair"] = jnp.asarray(hc)
        rng = np.random.default_rng(5)
        s3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        wi, w, pdf_s, ok = mat.hair_sample(params, wo, t, b, nn, s3)
        mean_w = float(np.asarray(w)[np.asarray(ok)].mean())
        assert 0.7 < mean_w <= 1.02, f"furnace mean {mean_w}"

    def test_pdf_integrates_to_one(self):
        """Monte-Carlo: integral of eval pdf over the sphere ~= 1."""
        from zyg_tpu.render import materials as mat

        n = 200_000
        t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
        b = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        nn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        wo = jnp.tile(
            jnp.asarray([[0.3, 0.5, 0.81]], jnp.float32)
            / np.linalg.norm([0.3, 0.5, 0.81]),
            (n, 1),
        )
        params = hair_params(n, h=np.full(n, 0.3))
        rng = np.random.default_rng(8)
        wi = rng.normal(size=(n, 3))
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        _, pdf = mat.hair_eval(params, wo, jnp.asarray(wi.astype(np.float32)), t, b, nn)
        integral = float(np.asarray(pdf).mean() * 4.0 * np.pi)
        assert abs(integral - 1.0) < 0.05, f"pdf integral {integral}"


class TestHairRender:
    def test_hair_ball_renders(self):
        import jax.numpy as jnp
        from zyg_tpu.scene.loader import (
            SceneBuilder, Transformation, MaterialDesc, PropDesc,
            rotation_matrix_from_euler_degrees,
        )
        from zyg_tpu.scene.types import MaterialKind, ShapeType
        from zyg_tpu.io.take import Take
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver

        b = SceneBuilder()
        ball = cv.make_hair_ball(num_strands=120, width=0.012)
        cid = b.add_curves(ball)
        mat = b.add_material(
            MaterialDesc(
                kind=int(MaterialKind.HAIR),
                color=np.array([0.6, 0.35, 0.15], np.float32),
                roughness=0.3, hair_beta_n=0.35,
            )
        )
        b.add_curve_prop(cid, Transformation(), mat)
        lm = b.add_material(
            MaterialDesc(kind=int(MaterialKind.LIGHT), emission=np.full(3, 10.0, np.float32))
        )
        b.add_prop(
            PropDesc(
                shape=int(ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([0, 2.5, -1.0], np.float32),
                    rotation=rotation_matrix_from_euler_degrees([-90, 0, 0]),
                    scale=np.array([2, 2, 1], np.float32),
                ),
                material=lm, is_light=True, visible_shadow=False,
            )
        )
        scene = b.build(0.0, 1.0)
        assert scene.curves is not None
        take = Take()
        take.num_samples_per_pixel = 4
        cam = PerspectiveCamera(resolution=(48, 48))
        cam.position = np.array([0, 0.4, -2.2], np.float32)
        take.cameras = [cam]
        take.integrator.kind = "PTMIS"
        take.integrator.max_depth_surface = 6
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        # the ball occupies the center: hair pixels lit and colored
        center = img[16:32, 16:32]
        assert center.mean() > 1e-3
        # absorption is reddish: red >= blue on the hair
        assert center[..., 0].sum() > center[..., 2].sum()


class TestPointClouds:
    """Point-cloud shape (ref shape/point/): sphere particles + motion."""

    def _cloud_scene(self, motion=False):
        from zyg_tpu.scene.loader import (
            SceneBuilder, Transformation, MaterialDesc, PropDesc,
            rotation_matrix_from_euler_degrees,
        )
        from zyg_tpu.scene.points import HostPoints
        from zyg_tpu.scene.types import MaterialKind, ShapeType

        rng = np.random.default_rng(12)
        pos = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        b = SceneBuilder()
        cloud = HostPoints(
            positions=pos,
            radii=np.full(300, 0.03, np.float32),
            positions_end=(pos + np.array([0.4, 0, 0], np.float32)) if motion else None,
        )
        cid = b.add_points(cloud)
        mat = b.add_material(
            MaterialDesc(color=np.array([0.8, 0.3, 0.2], np.float32), roughness=0.5)
        )
        b.add_point_prop(cid, Transformation(), mat)
        lm = b.add_material(
            MaterialDesc(kind=int(MaterialKind.LIGHT), emission=np.full(3, 10.0, np.float32))
        )
        b.add_prop(
            PropDesc(
                shape=int(ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([0, 2.0, 0], np.float32),
                    rotation=rotation_matrix_from_euler_degrees([-90, 0, 0]),
                    scale=np.array([2, 2, 1], np.float32),
                ),
                material=lm, is_light=True, visible_shadow=False,
            )
        )
        return b.build(0.0, 1.0)

    def test_traversal_matches_linear(self):
        from zyg_tpu.scene import points as pt_mod

        rng = np.random.default_rng(2)
        pos = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        radii = rng.uniform(0.02, 0.08, 200).astype(np.float32)
        arena = pt_mod.build_arena([pt_mod.HostPoints(pos, radii)])
        n = 256
        o = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, -3.0)], -1
        ).astype(np.float32)
        d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        root = jnp.zeros((n,), jnp.int32)
        h = pt_mod.traverse(arena, root, jnp.asarray(o), jnp.asarray(d), jnp.float32(0.0), jnp.float32(100.0))
        # linear reference
        t, ok = pt_mod._sphere_test(
            jnp.asarray(o)[None], jnp.asarray(d)[None],
            jnp.asarray(pos)[:, None], jnp.asarray(radii)[:, None],
            jnp.float32(0.0), jnp.float32(100.0),
        )
        tn = np.where(np.asarray(ok), np.asarray(t), 100.0)
        best = tn.min(axis=0)
        np.testing.assert_array_equal(np.asarray(h.prim) >= 0, best < 100.0)
        got = np.asarray(h.prim) >= 0
        # f32 rounding differs between packed-row and broadcast layouts
        np.testing.assert_allclose(np.asarray(h.t)[got], best[got], atol=1e-3)

    def test_render_and_shadows(self):
        from zyg_tpu.io.take import Take
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver

        scene = self._cloud_scene()
        assert scene.points is not None
        take = Take()
        take.num_samples_per_pixel = 4
        cam = PerspectiveCamera(resolution=(32, 32))
        cam.position = np.array([0, 0, -2.5], np.float32)
        take.cameras = [cam]
        take.integrator.kind = "PTMIS"
        take.integrator.max_depth_surface = 4
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        assert img[12:20, 12:20].mean() > 1e-3  # particles visible

    def test_motion_blur_moves_particles(self):
        """time=0 vs time=1 traversal sees the cloud at different x."""
        from zyg_tpu.scene import points as pt_mod

        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        arena = pt_mod.build_arena(
            [pt_mod.HostPoints(pos, np.array([0.1], np.float32),
                               positions_end=np.array([[1.0, 0.0, 0.0]], np.float32))]
        )
        assert arena.has_motion
        o = jnp.asarray([[0.0, 0.0, -2.0], [1.0, 0.0, -2.0]], jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (2, 1))
        root = jnp.zeros((2,), jnp.int32)
        h0 = pt_mod.traverse(arena, root, o, d, jnp.float32(0.0), jnp.float32(10.0),
                             time=jnp.zeros(2, jnp.float32))
        h1 = pt_mod.traverse(arena, root, o, d, jnp.float32(0.0), jnp.float32(10.0),
                             time=jnp.ones(2, jnp.float32))
        # at t=0 only the ray at x=0 hits; at t=1 only the ray at x=1
        assert np.asarray(h0.prim)[0] >= 0 and np.asarray(h0.prim)[1] < 0
        assert np.asarray(h1.prim)[0] < 0 and np.asarray(h1.prim)[1] >= 0

    def test_sow_point_cloud_roundtrip(self, tmp_path):
        from zyg_tpu.tools.sow import write_point_cloud
        from zyg_tpu.io.mesh import load_point_cloud_file

        pts = np.random.default_rng(1).uniform(-1, 1, (50, 3)).astype(np.float32)
        p = str(tmp_path / "cloud.json")
        write_point_cloud(p, pts, radius=0.05)
        cloud = load_point_cloud_file(p)
        np.testing.assert_allclose(cloud.positions, pts, rtol=1e-6)
        np.testing.assert_allclose(cloud.radii, 0.05)
