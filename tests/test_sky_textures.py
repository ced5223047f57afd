"""Sky model + texture engine tests."""

import os

import numpy as np
import jax.numpy as jnp

from zyg_tpu.scene.sky import bake_sky, sun_radiance
from zyg_tpu.scene.textures import TextureBuilder, sample_bilinear
from zyg_tpu.scene.loader import load_scene_file, load_scene_dict
from zyg_tpu.io.take import load_take_file
from zyg_tpu.render.driver import Driver

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


class TestSkyModel:
    def test_bake_plausible(self):
        sun_dir = np.array([0.3, -0.8, 0.5])
        sun_dir /= np.linalg.norm(sun_dir)
        img = bake_sky(sun_dir, turbidity=2.5, width=64, height=32)
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all() and (img >= 0).all()
        upper = img[:16]
        # sky is blue-ish away from the sun: B channel dominates on average
        assert upper[..., 2].mean() > upper[..., 0].mean()
        # brightest upper-hemisphere texel is near the sun direction
        to_sun = -sun_dir
        iy, ix = np.unravel_index(np.argmax(upper.sum(-1)), upper.shape[:2])
        theta = (iy + 0.5) / 32 * np.pi
        phi = ((ix + 0.5) / 64 - 0.5) * 2 * np.pi
        d = np.array([np.sin(theta) * np.sin(phi), np.cos(theta), np.sin(theta) * np.cos(phi)])
        assert d @ to_sun > 0.8, f"brightest texel not near sun: {d} vs {to_sun}"

    def test_sun_radiance_reddens_at_horizon(self):
        high = sun_radiance(np.array([0.0, -1.0, 0.0]))
        low = sun_radiance(np.array([0.0, -0.1, 0.99]))
        assert (low <= high).all()
        assert low[0] / max(low[2], 1e-6) > high[0] / max(high[2], 1e-6)

    def test_scene_with_sky_renders(self):
        take = load_take_file(os.path.join(EXAMPLES, "takes", "sunsky.take"))
        take.cameras[0].resolution = (48, 32)
        take.num_samples_per_pixel = 8
        take.integrator.max_depth_surface = 4
        scene = load_scene_file(take.scene_filename)
        assert scene.lights.count == 2  # dome + sun
        img = Driver(take=take, scene=scene).render_frame()
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # upper rows see sky: blue-ish
        sky_px = img[:6].reshape(-1, 3)
        assert sky_px[:, 2].mean() > sky_px[:, 0].mean()

    def test_sun_casts_shadow(self):
        """Direct sun: ground in the sphere's shadow is much darker than
        open ground."""
        take = load_take_file(os.path.join(EXAMPLES, "takes", "sunsky.take"))
        take.cameras[0].resolution = (96, 54)
        take.num_samples_per_pixel = 16
        take.integrator.max_depth_surface = 2
        scene = load_scene_file(take.scene_filename)
        img = Driver(take=take, scene=scene).render_frame()
        # shadow falls screen-right of the sphere (sun from +x overhead)
        shadow = img[38:42, 44:54].mean()
        lit = img[50, 10:30].mean()
        assert lit > 1.8 * shadow, f"no sun shadow: lit={lit} shadow={shadow}"


class TestTextures:
    def test_bilinear_roundtrip(self, rng_np):
        tb = TextureBuilder()
        img = rng_np.random((8, 16, 3)).astype(np.float32)
        tid = tb.add(img)
        arena = tb.build()
        # sample at texel centers -> exact values
        ys, xs = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
        uv = jnp.asarray(
            np.stack([(xs.ravel() + 0.5) / 16, (ys.ravel() + 0.5) / 8], -1), jnp.float32
        )
        out = np.asarray(sample_bilinear(arena, jnp.full(128, tid, jnp.int32), uv))
        np.testing.assert_allclose(out[:, :3], img.reshape(-1, 3), atol=1e-6)

    def test_textured_material_render(self, tmp_path, rng_np):
        # checkerboard emission texture on a dome: render sees both colors
        check = np.zeros((2, 4, 3), np.float32)
        check[:, ::2] = [4.0, 0.2, 0.2]
        check[:, 1::2] = [0.2, 0.2, 4.0]
        from zyg_tpu.scene.loader import SceneBuilder, MaterialDesc, PropDesc, Transformation
        from zyg_tpu.scene.types import ShapeType, MaterialKind
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera

        b = SceneBuilder()
        tid = b.add_texture_image(check)
        m = b.add_material(
            MaterialDesc(
                kind=int(MaterialKind.LIGHT),
                emission=np.ones(3, np.float32),
                emission_tex=tid,
            )
        )
        b.add_prop(
            PropDesc(shape=int(ShapeType.DOME), trafo=Transformation(), material=m, is_light=True, visible_shadow=False)
        )
        scene = b.build()
        take = Take()
        take.num_samples_per_pixel = 1
        take.integrator = IntegratorSettings(kind="PT", max_depth_surface=2)
        cam = PerspectiveCamera(resolution=(32, 16), fov=np.deg2rad(90))
        take.cameras = [cam]
        img = Driver(take=take, scene=scene).render_frame()
        reds = (img[..., 0] > img[..., 2]).mean()
        assert 0.2 < reds < 0.8, f"checker not visible: red fraction {reds}"


class TestProceduralTextures:
    """Baked procedural node graphs (ref texture/procedural*.zig)."""

    def test_checker_bakes_and_renders(self):
        from zyg_tpu.scene.loader import load_scene_dict

        scene = load_scene_dict(
            {
                "materials": [
                    {
                        "name": "check",
                        "rendering": {
                            "Substitute": {
                                "color": {
                                    "Checker": {
                                        "scale": 4,
                                        "colors": [[0.9, 0.1, 0.1], [0.1, 0.1, 0.9]],
                                    }
                                }
                            }
                        },
                    }
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Rectangle"}, "materials": ["check"]},
                ],
            }
        )
        assert scene.textures is not None
        # arena holds the baked checker: red and blue texels both present
        data = np.asarray(scene.textures.data)
        assert (np.abs(data[:, 0] - 0.9) < 1e-4).any()
        assert (np.abs(data[:, 2] - 0.9) < 1e-4).any()

    def test_noise_statistics(self):
        from zyg_tpu.scene.procedural import noise_eval, perlin2d, worley2d

        ys, xs = np.mgrid[0:256, 0:256]
        u = (xs + 0.5) / 256.0
        v = (ys + 0.5) / 256.0
        # gradient noise: zero-mean-ish before remap, remapped to [0,1]
        n = noise_eval({"levels": 3, "scale": [8, 8, 8], "transition": 0.5}, u, v)
        assert n.min() >= 0.0 and n.max() <= 1.0
        assert 0.3 < n.mean() < 0.7
        assert n.std() > 0.05  # actual structure, not constant
        # perlin is zero-mean in [-1,1]
        p = perlin2d(u * 16, v * 16)
        assert abs(p.mean()) < 0.05 and p.min() < -0.3 and p.max() > 0.3
        # worley F1 is nonnegative
        w = worley2d(u * 16, v * 16)
        assert w.min() >= 0.0 and 0.1 < w.mean() < 0.8

    def test_mix_mul_nodes(self):
        from zyg_tpu.scene.procedural import bake

        img = bake(
            {"Mix": {"a": [1.0, 0.0, 0.0], "b": [0.0, 1.0, 0.0], "weight": 0.25}},
            res=8,
        )
        np.testing.assert_allclose(img[0, 0], [0.75, 0.25, 0.0], rtol=1e-6)
        img = bake({"Mul": {"a": [0.5, 0.5, 0.5], "b": [0.5, 1.0, 0.0]}}, res=8)
        np.testing.assert_allclose(img[0, 0], [0.25, 0.5, 0.0], rtol=1e-6)
        img = bake(
            {"Max": {"a": [0.2, 0.8, 0.1], "b": [0.5, 0.1, 0.1]}}, res=8
        )
        np.testing.assert_allclose(img[0, 0], [0.5, 0.8, 0.1], rtol=1e-6)
        img = bake(
            {"ChannelMix": {"source": [1.0, 2.0, 3.0],
                            "channels": [[0, 0, 1], [0, 1, 0], [1, 0, 0]]}},
            res=8,
        )
        np.testing.assert_allclose(img[0, 0], [3.0, 2.0, 1.0], rtol=1e-6)


class TestAddressModes:
    """Per-texture clamp/repeat addressing (ref sampler_mode.zig Address)."""

    def test_clamp_vs_repeat(self):
        import jax.numpy as jnp
        from zyg_tpu.scene.textures import TextureBuilder, sample_bilinear

        grad = np.linspace(0, 1, 8, dtype=np.float32)[None, :, None].repeat(8, 0)
        b = TextureBuilder()
        t_rep = b.add(grad.repeat(3, -1))
        t_clm = b.add(grad.repeat(3, -1), clamp_u=True, clamp_v=True)
        arena = b.build()
        # u slightly beyond 1: repeat wraps to the dark left edge, clamp
        # sticks to the bright right edge
        uv = jnp.asarray([[1.04, 0.5]], jnp.float32)
        rep = float(sample_bilinear(arena, jnp.asarray([t_rep]), uv)[0, 0])
        clm = float(sample_bilinear(arena, jnp.asarray([t_clm]), uv)[0, 0])
        assert clm > 0.9
        assert rep < 0.6  # wrapped into the dark side
        # inside [0,1] both agree
        uv2 = jnp.asarray([[0.4, 0.5]], jnp.float32)
        r2 = float(sample_bilinear(arena, jnp.asarray([t_rep]), uv2)[0, 0])
        c2 = float(sample_bilinear(arena, jnp.asarray([t_clm]), uv2)[0, 0])
        np.testing.assert_allclose(r2, c2, rtol=1e-6)


class TestStochasticFiltering:
    def test_mean_matches_bilinear(self):
        """LinearStochastic (ref texture.zig default): expectation over the
        jitter equals the bilinear filter."""
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.scene import textures as tex

        rng = np.random.default_rng(5)
        b = tex.TextureBuilder()
        img = rng.random((16, 24, 3)).astype(np.float32)
        tid = b.add(img)
        arena = b.build()

        n = 4096
        uv = jnp.asarray(rng.random((n, 2)).astype(np.float32))
        ids = jnp.full((n,), tid, jnp.int32)
        ref = tex.sample_bilinear(arena, ids, uv)

        acc = jnp.zeros((n, 4))
        m = 256
        for k in range(m):
            xi = jnp.asarray(rng.random((n, 2)).astype(np.float32))
            acc = acc + tex.sample_stochastic(arena, ids, uv, xi)
        est = np.asarray(acc / m)
        refn = np.asarray(ref)
        # per-element within MC noise (sem ~ 0.02 at 256 samples), and the
        # global mean much tighter
        np.testing.assert_allclose(est, refn, atol=0.1)
        assert abs(est.mean() - refn.mean()) < 0.003

    def test_clamp_mode_respected(self):
        import numpy as np
        import jax.numpy as jnp
        from zyg_tpu.scene import textures as tex

        b = tex.TextureBuilder()
        img = np.zeros((4, 4, 3), np.float32)
        img[0, :, 0] = 1.0  # red top row
        tid = b.add(img, clamp_u=True, clamp_v=True)
        arena = b.build()
        # uv far below 0: clamp keeps row 0 (red); repeat would wrap
        uv = jnp.asarray([[0.5, -3.0]], jnp.float32)
        out = tex.sample_stochastic(arena, jnp.asarray([tid]), uv, jnp.zeros((1, 2)))
        assert float(out[0, 0]) == 1.0


class TestAnalyticProcedurals:
    """Shade-time analytic procedural evaluation with cone filtering
    (ref context.zig:139-199 screenspaceDifferentials feeding
    procedural_checker/noise.zig; round-5 VERDICT item 6)."""

    def _checker_scene_dict(self, scale=64):
        return {
            "materials": [
                {
                    "name": "check",
                    "rendering": {
                        "Substitute": {
                            "color": {
                                "Checker": {
                                    "scale": scale,
                                    "colors": [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]],
                                }
                            },
                            "roughness": 1.0,
                        }
                    },
                },
                {"name": "sun", "rendering": {"Light": {"emittance": {"value": 3.0}}}},
            ],
            "entities": [
                {
                    "type": "Prop", "shape": {"type": "Rectangle"},
                    "materials": ["check"],
                    "transformation": {"rotation": [90, 0, 0], "scale": [50, 50, 1]},
                },
                {"type": "Light", "shape": {"type": "Dome"}, "materials": ["sun"]},
            ],
        }

    def test_pure_nodes_register_analytic(self):
        from zyg_tpu.scene.loader import load_scene_dict

        scene = load_scene_dict(self._checker_scene_dict())
        assert scene.textures.procedurals is not None
        ((tid, kind, params),) = scene.textures.procedurals.keys()
        assert kind == "checker" and params[0] == 64.0

    def test_analytic_matches_host_pointwise(self):
        # unfiltered analytic value == the host bake formula (same hash)
        import jax.numpy as jnp
        from zyg_tpu.scene import procedural as prcd

        rng = np.random.default_rng(5)
        uv = jnp.asarray(rng.random((256, 2)), jnp.float32)
        spec = prcd.analytic_spec(
            {"Noise": {"levels": 3, "scale": [7, 7], "ratio": 0.5,
                       "transition": 0.4}}
        )
        dev = np.asarray(prcd.eval_analytic(spec[0], spec[1], uv))[:, 0]
        host = prcd.noise_eval(
            {"levels": 3, "scale": [7, 7], "ratio": 0.5, "transition": 0.4},
            np.asarray(uv[:, 0]), np.asarray(uv[:, 1]),
        )
        np.testing.assert_allclose(dev, host, atol=2e-5)

        cspec = prcd.analytic_spec(
            {"Checker": {"scale": 8, "colors": [[0.1] * 3, [0.9] * 3]}}
        )
        cdev = np.asarray(prcd.eval_analytic(cspec[0], cspec[1], uv))[:, :3]
        chost = prcd.checker_eval(
            {"scale": 8, "colors": [[0.1] * 3, [0.9] * 3]},
            np.asarray(uv[:, 0])[None], np.asarray(uv[:, 1])[None],
        )[0]
        np.testing.assert_allclose(cdev, chost, atol=1e-6)

    def test_checker_filter_limits(self):
        # box-filtered checker: w -> 0 reproduces the point sample; a
        # footprint spanning many cells converges to the 0.5 mean
        import jax.numpy as jnp
        from zyg_tpu.scene import procedural as prcd

        spec = ("checker", (16.0, (0.0,) * 3, (1.0,) * 3))
        rng = np.random.default_rng(6)
        uv = jnp.asarray(rng.random((512, 2)), jnp.float32)
        wide = np.asarray(
            prcd.eval_analytic(*spec, uv, foot=jnp.full(512, 2.0, jnp.float32))
        )[:, 0]
        assert np.abs(wide - 0.5).max() < 0.02  # fully band-limited
        narrow = np.asarray(
            prcd.eval_analytic(*spec, uv, foot=jnp.full(512, 1e-6, jnp.float32))
        )[:, 0]
        point = np.asarray(prcd.eval_analytic(*spec, uv))[:, 0]
        np.testing.assert_allclose(narrow, point, atol=1e-3)

    def test_closeup_sharper_than_bake(self):
        # a close-up of a scale-64 checker: the 128^2 fallback bake blurs
        # (tile ~= texel), the analytic eval keeps a hard edge
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_dict

        def render(analytic: bool):
            scene = load_scene_dict(self._checker_scene_dict(scale=64))
            if not analytic:
                scene = scene._replace(
                    textures=scene.textures._replace(procedurals=None)
                )
            take = Take()
            take.num_samples_per_pixel = 16
            take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
            cam = PerspectiveCamera(resolution=(48, 48), fov=np.deg2rad(30))
            cam.position = np.array([0.05, 0.4, 0.0], np.float32)
            take.cameras = [cam]
            return Driver(take=take, scene=scene).render_frame()

        img_a = render(True)
        img_b = render(False)
        # close-up sharpness: the analytic eval resolves hard cells, so
        # most pixels sit near black/white; the 128^2 bake (2 texels per
        # cell at scale 64) can only produce mush
        na = img_a.mean(-1) / max(img_a.mean(), 1e-6) * img_a.mean()
        mida = ((na > 0.25) & (na < 0.75)).mean()
        nb = img_b.mean(-1)
        midb = ((nb > 0.25) & (nb < 0.75)).mean()
        assert mida < 0.7 * midb, (mida, midb)

    def test_farfield_less_aliased_than_bake(self):
        # far-field: a scale-512 checker floor seen at a grazing distance.
        # Per-pixel uv spans many cells; the filtered analytic eval should
        # be close to the 0.5 mean (low spatial variance), while the baked
        # texture's stochastic texel reads alias (high variance)
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver
        from zyg_tpu.scene.loader import load_scene_dict

        def render(analytic: bool):
            scene = load_scene_dict(self._checker_scene_dict(scale=512))
            if not analytic:
                scene = scene._replace(
                    textures=scene.textures._replace(procedurals=None)
                )
            take = Take()
            take.num_samples_per_pixel = 4
            take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
            cam = PerspectiveCamera(resolution=(32, 32), fov=np.deg2rad(60))
            cam.position = np.array([0, 3.0, -6.0], np.float32)
            take.cameras = [cam]
            return Driver(take=take, scene=scene).render_frame()

        img_a = render(True)
        img_b = render(False)
        va = float(np.var(img_a[8:24].mean(-1)))
        vb = float(np.var(img_b[8:24].mean(-1)))
        assert va < 0.6 * vb, (va, vb)
