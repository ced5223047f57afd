"""Filtered sensor splatting, exporters, and the AOV integrator."""

import os

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import load_take_file
from zyg_tpu.render import sensor as sn
from zyg_tpu.render.driver import Driver
from zyg_tpu.render.sensor import Framebuffer
from zyg_tpu.scene.loader import load_scene_file

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def cornell_driver(res=32, spp=4, **take_mods):
    take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
    take.cameras[0].resolution = (res, res)
    take.num_samples_per_pixel = spp
    take.integrator.max_depth_surface = 4
    for k, v in take_mods.items():
        setattr(take, k, v) if hasattr(take, k) else None
    scene = load_scene_file(take.scene_filename)
    return take, scene


class TestFilters:
    def test_blackman_shape(self):
        x = jnp.linspace(-2.0, 2.0, 9)
        w = np.asarray(sn.blackman(x, 2.0))
        assert abs(w[4] - 1.0) < 1e-6  # peak at 0
        assert w[0] < 1e-6 and w[-1] < 1e-6  # zero at +-r
        assert (w >= -1e-6).all()

    def test_mitchell_partition(self):
        # Mitchell at integer offsets sums to 1 (partition of unity)
        for frac in (0.0, 0.25, 0.5):
            s = sum(float(sn.mitchell(jnp.float32(frac - k))) for k in range(-3, 4))
            assert abs(s - 1.0) < 1e-3

    def test_filtered_render_matches_box_mean(self):
        take, scene = cornell_driver(res=24, spp=8)
        d_box = Driver(take=take, scene=scene)
        img_box = d_box.render_frame()

        take2, scene2 = cornell_driver(res=24, spp=8)
        take2.sensor.filter_name = "Blackman"
        take2.sensor.filter_radius = 1.0
        d_f = Driver(take=take2, scene=scene2)
        img_f = d_f.render_frame()
        # same energy overall, smoother per-pixel
        assert abs(img_f.mean() / img_box.mean() - 1.0) < 0.03
        # filtered image has lower pixel-to-pixel variance
        gx_box = np.abs(np.diff(img_box.mean(-1), axis=1)).mean()
        gx_f = np.abs(np.diff(img_f.mean(-1), axis=1)).mean()
        assert gx_f < gx_box


class TestSplat:
    def test_splat_accumulates(self):
        fb = Framebuffer.zeros(16)
        ids = jnp.asarray([0, 5, 5], jnp.int32)
        rad = jnp.ones((3, 3), jnp.float32)
        w = jnp.asarray([1.0, 0.5, 0.5])
        fb = fb.splat(ids, rad, w)
        out = np.asarray(fb.resolve())
        np.testing.assert_allclose(out[0], 1.0)
        np.testing.assert_allclose(out[5], 1.0)
        assert np.asarray(fb.weight)[5] == 1.0


class TestAov:
    def test_normals_aov(self):
        take, scene = cornell_driver(res=24, spp=1)
        take.integrator.kind = "AOV"
        take.integrator.aov_value = "GeometricNormal"
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        # back wall normal points -z -> color (0.5, 0.5, 0)
        c = img[12, 12]
        np.testing.assert_allclose(c, [0.5, 0.5, 0.0], atol=0.05)

    def test_light_sample_count_aov(self):
        # single-light Cornell with no tree: every hit draws exactly one
        # sample -> ratio 1 everywhere a surface is hit (ref aov.zig
        # lightSampleCount normalizes drawn/potentialMax)
        take, scene = cornell_driver(res=24, spp=1)
        take.integrator.kind = "AOV"
        take.integrator.aov_value = "LightSampleCount"
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        assert np.isfinite(img).all()
        assert abs(float(img[12, 12].mean()) - 1.0) < 1e-5

    def test_light_sample_count_aov_split(self):
        # many-light scene with a light tree + splitting enabled: the ratio
        # is in (0, 1] and varies with the split decision
        import zyg_tpu.scene.types as st
        from zyg_tpu.io.take import Take, IntegratorSettings
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.scene.loader import (
            MaterialDesc, PropDesc, SceneBuilder, Transformation,
        )

        b = SceneBuilder()
        grey = b.add_material(MaterialDesc(color=np.full(3, 0.6, np.float32)))
        b.add_prop(PropDesc(
            shape=int(st.ShapeType.RECTANGLE),
            trafo=Transformation(
                position=np.array([0, -1, 0], np.float32),
                rotation=np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
                scale=np.array([8.0, 8.0, 1], np.float32),
            ),
            material=grey,
        ))
        lm = b.add_material(MaterialDesc(kind=2, emission=np.full(3, 5.0, np.float32)))
        rot_down = np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32)
        for i in range(20):
            b.add_prop(PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(
                    position=np.array([(i % 5) - 2.0, 2.0, i // 5 - 1.5], np.float32),
                    rotation=rot_down,
                    scale=np.array([0.3, 0.3, 1], np.float32),
                ),
                material=lm,
                is_light=True,
            ))
        scene = b.build()
        assert scene.light_tree is not None
        take = Take()
        take.num_samples_per_pixel = 1
        take.integrator = IntegratorSettings(kind="AOV", aov_value="LightSampleCount")
        cam = PerspectiveCamera(resolution=(16, 16), fov=np.deg2rad(60))
        cam.position = np.array([0, 0.5, -4.0], np.float32)
        take.cameras = [cam]
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        assert np.isfinite(img).all()
        hit = img[img.sum(-1) > 0]
        assert hit.size > 0
        assert (hit <= 1.0 + 1e-6).all()

    def test_photon_aov(self):
        # photon-map visualization: with a baked map the AOV is nonzero
        # where photons land (ref aov.zig photons)
        take, scene = cornell_driver(res=24, spp=1)
        take.integrator.kind = "AOV"
        take.integrator.aov_value = "Photon"
        take.photon.num_photons = 2048
        take.photon.search_radius = 0.15
        take.photon.not_only_through_specular = True
        # Cornell has no speculars: deposit on the full light path so the
        # map is non-empty (photons otherwise store only after specular
        # chains, photon.py:147)
        take.photon.full_light_path = True
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        assert np.isfinite(img).all()
        assert img.max() > 0.0

    def test_ao_aov(self):
        take, scene = cornell_driver(res=24, spp=4)
        take.integrator.kind = "AOV"
        take.integrator.aov_value = "AO"
        take.integrator.aov_num_samples = 4
        take.integrator.aov_radius = 0.5
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        assert np.isfinite(img).all()
        assert 0.0 <= img.min() and img.max() <= 1.0
        # open wall areas mostly unoccluded
        assert img[12, 4:8].mean() > 0.5


class TestExport:
    def test_exr_export(self, tmp_path):
        take, scene = cornell_driver(res=16, spp=2)
        d = Driver(take=take, scene=scene)
        d.render_frame()
        p = str(tmp_path / "out.exr")
        d.export_frame(p)
        from zyg_tpu.io.exr import read_exr

        back = read_exr(p)
        assert set(back.keys()) == {"R", "G", "B"}
        assert back["R"].shape == (16, 16)


class TestSensorAovs:
    """Sensor AOV layers + Transparent buffer (ref sensor/aov/*,
    buffer_transparent.zig), captured by the persistent wavefront."""

    def _driver(self, aovs=(), alpha=False):
        take, scene = cornell_driver(res=24, spp=4)
        take.integrator.kind = "PTMIS"
        take.aovs = tuple(aovs)
        take.sensor.alpha_transparency = alpha
        return Driver(take=take, scene=scene)

    def test_aov_buffers_collected(self):
        d = self._driver(aovs=("albedo", "depth", "shading_normal", "material_id"))
        d.render_frame()
        alb = d.resolve_aov("albedo")
        dep = d.resolve_aov("depth")
        nrm = d.resolve_aov("shading_normal")
        mid = d.resolve_aov("material_id")
        # cornell: every pixel covered; albedo in (0,1), depth finite,
        # unit normals, material ids >= 0
        assert alb.shape == (24, 24, 3)
        assert (alb > 0.0).any() and (alb <= 1.0).all()
        assert (dep < 100.0).all()
        ln = np.linalg.norm(nrm.reshape(-1, 3), axis=-1)
        np.testing.assert_allclose(ln, 1.0, atol=1e-3)
        assert (mid >= 0).all()

    def test_alpha_transparency_coverage(self):
        """An open scene: covered pixels alpha 1, background alpha 0."""
        from zyg_tpu.scene.loader import load_scene_dict
        from zyg_tpu.io.take import load_take_file

        take = load_take_file(os.path.join(EXAMPLES, "takes", "cornell.take"))
        take.cameras[0].resolution = (24, 24)
        take.num_samples_per_pixel = 4
        take.integrator.kind = "PTMIS"  # alpha rides the persistent path
        take.sensor.alpha_transparency = True
        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "w", "rendering": {"Substitute": {"color": [0.7, 0.7, 0.7]}}},
                    {"name": "l", "rendering": {"Light": {"emittance": {"value": 5.0}}}},
                ],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["w"],
                     "transformation": {"position": [0, 0, 2.0]}},
                    {"type": "Light", "shape": {"type": "Rectangle"}, "materials": ["l"],
                     "transformation": {"position": [0, 2, 2], "rotation": [-90, 0, 0]}},
                ],
            }
        )
        d = Driver(take=take, scene=scene)
        d.render_frame()
        alpha = d.resolve_alpha()
        assert alpha is not None
        # sphere of radius 0.5 at z=2: center pixels covered, corners not
        assert alpha[12, 12] > 0.9
        assert alpha[0, 0] < 0.1
        assert alpha[-1, -1] < 0.1

    def test_aov_export_companions(self, tmp_path):
        d = self._driver(aovs=("albedo", "depth"))
        d.render_frame()
        out = str(tmp_path / "img.png")
        d.export_frame(out)
        assert os.path.exists(str(tmp_path / "img_albedo.exr"))
        assert os.path.exists(str(tmp_path / "img_depth.exr"))
        from zyg_tpu.io.exr import read_exr

        ch = read_exr(str(tmp_path / "img_albedo.exr"))
        assert "R" in ch or "Y" in ch


class TestShadowCatcher:
    """Shadow catcher (ref vertex.zig shadow_catcher_*): the beauty keeps
    the occluded lighting; the alpha channel records shadow DENSITY at
    catcher primaries (compositing workflow)."""

    def test_alpha_is_shadow_density(self):
        from zyg_tpu.scene.loader import load_scene_dict
        from zyg_tpu.io.take import Take
        from zyg_tpu.render.camera import PerspectiveCamera
        from zyg_tpu.render.driver import Driver

        scene = load_scene_dict(
            {
                "materials": [
                    {"name": "g", "rendering": {"Substitute": {"color": [0.5, 0.5, 0.5], "roughness": 1.0}}},
                    {"name": "b", "rendering": {"Substitute": {"color": [0.4, 0.4, 0.4]}}},
                    {"name": "sun", "rendering": {"Light": {"emittance": {"value": 8.0}}}},
                ],
                "entities": [
                    # catcher ground plane
                    {"type": "Prop", "shape": {"type": "Rectangle"}, "materials": ["g"],
                     "shadow_catcher": True,
                     "transformation": {"position": [0, 0, 0], "rotation": [90, 0, 0], "scale": [6, 6, 1]}},
                    # occluder sphere above the ground
                    {"type": "Prop", "shape": {"type": "Sphere"}, "materials": ["b"],
                     "transformation": {"position": [0, 0.8, 0], "scale": [0.8, 0.8, 0.8]}},
                    # small light high above: crisp downward shadow
                    {"type": "Light", "shape": {"type": "Rectangle"}, "materials": ["sun"],
                     "transformation": {"position": [0, 6, 0], "rotation": [-90, 0, 0], "scale": [1.5, 1.5, 1]}},
                ],
            }
        )
        assert "shadow_catchers" in scene.mat_features
        take = Take()
        take.num_samples_per_pixel = 16
        take.integrator.kind = "PTMIS"
        take.integrator.max_depth_surface = 3
        take.sensor.alpha_transparency = True
        cam = PerspectiveCamera(resolution=(32, 32), fov=np.deg2rad(50))
        cam.position = np.array([0, 3.2, -3.2], np.float32)
        cam.rotation = np.array(
            [[1, 0, 0], [0, 0.7071, 0.7071], [0, -0.7071, 0.7071]], np.float32
        )
        take.cameras = [cam]
        d = Driver(take=take, scene=scene)
        img = d.render_frame()
        alpha = d.resolve_alpha()
        assert alpha is not None
        assert np.isfinite(img).all()
        # center of frame looks at the shadowed ground under the sphere...
        # find the darkest vs brightest ground alphas: shadowed pixels have
        # HIGH density, unshadowed catcher pixels ~0
        assert alpha.max() > 0.5, f"no shadow recorded, max {alpha.max()}"
        lit = alpha < 0.1
        assert lit.mean() > 0.2, "catcher should be mostly unshadowed"
        # beauty still renders the occluded lighting (not black)
        assert img.mean() > 1e-3


class TestFilteredPersistent:
    """Reconstruction filters on the persistent wavefront (ref sensor.zig
    addSample radius-1/2 splats run unconditionally with AOVs)."""

    def test_filtered_with_aovs(self):
        # AOVs + Mitchell r2 render together on the persistent path (the
        # scan fallback used to drop every AOV plane)
        take, scene = cornell_driver(res=24, spp=8)
        take.integrator.kind = "PTMIS"
        take.sensor.filter_name = "Mitchell"
        take.sensor.filter_radius = 2.0
        take.aovs = ("albedo", "depth")
        d = Driver(take=take, scene=scene)
        assert d._aov_names == ("albedo", "depth")
        img = d.render_frame()
        assert np.isfinite(img).all() and img.mean() > 1e-3
        alb = d.resolve_aov("albedo")
        dep = d.resolve_aov("depth")
        assert alb.shape == (24, 24, 3) and alb.max() > 0.1
        assert dep.shape == (24, 24, 1) and np.isfinite(dep).all()
        # energy parity with the box-filtered render
        take2, scene2 = cornell_driver(res=24, spp=8)
        take2.integrator.kind = "PTMIS"
        d2 = Driver(take=take2, scene=scene2)
        img2 = d2.render_frame()
        assert abs(img.mean() / img2.mean() - 1.0) < 0.05

    def test_filtered_shuffled_drain_exact(self, monkeypatch):
        # the drain cascade relocates in-flight filtered samples; equal
        # seeds must give the same splats (scatter-splat path vs rolls)
        import jax.numpy as jnp
        from zyg_tpu.render.integrator import ptmis

        take, scene = cornell_driver(res=32, spp=4)
        n = 32 * 32
        ids = jnp.arange(n, dtype=jnp.uint32)
        ys, xs = np.divmod(np.arange(n), 32)
        pxy = jnp.asarray(np.stack([xs, ys], -1), jnp.int32)
        cam = take.cameras[0].arrays(0)
        st = ptmis.PtmisSettings(max_depth=4)

        def run():
            acc, rays, _, iters, counts = ptmis.integrate_persistent(
                scene, cam, pxy, ids, jnp.int32(0), 4, 4, st,
                frame_width=32, oversample_slack=2,
                filter_name="Blackman", filter_radius=1,
                resolution=(32, 32),
            )
            return np.asarray(acc), int(rays), np.asarray(counts)

        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 1 << 30)
        acc0, rays0, c0 = run()
        monkeypatch.setattr(ptmis, "_DRAIN_MIN", 16)
        acc1, rays1, c1 = run()
        assert rays1 == rays0
        # same samples, relocated lanes: differences are float add-order
        # only (scatter-splat vs rolled adds; the box path shows the same
        # ~3e-4 noise between drain on/off)
        np.testing.assert_allclose(c1, c0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(acc1, acc0, rtol=2e-3, atol=1e-3)
        # per-pixel weight sums: spp samples x the Blackman tap-sum (~0.73
        # per sample — Blackman is not a partition of unity; the weighted
        # resolve normalizes). Every pixel must have received weight.
        cw = c0.reshape(32, 32)
        assert cw.min() > 0.0
        assert 0.4 * 4.0 < cw[8:24, 8:24].mean() < 1.2 * 4.0
