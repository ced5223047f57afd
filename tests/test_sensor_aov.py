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
