"""Image codec roundtrip tests (PNG/EXR/RGBE) + take/scene loading."""

import os
import zlib

import numpy as np
import pytest

from zyg_tpu.io.png import write_png, float_to_srgb8
from zyg_tpu.io.exr import write_exr, read_exr, ZIP_COMPRESSION, NO_COMPRESSION
from zyg_tpu.io.rgbe import write_hdr, read_hdr, float_to_rgbe, rgbe_to_float
from zyg_tpu.io.mesh import load_obj


class TestPng:
    def test_roundtrip_via_zlib(self, tmp_path, rng_np):
        img = (rng_np.random((16, 24, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        data = open(p, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # decode IDAT manually
        idat = data[data.index(b"IDAT") + 4 :]
        raw = zlib.decompress(idat[: len(idat) - 12])
        rows = np.frombuffer(raw, np.uint8).reshape(16, 1 + 24 * 3)
        assert (rows[:, 0] == 0).all()
        np.testing.assert_array_equal(rows[:, 1:].reshape(16, 24, 3), img)

    def test_srgb8(self):
        x = np.zeros((2, 2, 3), np.float32)
        x[0, 0] = 1.0
        out = float_to_srgb8(x, dither=False)
        assert out[0, 0, 0] == 255 and out[1, 1, 0] == 0


class TestExr:
    @pytest.mark.parametrize("half", [True, False])
    @pytest.mark.parametrize("compression", [ZIP_COMPRESSION, NO_COMPRESSION])
    def test_roundtrip(self, tmp_path, rng_np, half, compression):
        h, w = 21, 33  # non-multiple of block size
        img = (rng_np.random((h, w, 3)).astype(np.float32) * 4.0) ** 2
        p = str(tmp_path / "x.exr")
        write_exr(
            p,
            {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]},
            half=half,
            compression=compression,
        )
        back = read_exr(p)
        rtol = 1e-2 if half else 1e-6
        for i, c in enumerate("RGB"):
            np.testing.assert_allclose(back[c], img[..., i], rtol=rtol, atol=1e-3)

    def test_zip_prefilter_matches_openexr_spec(self, rng_np):
        """Byte-exact check of the ZIP pre-filter against a scalar
        transliteration of OpenEXR's documented ImfZip::compress order:
        reorder (deinterleave into two halves) FIRST, then delta-predictor
        with the +128+256 bias (ref exr_writer.zig reorder())."""
        from zyg_tpu.io.exr import _predictor_encode, _predictor_decode

        for n in (1, 2, 7, 64, 129):
            raw = bytes(rng_np.integers(0, 256, n, dtype=np.uint8))
            # spec reference: reorder
            t1, t2 = [], []
            it = iter(raw)
            for i, b in enumerate(raw):
                (t1 if i % 2 == 0 else t2).append(b)
            reordered = t1 + t2
            # spec reference: predictor (in place, scalar)
            enc = list(reordered)
            p = enc[0] if enc else 0
            for i in range(1, len(enc)):
                d = enc[i] - p + (128 + 256)
                p = enc[i]
                enc[i] = d & 0xFF
            expect = bytes(enc)
            got = _predictor_encode(bytearray(raw))
            assert got == expect, f"encode mismatch at n={n}"
            assert _predictor_decode(got) == raw, f"decode mismatch at n={n}"

    def test_aov_channels(self, tmp_path, rng_np):
        h, w = 8, 8
        depth = rng_np.random((h, w)).astype(np.float32)
        write_exr(str(tmp_path / "a.exr"), {"Z": depth}, half=False)
        back = read_exr(str(tmp_path / "a.exr"))
        np.testing.assert_allclose(back["Z"], depth, rtol=1e-6)


class TestRgbe:
    def test_encode_decode(self, rng_np):
        rgb = (rng_np.random((64, 3)).astype(np.float32) * 10.0) ** 2
        back = rgbe_to_float(float_to_rgbe(rgb))
        # shared-exponent format: absolute error bounded by pixel max / 256
        bound = rgb.max(axis=-1, keepdims=True) / 256.0 + 1e-4
        assert (np.abs(back - rgb) <= bound).all()

    def test_file_roundtrip(self, tmp_path, rng_np):
        img = (rng_np.random((12, 40, 3)).astype(np.float32) * 2.0) ** 2
        p = str(tmp_path / "x.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
        bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
        assert (np.abs(back - img) <= bound).all()


class TestObj:
    def test_load_simple(self, tmp_path):
        obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 2//1 4//1 3//1
"""
        p = str(tmp_path / "m.obj")
        open(p, "w").write(obj)
        mesh = load_obj(p)
        assert mesh.indices.shape == (2, 3)
        assert mesh.positions.shape[0] == 4
        np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 4)


class TestSubVolume:
    def test_roundtrip_sparse_and_dense(self, tmp_path):
        import numpy as np
        from zyg_tpu.io.sub import read_sub_volume, write_sub_volume

        g = np.random.default_rng(0).random((9, 7, 5)).astype(np.float32)
        g[g < 0.5] = 0.0
        p = str(tmp_path / "t.sub")
        write_sub_volume(p, g, sparse=True)
        np.testing.assert_allclose(read_sub_volume(p), g)
        write_sub_volume(p, g, sparse=False)
        np.testing.assert_allclose(read_sub_volume(p), g)


class TestStereoAndFs:
    def test_stereo_layers_differ(self):
        import numpy as np
        from zyg_tpu.io.take import load_take_dict
        from zyg_tpu.scene.loader import load_scene_dict
        from zyg_tpu.render.driver import Driver

        take = load_take_dict(
            {
                "camera": {
                    "Perspective": {
                        "parameters": {"fov": 50, "stereo": {"ipd": 0.07}},
                        "transformation": {"position": [0, 1, -3]},
                        "resolution": [48, 32],
                    }
                },
                "sampler": {"Sobol": {"samples_per_pixel": 4}},
            }
        )
        assert take.cameras[0].num_layers == 2
        scene = load_scene_dict(
            {
                "materials": [{"name": "l", "rendering": {"Light": {"emittance": {"value": 1.0}}}}],
                "entities": [
                    {"type": "Prop", "shape": {"type": "Sphere"}, "transformation": {"position": [0, 1, 0]}},
                    {"type": "Light", "shape": {"type": "Dome"}, "materials": ["l"]},
                ],
            }
        )
        imgs = Driver(take=take, scene=scene).render_layers()
        assert len(imgs) == 2
        assert float(np.abs(imgs[0] - imgs[1]).max()) > 1e-3

    def test_gzip_mounted_take(self, tmp_path):
        import gzip

        from zyg_tpu.io import fs
        from zyg_tpu.io.take import load_take_file

        (tmp_path / "takes").mkdir()
        src = open("examples/takes/cornell_ptmis.take").read()
        with gzip.open(tmp_path / "takes" / "c.take.gz", "wt") as f:
            f.write(src)
        fs.push_mount(str(tmp_path))
        try:
            t = load_take_file("takes/c.take.gz")
            assert t.num_samples_per_pixel > 0
        finally:
            fs.clear_mounts()

    def test_frame_dependant_name(self):
        from zyg_tpu.io import fs

        assert fs.frame_dependant_name("img_####.exr", 37) == "img_0037.exr"
        assert fs.frame_dependant_name("b_{f:03}.png", 5) == "b_005.png"

    def test_ffmpeg_command(self):
        from zyg_tpu.io.ffmpeg import FfmpegSink

        cmd = FfmpegSink("/tmp/x.mp4", (64, 32), 24).command()
        assert cmd[0] == "ffmpeg" and "64x32" in cmd and "/tmp/x.mp4" in cmd
