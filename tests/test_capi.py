"""C API smoke tests, mirroring ref src/capi-test/test.py + test_progressive.py:
build a scene purely through su_* calls, render progressively, copy the
framebuffer."""

import numpy as np

from zyg_tpu.capi import capi as su


import pytest


@pytest.fixture(autouse=True)
def _release_engine():
    yield
    su.su_release()


def _build_scene():
    assert su.su_init() == 0
    assert su.su_perspective_camera_create(40, 30) >= 0
    assert su.su_camera_set_fov(np.deg2rad(60.0)) == 0
    assert su.su_sampler_create(4) == 0
    assert su.su_integrators_create('{"surface": {"PTMIS": {"depth": {"surface": 4}}}}') == 0

    white = su.su_material_create(
        0xFFFFFFFF, '{"rendering": {"Substitute": {"color": [0.7, 0.7, 0.7]}}}'
    )
    assert white >= 0
    lightm = su.su_material_create(
        0xFFFFFFFF, '{"rendering": {"Light": {"emittance": {"value": 20.0}}}}'
    )
    assert lightm >= 0

    # quad floor via raw triangle arrays
    positions = np.array(
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
    ).ravel()
    normals = np.tile(np.array([0, 1, 0], np.float32), 4)
    indices = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    mesh = su.su_triangle_mesh_create(
        0xFFFFFFFF, 0, None, 2, indices, 4, positions, 3, normals, 3
    )
    assert mesh >= su.MESH_BASE

    floor = su.su_prop_create(mesh, 1, np.array([white], np.uint32))
    assert floor >= 0

    # analytic sphere prop (builtin shape id 6)
    ball = su.su_prop_create(6, 1, np.array([white], np.uint32))
    trafo = np.eye(4, dtype=np.float32)
    trafo[3, :3] = [0.0, 0.7, 0.0]
    trafo[0, 0] = trafo[1, 1] = trafo[2, 2] = 1.0
    assert su.su_prop_set_transformation(ball, trafo.ravel()) == 0

    # rectangle area light above (builtin 5), rotated to face down
    lamp = su.su_prop_create(5, 1, np.array([lightm], np.uint32))
    m = np.eye(4, dtype=np.float32)
    m[1, :3] = [0, 0, -1]  # rows = axes: y-axis -> -z
    m[2, :3] = [0, -1, 0]  # z-axis (normal) -> -y
    m[3, :3] = [0, 3.0, 0]
    assert su.su_prop_set_transformation(lamp, m.ravel()) == 0
    assert su.su_light_create(lamp) == 0

    camt = np.eye(4, dtype=np.float32)
    camt[3, :3] = [0, 1.0, -4.0]
    # camera prop doesn't exist in the builder; camera transform set directly
    su._engine.camera.position = np.array([0, 1.0, -4.0], np.float32)
    return white


class TestCapi:
    def test_full_render(self):
        _build_scene()
        assert su.su_render_frame(0) == 0
        buf = np.zeros((30, 40, 4), np.float32)
        assert su.su_copy_framebuffer(1, 4, 40, 30, buf) == 0
        assert np.isfinite(buf).all()
        assert buf[..., :3].max() > 0.0, "rendered frame is black"
        assert (buf[..., 3] == 1.0).all()

    def test_progressive(self):
        _build_scene()
        assert su.su_start_frame(0) == 0
        assert su.su_render_iterations(2) == 0
        buf1 = np.zeros((30, 40, 3), np.float32)
        assert su.su_copy_framebuffer(1, 3, 40, 30, buf1) == 0
        assert su.su_render_iterations(2) == 0
        buf2 = np.zeros((30, 40, 3), np.float32)
        assert su.su_copy_framebuffer(1, 3, 40, 30, buf2) == 0
        assert buf1.max() > 0 and buf2.max() > 0
        assert not np.array_equal(buf1, buf2)  # accumulation progressed

    def test_material_update_between_frames(self):
        white = _build_scene()
        assert su.su_render_frame(0) == 0
        a = np.zeros((30, 40, 3), np.float32)
        su.su_copy_framebuffer(1, 3, 40, 30, a)
        assert (
            su.su_material_update(white, '{"rendering": {"Substitute": {"color": [0.9, 0.1, 0.1]}}}')
            == 0
        )
        assert su.su_render_frame(0) == 0
        b = np.zeros((30, 40, 3), np.float32)
        su.su_copy_framebuffer(1, 3, 40, 30, b)
        # red channel relatively brighter after the update
        assert b[..., 0].sum() > b[..., 1].sum() * 1.5

    def test_srgb_copy(self):
        _build_scene()
        su.su_render_frame(0)
        buf = np.zeros((30, 40, 3), np.uint8)
        assert su.su_copy_framebuffer(0, 3, 40, 30, buf) == 0
        assert buf.max() > 10

    def test_error_codes(self):
        assert su.su_release() == -1  # not initialized
        assert su.su_init() == 0
        assert su.su_init() == -1  # double init
        assert su.su_prop_set_transformation(99, np.eye(4, dtype=np.float32).ravel()) == -1
        assert su.su_material_update(42, "{}") == -1


class TestCapiImages:
    def test_material_references_image_by_id(self):
        """ref capi-test/test.py:115-127: create an image, reference it from
        a material via {"usage":"Color","id":N}, render, then update the
        image and verify the render changes."""
        white = _build_scene()
        # 2x2 red/blue checker, uint8 RGB (format 0 = Byte, see capi.zig)
        px = np.array(
            [[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], np.uint8
        )
        img = su.su_image_create(0xFFFFFFFF, 0, 3, 2, 2, 1, 3, px.ravel())
        assert img >= 0
        checker = su.su_material_create(
            0xFFFFFFFF,
            '{"rendering": {"Substitute": {"color": {"usage": "Color", "id": %d}}}}'
            % img,
        )
        assert checker >= 0
        # repaint the floor with the textured material
        su._engine.builder.props[0].material = checker
        su._engine.dirty = True
        assert su.su_render_frame(0) == 0
        buf1 = np.zeros((30, 40, 4), np.float32)
        assert su.su_resolve_frame_to_buffer(0xFFFFFFFF, 40, 30, buf1) == 0
        assert buf1[..., :3].max() > 0.01
        # the checker is red/blue: green stays darker than red+blue
        rb = buf1[..., 0].mean() + buf1[..., 2].mean()
        assert rb > 2.5 * buf1[..., 1].mean()

        # live image update to solid green must flip the channel balance
        green = np.zeros((2, 2, 3), np.uint8)
        green[..., 1] = 255
        assert su.su_image_update(img, 3, green.ravel()) == 0
        assert su.su_render_frame(0) == 0
        buf2 = np.zeros((30, 40, 4), np.float32)
        assert su.su_resolve_frame_to_buffer(0xFFFFFFFF, 40, 30, buf2) == 0
        assert buf2[..., 1].mean() > buf2[..., 0].mean() + buf2[..., 2].mean()


class TestCapiAovs:
    def test_aov_planes(self):
        """su_aovs_create enables sensor AOVs; resolve by reference Class
        index (0 = Albedo, 1 = Depth, 4 = ShadingNormal)."""
        _build_scene()
        assert (
            su.su_aovs_create('{"Albedo": true, "Depth": true, "ShadingNormal": true}')
            == 0
        )
        assert su.su_render_frame(0) == 0
        alb = np.zeros((30, 40, 3), np.float32)
        assert su.su_resolve_frame_to_buffer(0, 40, 30, alb) == 0
        dep = np.zeros((30, 40, 1), np.float32)
        assert su.su_resolve_frame_to_buffer(1, 40, 30, dep) == 0
        nrm = np.zeros((30, 40, 3), np.float32)
        assert su.su_resolve_frame_to_buffer(4, 40, 30, nrm) == 0
        # floor/sphere albedo is 0.7 grey where geometry is visible
        cov = alb.max(axis=-1) > 0.1
        assert cov.mean() > 0.3
        # interior pixels average to the 0.7 grey; silhouette pixels mix
        # with miss samples (sum-mode AOV -> fractional coverage)
        np.testing.assert_allclose(alb[cov].max(), 0.7, atol=0.05)
        assert (alb[cov] <= 0.75).all()
        # depth: finite where covered, sentinel-far where background
        assert (dep[..., 0][cov] < 100.0).all()
        assert (dep[..., 0][~cov] > 1e6).all()
        # shading normals are unit where covered
        ln = np.linalg.norm(nrm[cov], axis=-1)
        np.testing.assert_allclose(ln, 1.0, atol=1e-3)
        # MaterialId was not enabled -> error
        assert su.su_resolve_frame_to_buffer(2, 40, 30, alb) == -1
