"""Drive libzyg.so through ctypes — the exact access pattern of the
reference's capi-test/test.py and Blender plugin (CDLL + su_* C ABI).

When the test process already runs Python, the shim detects the live
interpreter and forwards into it (same code path a C host gets after
Py_InitializeEx)."""

import ctypes
import os

import numpy as np
import pytest

from zyg_tpu.capi.shim import build_shim


@pytest.fixture(scope="module")
def zyg():
    path = build_shim()
    if path is None:
        pytest.skip("no C toolchain for libzyg.so")
    lib = ctypes.CDLL(path)
    lib.su_camera_set_fov.argtypes = [ctypes.c_float]
    yield lib
    lib.su_release()


def test_capi_test_py_workflow(zyg):
    """Mirrors ref capi-test/test.py: camera, integrator, image-backed
    material, mesh + light through raw pointers, render, copy out."""
    assert zyg.su_init() == 0
    assert zyg.su_perspective_camera_create(32, 24) >= 0  # camera prop handle
    zyg.su_camera_set_fov(ctypes.c_float(float(np.deg2rad(70.0))))

    dims = (ctypes.c_int32 * 2)()
    assert zyg.su_camera_sensor_dimensions(dims) == 0
    assert list(dims) == [32, 24]

    assert zyg.su_sampler_create(2) == 0
    assert (
        zyg.su_integrators_create(
            b'{"surface": {"PTMIS": {"depth": {"surface": 3}}}}'
        )
        == 0
    )

    # image -> material reference by id (ref test.py:115-127)
    px = np.zeros((2, 2, 3), np.uint8)
    px[..., 0] = 255  # red
    img = zyg.su_image_create(
        0xFFFFFFFF, 0, 3, 2, 2, 1, 3,
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert img >= 0
    mat_desc = (
        '{"rendering": {"Substitute": {"color": {"usage": "Color", "id": %d}}}}'
        % img
    ).encode()
    red = zyg.su_material_create(0xFFFFFFFF, mat_desc)
    assert red >= 0
    lightm = zyg.su_material_create(
        0xFFFFFFFF, b'{"rendering": {"Light": {"emittance": {"value": 30.0}}}}'
    )
    assert lightm >= 0

    # floor quad through raw pointers
    positions = np.array(
        [[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]], np.float32
    )
    normals = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    indices = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    mesh = zyg.su_triangle_mesh_create(
        0xFFFFFFFF, 0, None, 2, indices.ctypes.data_as(u32p), 4,
        positions.ctypes.data_as(f32p), 3, normals.ctypes.data_as(f32p), 3,
        None, 0, None, 0, False,
    )
    assert mesh >= 7  # MESH_BASE

    mats = (ctypes.c_uint32 * 1)(red)
    floor = zyg.su_prop_create(mesh, 1, mats)
    assert floor >= 0

    lmats = (ctypes.c_uint32 * 1)(lightm)
    lamp = zyg.su_prop_create(5, 1, lmats)  # builtin rectangle
    assert lamp >= 0
    m = np.eye(4, dtype=np.float32)
    m[1, :3] = [0, 0, -1]
    m[2, :3] = [0, -1, 0]
    m[3, :3] = [0, 2.5, 0]
    assert zyg.su_prop_set_transformation(lamp, m.ravel().ctypes.data_as(f32p)) == 0
    assert zyg.su_light_create(lamp) == 0

    # camera placement goes through the same transformation entry the
    # Blender plugin uses (prop id of the camera is engine-internal; the
    # python surface exposes it via the engine object)
    from zyg_tpu.capi import capi as su

    su._engine.camera.position = np.array([0, 1.0, -3.0], np.float32)

    # progressive loop (ref test_progressive.py)
    assert zyg.su_start_frame(0) == 0
    assert zyg.su_render_iterations(2) == 0
    assert zyg.su_resolve_frame(0xFFFFFFFF) == 0

    buf = np.zeros((24, 32, 4), np.float32)
    assert (
        zyg.su_resolve_frame_to_buffer(
            0xFFFFFFFF, 32, 24, buf.ctypes.data_as(f32p)
        )
        == 0
    )
    assert buf[..., :3].max() > 0.01
    # the floor is textured red: red channel dominates (the white lamp
    # occupies part of the frame, so the margin is moderate)
    assert buf[..., 0].sum() > 1.25 * buf[..., 1].sum()

    # sRGB copy path
    out8 = np.zeros((24, 32, 4), np.uint8)
    assert (
        zyg.su_copy_framebuffer(
            0, 4, 32, 24, out8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        == 0
    )
    assert out8[..., 0].max() > 0
