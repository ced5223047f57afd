"""Headless smoke test for the Blender plugin's sync + viewport code.

Blender itself is not available in CI, so bpy/gpu/mathutils are faked with
minimal stand-ins and the plugin's engine module is driven directly over a
real libzyg.so session: depsgraph sync (mesh + light + camera export),
final render, and the progressive viewport loop
(view_update/view_draw — VERDICT r2 item 10)."""

import ctypes
import os
import sys
import types

import numpy as np
import pytest

PLUGIN_DIR = os.path.join(os.path.dirname(__file__), "..", "blender-plugin")


# ---------------------------------------------------------------------------
# minimal Blender fakes
# ---------------------------------------------------------------------------


class FakeMatrix:
    """mathutils.Matrix stand-in: indexable [row][col], invertible."""

    def __init__(self, m):
        self.m = np.asarray(m, np.float64)

    def __getitem__(self, r):
        return self.m[r]

    def inverted(self):
        return FakeMatrix(np.linalg.inv(self.m))


def translation(x, y, z):
    m = np.eye(4)
    m[:3, 3] = (x, y, z)
    return FakeMatrix(m)


class FakeVerts:
    def __init__(self, pos, nrm):
        self._pos, self._nrm = pos, nrm

    def __len__(self):
        return len(self._pos) // 3

    def foreach_get(self, name, buf):
        buf[:] = self._pos if name == "co" else self._nrm


class FakeTris:
    def __init__(self, idx):
        self._idx = idx

    def __len__(self):
        return len(self._idx) // 3

    def foreach_get(self, name, buf):
        buf[:] = self._idx


class FakeMesh:
    def __init__(self):
        # unit quad (two triangles)
        self.vertices = FakeVerts(
            np.array(
                [-1, -1, 0, 1, -1, 0, 1, 1, 0, -1, 1, 0], np.float32
            ),
            np.array([0, 0, 1] * 4, np.float32),
        )
        self.loop_triangles = FakeTris(np.array([0, 1, 2, 0, 2, 3], np.uint32))

    def calc_loop_triangles(self):
        pass


class FakeObj:
    def __init__(self, otype, name, mw, data=None):
        self.type = otype
        self.name = name
        self.matrix_world = mw
        self.data = data if data is not None else types.SimpleNamespace(name=name)
        self.material_slots = []

    def to_mesh(self):
        return FakeMesh()

    def to_mesh_clear(self):
        pass


class FakeInstance:
    def __init__(self, obj):
        self.object = obj
        self.matrix_world = obj.matrix_world
        self.is_instance = False


class FakeDepsgraph:
    def __init__(self):
        light = types.SimpleNamespace(
            name="lamp", color=(1.0, 1.0, 1.0), energy=40.0, type="POINT",
            shadow_soft_size=0.3,
        )
        cam = types.SimpleNamespace(name="cam", angle=np.deg2rad(60.0))
        self.objects = [
            FakeObj("MESH", "quad", translation(0, 0, 0)),
            FakeObj("LIGHT", "lamp", translation(0, 0, 3), data=light),
            FakeObj("CAMERA", "cam", translation(0, 0, 4), data=cam),
        ]
        self.object_instances = [FakeInstance(o) for o in self.objects]
        self.scene = types.SimpleNamespace(
            render=types.SimpleNamespace(
                resolution_x=32, resolution_y=24, resolution_percentage=100
            )
        )


class FakeEngine:
    """RenderEngine stand-in: captures begin/end_result + tag_redraw."""

    def __init__(self):
        self.session = None
        self.redraws = 0
        self.result_rect = None

    def begin_result(self, x, y, w, h):
        passes = {"Combined": types.SimpleNamespace(rect=None)}
        layer = types.SimpleNamespace(passes=passes)
        self._res = types.SimpleNamespace(layers=[layer])
        return self._res

    def end_result(self, res):
        self.result_rect = np.asarray(res.layers[0].passes["Combined"].rect)

    def tag_redraw(self):
        self.redraws += 1


def fake_gpu_modules(drawn):
    gpu = types.ModuleType("gpu")

    class Buffer:
        def __init__(self, fmt, size, data):
            self.data = np.asarray(data)

    class GPUTexture:
        def __init__(self, size, format=None, data=None):
            self.size, self.data = size, data

    gpu.types = types.SimpleNamespace(Buffer=Buffer, GPUTexture=GPUTexture)
    gpu.state = types.SimpleNamespace(blend_set=lambda mode: None)
    presets = types.ModuleType("gpu_extras.presets")
    presets.draw_texture_2d = lambda tex, pos, w, h: drawn.append((tex, w, h))
    gpu_extras = types.ModuleType("gpu_extras")
    gpu_extras.presets = presets
    return {"gpu": gpu, "gpu_extras": gpu_extras, "gpu_extras.presets": presets}


@pytest.fixture(scope="module")
def engine_mod():
    from zyg_tpu.capi.shim import build_shim

    if build_shim() is None:
        pytest.skip("no C toolchain for libzyg.so")
    sys.path.insert(0, os.path.dirname(PLUGIN_DIR))
    import importlib

    mod = importlib.import_module("blender-plugin.engine")
    yield mod
    mod.shutdown()


def test_sync_and_final_render(engine_mod):
    eng = FakeEngine()
    dg = FakeDepsgraph()
    engine_mod.sync(eng, None, dg)
    assert eng.session
    engine_mod.draw(eng, dg)
    img = eng.result_rect.reshape(-1, 4)
    assert np.isfinite(img).all()
    assert img[:, :3].max() > 0.0, "lit quad should be visible"


def test_viewport_progressive_loop(engine_mod):
    eng = FakeEngine()
    dg = FakeDepsgraph()
    ctx = types.SimpleNamespace(
        region=types.SimpleNamespace(width=48, height=32),
        region_data=types.SimpleNamespace(view_matrix=translation(0, 0, -4)),
        space_data=types.SimpleNamespace(lens=50.0),
    )
    drawn = []
    saved = {k: sys.modules.get(k) for k in ("gpu", "gpu_extras", "gpu_extras.presets")}
    sys.modules.update(fake_gpu_modules(drawn))
    try:
        engine_mod.view_update(eng, ctx, dg)
        assert eng.view_size == (48, 32)
        # drive the redraw loop to the sample budget
        steps = 0
        while steps == 0 or (
            eng.view_samples < engine_mod.VIEWPORT_MAX_SAMPLES and steps < 64
        ):
            engine_mod.view_draw(eng, ctx, dg)
            steps += 1
        assert eng.view_samples >= engine_mod.VIEWPORT_MAX_SAMPLES
        assert len(drawn) == steps, "every view_draw must blit"
        tex = drawn[-1][0]
        img = np.asarray(tex.data.data, np.float32).reshape(32, 48, 4)
        assert np.isfinite(img).all()
        assert eng.redraws >= steps - 1, "refinement must tag_redraw"
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
