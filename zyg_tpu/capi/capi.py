"""The `su_*` C API surface (ref: src/capi/capi.zig, 30 exports).

Function names, argument orders, and return-code conventions (0 ok, negative
error) match the reference so programs written against libzyg's ctypes
surface port by swapping the ctypes CDLL for this module (a thin libzyg.so
shim embedding CPython is planned; the Blender plugin drives exactly these
calls, ref src/blender-plugin/engine.py).

Engine model: scene state accumulates host-side (SceneBuilder); `su_start_
frame`/`su_render_frame` compile it to device arrays and drive the renderer;
the progressive loop maps to repeated jitted sample batches exactly like the
reference's iteration loop (ref driver.zig renderIterations).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..io.take import Take, load_take_dict, _load_integrator, _load_sensor
from ..render.camera import PerspectiveCamera
from ..render.driver import Driver
from ..scene.loader import (
    MaterialDesc,
    PropDesc,
    SceneBuilder,
    Transformation,
    parse_material,
)
from ..scene.trimesh import HostMesh
from ..scene.types import ShapeType

# shape handle space: 0..6 builtin analytic (ref resource/manager.zig),
# >= MESH_BASE are triangle meshes created via su_triangle_mesh_create
MESH_BASE = 7

# prop handle returned by su_perspective_camera_create: the reference's
# camera IS a prop (capi.zig:143 returns its entity id), so transforms
# arrive through su_prop_set_transformation — route this reserved handle
# to the view camera
CAMERA_PROP = 0x00FFFFFF

_engine = None


def _as_array(ptr, count, dtype):
    """Accept numpy arrays, ctypes pointers, or buffers."""
    if ptr is None:
        return None
    if isinstance(ptr, np.ndarray):
        return ptr.reshape(-1)[:count].astype(dtype, copy=False)
    try:
        import ctypes

        if isinstance(ptr, ctypes.Array) or hasattr(ptr, "contents"):
            addr = ctypes.cast(ptr, ctypes.c_void_p).value
            ct = np.ctypeslib.as_array(
                ctypes.cast(ptr, ctypes.POINTER(np.ctypeslib.as_ctypes_type(dtype))),
                shape=(count,),
            )
            return np.array(ct, dtype=dtype)
    except Exception:
        pass
    return np.frombuffer(ptr, dtype=dtype, count=count)


def _out_array(buffer, dtype, count):
    """Writable destination view: ndarrays pass through, raw memoryviews
    (the libzyg.so shim) reinterpret as `dtype`."""
    if isinstance(buffer, np.ndarray):
        return buffer
    return np.frombuffer(buffer, dtype=dtype, count=count)


@dataclass
class _Engine:
    builder: SceneBuilder = field(default_factory=SceneBuilder)
    take: Take = field(default_factory=Take)
    camera: PerspectiveCamera = field(default_factory=PerspectiveCamera)
    driver: Driver = None
    images: dict[int, np.ndarray] = field(default_factory=dict)
    mounts: list[str] = field(default_factory=list)
    log_fn: object = None
    progress_fns: tuple = None
    dirty: bool = True
    export_paths: list[str] = field(default_factory=list)
    frame: int = 0

    def compile(self):
        if self.dirty or self.driver is None:
            t0, t1 = self.camera.frame_interval(self.frame)
            scene = self.builder.build(t0, t1)
            self.take.cameras = [self.camera]
            self.driver = Driver(take=self.take, scene=scene, camera=self.camera)
            self.dirty = False


def su_init() -> int:
    global _engine
    if _engine is not None:
        return -1
    _engine = _Engine()
    _engine.take.num_samples_per_pixel = 1
    return 0


def su_release() -> int:
    global _engine
    if _engine is None:
        return -1
    _engine = None
    return 0


def su_mount(folder) -> int:
    if _engine is None:
        return -1
    _engine.mounts.append(folder.decode() if isinstance(folder, bytes) else str(folder))
    return 0


def su_perspective_camera_create(width: int, height: int) -> int:
    if _engine is None:
        return -1
    _engine.camera = PerspectiveCamera(resolution=(int(width), int(height)))
    _engine.dirty = True
    return CAMERA_PROP


def su_camera_set_fov(fov: float) -> int:
    if _engine is None:
        return -1
    _engine.camera.fov = float(fov)
    _engine.dirty = True
    return 0


def su_camera_sensor_dimensions(dimensions) -> int:
    if _engine is None:
        return -1
    w, h = _engine.camera.resolution
    dimensions[0], dimensions[1] = int(w), int(h)
    return 0


def su_camera_sensor_dimensions_raw(buffer) -> int:
    """libzyg.so entry: writes int32[2] through a raw memoryview."""
    if _engine is None:
        return -1
    out = _out_array(buffer, np.int32, 2)
    w, h = _engine.camera.resolution
    out[0], out[1] = int(w), int(h)
    return 0


def su_exporters_create(string) -> int:
    if _engine is None:
        return -1
    s = string.decode() if isinstance(string, bytes) else str(string)
    try:
        node = json.loads(s)
    except json.JSONDecodeError:
        return -1
    from ..io.take import Exporter

    _engine.take.exporters = []
    if "Image" in node:
        fmt = node["Image"].get("format", "PNG").upper()
        _engine.take.exporters.append(Exporter("Image", fmt))
    return 0


# reference aov_value.zig Class enum order, for su_resolve_frame(aov)
_AOV_INDEX = (
    "albedo", "depth", "material_id", "geometric_normal", "shading_normal",
    "roughness", "emission", "direct", "indirect",
)


def su_aovs_create(string) -> int:
    """Enable sensor AOV layers (ref capi.zig:202 -> View.loadAOV)."""
    if _engine is None:
        return -1
    s = string.decode() if isinstance(string, bytes) else str(string)
    try:
        node = json.loads(s)
    except json.JSONDecodeError:
        return -1
    from ..io.take import parse_aovs

    _engine.take.aovs = parse_aovs(node)
    _engine.dirty = True
    return 0


def su_sampler_create(num_samples: int) -> int:
    if _engine is None:
        return -1
    _engine.take.num_samples_per_pixel = max(int(num_samples), 1)
    _engine.dirty = True
    return 0


def su_integrators_create(string) -> int:
    if _engine is None:
        return -1
    s = string.decode() if isinstance(string, bytes) else str(string)
    try:
        node = json.loads(s)
    except json.JSONDecodeError:
        return -1
    _load_integrator(node, _engine.take)
    _engine.dirty = True
    return 0


def su_image_create(id, format, num_channels, width, height, depth, pixel_stride, data) -> int:
    if _engine is None:
        return -1
    bpc = {0: 1, 1: 2, 2: 4, 3: 2, 4: 4}.get(int(format), 1)
    count = int(num_channels) * int(width) * int(height) * max(int(depth), 1)
    dtype = {1: np.uint8, 2: np.uint16, 4: np.float32}[bpc]
    arr = _as_array(data, count, dtype)
    if arr is None:
        return -1
    new_id = (max(_engine.images.keys()) + 1) if _engine.images else 0
    if id != 0xFFFFFFFF:
        new_id = int(id)
    _engine.images[new_id] = arr.reshape(max(int(depth), 1), int(height), int(width), int(num_channels))
    return new_id


def su_image_update(id, pixel_stride, data) -> int:
    if _engine is None or int(id) not in _engine.images:
        return -1
    old = _engine.images[int(id)]
    arr = _as_array(data, old.size, old.dtype)
    _engine.images[int(id)] = arr.reshape(old.shape)
    # propagate into texture slots that reference this image id
    if _engine.builder.refresh_capi_image(int(id), _engine.images[int(id)]):
        _engine.dirty = True
    return 0


def su_material_create(id, string) -> int:
    if _engine is None:
        return -1
    s = string.decode() if isinstance(string, bytes) else str(string)
    try:
        desc = parse_material(
            json.loads(s), builder=_engine.builder,
            image_provider=_engine.images.get,
        )
    except (json.JSONDecodeError, KeyError, ValueError):
        return -1
    if id != 0xFFFFFFFF and int(id) < len(_engine.builder.materials):
        _engine.builder.materials[int(id)] = desc
        _engine.dirty = True
        return int(id)
    mid = _engine.builder.add_material(desc)
    _engine.dirty = True
    return mid


def su_material_update(id, string) -> int:
    if _engine is None or int(id) >= len(_engine.builder.materials):
        return -1
    s = string.decode() if isinstance(string, bytes) else str(string)
    try:
        _engine.builder.materials[int(id)] = parse_material(
            json.loads(s), builder=_engine.builder,
            image_provider=_engine.images.get,
        )
    except (json.JSONDecodeError, KeyError, ValueError):
        return -1
    _engine.dirty = True
    return 0


def su_triangle_mesh_create(
    id,
    num_parts,
    parts,
    num_triangles,
    indices,
    num_vertices,
    positions,
    positions_stride,
    normals,
    normals_stride,
    tangents=None,
    tangents_stride=0,
    uvs=None,
    uvs_stride=0,
    asyncr=False,
) -> int:
    """Returns a shape handle (>= MESH_BASE) usable with su_prop_create."""
    if _engine is None:
        return -1
    nv = int(num_vertices)
    nt = int(num_triangles)
    pos = _as_array(positions, nv * max(int(positions_stride), 3), np.float32)
    pos = pos.reshape(nv, -1)[:, :3]
    idx = _as_array(indices, nt * 3, np.uint32)
    idx = (
        idx.reshape(nt, 3).astype(np.int32)
        if idx is not None
        else np.arange(nt * 3, dtype=np.int32).reshape(nt, 3)
    )
    nrm = None
    if normals is not None and int(normals_stride) > 0:
        nrm = _as_array(normals, nv * max(int(normals_stride), 3), np.float32).reshape(nv, -1)[:, :3]
    uv = None
    if uvs is not None and int(uvs_stride) > 0:
        uv = _as_array(uvs, nv * max(int(uvs_stride), 2), np.float32).reshape(nv, -1)[:, :2]
    part_arr = None
    if parts is not None and int(num_parts) > 0:
        # parts come as (start_index, num_indices, material_index) triples
        p = _as_array(parts, int(num_parts) * 3, np.uint32).reshape(-1, 3)
        part_arr = np.zeros(nt, np.int32)
        for pi, (start, count, _mat) in enumerate(p):
            part_arr[start // 3 : (start + count) // 3] = pi
    mesh_id = _engine.builder.add_mesh(HostMesh(pos, idx, nrm, uv, part_arr))
    _engine.dirty = True
    return MESH_BASE + mesh_id


def su_prop_create(shape, num_materials, materials) -> int:
    if _engine is None:
        return -1
    mats = _as_array(materials, int(num_materials), np.uint32) if num_materials else None
    mat0 = int(mats[0]) if mats is not None and len(mats) else _engine.builder._fallback
    shape = int(shape)
    if shape >= MESH_BASE:
        pid = _engine.builder.add_mesh_prop(shape - MESH_BASE, Transformation(), mat0)
    else:
        pid = _engine.builder.add_prop(
            PropDesc(shape=shape, trafo=Transformation(), material=mat0)
        )
    _engine.dirty = True
    return pid


def su_prop_create_instance(entity) -> int:
    if _engine is None or int(entity) >= len(_engine.builder.props):
        return -1
    import copy

    src = _engine.builder.props[int(entity)]
    pid = _engine.builder.add_prop(copy.deepcopy(src))
    _engine.dirty = True
    return pid


def su_light_create(prop) -> int:
    if _engine is None or int(prop) >= len(_engine.builder.props):
        return -1
    p = _engine.builder.props[int(prop)]
    p.is_light = True
    p.visible_shadow = False
    _engine.dirty = True
    return 0


def _decompose_matrix(trafo) -> Transformation:
    m = _as_array(trafo, 16, np.float32).reshape(4, 4)
    basis = m[:3, :3]
    scale = np.linalg.norm(basis, axis=1)
    rot = basis / np.maximum(scale[:, None], 1e-12)
    return Transformation(
        position=m[3, :3].astype(np.float32),
        rotation=rot.astype(np.float32),
        scale=scale.astype(np.float32),
    )


def su_prop_set_transformation(prop, trafo) -> int:
    if _engine is None:
        return -1
    if int(prop) == CAMERA_PROP:
        t = _decompose_matrix(trafo)
        _engine.camera.position = np.asarray(t.position, np.float32)
        _engine.camera.rotation = np.asarray(t.rotation, np.float32)
        _engine.dirty = True
        return 0
    if int(prop) >= len(_engine.builder.props):
        return -1
    _engine.builder.props[int(prop)].trafo = _decompose_matrix(trafo)
    _engine.dirty = True
    return 0


def su_prop_set_transformation_frame(prop, frame, trafo) -> int:
    """Set one motion keyframe (ref capi.zig:506 -> space.zig setFrames).

    Keyframes are spaced by the camera's frame_step; the scene build
    interpolates them over the render frame's shutter interval."""
    if _engine is None or int(prop) >= len(_engine.builder.props):
        return -1
    p = _engine.builder.props[int(prop)]
    step = _engine.camera.frame_step if _engine.camera.frame_step > 0 else 1.0 / 60.0
    t = float(int(frame)) * step
    kf = (t, _decompose_matrix(trafo))
    anim = [k for k in (p.animation or []) if abs(k[0] - t) > 1e-12]
    anim.append(kf)
    anim.sort(key=lambda k: k[0])
    p.animation = anim
    p.trafo = anim[0][1]
    _engine.dirty = True
    return 0


def su_prop_set_visibility(prop, in_camera, in_reflection, in_sss) -> int:
    if _engine is None or int(prop) >= len(_engine.builder.props):
        return -1
    p = _engine.builder.props[int(prop)]
    p.visible_camera = bool(in_camera)
    p.visible_reflection = bool(in_reflection)
    _engine.dirty = True
    return 0


def su_render_frame(frame) -> int:
    if _engine is None:
        return -1
    if int(frame) != _engine.frame:
        _engine.frame = int(frame)
        _engine.dirty = True
    _engine.compile()
    _engine.driver.render_frame()
    return 0


def su_export_frame() -> int:
    if _engine is None or _engine.driver is None:
        return -1
    fmt = _engine.take.exporters[0].format if _engine.take.exporters else "PNG"
    path = f"frame.{fmt.lower()}"
    _engine.driver.export_frame(path)
    _engine.export_paths.append(path)
    return 0


def su_start_frame(frame) -> int:
    if _engine is None:
        return -1
    if int(frame) != _engine.frame:
        _engine.frame = int(frame)
        _engine.dirty = True
    _engine.compile()
    _engine.driver.start_frame()
    return 0


def su_render_iterations(num_steps) -> int:
    if _engine is None or _engine.driver is None:
        return -1
    _engine.driver.render_iterations(int(num_steps))
    return 0


def su_resolve_frame(aov=0xFFFFFFFF) -> int:
    if _engine is None or _engine.driver is None:
        return -1
    a = int(aov) & 0xFFFFFFFF
    if a < len(_AOV_INDEX):
        name = _AOV_INDEX[a]
        if name in getattr(_engine.driver, "_aov", {}):
            _engine.driver.resolve_aov(name)
            return 0
        return -1
    _engine.driver.resolve()
    return 0


def su_resolve_frame_to_buffer(aov, width, height, buffer) -> int:
    """aov = 0xFFFFFFFF/-1 -> tonemapped beauty; else an AOV plane by the
    reference Class index (ref capi.zig su_resolve_frame_to_buffer)."""
    if _engine is None or _engine.driver is None:
        return -1
    a = int(aov) & 0xFFFFFFFF
    if isinstance(buffer, np.ndarray):
        out = buffer.reshape(int(height), int(width), -1)
    else:  # raw shim buffer: 4 float32 per pixel
        out = _out_array(buffer, np.float32, int(width) * int(height) * 4)
        out = out.reshape(int(height), int(width), 4)
    if a < len(_AOV_INDEX):
        name = _AOV_INDEX[a]
        if name not in getattr(_engine.driver, "_aov", {}):
            return -1
        plane = _engine.driver.resolve_aov(name)
        h = min(int(height), plane.shape[0])
        w = min(int(width), plane.shape[1])
        c = min(out.shape[-1], plane.shape[-1])
        out[:h, :w, :c] = plane[:h, :w, :c]
        return 0
    img = _engine.driver.resolve(tonemapped=True)
    h = min(int(height), img.shape[0])
    w = min(int(width), img.shape[1])
    out[:h, :w, :3] = img[:h, :w]
    if out.shape[-1] == 4:
        alpha = _engine.driver.resolve_alpha()
        out[:h, :w, 3] = 1.0 if alpha is None else alpha[:h, :w]
    return 0


def su_copy_framebuffer(format, num_channels, width, height, destination) -> int:
    """format 0 = sRGB uint8, else float32 (ref capi.zig CopyFramebufferContext)."""
    if _engine is None or _engine.driver is None:
        return -1
    img = _engine.driver.resolve(tonemapped=True)
    h = min(int(height), img.shape[0])
    w = min(int(width), img.shape[1])
    nc = int(num_channels)
    if int(format) == 0:
        from ..io.png import float_to_srgb8

        srgb = float_to_srgb8(img[:h, :w], dither=False)
        dst = _out_array(
            destination, np.uint8, int(height) * int(width) * nc
        ).reshape(int(height), int(width), nc)
        if nc >= 3:
            dst[:h, :w, :3] = srgb
        if nc == 4:
            alpha = _engine.driver.resolve_alpha()
            dst[:h, :w, 3] = (
                255 if alpha is None
                else (alpha[:h, :w] * 255.0 + 0.5).astype(np.uint8)
            )
    else:
        dst = _out_array(
            destination, np.float32, int(height) * int(width) * nc
        ).reshape(int(height), int(width), nc)
        dst[:h, :w, : min(nc, 3)] = img[:h, :w, : min(nc, 3)]
        if nc == 4:
            alpha = _engine.driver.resolve_alpha()
            dst[:h, :w, 3] = 1.0 if alpha is None else alpha[:h, :w]
    return 0


def su_register_log(post) -> int:
    if _engine is None:
        return -1
    if isinstance(post, int):  # raw fn pointer from the libzyg.so shim
        import ctypes

        post = (
            ctypes.CFUNCTYPE(None, ctypes.c_uint32, ctypes.c_char_p)(post)
            if post
            else None
        )
        raw = post
        post = (
            (lambda lvl, msg: raw(lvl, msg.encode() if isinstance(msg, str) else msg))
            if raw
            else None
        )
    _engine.log_fn = post
    from ..utils import log as _log

    _log.register((lambda lvl, msg: post(lvl, msg)) if post else None)
    return 0


def su_register_progress(start, tick) -> int:
    if _engine is None:
        return -1
    if isinstance(start, int):  # raw fn pointers from the libzyg.so shim
        import ctypes

        start = ctypes.CFUNCTYPE(None, ctypes.c_uint32)(start) if start else None
        tick = ctypes.CFUNCTYPE(None)(tick) if tick else None
    _engine.progress_fns = (start, tick)
    return 0
