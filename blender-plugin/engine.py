"""Blender → zyg_tpu scene sync + render, over the libzyg.so C ABI.

Reimplements the functionality of the reference plugin
(/root/reference/src/blender-plugin/engine.py) against the same su_*
surface: depsgraph meshes/lights/camera export, Principled BSDF →
Substitute material mapping, progressive render into Blender's
RenderResult. Structure is original (class-based session, single sync
walk); only the C ABI contract is shared.
"""

from __future__ import annotations

import ctypes
import math
import os

import numpy as np

_LIB = None

# builtin analytic shape handles (zyg_tpu.capi.capi shape space)
SHAPE_DISTANT = 4
SHAPE_RECTANGLE = 5
SHAPE_SPHERE = 6


def _lib():
    global _LIB
    if _LIB is None:
        here = os.path.dirname(__file__)
        path = os.path.join(here, "libzyg.so")
        if not os.path.exists(path):
            # dev fallback: build the shim from the in-tree sources
            from zyg_tpu.capi.shim import build_shim

            path = build_shim()
        _LIB = ctypes.CDLL(path)
        _LIB.su_camera_set_fov.argtypes = [ctypes.c_float]
    return _LIB


def shutdown():
    global _LIB
    if _LIB is not None:
        _LIB.su_release()
        _LIB = None


def free(engine):
    if getattr(engine, "session", None):
        _lib().su_release()
        engine.session = None


def _matrix_rows(mw, pre_scale=None, camera=False):
    """Blender world matrix (column-major mathutils) → row-major float16
    with rows-as-axes, the layout su_prop_set_transformation expects.

    camera=True applies the Blender→zyg camera convention: Blender
    cameras look down local -Z with +Y up; zyg looks down +Z with a
    y-down raster — a 180° rotation about local X (negate the Y and Z
    axis rows)."""
    m = np.eye(4, dtype=np.float32)
    for r in range(3):
        # mathutils matrices index [row][col]; zyg wants axis rows
        m[r, :3] = [mw[0][r], mw[1][r], mw[2][r]]
    if camera:
        m[1, :3] *= -1.0
        m[2, :3] *= -1.0
    if pre_scale is not None:
        m[:3, :3] *= np.asarray(pre_scale, np.float32)[:, None]
    m[3, :3] = [mw[0][3], mw[1][3], mw[2][3]]
    return m


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _substitute_json(color, roughness, ior, metallic):
    return (
        '{"rendering": {"Substitute": {"color": [%g, %g, %g], '
        '"roughness": %g, "ior": %g, "metallic": %g}}}'
        % (color[0], color[1], color[2], roughness, ior, metallic)
    ).encode()


def _principled_to_material(zyg, bmat):
    """Principled BSDF node → Substitute material id (or None)."""
    if bmat is None or not bmat.node_tree:
        return None
    bsdf = bmat.node_tree.nodes.get("Principled BSDF")
    if not bsdf:
        return None
    color = bsdf.inputs["Base Color"].default_value
    rough = bsdf.inputs["Roughness"].default_value
    metal = bsdf.inputs["Metallic"].default_value
    spec_in = bsdf.inputs.get("Specular") or bsdf.inputs.get("Specular IOR Level")
    s = spec_in.default_value if spec_in else 0.5
    # remap Blender specular to ior (inverse of the 0.08*((ior-1)/(ior+1))^2
    # convention)
    f0 = 0.08 * max(float(s), 1e-4)
    r = math.sqrt(f0)
    ior = (1.0 + r) / max(1.0 - r, 1e-4)
    return zyg.su_material_create(
        0xFFFFFFFF, _substitute_json(color, rough, ior, metal)
    )


def _light_json(color, energy):
    return (
        '{"rendering": {"Light": {"emittance": {"quantity": '
        '"Radiant_intensity", "spectrum": [%g, %g, %g], "value": %g}}}}'
        % (color[0], color[1], color[2], energy)
    ).encode()


def _export_mesh(zyg, engine, obj, fallback_mat):
    """Triangulated evaluated mesh → su_triangle_mesh_create handle."""
    cached = engine.mesh_cache.get(obj.data.name)
    if cached is not None:
        return cached
    mesh = obj.to_mesh()
    mesh.calc_loop_triangles()
    if hasattr(mesh, "calc_normals_split"):
        mesh.calc_normals_split()
    nv = len(mesh.vertices)
    nt = len(mesh.loop_triangles)
    if nt == 0:
        obj.to_mesh_clear()
        return None
    pos = np.empty(nv * 3, np.float32)
    mesh.vertices.foreach_get("co", pos)
    nrm = np.empty(nv * 3, np.float32)
    mesh.vertices.foreach_get("normal", nrm)
    idx = np.empty(nt * 3, np.uint32)
    mesh.loop_triangles.foreach_get("vertices", idx)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    handle = zyg.su_triangle_mesh_create(
        0xFFFFFFFF, 0, None, nt, idx.ctypes.data_as(u32p), nv,
        _f32p(pos), 3, _f32p(nrm), 3, None, 0, None, 0, False,
    )
    obj.to_mesh_clear()
    engine.mesh_cache[obj.data.name] = handle
    return handle


def sync(engine, data, depsgraph):
    """Full scene (re)build — the reference re-exports on every reset."""
    zyg = _lib()
    if not getattr(engine, "session", None):
        zyg.su_init()
        engine.session = 1
    engine.mesh_cache = {}
    engine.materials = {}

    scene = depsgraph.scene
    scale = scene.render.resolution_percentage / 100.0
    size_x = int(scene.render.resolution_x * scale)
    size_y = int(scene.render.resolution_y * scale)
    engine.size = (size_x, size_y)

    zyg.su_sampler_create(max(int(scene.cycles.samples) if hasattr(scene, "cycles") else 16, 1))
    engine.camera_prop = zyg.su_perspective_camera_create(size_x, size_y)
    zyg.su_integrators_create(b'{"surface": {"PTMIS": {}}}')

    grey = zyg.su_material_create(0xFFFFFFFF, _substitute_json((0.6, 0.6, 0.6), 0.6, 1.5, 0.0))

    for inst in depsgraph.object_instances:
        obj = inst.object
        if obj.type == "MESH":
            mat = None
            if obj.material_slots:
                key = obj.material_slots[0].name
                mat = engine.materials.get(key)
                if mat is None:
                    mat = _principled_to_material(zyg, obj.material_slots[0].material)
                    if mat is not None:
                        engine.materials[key] = mat
            handle = _export_mesh(zyg, engine, obj, grey)
            if handle is None or handle < 0:
                continue
            mats = (ctypes.c_uint32 * 1)(mat if mat is not None else grey)
            prop = zyg.su_prop_create(handle, 1, mats)
            trafo = _matrix_rows(inst.matrix_world)
            zyg.su_prop_set_transformation(prop, _f32p(trafo.ravel()))
        elif obj.type == "LIGHT" and not inst.is_instance:
            light = obj.data
            mat = zyg.su_material_create(
                0xFFFFFFFF, _light_json(light.color, light.energy)
            )
            mats = (ctypes.c_uint32 * 1)(mat)
            if light.type == "POINT":
                prop = zyg.su_prop_create(SHAPE_SPHERE, 1, mats)
                r = max(light.shadow_soft_size, 1e-3)
                trafo = _matrix_rows(inst.matrix_world, pre_scale=(r, r, r))
            elif light.type == "SUN":
                prop = zyg.su_prop_create(SHAPE_DISTANT, 1, mats)
                r = max(light.angle / 2.0, 1e-4)
                trafo = _matrix_rows(inst.matrix_world, pre_scale=(r, r, r))
            else:  # AREA and others map to a rectangle
                prop = zyg.su_prop_create(SHAPE_RECTANGLE, 1, mats)
                s = max(getattr(light, "size", 1.0), 1e-3)
                trafo = _matrix_rows(inst.matrix_world, pre_scale=(s, s, 1.0))
            zyg.su_prop_set_transformation(prop, _f32p(trafo.ravel()))
            zyg.su_prop_set_visibility(prop, 0, 1, 0)
            zyg.su_light_create(prop)
        elif obj.type == "CAMERA":
            zyg.su_camera_set_fov(ctypes.c_float(obj.data.angle))
            trafo = _matrix_rows(inst.matrix_world, camera=True)
            # the camera is a prop (su_perspective_camera_create's handle)
            zyg.su_prop_set_transformation(engine.camera_prop, _f32p(trafo.ravel()))


def draw(engine, depsgraph):
    """Render the synced scene into Blender's combined pass."""
    zyg = _lib()
    if not getattr(engine, "session", None):
        return
    size_x, size_y = engine.size
    buf = np.empty((size_x * size_y, 4), np.float32)
    zyg.su_render_frame(0)
    zyg.su_resolve_frame_to_buffer(0xFFFFFFFF, size_x, size_y, _f32p(buf))
    result = engine.begin_result(0, 0, size_x, size_y)
    result.layers[0].passes["Combined"].rect = buf
    engine.end_result(result)


# ---------------------------------------------------------------------------
# viewport preview (ref __init__.py view_update/view_draw — stubs in the
# reference; implemented here over the progressive su_start_frame /
# su_render_iterations API, the same loop it.py and capi-test drive)
# ---------------------------------------------------------------------------

VIEWPORT_MAX_SAMPLES = 16
VIEWPORT_STEP = 2


def _viewport_camera(engine, context):
    """Aim the session camera at the viewport eye (region_data view
    matrix inverted = camera→world) and match the viewport lens."""
    zyg = _lib()
    rv3d = context.region_data
    space = context.space_data
    vm = rv3d.view_matrix.inverted()
    trafo = _matrix_rows(vm, camera=True)
    zyg.su_prop_set_transformation(engine.camera_prop, _f32p(trafo.ravel()))
    # Blender viewport: fov from the space lens over a 72mm film back
    lens = float(getattr(space, "lens", 50.0))
    fov = 2.0 * math.atan(36.0 / lens)
    zyg.su_camera_set_fov(ctypes.c_float(fov))


def view_update(engine, context, depsgraph):
    """Viewport sync: (re)export the scene at region resolution and
    restart the progressive frame."""
    region = context.region
    # keep the preview cheap: cap the long edge, preserve aspect
    w, h = int(region.width), int(region.height)
    cap = 640
    if max(w, h) > cap:
        s = cap / float(max(w, h))
        w, h = max(int(w * s), 8), max(int(h * s), 8)
    engine.view_size = (w, h)

    zyg = _lib()
    if not getattr(engine, "session", None):
        zyg.su_init()
        engine.session = 1
    sync(engine, None, depsgraph)
    # sync() configured the final-render camera; retarget to the viewport
    zyg.su_sampler_create(VIEWPORT_MAX_SAMPLES)
    engine.camera_prop = zyg.su_perspective_camera_create(w, h)
    _viewport_camera(engine, context)
    zyg.su_start_frame(0)
    engine.view_samples = 0


def view_draw(engine, context, depsgraph):
    """Progressive viewport refinement: a few iterations per redraw,
    blitted with the gpu module; tag_redraw keeps the loop going until
    the sample budget is reached."""
    zyg = _lib()
    if not getattr(engine, "session", None) or not hasattr(engine, "view_size"):
        return
    w, h = engine.view_size
    if engine.view_samples < VIEWPORT_MAX_SAMPLES:
        _viewport_camera(engine, context)
        zyg.su_render_iterations(VIEWPORT_STEP)
        engine.view_samples += VIEWPORT_STEP

    buf = np.empty((w * h, 4), np.float32)
    zyg.su_resolve_frame_to_buffer(0xFFFFFFFF, w, h, _f32p(buf))

    import gpu
    from gpu_extras.presets import draw_texture_2d

    pixels = gpu.types.Buffer("FLOAT", w * h * 4, buf.ravel())
    tex = gpu.types.GPUTexture((w, h), format="RGBA16F", data=pixels)
    region = context.region
    gpu.state.blend_set("ALPHA_PREMULT")
    draw_texture_2d(tex, (0, 0), region.width, region.height)
    gpu.state.blend_set("NONE")

    if engine.view_samples < VIEWPORT_MAX_SAMPLES:
        engine.tag_redraw()
