/* libzyg.so — C ABI shim over the Python `su_*` surface.
 *
 * The reference ships a native libzyg (src/capi/capi.zig exports) that the
 * Blender plugin and capi-test drive through ctypes/CDLL. The TPU build's
 * engine is Python (zyg_tpu.capi.capi); this shim embeds CPython and
 * forwards each exported symbol, so binaries and scripts written against
 * the reference library load this one unmodified:
 *
 *     zyg = CDLL("libzyg.so"); zyg.su_init(); ...
 *
 * Build (done on demand by zyg_tpu.capi.shim.build_shim()):
 *     gcc -O2 -shared -fPIC libzyg.c -o libzyg.so \
 *         $(python3-config --includes --ldflags --embed)
 *
 * Marshaling: scalars map directly; char* -> str; in/out pointer buffers
 * wrap as memoryviews sized from the call's dimension args (the Python side
 * reads them with np.frombuffer / fills them through np.asarray).
 * Callback registration (su_register_log/progress) forwards the raw
 * function pointer as an integer; the Python side rebinds it with
 * ctypes.CFUNCTYPE. Python path resolution: ZYG_PYTHONPATH env var, else
 * the .so's grandparent directory (the repo root when built in place).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define _GNU_SOURCE
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static PyObject *g_mod = NULL; /* zyg_tpu.capi.capi */

static void add_sys_path(const char *path) {
    PyObject *sys_path = PySys_GetObject("path");
    if (!sys_path) return;
    PyObject *p = PyUnicode_FromString(path);
    if (p) {
        PyList_Insert(sys_path, 0, p);
        Py_DECREF(p);
    }
}

static int ensure_python(void) {
    if (g_mod) return 0;
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
    }
    PyGILState_STATE st = PyGILState_Ensure();
    const char *env = getenv("ZYG_PYTHONPATH");
    if (env && env[0]) {
        add_sys_path(env);
    } else {
        Dl_info info;
        if (dladdr((void *)&ensure_python, &info) && info.dli_fname) {
            /* .so lives in <root>/zyg_tpu/native/ -> add <root> */
            char buf[4096];
            strncpy(buf, info.dli_fname, sizeof(buf) - 1);
            buf[sizeof(buf) - 1] = 0;
            for (int up = 0; up < 3; up++) {
                char *slash = strrchr(buf, '/');
                if (!slash) break;
                *slash = 0;
            }
            if (buf[0]) add_sys_path(buf);
        }
    }
    g_mod = PyImport_ImportModule("zyg_tpu.capi.capi");
    if (!g_mod) {
        PyErr_Print();
        PyGILState_Release(st);
        return -1;
    }
    PyGILState_Release(st);
    return 0;
}

/* call capi.<name>(args...) -> C int; returns `fail` on any error */
static int32_t call_i(const char *name, PyObject *args, int32_t fail) {
    if (ensure_python() != 0) {
        Py_XDECREF(args);
        return fail;
    }
    PyGILState_STATE st = PyGILState_Ensure();
    int32_t out = fail;
    PyObject *fn = PyObject_GetAttrString(g_mod, name);
    if (fn) {
        PyObject *r = PyObject_CallObject(fn, args);
        if (r) {
            out = (int32_t)PyLong_AsLong(r);
            Py_DECREF(r);
        } else {
            PyErr_Print();
        }
        Py_DECREF(fn);
    }
    Py_XDECREF(args);
    PyGILState_Release(st);
    return out;
}

static PyObject *mv(const void *ptr, Py_ssize_t size, int writable) {
    if (!ptr) Py_RETURN_NONE;
    return PyMemoryView_FromMemory(
        (char *)ptr, size, writable ? PyBUF_WRITE : PyBUF_READ);
}

#define GIL_ARGS(...)                                \
    PyGILState_STATE st_ = PyGILState_Ensure();      \
    PyObject *args_ = Py_BuildValue(__VA_ARGS__);    \
    PyGILState_Release(st_);

int32_t su_init(void) {
    if (ensure_python() != 0) return -1;
    return call_i("su_init", NULL, -1);
}

int32_t su_release(void) { return call_i("su_release", NULL, -1); }

int32_t su_mount(const char *folder) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(s)", folder);
    return call_i("su_mount", args_, -1);
}

int32_t su_perspective_camera_create(uint32_t w, uint32_t h) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(II)", w, h);
    return call_i("su_perspective_camera_create", args_, -1);
}

int32_t su_camera_set_fov(float fov) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(f)", fov);
    return call_i("su_camera_set_fov", args_, -1);
}

int32_t su_camera_sensor_dimensions(int32_t *dims) {
    if (ensure_python() != 0) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue("(N)", mv(dims, 2 * sizeof(int32_t), 1));
    PyGILState_Release(st);
    /* python writes through np.frombuffer of the memoryview */
    return call_i("su_camera_sensor_dimensions_raw", args, -1);
}

int32_t su_exporters_create(const char *s) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(s)", s);
    return call_i("su_exporters_create", args_, -1);
}

int32_t su_aovs_create(const char *s) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(s)", s);
    return call_i("su_aovs_create", args_, -1);
}

int32_t su_sampler_create(uint32_t n) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", n);
    return call_i("su_sampler_create", args_, -1);
}

int32_t su_integrators_create(const char *s) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(s)", s);
    return call_i("su_integrators_create", args_, -1);
}

int32_t su_image_create(uint32_t id, uint32_t format, uint32_t num_channels,
                        uint32_t width, uint32_t height, uint32_t depth,
                        uint32_t pixel_stride, const uint8_t *data) {
    if (ensure_python() != 0) return -1;
    uint32_t bpc = (format == 0) ? 1 : (format == 1 || format == 3) ? 2 : 4;
    uint32_t d = depth ? depth : 1;
    Py_ssize_t size =
        (Py_ssize_t)bpc * num_channels * width * height * d;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue(
        "(IIIIIIIN)", id, format, num_channels, width, height, depth,
        pixel_stride, mv(data, size, 0));
    PyGILState_Release(st);
    return call_i("su_image_create", args, -1);
}

int32_t su_image_update(uint32_t id, uint32_t pixel_stride,
                        const uint8_t *data) {
    if (ensure_python() != 0) return -1;
    /* image dimensions live Python-side; pass an oversized view and let
     * numpy slice to the stored element count */
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue(
        "(IIN)", id, pixel_stride, mv(data, (Py_ssize_t)1 << 31, 0));
    PyGILState_Release(st);
    return call_i("su_image_update", args, -1);
}

int32_t su_material_create(uint32_t id, const char *s) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(Is)", id, s);
    return call_i("su_material_create", args_, -1);
}

int32_t su_material_update(uint32_t id, const char *s) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(Is)", id, s);
    return call_i("su_material_update", args_, -1);
}

int32_t su_triangle_mesh_create(
    uint32_t id, uint32_t num_parts, const uint32_t *parts,
    uint32_t num_triangles, const uint32_t *indices, uint32_t num_vertices,
    const float *positions, uint32_t positions_stride, const float *normals,
    uint32_t normals_stride, const float *tangents, uint32_t tangents_stride,
    const float *uvs, uint32_t uvs_stride, uint8_t asyncr) {
    if (ensure_python() != 0) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue(
        "(IININININININIO)", id, num_parts,
        mv(parts, (Py_ssize_t)num_parts * 3 * 4, 0), num_triangles,
        mv(indices, (Py_ssize_t)num_triangles * 3 * 4, 0), num_vertices,
        mv(positions, (Py_ssize_t)num_vertices * (positions_stride < 3 ? 3 : positions_stride) * 4, 0),
        positions_stride,
        mv(normals, (Py_ssize_t)num_vertices * (normals_stride < 3 ? 3 : normals_stride) * 4, 0),
        normals_stride,
        mv(tangents, tangents ? (Py_ssize_t)num_vertices * (tangents_stride < 3 ? 3 : tangents_stride) * 4 : 0, 0),
        tangents_stride,
        mv(uvs, uvs ? (Py_ssize_t)num_vertices * (uvs_stride < 2 ? 2 : uvs_stride) * 4 : 0, 0),
        uvs_stride, asyncr ? Py_True : Py_False);
    PyGILState_Release(st);
    return call_i("su_triangle_mesh_create", args, -1);
}

int32_t su_prop_create(uint32_t shape, uint32_t num_materials,
                       const uint32_t *materials) {
    if (ensure_python() != 0) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue(
        "(IIN)", shape, num_materials,
        mv(materials, (Py_ssize_t)num_materials * 4, 0));
    PyGILState_Release(st);
    return call_i("su_prop_create", args, -1);
}

int32_t su_prop_create_instance(uint32_t entity) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", entity);
    return call_i("su_prop_create_instance", args_, -1);
}

int32_t su_light_create(uint32_t prop) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", prop);
    return call_i("su_light_create", args_, -1);
}

int32_t su_prop_set_transformation(uint32_t prop, const float *trafo) {
    if (ensure_python() != 0) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args =
        Py_BuildValue("(IN)", prop, mv(trafo, 16 * 4, 0));
    PyGILState_Release(st);
    return call_i("su_prop_set_transformation", args, -1);
}

int32_t su_prop_set_transformation_frame(uint32_t prop, uint32_t frame,
                                         const float *trafo) {
    if (ensure_python() != 0) return -1;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args =
        Py_BuildValue("(IIN)", prop, frame, mv(trafo, 16 * 4, 0));
    PyGILState_Release(st);
    return call_i("su_prop_set_transformation_frame", args, -1);
}

int32_t su_prop_set_visibility(uint32_t prop, uint32_t in_camera,
                               uint32_t in_reflection, uint32_t in_sss) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(IIII)", prop, in_camera, in_reflection, in_sss);
    return call_i("su_prop_set_visibility", args_, -1);
}

int32_t su_render_frame(uint32_t frame) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", frame);
    return call_i("su_render_frame", args_, -1);
}

int32_t su_export_frame(void) { return call_i("su_export_frame", NULL, -1); }

int32_t su_start_frame(uint32_t frame) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", frame);
    return call_i("su_start_frame", args_, -1);
}

int32_t su_render_iterations(uint32_t num) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", num);
    return call_i("su_render_iterations", args_, -1);
}

int32_t su_resolve_frame(uint32_t aov) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(I)", aov);
    return call_i("su_resolve_frame", args_, -1);
}

int32_t su_resolve_frame_to_buffer(uint32_t aov, uint32_t width,
                                   uint32_t height, float *buffer) {
    if (ensure_python() != 0) return -1;
    /* beauty fills 4 channels; AOV planes are <= 4 — expose 4 floats/px
     * to match the reference's packed output buffer */
    Py_ssize_t size = (Py_ssize_t)width * height * 4 * 4;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue("(IIIN)", aov, width, height,
                                   mv(buffer, size, 1));
    PyGILState_Release(st);
    return call_i("su_resolve_frame_to_buffer", args, -1);
}

int32_t su_copy_framebuffer(uint32_t format, uint32_t num_channels,
                            uint32_t width, uint32_t height, uint8_t *dst) {
    if (ensure_python() != 0) return -1;
    uint32_t bpc = (format == 0) ? 1 : 4;
    Py_ssize_t size = (Py_ssize_t)width * height * num_channels * bpc;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *args = Py_BuildValue("(IIIIN)", format, num_channels, width,
                                   height, mv(dst, size, 1));
    PyGILState_Release(st);
    return call_i("su_copy_framebuffer", args, -1);
}

int32_t su_register_log(void *post) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(k)", (unsigned long)(uintptr_t)post);
    return call_i("su_register_log", args_, -1);
}

int32_t su_register_progress(void *start, void *tick) {
    if (ensure_python() != 0) return -1;
    GIL_ARGS("(kk)", (unsigned long)(uintptr_t)start,
             (unsigned long)(uintptr_t)tick);
    return call_i("su_register_progress", args_, -1);
}
