"""zyg_tpu Blender render-engine add-on.

Registers a RenderEngine backed by libzyg.so — the C ABI shim over the
TPU renderer's su_* surface (see zyg_tpu/capi/). Parity target:
/root/reference/src/blender-plugin/__init__.py (reimplemented, not copied).

Install: copy this directory (with a built libzyg.so next to it, see
zyg_tpu.capi.shim.build_shim) into Blender's addons folder and enable
"ZygTPU Render".
"""

bl_info = {
    "name": "ZygTPU Render",
    "author": "zyg_tpu",
    "version": (0, 2, 0),
    "blender": (3, 0, 0),
    "description": "TPU-native path tracer (zyg_tpu) render engine",
    "category": "Render",
}


def register():
    import bpy

    from . import engine

    class ZygTpuRenderEngine(bpy.types.RenderEngine):
        bl_idname = "ZYG_TPU"
        bl_label = "ZygTPU"
        bl_use_preview = False
        bl_use_eevee_viewport = True

        def __init__(self):
            self.session = None

        def __del__(self):
            engine.free(self)

        def update(self, data, depsgraph):
            engine.sync(self, data, depsgraph)

        def render(self, depsgraph):
            engine.draw(self, depsgraph)

        # viewport preview: progressive refinement over the su_start_frame /
        # su_render_iterations API (ref __init__.py:79-90 — stubs there)
        def view_update(self, context, depsgraph):
            engine.view_update(self, context, depsgraph)

        def view_draw(self, context, depsgraph):
            engine.view_draw(self, context, depsgraph)

    global _engine_cls
    _engine_cls = ZygTpuRenderEngine
    bpy.utils.register_class(ZygTpuRenderEngine)

    # expose the standard render panels for the engine
    from bl_ui import properties_render, properties_output

    for panel in (
        properties_render.RENDER_PT_context,
        properties_output.RENDER_PT_format,
        properties_output.RENDER_PT_output,
    ):
        if hasattr(panel, "COMPAT_ENGINES"):
            panel.COMPAT_ENGINES.add("ZYG_TPU")


def unregister():
    import bpy

    from . import engine

    engine.shutdown()
    if _engine_cls is not None:
        bpy.utils.unregister_class(_engine_cls)


_engine_cls = None
