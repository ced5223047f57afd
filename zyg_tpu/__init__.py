"""zyg_tpu — a TPU-native physically-based renderer.

A from-scratch rebuild of the capabilities of Opioid/zyg (a Zig CPU Monte-Carlo
path tracer, see /root/reference) as a batched **wavefront** path tracer on TPU:

- SoA path state over large ray batches, bounced inside ``jax.lax.while_loop``
- analytic shapes + flattened BVH triangle meshes (Pallas traversal kernels)
- PT / PTDL / PTMIS integrators with NEE + MIS, light trees, volumes
- deterministic Owen-scrambled Sobol' QMC streams keyed (pixel_id, sample)
- framebuffers sharded across a ``jax.sharding.Mesh`` and psum-merged

Package layout:
    core/      math, RNG, Sobol', distributions, spectra (substrate; ref src/base)
    scene/     scene description compiled to flat device arrays (ref src/core/scene)
    render/    camera, sensor, integrators, driver (ref src/core/rendering)
    ops/       Pallas TPU kernels (BVH traversal etc.)
    parallel/  device-mesh sharding of the pixel/sample domain
    io/        take/scene JSON loaders, PNG/EXR/RGBE codecs (host side)
    utils/     logging, progress, timing
"""

__version__ = "0.1.0"

# Geometry correctness: XLA:TPU lowers matmul/einsum (including the tiny
# batched 3x3 transform products in core/vecmath.py) to the MXU at BF16
# input precision by default. An object-space ray origin computed at bf16
# loses ~1e-3 relative accuracy — enough to defeat the watertight ray
# offset and cover mesh surfaces in self-intersection acne (observed on
# v5e; CPU was exact). Renderer FLOPs live on the VPU, so forcing full
# f32 matmul precision costs nothing measurable here.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the big fused render programs (wavefront
# integrator + multi-stage BVH cascade) compile in minutes over the remote
# TPU tunnel; cache executables on disk so repeat runs (CLI, bench, tests)
# skip compilation entirely.
import os as _os

_cache_dir = _os.environ.get(
    "ZYG_TPU_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:  # cache unsupported on this backend -> compile as before
    pass
