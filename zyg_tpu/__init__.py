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
