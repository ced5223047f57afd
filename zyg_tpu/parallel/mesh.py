"""Multi-chip rendering over a jax.sharding.Mesh.

The reference parallelizes across CPU threads with tile queues + atomic
framebuffer adds (ref: src/core/rendering/tile_queue.zig, sensor.zig). On
TPU the two shardable domains are pixels and samples:

- **pixel sharding** (the default): each device renders a contiguous slice
  of the pixel batch; the framebuffer stays device-sharded until resolve.
  The scene is replicated — analytic scenes and BVHs fit in HBM.
- **sample sharding**: every device renders all pixels at different sample
  indices; framebuffers are psum-merged over ICI. Better for tiny frames.

Both are expressed with shard_map over a 1-D 'pixels' mesh so XLA inserts
the collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def render_mesh(devices=None, axis: str = "pixels") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_render(render_one_shard, mesh: Mesh, *, sample_sharded: bool = False):
    """Wrap a per-shard render fn into a mesh-parallel one.

    render_one_shard(scene, cam, fb_shard, pixel_xy_shard, pixel_ids_shard,
    first_iteration) -> fb_shard. Scene and camera are replicated; pixel
    arrays and framebuffer are sharded along the pixel axis.

    With sample_sharded=True the pixel arrays are replicated, each device
    renders a different sample offset, and the returned framebuffer is the
    psum over devices.
    """
    axis = mesh.axis_names[0]

    if not sample_sharded:
        fn = shard_map(
            render_one_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )
        return fn

    def per_device(scene, cam, fb, pixel_xy, pixel_ids, first_iteration):
        idx = jax.lax.axis_index(axis)
        fb = render_one_shard(scene, cam, fb, pixel_xy, pixel_ids, first_iteration + idx)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), fb)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
