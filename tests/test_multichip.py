"""Multi-chip entry points: the driver-facing dryrun + sample sharding.

Round-1 regression: MULTICHIP_r01.json recorded rc=1 because
__graft_entry__.dryrun_multichip relied on the caller to force the CPU
platform. These tests call the *real* entry points the round driver uses.
Ref parallelism model: src/core/rendering/tile_queue.zig (tile queues) →
here shard_map over a 1-D pixel mesh (zyg_tpu/parallel/mesh.py).
"""

import functools
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_entry_point():
    """The exact function the round driver invokes must pass in-process."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    fb, _, _ = jax.jit(fn)(*args)
    img = np.asarray(fb.resolve())
    assert np.isfinite(img).all() and img.max() > 0.0


def test_sample_sharding_psum_matches_sequential():
    """Sample sharding (mesh.py sample_sharded=True): N devices each render a
    different sample offset; psum of their framebuffers must equal the
    sequential sum of the same offsets on one device."""
    from __graft_entry__ import _cornell
    from zyg_tpu.parallel.mesh import render_mesh, shard_render
    from zyg_tpu.render.driver import Driver, _render_samples

    n = 4
    take, scene = _cornell(res=8, spp=1)
    driver = Driver(take=take, scene=scene)

    render_impl = functools.partial(
        _render_samples,
        num_samples=1,
        num_expected_samples=2,
        integrator=take.integrator,
        clamp_max=(np.inf, np.inf, np.inf),
    )

    def render_one(scene, cam, fb, xy, ids, first_it):
        new_fb, _, _ = render_impl(scene, cam, fb, xy, ids, first_it)
        return jax.tree.map(lambda a, b: a - b, new_fb, fb)  # delta only

    args = (scene, driver.camera.arrays(), driver._fb, driver._pixel_xy, driver._pixel_ids)

    mesh = render_mesh(jax.devices()[:n])
    sharded = shard_render(render_one, mesh, sample_sharded=True)
    fb_psum = jax.jit(sharded)(*args, jnp.int32(0))

    seq = jax.tree.map(jnp.zeros_like, driver._fb)
    for i in range(n):
        delta = jax.jit(render_one)(*args, jnp.int32(i))
        seq = jax.tree.map(lambda a, b: a + b, seq, delta)

    for a, b in zip(jax.tree.leaves(fb_psum), jax.tree.leaves(seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
