"""Pallas TPU kernels exercised on CPU via the Mosaic interpreter.

The CPU suite normally runs the pure-XLA fallbacks (ops.use_pallas()
gates); these tests force the kernels through
pltpu.force_tpu_interpret_mode so CI checks the kernel MATH (the TPU
lowering itself is validated on hardware — both kernels measured
bit-exact vs their XLA paths on 1M+ random lanes, round 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture()
def force_pallas(monkeypatch):
    import zyg_tpu.ops as ops_pkg
    import zyg_tpu.ops.isect as isect
    import zyg_tpu.ops.sobol_block as sbk

    monkeypatch.setattr(ops_pkg, "use_pallas", lambda: True)
    monkeypatch.setattr(isect, "use_pallas", lambda: True)
    monkeypatch.setattr(sbk, "use_pallas", lambda: True)


def test_sobol_block_matches_xla(force_pallas):
    from zyg_tpu.ops.sobol_block import sobol_block
    from zyg_tpu.core import sobol as sb

    n = 3000  # non-multiple of the lane tile
    rng = np.random.RandomState(3)
    sample = jnp.asarray(rng.randint(0, 2**31, n).astype(np.uint32))
    seed = jnp.asarray(rng.randint(0, 2**31, n).astype(np.uint32))
    with pltpu.force_tpu_interpret_mode():
        buf, ns = sobol_block(sample, seed)
    idx = sb.nested_uniform_scramble(sample, seed)
    sob = sb.sobol5(idx)
    seeds = sb.hash_combine(seed[..., None], jnp.arange(5, dtype=jnp.uint32))
    ref_buf = sb.u32_to_float(sb.nested_uniform_scramble(sob, seeds))
    np.testing.assert_array_equal(np.asarray(buf), np.asarray(ref_buf))
    np.testing.assert_array_equal(
        np.asarray(ns), np.asarray(sb.hash_u32(seed + jnp.uint32(1)))
    )


def test_isect_matches_xla(force_pallas):
    from zyg_tpu.scene import shapes
    from zyg_tpu.ops import isect
    from zyg_tpu.scene.loader import load_scene_file

    scene = load_scene_file("examples/scenes/cornell.scene")
    groups = scene.prop_groups or {}
    rng = np.random.RandomState(5)
    n = 700
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    d = jnp.asarray(dd)
    tmin = jnp.float32(1e-4)
    tmax = jnp.float32(3.0e37)
    prim = jnp.asarray(rng.rand(n) < 0.5)

    with pltpu.force_tpu_interpret_mode():
        res = isect.closest_props(
            scene, groups, o, d, tmin, tmax, "reflection", prim
        )
        blk = isect.anyhit_props(
            scene, groups, o, d, tmin, jnp.full((n,), 2.0, jnp.float32)
        )
    assert res is not None and blk is not None

    # XLA reference via the public entry points with the kernel disabled
    import zyg_tpu.ops.isect as isect_mod

    orig = isect_mod.use_pallas
    isect_mod.use_pallas = lambda: False
    try:
        hit = shapes.intersect_scene(
            scene, o, d, tmin, tmax, "reflection", primary=prim
        )
        blocked = shapes.occluded(
            scene, o, d, tmin, jnp.full((n,), 2.0, jnp.float32)
        )
    finally:
        isect_mod.use_pallas = orig
    t, pid, u, v = (np.asarray(x) for x in res)
    np.testing.assert_array_equal(pid, np.asarray(hit.prop))
    # interpreter float association differs from vm.dot's sum-reduction by
    # ~1 ulp (on real TPU both paths measured bit-equal)
    np.testing.assert_allclose(t, np.asarray(hit.t), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(u, np.asarray(hit.u), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(v, np.asarray(hit.v), rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(blk), np.asarray(blocked))
