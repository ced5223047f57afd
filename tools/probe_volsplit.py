"""Probe: component split of the smoke bench (960x540 PTMIS 8spp).

Times the two nested tracking loops the volume integrator runs per
bounce — sample_interaction (camera/bounce segments) and transmittance
(NEE shadow rays) — on a bench-like lane population, via in-loop REPS
deltas (CLAUDE.md rule 11). Also reports macrocell-hop counts.

Run: python tools/probe_volsplit.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import zyg_tpu  # noqa: F401
from zyg_tpu.io.take import load_take_file
from zyg_tpu.scene.loader import load_scene_file
from zyg_tpu.render.integrator import volume as vol_mod

N = 1 << 18  # bench tiles volume scenes at 256k lanes


def populations(scene):
    """Lane population mimicking in-smoke bounce segments: origins inside
    the cube (pos [0,1.3,0], scale [2.4,2.6,2.4], rot 25deg — stay well
    inside), isotropic directions, seg_t to the cube wall (the tracker
    clamps to the prop exit anyway)."""
    rng = np.random.RandomState(5)
    o = np.array([0, 1.3, 0], np.float32) + rng.uniform(
        -1.0, 1.0, size=(N, 3)
    ).astype(np.float32) * np.array([1.5, 1.7, 1.5], np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    seg = np.full(N, 1e9, np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(seg)


def timed(fn, *a):
    out = fn(*a)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    take = load_take_file(os.path.join(REPO, "examples/takes/smoke.take"))
    scene = load_scene_file(take.scene_filename)
    import zyg_tpu.scene.types as st

    kinds = np.asarray(scene.materials.kind)
    vol_mat = int(np.flatnonzero(kinds == int(st.MaterialKind.VOLUMETRIC))[0])
    pm = np.asarray(scene.prop_material)
    vol_prop = int(np.flatnonzero(pm == vol_mat)[0])
    print(f"vol_mat={vol_mat} vol_prop={vol_prop}", flush=True)

    o, d, seg = populations(scene)
    mp = jnp.full(N, vol_prop, jnp.int32)
    key0 = jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)

    def chain_track(reps):
        def f(o, d, seg, key):
            acc = jnp.float32(0)
            u = jnp.full(N, 0.5, jnp.float32)
            for i in range(reps):
                ev = vol_mod.sample_interaction(
                    scene, mp, o, d, seg, u, key + jnp.uint32(i)
                )
                acc = acc + ev.w[0, 0]
                o = o + (ev.w[0, 0] * 0)
            return acc

        return jax.jit(f)

    def chain_shadow(reps):
        def f(o, d, seg, key):
            acc = jnp.float32(0)
            s2 = jnp.full(N, 2.0, jnp.float32)
            for i in range(reps):
                tr = vol_mod.transmittance(
                    scene, o, d, s2, key + jnp.uint32(i)
                )
                acc = acc + tr[0, 0]
                o = o + (tr[0, 0] * 0)
            return acc

        return jax.jit(f)

    for name, mk in (("track", chain_track), ("shadow_tr", chain_shadow)):
        try:
            t1 = timed(mk(1), o, d, seg, key0)
            t3 = timed(mk(3), o, d, seg, key0)
            per = (t3 - t1) / 2
            print(
                f"{name}: {per*1e3:8.2f} ms/call at {N} lanes "
                f"({per/N*1e9:6.1f} ns/lane)",
                flush=True,
            )
        except Exception as e:
            print(f"{name} failed: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
