"""Probe: component split of the mesh bench (trefoil 720p PTMIS 4spp).

The bench reports ~3.3 Mrays/s end-to-end (~300 ns/traced ray). How much
is closest-hit traversal vs shadow any-hit vs everything else? Times
intersect_scene / occluded on a bench-like primary-ray population (720p
pinhole rays from the bench pose) using in-loop REPS deltas (CLAUDE.md
rule 11 — standalone dispatches carry ~22 ms tunnel overhead). Also
reports live-iteration stats via _COUNT_LIVE on the BLAS walk.

Run: python tools/probe_meshsplit.py
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
from zyg_tpu.scene import trimesh
from zyg_tpu.scene import shapes
from zyg_tpu.scene.loader import (
    MaterialDesc, PropDesc, SceneBuilder, Transformation,
)
import zyg_tpu.scene.types as st

N = 1 << 20


def build_scene():
    b = SceneBuilder()
    grey = b.add_material(MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.5))
    lightm = b.add_material(MaterialDesc(kind=2, emission=np.full(3, 30.0, np.float32)))
    mid = b.add_mesh(trimesh.make_trefoil_mesh(512, 480))
    b.add_mesh_prop(mid, Transformation(scale=np.full(3, 0.35, np.float32)), grey)
    rot_down = np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32)
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(
            position=np.array([0, 4.0, 0], np.float32),
            rotation=rot_down,
            scale=np.array([3.0, 3.0, 1], np.float32),
        ),
        material=lightm,
        is_light=True,
        visible_shadow=False,
    ))
    return b.build()


def camera_rays(n):
    """Pinhole rays matching the bench pose (fov 50, 1280x720)."""
    rng = np.random.RandomState(3)
    px = rng.rand(n).astype(np.float32) * 2 - 1  # ndc x
    py = rng.rand(n).astype(np.float32) * 2 - 1
    tanf = np.tan(np.deg2rad(50) / 2)
    d = np.stack([px * tanf * (1280 / 720), py * tanf, np.ones(n, np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0, 0.8, -5.5]], np.float32), (n, 1))
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


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
    scene = build_scene()
    o, d = camera_rays(N)
    arena = scene.meshes
    print(
        f"arena: node_rows={arena.node_rows.shape} tri_rows={arena.tri_rows.shape}",
        flush=True,
    )

    def chain_closest(reps):
        def f(o, d):
            tmax = jnp.full(N, 1e9, jnp.float32)
            acc = jnp.float32(0)
            for _ in range(reps):
                h = shapes.intersect_scene(scene, o, d, 1e-4, tmax)
                acc = acc + h.t[0]
                tmax = jnp.full(N, 1e9, jnp.float32) + (h.t[0] * 0)
            return acc

        return jax.jit(f)

    def chain_shadow(reps):
        def f(o, d):
            tmax = jnp.full(N, 4.0, jnp.float32)
            acc = jnp.float32(0)
            for _ in range(reps):
                v = shapes.occluded(scene, o, d, 1e-4, tmax)
                acc = acc + v.astype(jnp.float32)[0]
                tmax = tmax + (acc * 0)
            return acc

        return jax.jit(f)

    for name, mk in (("closest", chain_closest), ("shadow", chain_shadow)):
        t1 = timed(mk(1), o, d)
        t3 = timed(mk(3), o, d)
        per = (t3 - t1) / 2
        print(
            f"{name}: {per*1e3:8.2f} ms/call at {N} lanes "
            f"({per/N*1e9:6.1f} ns/ray -> {N/per/1e6:6.2f} Mrays/s)",
            flush=True,
        )

    # iteration statistics on the raw BLAS walk (object space: the bench
    # instance is uniform scale 0.35 at the origin)
    trimesh._COUNT_LIVE = True

    @jax.jit
    def stats(o, d):
        root = jnp.broadcast_to(arena.mesh_root[0], (N,))
        h = trimesh.traverse(
            arena, root, o / 0.35, d, 1e-4, jnp.full(N, 1e9, jnp.float32)
        )
        return h.iters, h.t

    it, t = stats(o, d)
    it = np.asarray(it)
    hitfrac = float(np.asarray((t < 1e8).mean()))
    print(
        f"iters={it[0]} live_node={it[1]} live_leaf={it[2]} "
        f"mean_live/ray={(it[1]+it[2])/N:.1f} (node {it[1]/N:.1f} leaf {it[2]/N:.1f}) "
        f"hit_frac={hitfrac:.3f}",
        flush=True,
    )
    trimesh._COUNT_LIVE = False


if __name__ == "__main__":
    main()
