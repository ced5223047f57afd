"""Benchmark: Cornell 1080p PTMIS (primary) + dragon-class mesh scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 150 (the BASELINE.md north-star Mrays/sec/chip).
Extra keys report the mesh-scene case (trefoil knot, ~500k tris) — the BVH
path number the Cornell figure alone would hide.
Measures steady-state (post-compile) rays/sec including all bounce segments.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

NORTH_STAR_MRAYS = 150.0


def bench_cornell():
    import jax

    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file
    from zyg_tpu.render.driver import Driver

    take = load_take_file(os.path.join(REPO, "examples/takes/cornell_ptmis.take"))
    take.cameras[0].resolution = (1920, 1080)
    take.num_samples_per_pixel = 16
    scene = load_scene_file(take.scene_filename)
    driver = Driver(take=take, scene=scene)

    # warmup: compile + one chunk
    driver.start_frame()
    driver.render_iterations(driver.chunk_size)
    jax.block_until_ready(driver._fb)

    # best-of-3: single timed runs over the axon tunnel stall erratically
    # (15-200s observed for a binary that then runs in 3s)
    best = float("inf")
    for _ in range(3):
        driver.start_frame()
        t0 = time.perf_counter()
        driver.render_iterations(take.num_samples_per_pixel)
        jax.block_until_ready(driver._fb)
        best = min(best, time.perf_counter() - t0)
    return driver.rays_traced / best / 1e6


def bench_mesh():
    """Dragon-class mesh (trefoil knot, ~500k tris) + area light + dome,
    720p PTMIS 4spp — the full TLAS->BLAS traversal path."""
    import jax
    import numpy as np

    from zyg_tpu.io.take import Take, IntegratorSettings
    from zyg_tpu.render.camera import PerspectiveCamera
    from zyg_tpu.render.driver import Driver
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.loader import (
        MaterialDesc, PropDesc, SceneBuilder, Transformation,
    )
    import zyg_tpu.scene.types as st

    b = SceneBuilder()
    grey = b.add_material(MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.5))
    lightm = b.add_material(MaterialDesc(kind=2, emission=np.full(3, 30.0, np.float32)))
    mid = b.add_mesh(trimesh.make_trefoil_mesh(512, 480))  # ~491k tris
    b.add_mesh_prop(
        mid,
        Transformation(scale=np.full(3, 0.35, np.float32)),
        grey,
    )
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
    scene = b.build()

    take = Take()
    take.num_samples_per_pixel = 4
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=4)
    cam = PerspectiveCamera(resolution=(1280, 720), fov=np.deg2rad(50))
    cam.position = np.array([0, 0.8, -5.5], np.float32)
    take.cameras = [cam]
    driver = Driver(take=take, scene=scene)

    driver.start_frame()
    driver.render_iterations(driver.chunk_size)
    jax.block_until_ready(driver._fb)

    best = float("inf")
    for _ in range(3):
        driver.start_frame()
        t0 = time.perf_counter()
        driver.render_iterations(take.num_samples_per_pixel)
        jax.block_until_ready(driver._fb)
        best = min(best, time.perf_counter() - t0)
    return driver.rays_traced / best / 1e6


def bench_volume():
    """BASELINE config 4: heterogeneous smoke volume (smoke.take), 8spp
    steady state — the delta-tracking + residual-ratio path."""
    import jax

    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file
    from zyg_tpu.render.driver import Driver

    take = load_take_file(os.path.join(REPO, "examples/takes/smoke.take"))
    scene = load_scene_file(take.scene_filename)
    driver = Driver(take=take, scene=scene)
    driver.start_frame()
    driver.render_iterations(driver.chunk_size)
    jax.block_until_ready(driver._fb)
    best = float("inf")
    for _ in range(3):
        driver.start_frame()
        t0 = time.perf_counter()
        driver.render_iterations(8)
        jax.block_until_ready(driver._fb)
        best = min(best, time.perf_counter() - t0)
    return driver.rays_traced / best / 1e6


def main() -> None:
    mrays = bench_cornell()
    try:
        mesh_mrays = round(bench_mesh(), 3)
    except Exception:
        mesh_mrays = None
    try:
        vol_mrays = round(bench_volume(), 3)
    except Exception:
        vol_mrays = None
    print(
        json.dumps(
            {
                "metric": "cornell_1080p_ptmis_mrays_per_sec_chip",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
                "mesh_trefoil_720p_mrays": mesh_mrays,
                "volume_smoke_mrays": vol_mrays,
            }
        )
    )


if __name__ == "__main__":
    main()
