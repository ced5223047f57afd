"""Probe: wavefront-iteration accounting of the mesh bench.

Runs the EXACT bench_mesh dispatch (720p, 4spp, full-frame persistent
wavefront) and reports wall time, wavefront iterations, rays traced, and
the derived ms/iteration at 921k lanes — the number to compare against
the standalone traversal cascades (probe_meshsplit) to see how much of
the 454 ns/ray end-to-end cost is traversal vs body.

Run: python tools/probe_meshbench.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

import bench


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    import zyg_tpu.render.driver as drv
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
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(
            f"run: {dt*1000:8.1f} ms  wf_iters={driver.last_iterations} "
            f"rays={driver.rays_traced} "
            f"-> {driver.rays_traced/dt/1e6:6.3f} Mrays/s",
            flush=True,
        )
    n_lanes = 1280 * 720
    it = driver.last_iterations
    print(
        f"best {best*1000:.1f} ms, {it} iters "
        f"-> {best/max(it,1)*1000:6.2f} ms/iter at {n_lanes} lanes "
        f"({best/max(it,1)/n_lanes*1e9:5.1f} ns/lane-iter)",
        flush=True,
    )


if __name__ == "__main__":
    main()
