"""Probe: smoke-bench throughput vs supergrid cell size (+ empty skipping).

SUPER_CELL=8 on the 64^3 smoke grid gives an 8^3 supergrid: 20% empty
cells, free_r all zero (nothing skippable), loose majorants (halo'd 10^3
windows). Finer cells tighten majorants (fewer null collisions) and open
skippable runs; they also add cell hops. Measure, don't guess.

Run: python tools/probe_volume.py [super_cell ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def bench_smoke():
    import jax
    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file
    from zyg_tpu.render.driver import Driver

    take = load_take_file(os.path.join(REPO, "examples/takes/smoke.take"))
    scene = load_scene_file(take.scene_filename)
    sd = np.asarray(scene.grids.sdata)
    print(
        f"  cells={sd.shape[0]} empty={float((sd[:,0]<=1e-9).mean()):.3f} "
        f"mean_free_r={float(sd[sd[:,0]<=1e-9,2].mean()) if (sd[:,0]<=1e-9).any() else 0:.2f} "
        f"mean_maj={float(sd[:,0].mean()):.3f}",
        flush=True,
    )
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
    img = driver.resolve()
    return driver.rays_traced / best / 1e6, float(img.mean())


def main():
    from zyg_tpu.scene import grids

    cells = [int(x) for x in sys.argv[1:]] or [8, 4, 2]
    for sc in cells:
        grids.SUPER_CELL = sc
        print(f"SUPER_CELL={sc}", flush=True)
        mrays, mean = bench_smoke()
        print(f"  -> {mrays:.3f} Mrays/s  img_mean={mean:.5f}", flush=True)


if __name__ == "__main__":
    main()
