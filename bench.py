"""Benchmark: Cornell box (BASELINE.json config 1 style) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 150 (the BASELINE.md north-star Mrays/sec/chip).
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


def main() -> None:
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

    # timed run
    driver.start_frame()
    t0 = time.perf_counter()
    driver.render_iterations(take.num_samples_per_pixel)
    jax.block_until_ready(driver._fb)
    dt = time.perf_counter() - t0

    mrays = driver.rays_traced / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell_1080p_ptmis_mrays_per_sec_chip",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
