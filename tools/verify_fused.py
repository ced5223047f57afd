"""TPU-side statistical pin: fused Pallas bounce vs the general XLA body.

The CPU golden gate (tests/test_goldens.py) renders the XLA body only, and
tests/test_shade_kernel.py compares the kernels through the Mosaic
INTERPRETER — neither pins what the compiled Mosaic kernel actually
produces on hardware. This script renders the same scene twice on the
attached TPU — once with the fused bounce (ops/shade.py), once with
ZYG_TPU_NO_PALLAS forcing the general XLA body — and asserts the images
agree statistically (identical seeds: per-pixel differences come only from
the kernel's acos polynomial + f32 reassociation, which can chaotically
flip a small minority of MC paths but must not move the estimate).

Run: python tools/verify_fused.py          (exit 1 on violation)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _render(take, scene, no_pallas: bool) -> np.ndarray:
    from zyg_tpu.render.driver import Driver

    if no_pallas:
        os.environ["ZYG_TPU_NO_PALLAS"] = "1"
    else:
        os.environ.pop("ZYG_TPU_NO_PALLAS", None)
    try:
        d = Driver(take=take, scene=scene)
        return np.asarray(d.render_frame())
    finally:
        os.environ.pop("ZYG_TPU_NO_PALLAS", None)


def _cornell_case():
    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file

    def mk():
        take = load_take_file(os.path.join(REPO, "examples/takes/cornell_ptmis.take"))
        take.cameras[0].resolution = (192, 192)
        take.num_samples_per_pixel = 8
        return take, load_scene_file(take.scene_filename)

    return mk


def _mesh_case():
    """Small version of the bench trefoil (full-bounce hybrid kernel)."""
    from zyg_tpu.io.take import Take, IntegratorSettings
    from zyg_tpu.render.camera import PerspectiveCamera
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.loader import (
        MaterialDesc, PropDesc, SceneBuilder, Transformation,
    )
    import zyg_tpu.scene.types as st

    def mk():
        b = SceneBuilder()
        grey = b.add_material(
            MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.5)
        )
        lightm = b.add_material(
            MaterialDesc(kind=2, emission=np.full(3, 30.0, np.float32))
        )
        mid = b.add_mesh(trimesh.make_trefoil_mesh(128, 96))
        b.add_mesh_prop(
            mid, Transformation(scale=np.full(3, 0.35, np.float32)), grey
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
        take.num_samples_per_pixel = 8
        take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=4)
        cam = PerspectiveCamera(resolution=(192, 108), fov=np.deg2rad(50))
        cam.position = np.array([0, 0.8, -5.5], np.float32)
        take.cameras = [cam]
        return take, scene

    return mk


def run_case(name: str, mk) -> dict:
    take, scene = mk()
    img_f = _render(take, scene, no_pallas=False)
    take, scene = mk()  # fresh objects: jit caches key on scene identity
    img_x = _render(take, scene, no_pallas=True)
    mean_f = float(img_f.mean())
    mean_x = float(img_x.mean())
    rel_mean = abs(mean_f - mean_x) / max(mean_x, 1e-9)
    rmse = float(np.sqrt(np.mean((img_f - img_x) ** 2)))
    # fraction of pixels that differ visibly (chaotic path flips)
    frac_off = float(np.mean(np.abs(img_f - img_x).max(-1) > 0.05))
    ok = rel_mean < 0.005 and frac_off < 0.02
    return {
        "case": name, "mean_fused": round(mean_f, 6), "mean_xla": round(mean_x, 6),
        "rel_mean_diff": round(rel_mean, 6), "rmse": round(rmse, 6),
        "frac_pixels_off": round(frac_off, 6), "ok": ok,
    }


def main() -> int:
    import jax

    results = []
    if jax.default_backend() == "cpu":
        print(json.dumps({"skipped": "cpu backend — fused path is TPU-only"}))
        return 0
    for name, mk in (("cornell", _cornell_case()), ("mesh", _mesh_case())):
        results.append(run_case(name, mk))
        print(json.dumps(results[-1]), flush=True)
    return 0 if all(r["ok"] for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
