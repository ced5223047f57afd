"""Golden-image regression configs: BASELINE.md configs 1-4 at CI scale.

Stands in for the unverifiable 2-sigma-vs-Zig acceptance (BASELINE.md
north star): no Zig toolchain exists in this environment, so these lock
TODAY'S verified estimator output in place — any regression in the
estimators (MIS weights, BSDF sampling, tracking, traversal) shifts the
fixed-seed renders and fails the gate loudly. Regenerate with
`python tools/generate_goldens.py` ONLY alongside a reviewed estimator
change, and say why in the commit.
"""

from __future__ import annotations

import os

import numpy as np

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _take_file(name, res, spp, depth=None):
    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file

    take = load_take_file(os.path.join(EXAMPLES, "takes", name))
    take.cameras[0].resolution = res
    take.num_samples_per_pixel = spp
    if depth is not None:
        take.integrator.max_depth_surface = depth
    scene = load_scene_file(take.scene_filename)
    return take, scene


def cornell_pt():
    """BASELINE config 1: Cornell box, PT, diffuse-only."""
    return _take_file("cornell.take", (64, 64), 24, depth=6)


def material_spheres():
    """BASELINE config 2: substitute/glass/metal spheres, PTMIS + NEE."""
    return _take_file("material_test.take", (64, 48), 12, depth=6)


def mesh_trefoil():
    """BASELINE config 3 (CI-scale): ~30k-tri trefoil, full BVH path."""
    from zyg_tpu.io.take import Take, IntegratorSettings
    from zyg_tpu.render.camera import PerspectiveCamera
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.loader import (
        MaterialDesc, PropDesc, SceneBuilder, Transformation,
    )
    import zyg_tpu.scene.types as st

    b = SceneBuilder()
    grey = b.add_material(
        MaterialDesc(color=np.full(3, 0.6, np.float32), roughness=0.5)
    )
    lightm = b.add_material(
        MaterialDesc(kind=2, emission=np.full(3, 30.0, np.float32))
    )
    mid = b.add_mesh(trimesh.make_trefoil_mesh(128, 120))
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
    cam = PerspectiveCamera(resolution=(64, 64), fov=np.deg2rad(50))
    cam.position = np.array([0, 0.8, -5.5], np.float32)
    take.cameras = [cam]
    return take, scene


def volume_smoke():
    """BASELINE config 4: heterogeneous smoke, volumetric PT."""
    return _take_file("smoke.take", (64, 36), 8)


CONFIGS = {
    "cornell_pt": cornell_pt,
    "material_spheres": material_spheres,
    "mesh_trefoil": mesh_trefoil,
    "volume_smoke": volume_smoke,
}


def render_config(name):
    from zyg_tpu.render.driver import Driver

    take, scene = CONFIGS[name]()
    d = Driver(take=take, scene=scene, use_mesh=False)
    return d.render_frame()


def golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.exr")
