"""Compiled-HLO traffic audit of the MESH bench render fn.

Same method as tools/audit_hlo.py (rule 13) but for the in-code bench
trefoil scene, and reporting EVERY while-body region ranked by total
fusion output bytes — the mesh program runs many nested while loops
(wavefront body + one per traversal-cascade stage), so "the body with
the most fusions" alone misleads.

Usage: python tools/probe_meshhlo.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zyg_tpu  # noqa: F401
import jax.numpy as jnp
import numpy as np

from tools.audit_hlo import shape_bytes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
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
    fn = driver._render_fn(driver.chunk_size, max(2, driver.chunk_size // 2))
    args = (scene, driver.camera.arrays(0), driver._fb, driver._pixel_xy,
            driver._pixel_ids, jnp.int32(0))
    txt = fn.lower(*args, photon_map=None).compile().as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)

    comps, cur = {}, None
    for line in txt.splitlines():
        m = re.match(r'^(?:ENTRY )?%?([\w.-]+)(?:\.\d+)? \(', line)
        if m and line.rstrip().endswith("{"):
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line)

    def fusions(n):
        out = []
        for l in comps.get(n, []):
            if " fusion(" in l:
                outshape = l.split("=")[1].strip().split(" fusion(")[0]
                nm = re.search(r'calls=%?([\w.-]+)', l)
                out.append((shape_bytes(outshape), outshape[:52],
                            nm.group(1) if nm else "?"))
        return out

    totals = []
    for n in comps:
        if "region" not in n:
            continue
        fus = fusions(n)
        tot = sum(f[0] for f in fus)
        # also count non-fusion ops with big outputs (gather/scatter/sort)
        big = []
        for l in comps[n]:
            for op in (" gather(", " scatter(", " sort(", " while("):
                if op in l:
                    outshape = l.split("=")[1].strip().split(op)[0]
                    big.append((shape_bytes(outshape), op.strip("( "), outshape[:40]))
        totals.append((tot, n, len(fus), fus, big))
    totals.sort(reverse=True)
    for tot, n, k, fus, big in totals[:8]:
        print(f"\n== {n}: {k} fusions, {tot/1e6:.0f} MB fusion output")
        for bts, s, nm in sorted(fus, reverse=True)[:10]:
            print(f"  {bts/1e6:8.2f}MB  {s:52s} {nm[:36]}")
        for bts, op, s in sorted(big, reverse=True)[:6]:
            print(f"  {bts/1e6:8.2f}MB  [{op}] {s}")


if __name__ == "__main__":
    main()
