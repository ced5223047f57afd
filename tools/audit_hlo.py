"""Compiled-HLO traffic audit: where does a wavefront iteration's time go?

Compiles the Cornell persistent render fn for the attached TPU, finds the
while-body computation with the most fusions (the persistent wavefront
body), and ranks its fusion kernels by OUTPUT bytes — a direct map of the
HBM traffic XLA materializes per iteration (CLAUDE.md rule 13).

Round-4 findings from this tool: 211 fusions / 3.4 GB out per iteration;
the [6,N] analytic-intersection block (500 MB) became ops/isect.py and
the ~8-fusion Sobol chain (~300 MB) became ops/sobol_block.py; together
Cornell 105 -> ~120 Mrays/s.

Usage: python tools/audit_hlo.py [take-file] [width height spp]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zyg_tpu  # noqa: F401
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DT = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "bf16": 2,
       "u8": 1, "s8": 1, "u16": 2, "s16": 2}


def shape_bytes(s: str) -> int:
    total = 0
    for m in re.finditer(r'(f32|s32|u32|pred|f16|bf16|u8|s8|u16|s16)\[([\d,]*)\]', s):
        dt, dims = m.groups()
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DT[dt]
    return total


def main():
    take_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "examples/takes/cornell_ptmis.take")
    w, h, spp = (int(x) for x in sys.argv[2:5]) if len(sys.argv) > 4 else (1920, 1080, 16)

    from zyg_tpu.io.take import load_take_file
    from zyg_tpu.scene.loader import load_scene_file
    from zyg_tpu.render.driver import Driver

    take = load_take_file(take_path)
    take.cameras[0].resolution = (w, h)
    take.num_samples_per_pixel = spp
    scene = load_scene_file(take.scene_filename)
    driver = Driver(take=take, scene=scene)
    fn = driver._render_fn(driver.chunk_size, 0)
    args = (scene, driver.camera.arrays(0), driver._fb, driver._pixel_xy,
            driver._pixel_ids, jnp.int32(0))
    txt = fn.lower(*args, photon_map=None).compile().as_text()

    # split into computations
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

    def nfus(n):
        return sum(1 for l in comps.get(n, []) if " fusion(" in l)

    cand = sorted(((nfus(n), n) for n in comps if "region" in n), reverse=True)
    if not cand or cand[0][0] == 0:
        print("no while-body region with fusions found")
        return
    name = cand[0][1]
    fus = []
    for l in comps[name]:
        if " fusion(" in l:
            outshape = l.split("=")[1].strip().split(" fusion(")[0]
            nm = re.search(r'calls=%?([\w.-]+)', l)
            fus.append((shape_bytes(outshape), outshape[:56],
                        nm.group(1) if nm else "?"))
    fus.sort(reverse=True)
    print(f"main body {name}")
    print(f"{len(fus)} fusions, total OUTPUT {sum(f[0] for f in fus)/1e6:.0f} MB per iteration")
    for b, s, n in fus[:25]:
        print(f"{b/1e6:8.2f}MB  {s:56s} {n[:40]}")
    print("\nother loop bodies by fusion count:", cand[1:5])


if __name__ == "__main__":
    main()
