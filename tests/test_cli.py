"""CLI end-to-end: multi-frame rendering with a '#' volume sequence
(ref cli/main.zig per-frame loop + resource/cache.zig:131 frame keys)."""

import json
import os

import numpy as np


def test_multiframe_volume_sequence(tmp_path):
    from zyg_tpu import cli
    from zyg_tpu.io import resource

    # frame 1: thin smoke; frame 2: dense smoke — outputs must differ
    for f, val in ((1, 0.05), (2, 3.0)):
        np.save(tmp_path / f"seq_{f:04d}.npy", np.full((4, 4, 4), val, np.float32))
    scene = {
        "materials": [
            {
                "name": "vol",
                "rendering": {
                    "Volumetric": {
                        "density_map": {"file": "seq_####.npy"},
                        "attenuation_color": [0.2, 0.2, 0.2],
                        "subsurface_color": [0.0, 0.0, 0.0],
                        "attenuation_distance": 0.4,
                    }
                },
            },
            {"name": "env", "rendering": {"Light": {"emittance": {"value": 1.0}}}},
        ],
        "entities": [
            {"type": "Prop", "shape": {"type": "Cube"}, "materials": ["vol"]},
            {"type": "Light", "shape": {"type": "Dome"}, "materials": ["env"]},
        ],
    }
    (tmp_path / "scene.json").write_text(json.dumps(scene))
    take = {
        "scene": "scene.json",
        "camera": {
            "Perspective": {
                "parameters": {"fov": 30},
                "transformation": {"position": [0, 0, -4.0]},
                "resolution": [16, 16],
            }
        },
        "sampler": {"Sobol": {"samples_per_pixel": 8}},
        "integrator": {"surface": {"PTMIS": {"depth": {"surface": 8}}}},
    }
    (tmp_path / "t.take").write_text(json.dumps(take))
    out = tmp_path / "out.png"
    try:
        rc = cli.main(
            ["-i", str(tmp_path / "t.take"), "-o", str(out), "-f", "1", "-n", "2"]
        )
    finally:
        resource.set_frame(0)
    assert rc == 0
    from zyg_tpu.io.png import read_png

    f1 = read_png(str(tmp_path / "out_000001.png")).astype(np.float32)
    f2 = read_png(str(tmp_path / "out_000002.png")).astype(np.float32)
    # dense smoke darkens the cube region substantially vs thin smoke
    assert abs(f1.mean() - f2.mean()) > 2.0, (f1.mean(), f2.mean())
