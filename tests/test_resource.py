"""Resource cache: variant keys, per-frame sequences, BLAS reuse.

ref: src/core/resource/cache.zig:86 (variant-keyed entries),
cache.zig:131 (frame-dependent reload)."""

import json
import os

import numpy as np

from zyg_tpu.io import resource


def test_variant_keys_coexist():
    rc = resource.ResourceCache()
    a = rc.get_or_load("thing", "name", (1,), lambda n: {"v": 1})
    b = rc.get_or_load("thing", "name", (2,), lambda n: {"v": 2})
    assert a["v"] == 1 and b["v"] == 2
    # same key returns the cached object, loader not re-run
    c = rc.get_or_load("thing", "name", (1,), lambda n: {"v": 99})
    assert c is a


def test_failed_loads_not_cached():
    rc = resource.ResourceCache()
    calls = []

    def loader(n):
        calls.append(n)
        return None if len(calls) == 1 else "ok"

    assert rc.get_or_load("x", "n", (), loader) is None
    assert rc.get_or_load("x", "n", (), loader) == "ok"
    assert len(calls) == 2


def test_frame_sequence_resolution(tmp_path):
    rc = resource.ResourceCache()
    loads = []

    def loader(resolved):
        loads.append(resolved)
        return resolved

    try:
        resource.set_frame(3)
        assert rc.get_or_load("grid", "smoke_####.npy", (), loader) == "smoke_0003.npy"
        resource.set_frame(4)
        assert rc.get_or_load("grid", "smoke_####.npy", (), loader) == "smoke_0004.npy"
        # static names resolve identically across frames -> single load
        rc.get_or_load("grid", "static.npy", (), loader)
        resource.set_frame(5)
        rc.get_or_load("grid", "static.npy", (), loader)
        assert loads == ["smoke_0003.npy", "smoke_0004.npy", "static.npy"]
    finally:
        resource.set_frame(0)


def test_scene_volume_sequence_reloads(tmp_path):
    """A scene whose density grid names a '#' sequence gets a different
    grid per frame; the scene JSON itself is reloaded per frame by the
    CLI loop (ref cli/main.zig)."""
    from zyg_tpu.scene.loader import load_scene_file

    for f, val in ((1, 0.25), (2, 0.75)):
        np.save(tmp_path / f"seq_{f:04d}.npy", np.full((4, 4, 4), val, np.float32))
    scene_json = {
        "materials": [
            {
                "name": "vol",
                "rendering": {
                    "Volumetric": {
                        "density_map": {"file": "seq_####.npy"},
                        "scattering": [0.5, 0.5, 0.5],
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
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene_json))
    try:
        resource.set_frame(1)
        s1 = load_scene_file(str(p))
        resource.set_frame(2)
        s2 = load_scene_file(str(p))
    finally:
        resource.set_frame(0)
    g1 = np.asarray(s1.grids.data).max()
    g2 = np.asarray(s2.grids.data).max()
    assert abs(g1 - 0.25) < 1e-6 and abs(g2 - 0.75) < 1e-6


def test_named_mesh_blas_cached_across_builders():
    from zyg_tpu.scene import trimesh
    from zyg_tpu.scene.loader import MaterialDesc, SceneBuilder, Transformation

    mesh = trimesh.make_trefoil_mesh(24, 12)
    futs = []
    for _ in range(2):
        b = SceneBuilder()
        m = b.add_material(MaterialDesc(color=np.full(3, 0.5, np.float32)))
        mid = b.add_mesh(mesh, name="trefoil-test-blas")
        b.add_mesh_prop(mid, Transformation(), m)
        futs.append(b._mesh_builds[-1])
        b.build()
    assert futs[0] is futs[1]  # second builder reused the cached build
    # a DIFFERENT mesh under the same name misses (content fingerprint)
    b = SceneBuilder()
    b.add_mesh(trimesh.make_trefoil_mesh(16, 8), name="trefoil-test-blas")
    assert b._mesh_builds[-1] is not futs[0]
