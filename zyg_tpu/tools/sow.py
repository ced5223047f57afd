"""`sow` — asset baker: scatter instances/particles over meshes.

ref: src/sow/ (particle_generator.zig scatters instances over surfaces by
area-weighted triangle sampling with density/orientation controls, writes
.instancer JSON files and point clouds; model merger/writer).

Usage:
  python -m zyg_tpu.tools.sow scatter --mesh m.obj --count 1000 -o out.instancer
  python -m zyg_tpu.tools.sow points  --mesh m.obj --count 5000 -o cloud.json
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def mesh_area_cdf(positions: np.ndarray, indices: np.ndarray):
    v0 = positions[indices[:, 0]]
    e1 = positions[indices[:, 1]] - v0
    e2 = positions[indices[:, 2]] - v0
    n = np.cross(e1, e2)
    areas = 0.5 * np.linalg.norm(n, axis=-1)
    total = areas.sum()
    cdf = np.cumsum(areas) / max(total, 1e-20)
    normals = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return cdf, normals, total


def scatter_on_mesh(mesh, count: int, seed: int = 0, align_normals: bool = True,
                    scale_range=(0.8, 1.2), random_yaw: bool = True):
    """Area-uniform surface samples -> (positions, rotations[3x3], scales)."""
    rng = np.random.default_rng(seed)
    pos, idx = np.asarray(mesh.positions), np.asarray(mesh.indices)
    cdf, normals, _ = mesh_area_cdf(pos, idx)
    tri = np.searchsorted(cdf, rng.random(count))
    tri = np.clip(tri, 0, len(idx) - 1)
    u = rng.random(count)
    v = rng.random(count)
    swap = u + v > 1.0
    u = np.where(swap, 1.0 - u, u)
    v = np.where(swap, 1.0 - v, v)
    v0 = pos[idx[tri, 0]]
    v1 = pos[idx[tri, 1]]
    v2 = pos[idx[tri, 2]]
    points = v0 + u[:, None] * (v1 - v0) + v[:, None] * (v2 - v0)

    rots = np.tile(np.eye(3, dtype=np.float32), (count, 1, 1))
    if align_normals:
        n = normals[tri]
        # build frames with z... reference aligns instance up (y) to the normal
        up = n
        ref = np.where(np.abs(up[:, 1:2]) < 0.9, np.tile([0.0, 1.0, 0.0], (count, 1)), np.tile([1.0, 0.0, 0.0], (count, 1)))
        x = np.cross(ref, up)
        x /= np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        z = np.cross(x, up)
        rots = np.stack([x, up, z], axis=1).astype(np.float32)
    if random_yaw:
        a = rng.random(count) * 2 * np.pi
        c, s = np.cos(a), np.sin(a)
        yaw = np.zeros((count, 3, 3), np.float32)
        yaw[:, 0, 0] = c
        yaw[:, 0, 2] = s
        yaw[:, 1, 1] = 1
        yaw[:, 2, 0] = -s
        yaw[:, 2, 2] = c
        rots = yaw @ rots
    scales = rng.uniform(scale_range[0], scale_range[1], count).astype(np.float32)
    return points.astype(np.float32), rots, scales


def write_instancer(path: str, prototype: str, points, rots, scales) -> None:
    """zyg-style .instancer JSON: prototype entity + per-instance transforms."""
    from ..core.vecmath import mat3_to_quat  # noqa: F401  (kept numeric below)

    instances = []
    for i in range(len(points)):
        instances.append(
            {
                "position": [float(x) for x in points[i]],
                "rotation_matrix": [float(x) for x in rots[i].ravel()],
                "scale": [float(scales[i])] * 3,
            }
        )
    with open(path, "w") as f:
        json.dump({"prototype": {"shape": {"file": prototype}}, "instances": instances}, f)


def write_point_cloud(path: str, points, radius: float = 0.01) -> None:
    """Reference-format point-list geometry (ref shape_provider.zig
    loadGeometry primitive_topology == point_list; renderable by the
    Points shape)."""
    with open(path, "w") as f:
        json.dump(
            {
                "geometry": {
                    "primitive_topology": "point_list",
                    "point_radius": radius,
                    "positions": [float(x) for x in np.asarray(points).ravel()],
                }
            },
            f,
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sow", description="asset baker")
    p.add_argument("mode", choices=["scatter", "points"])
    p.add_argument("--mesh", required=True)
    p.add_argument("--prototype", default="proc:sphere")
    p.add_argument("--count", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--radius", type=float, default=0.01)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args(argv)

    from ..io.mesh import load_mesh_file

    mesh = load_mesh_file(args.mesh)
    if mesh is None:
        raise SystemExit(f"sow: cannot load mesh {args.mesh}")

    points, rots, scales = scatter_on_mesh(mesh, args.count, args.seed)
    if args.mode == "scatter":
        write_instancer(args.output, args.prototype, points, rots, scales)
    else:
        write_point_cloud(args.output, points, args.radius)
    print(f"sow: wrote {args.count} {'instances' if args.mode == 'scatter' else 'points'} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
