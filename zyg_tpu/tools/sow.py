"""`sow` — asset baker: scatter instances/particles over meshes.

ref: src/sow/ — main.zig scatter() (grid of probe rays along a world
axis, density-driven cell size, acceptance by a density map, prototype
distribution with per-prototype scale/incline/position jitter, optional
align-to-normal and depth offset), particle_generator.zig (ballistic
particle sims), triangle_motion_merger.zig (per-frame meshes -> one
multi-frame vertex buffer), model_sub_writer.zig (SUB model output).

Divergences: the reference scatters over a full composed SCENE and takes
the acceptance probability from the hit material's albedo; this tool
scatters over a mesh and takes an explicit grayscale density image (the
same control knob without dragging the material system into a baker).

Usage:
  python -m zyg_tpu.tools.sow scatter --mesh m.obj --count 1000 -o out.instancer
  python -m zyg_tpu.tools.sow grid    --mesh terrain.obj --density 2 -o out.instancer
  python -m zyg_tpu.tools.sow points  --mesh m.obj --count 5000 -o cloud.json
  python -m zyg_tpu.tools.sow project proj.json -o out.instancer
  python -m zyg_tpu.tools.sow merge-motion f0.obj f1.obj f2.obj -o anim.sub
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

UP_AXES = {
    "XPos": (0, (2, 1)), "XNeg": (0, (2, 1)),
    "YPos": (1, (0, 2)), "YNeg": (1, (0, 2)),
    "ZPos": (2, (0, 1)), "ZNeg": (2, (0, 1)),
}


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


def raycast_mesh(positions, indices, origins, dirs, chunk=512):
    """Batched Möller-Trumbore closest hit. origins/dirs [N,3] ->
    (t [N], tri [N], hit [N]). Host numpy; fine at baker scale."""
    pos = np.asarray(positions, np.float64)
    idx = np.asarray(indices, np.int64)
    v0 = pos[idx[:, 0]]
    e1 = pos[idx[:, 1]] - v0
    e2 = pos[idx[:, 2]] - v0
    n = len(origins)
    t_out = np.full(n, np.inf)
    tri_out = np.full(n, -1, np.int64)
    for s in range(0, n, chunk):
        o = np.asarray(origins[s : s + chunk], np.float64)[:, None, :]
        d = np.asarray(dirs[s : s + chunk], np.float64)[:, None, :]
        p = np.cross(d, e2[None])
        det = np.sum(p * e1[None], axis=-1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
        tv = o - v0[None]
        u = np.sum(tv * p, axis=-1) * inv
        q = np.cross(tv, e1[None])
        v = np.sum(q * d, axis=-1) * inv
        t = np.sum(q * e2[None], axis=-1) * inv
        ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
        t = np.where(ok, t, np.inf)
        best = np.argmin(t, axis=-1)
        rows = np.arange(len(best))
        tb = t[rows, best]
        t_out[s : s + chunk] = tb
        tri_out[s : s + chunk] = np.where(np.isfinite(tb), idx_of(best), -1)
    return t_out, tri_out, np.isfinite(t_out)


def idx_of(best):
    return best


def _rot_align_y(up: np.ndarray):
    """[N,3,3] rotations aligning local +Y to `up` (rows-as-axes)."""
    n = len(up)
    ref = np.where(
        np.abs(up[:, 1:2]) < 0.9,
        np.tile([0.0, 1.0, 0.0], (n, 1)),
        np.tile([1.0, 0.0, 0.0], (n, 1)),
    )
    x = np.cross(ref, up)
    x /= np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    z = np.cross(x, up)
    return np.stack([x, up, z], axis=1).astype(np.float32)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    n = len(a)
    r = np.zeros((n, 3, 3), np.float32)
    r[:, 0, 0] = c
    r[:, 0, 2] = s
    r[:, 1, 1] = 1
    r[:, 2, 0] = -s
    r[:, 2, 2] = c
    return r


def _rot_axis(a, axis):
    c, s = np.cos(a), np.sin(a)
    n = len(a)
    r = np.zeros((n, 3, 3), np.float32)
    i, j, k = {(0): (1, 2, 0), (2): (0, 1, 2)}[axis]
    r[:, k, k] = 1
    r[:, i, i] = c
    r[:, i, j] = -s
    r[:, j, i] = s
    r[:, j, j] = c
    return r


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
        rots = _rot_align_y(normals[tri])
    if random_yaw:
        rots = _rot_y(rng.random(count) * 2 * np.pi) @ rots
    scales = rng.uniform(scale_range[0], scale_range[1], count).astype(np.float32)
    return points.astype(np.float32), rots, scales


def scatter_grid(
    mesh,
    density: float = 1.0,
    up: str = "YPos",
    seed: int = 0,
    prototypes=None,
    align_to_normal: bool = True,
    depth_offset_range=(0.0, 0.0),
    density_image: np.ndarray | None = None,
    prototype_extent: float = 1.0,
):
    """Reference-style grid scatter (ref sow/main.zig scatter()): one
    jittered probe ray per grid cell along the world `up` axis; cell size
    = prototype extent / density; acceptance by the density image sampled
    at the hit's footprint uv. Returns (points, rots, scales, proto_ids).
    """
    axis, (a0, a1) = UP_AXES[up]
    sign = -1.0 if up.endswith("Pos") else 1.0
    pos, idx = np.asarray(mesh.positions), np.asarray(mesh.indices)
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    ext0, ext1 = hi[a0] - lo[a0], hi[a1] - lo[a1]

    protos = prototypes or [dict()]
    p_prob = np.asarray([float(p.get("probability", 1.0)) for p in protos])
    p_prob = p_prob / p_prob.sum()

    cell = max(prototype_extent / max(density, 1e-6), 1e-6)
    g0 = max(int(np.ceil(ext0 / cell)), 1)
    g1 = max(int(np.ceil(ext1 / cell)), 1)
    rng = np.random.default_rng(seed)
    n = g0 * g1
    gx, gy = np.meshgrid(np.arange(g0), np.arange(g1), indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()

    proto_ids = rng.choice(len(protos), size=n, p=p_prob)
    pj = np.stack(
        [
            np.asarray(protos[i].get("position_jitter", (1.0, 1.0)), np.float64)
            for i in proto_ids
        ]
    )
    jit = (rng.random((n, 2)) * 2.0 - 1.0) * 0.5 * pj
    x = lo[a0] + (gx + 0.5 + jit[:, 0]) * (ext0 / g0)
    y = lo[a1] + (gy + 0.5 + jit[:, 1]) * (ext1 / g1)

    origins = np.zeros((n, 3))
    origins[:, a0] = x
    origins[:, a1] = y
    origins[:, axis] = (hi[axis] + 1.0) if sign < 0 else (lo[axis] - 1.0)
    dirs = np.zeros((n, 3))
    dirs[:, axis] = sign

    t, tri, hit = raycast_mesh(pos, idx, origins, dirs)
    # acceptance by the density map at the footprint uv
    if density_image is not None:
        img = np.asarray(density_image, np.float64)
        if img.ndim == 3:
            img = img[..., :3].mean(axis=-1)
        h, w = img.shape
        uu = np.clip(((x - lo[a0]) / max(ext0, 1e-9) * w).astype(int), 0, w - 1)
        vv = np.clip(((y - lo[a1]) / max(ext1, 1e-9) * h).astype(int), 0, h - 1)
        hit = hit & (rng.random(n) < img[vv, uu])

    keep = np.flatnonzero(hit)
    t, tri, proto_ids = t[keep], tri[keep], proto_ids[keep]
    points = origins[keep] + t[:, None] * dirs[keep]
    m = len(keep)

    _, face_n, _ = mesh_area_cdf(pos, idx)
    nrm = face_n[tri]
    up_v = nrm if align_to_normal else np.tile(
        np.eye(3)[axis] * -sign, (m, 1)
    )
    basis = _rot_align_y(up_v)
    yaw = _rot_y(rng.random(m) * 2 * np.pi)
    inc = np.stack(
        [
            np.asarray(protos[i].get("incline_jitter", (0.0, 0.0)), np.float64)
            for i in proto_ids
        ]
    )
    ix = _rot_axis(np.pi * inc[:, 0] * (rng.random(m) * 2 - 1), 0)
    iz = _rot_axis(np.pi * inc[:, 1] * (rng.random(m) * 2 - 1), 2)
    rots = (ix @ iz @ yaw @ basis).astype(np.float32)

    sr = np.stack(
        [
            np.asarray(protos[i].get("scale_range", (0.8, 1.2)), np.float64)
            for i in proto_ids
        ]
    )
    scales = (sr[:, 0] + rng.random(m) * (sr[:, 1] - sr[:, 0])).astype(np.float32)
    d_off = depth_offset_range[0] + rng.random(m) * (
        depth_offset_range[1] - depth_offset_range[0]
    )
    points = points + d_off[:, None] * up_v
    return points.astype(np.float32), rots, scales, proto_ids


def write_instancer(path: str, prototypes, points, rots, scales, proto_ids=None):
    """zyg-style .instancer JSON: prototype entities + per-instance
    transforms (+ prototype index when several prototypes scatter)."""
    if isinstance(prototypes, str):
        prototypes = [prototypes]
    instances = []
    for i in range(len(points)):
        inst = {
            "position": [float(x) for x in points[i]],
            "rotation_matrix": [float(x) for x in rots[i].ravel()],
            "scale": [float(scales[i])] * 3,
        }
        if proto_ids is not None:
            inst["prototype"] = int(proto_ids[i])
        instances.append(inst)
    protos = [{"shape": {"file": p}} for p in prototypes]
    doc = {"prototype": protos[0], "instances": instances}
    if len(protos) > 1:
        doc["prototypes"] = protos
    with open(path, "w") as f:
        json.dump(doc, f)


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


# ---------------------------------------------------------------------------
# ballistic particle generators (ref sow/particle/particle_generator.zig)
# ---------------------------------------------------------------------------

_PARTICLE_FPS = 120


def _sphere_uniform(rng, n):
    z = 1.0 - 2.0 * rng.random(n)
    phi = 2.0 * np.pi * rng.random(n)
    s = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], -1).astype(np.float32)


def _cone_uniform(rng, n, cos_max: float):
    """Uniform directions in a cone around +Y (ref smpl.coneUniform)."""
    z = 1.0 - rng.random(n) * (1.0 - cos_max)
    phi = 2.0 * np.pi * rng.random(n)
    s = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    # reference cones open around +y for the spark fountain
    return np.stack([s * np.cos(phi), z, s * np.sin(phi)], -1).astype(np.float32)


def simulate_burst(count: int, frames: int, seed: int = 0):
    """Radial burst: particles leave a small sphere at 2 m/s and fly under
    gravity with unit linear drag (ref particle_generator.zig generate/
    simulate). Returns positions [F,N,3]; radius is constant."""
    rng = np.random.default_rng(seed)
    s = _sphere_uniform(rng, count)
    pos = np.empty((frames, count, 3), np.float32)
    pos[0] = s * 0.01
    vel = s * 2.0
    step = 1.0 / _PARTICLE_FPS
    g = np.array([0.0, -9.8, 0.0], np.float32)
    for f in range(1, frames):
        pos[f] = pos[f - 1] + step * vel
        nv = vel / np.maximum(np.linalg.norm(vel, axis=-1, keepdims=True), 1e-12)
        vel = vel + step * (-nv + g)
    return pos, None


def simulate_sparks(count: int, frames: int, radius: float, seed: int = 0):
    """Spark fountain: respawning cone-directed particles with per-frame
    radii that hide dead/spawning sparks (ref generateSparks/simulateSparks:
    cone 0.9, speed 3, lifetime 0.24+0.12*u, drag + gravity)."""
    rng = np.random.default_rng(seed)
    step = 1.0 / _PARTICLE_FPS
    g = np.array([0.0, -9.8, 0.0], np.float32)
    pos = np.zeros((frames, count, 3), np.float32)
    rad = np.zeros((frames, count), np.float32)
    vel = np.ones((count, 3), np.float32)
    # stagger initial ages so spawns spread over one lifetime
    ages = np.floor((-rng.random(count) * 0.32) / step).astype(np.int64)
    max_ages = np.zeros(count, np.int64)
    for f in range(1, frames):
        respawn = ages >= max_ages
        waiting = (~respawn) & (ages < 0)
        flying = (~respawn) & (ages >= 0)

        n_r = int(respawn.sum())
        if n_r:
            pos[f][respawn] = _sphere_uniform(rng, n_r) * 0.005
            rad[f][respawn] = 0.0
            vel[respawn] = _cone_uniform(rng, n_r, 0.9) * 3.0
            ages[respawn] = -2
            max_ages[respawn] = ((0.24 + 0.12 * rng.random(n_r)) / step).astype(np.int64)
        pos[f][waiting] = pos[f - 1][waiting]
        rad[f][waiting] = 0.0
        if flying.any():
            p = pos[f - 1][flying] + step * vel[flying]
            v = vel[flying]
            nv = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
            vel[flying] = v + step * (-nv + g)
            pos[f][flying] = p
            rad[f][flying] = np.where(ages[flying] >= max_ages[flying] - 1, 0.0, radius)
        ages += 1
    return pos, rad


def simulate_rain(count: int, frames: int, radius: float, seed: int = 0,
                  extent: float = 0.27, gravity: float = -7.0, max_age: float = 0.4):
    """Cornell rain: drops spawn on a horizontal rectangle and free-fall
    (ref generateCornellRain/simulateCornellRain)."""
    rng = np.random.default_rng(seed)
    step = 1.0 / _PARTICLE_FPS
    pos = np.zeros((frames, count, 3), np.float32)
    rad = np.zeros((frames, count), np.float32)
    vel = np.zeros((count, 3), np.float32)
    ages = (-(rng.random(count) * max_age / step)).astype(np.int64) - 2
    max_ages = np.zeros(count, np.int64)
    for f in range(1, frames):
        respawn = ages >= max_ages
        waiting = (~respawn) & (ages < 0)
        flying = (~respawn) & (ages >= 0)

        n_r = int(respawn.sum())
        if n_r:
            uv = rng.random((n_r, 2)).astype(np.float32)
            rect = extent * (2.0 * (uv - 0.5))
            pos[f][respawn] = np.stack(
                [rect[:, 0], np.zeros(n_r, np.float32), rect[:, 1]], -1
            )
            rad[f][respawn] = 0.0
            vel[respawn] = 0.0
            ages[respawn] = -2
            max_ages[respawn] = int(max_age / step)
        pos[f][waiting] = pos[f - 1][waiting]
        rad[f][waiting] = 0.0
        if flying.any():
            pos[f][flying] = pos[f - 1][flying] + step * vel[flying]
            vel[flying, 1] += step * gravity
            rad[f][flying] = np.where(ages[flying] >= max_ages[flying] - 1, 0.0, radius)
        ages += 1
    return pos, rad


def write_particles(path: str, positions, radii, radius: float,
                    fps: int = _PARTICLE_FPS, start_frame: int = 0) -> None:
    """Reference particle-exporter JSON (ref particle_exporter.zig write):
    point_list geometry whose vertices carry the whole frame stack.
    A negative start_frame shifts the simulation earlier, so render time 0
    already shows developed particles."""
    positions = np.asarray(positions, np.float32)
    doc = {
        "geometry": {
            "parts": [{"material_index": 0, "start_index": 0, "num_indices": 0}],
            "primitive_topology": "point_list",
            "frames_per_second": int(fps),
            "start_frame": int(start_frame),
            "point_radius": float(radius),
            "vertices": {
                # 5 decimals keep sub-0.1mm precision at scene scale while
                # roughly halving the JSON size
                "positions": [
                    [round(float(x), 5) for x in frame.ravel()]
                    for frame in positions
                ],
            },
        }
    }
    if radii is not None:
        doc["geometry"]["vertices"]["radius_samples"] = [
            [round(float(x), 5) for x in frame]
            for frame in np.asarray(radii, np.float32)
        ]
    with open(path, "w") as f:
        json.dump(doc, f)


PARTICLE_KINDS = {
    "burst": lambda count, frames, radius, seed: simulate_burst(count, frames, seed),
    "sparks": simulate_sparks,
    "rain": simulate_rain,
}


def merge_motion(frame_paths: list[str], out: str):
    """Triangle motion merger (ref sow/triangle_motion_merger.zig): N
    topologically identical per-frame meshes -> ONE SUB model whose
    Position stream carries num_frames vertex buffers."""
    from ..io.mesh import load_mesh_file
    from ..io.sub_mesh import write_sub_mesh

    meshes = [load_mesh_file(p) for p in frame_paths]
    if any(m is None for m in meshes):
        raise SystemExit("sow: cannot load all motion frames")
    base = meshes[0]
    for i, m in enumerate(meshes[1:], 1):
        if m.positions.shape != base.positions.shape or not np.array_equal(
            m.indices, base.indices
        ):
            raise SystemExit(
                f"sow: frame {i} topology differs ({m.positions.shape} vs "
                f"{base.positions.shape})"
            )
    frames = [np.asarray(m.positions, np.float32) for m in meshes]
    write_sub_mesh(out, base, position_frames=frames)
    print(f"sow: merged {len(frames)} frames x {len(base.positions)} verts -> {out}")


def load_project(path: str) -> dict:
    """ref sow/project_loader.zig keys: mesh/scene, density, up,
    align_to_normal, depth_offset_range, density_map, prototypes[]."""
    with open(path) as f:
        return json.load(f)


def run_project(proj: dict, out: str, seed: int = 0):
    from ..io.mesh import load_mesh_file

    mesh_path = proj.get("mesh") or proj.get("scene")
    mesh = load_mesh_file(mesh_path)
    if mesh is None:
        raise SystemExit(f"sow: cannot load mesh {mesh_path}")
    density_image = None
    if "density_map" in proj:
        from ..scene.loader import load_image

        density_image = load_image(proj["density_map"])
    protos = proj.get("prototypes", [{}])
    points, rots, scales, pids = scatter_grid(
        mesh,
        density=float(proj.get("density", 1.0)),
        up=proj.get("up", "YPos"),
        seed=seed,
        prototypes=protos,
        align_to_normal=bool(proj.get("align_to_normal", True)),
        depth_offset_range=tuple(proj.get("depth_offset_range", (0.0, 0.0))),
        density_image=density_image,
    )
    files = [p.get("file", "proc:sphere") for p in protos]
    write_instancer(out, files, points, rots, scales, pids)
    print(f"sow: wrote {len(points)} instances -> {out}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sow", description="asset baker")
    p.add_argument("mode", choices=["scatter", "points", "grid", "project", "merge-motion", "particles"])
    p.add_argument("--kind", default="sparks", choices=sorted(PARTICLE_KINDS),
                   help="particle generator (particles mode)")
    p.add_argument("--frames", type=int, default=60,
                   help="simulation frames at 120 fps (particles mode)")
    p.add_argument("--start-frame", type=int, default=0,
                   help="frame offset of the export (particles mode)")
    p.add_argument("inputs", nargs="*", help="project file / motion frames")
    p.add_argument("--mesh", default="")
    p.add_argument("--prototype", default="proc:sphere")
    p.add_argument("--count", type=int, default=1000)
    p.add_argument("--density", type=float, default=1.0)
    p.add_argument("--up", default="YPos", choices=sorted(UP_AXES))
    p.add_argument("--density-map", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--radius", type=float, default=0.01)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args(argv)

    if args.mode == "particles":
        pos, rad = PARTICLE_KINDS[args.kind](
            args.count, args.frames, args.radius, args.seed
        )
        write_particles(args.output, pos, rad, args.radius,
                        start_frame=args.start_frame)
        print(
            f"sow: simulated {args.count} {args.kind} particles x "
            f"{args.frames} frames -> {args.output}"
        )
        return 0
    if args.mode == "merge-motion":
        merge_motion(args.inputs, args.output)
        return 0
    if args.mode == "project":
        run_project(load_project(args.inputs[0]), args.output, args.seed)
        return 0

    from ..io.mesh import load_mesh_file

    mesh = load_mesh_file(args.mesh)
    if mesh is None:
        raise SystemExit(f"sow: cannot load mesh {args.mesh}")

    if args.mode == "grid":
        density_image = None
        if args.density_map:
            from ..scene.loader import load_image

            density_image = load_image(args.density_map)
        points, rots, scales, pids = scatter_grid(
            mesh, density=args.density, up=args.up, seed=args.seed,
            density_image=density_image,
        )
        write_instancer(args.output, args.prototype, points, rots, scales, pids)
        print(f"sow: wrote {len(points)} instances -> {args.output}")
        return 0

    points, rots, scales = scatter_on_mesh(mesh, args.count, args.seed)
    if args.mode == "scatter":
        write_instancer(args.output, args.prototype, points, rots, scales)
    else:
        write_point_cloud(args.output, points, args.radius)
    print(f"sow: wrote {args.count} {'instances' if args.mode == 'scatter' else 'points'} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
