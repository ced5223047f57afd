"""Host-side mesh file loading.

The reference reads its own binary SUB format plus JSON meshes (ref:
src/core/scene/shape/shape_provider.zig) and glTF (ref: util/gltf_loader.zig).
Here: Wavefront OBJ (ubiquitous for test assets), zyg-style JSON geometry,
and procedural 'proc:' URIs; glTF/SUB come with the asset-pipeline round.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..scene.trimesh import HostMesh, make_cube_mesh, make_sphere_mesh


def load_obj(path: str) -> HostMesh:
    positions: list[list[float]] = []
    normals: list[list[float]] = []
    uvs: list[list[float]] = []
    # OBJ allows per-corner (v, vt, vn) triples; rebuild unified vertices
    corner_map: dict[tuple, int] = {}
    out_pos: list = []
    out_n: list = []
    out_uv: list = []
    faces: list[list[int]] = []
    parts: list[int] = []
    part = 0
    seen_usemtl: dict[str, int] = {}

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                positions.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("usemtl"):
                name = line.split(maxsplit=1)[1].strip() if " " in line else ""
                part = seen_usemtl.setdefault(name, len(seen_usemtl))
            elif line.startswith("f "):
                corners = line.split()[1:]
                ids = []
                for c in corners:
                    key = c
                    if key not in corner_map:
                        vi, ti, ni = (list(c.split("/")) + ["", ""])[:3]
                        vi = int(vi)
                        vi = vi - 1 if vi > 0 else len(positions) + vi
                        out_pos.append(positions[vi])
                        if ni:
                            nii = int(ni)
                            out_n.append(normals[nii - 1 if nii > 0 else len(normals) + nii])
                        if ti:
                            tii = int(ti)
                            out_uv.append(uvs[tii - 1 if tii > 0 else len(uvs) + tii])
                        corner_map[key] = len(out_pos) - 1
                    ids.append(corner_map[key])
                # fan-triangulate
                for k in range(1, len(ids) - 1):
                    faces.append([ids[0], ids[k], ids[k + 1]])
                    parts.append(part)

    return HostMesh(
        positions=np.asarray(out_pos, np.float32),
        indices=np.asarray(faces, np.int32),
        normals=np.asarray(out_n, np.float32) if len(out_n) == len(out_pos) else None,
        uvs=np.asarray(out_uv, np.float32) if len(out_uv) == len(out_pos) else None,
        parts=np.asarray(parts, np.int32),
    )


def load_json_mesh(path: str) -> HostMesh | None:
    """zyg JSON geometry (ref shape_provider.zig loadData): object with
    'geometry': {positions, normals, texture_coordinates_0, parts, indices}."""
    with open(path) as f:
        root = json.load(f)
    geo = root.get("geometry", root)
    if "positions" not in geo and "vertices" not in geo:
        return None
    pos = np.asarray(geo.get("positions", geo.get("vertices")), np.float32).reshape(-1, 3)
    idx = np.asarray(geo["indices"], np.int32).reshape(-1, 3)
    nrm = geo.get("normals")
    uv = geo.get("texture_coordinates_0", geo.get("uvs"))
    parts = None
    if "parts" in geo:
        parts = np.zeros(len(idx), np.int32)
        for pi, p in enumerate(geo["parts"]):
            start = int(p.get("start_index", 0)) // 3
            count = int(p.get("num_indices", 0)) // 3
            parts[start : start + count] = pi
    return HostMesh(
        positions=pos,
        indices=idx,
        normals=np.asarray(nrm, np.float32).reshape(-1, 3) if nrm is not None else None,
        uvs=np.asarray(uv, np.float32).reshape(-1, 2) if uv is not None else None,
        parts=parts,
    )


def load_mesh_file(path: str) -> HostMesh | None:
    if path.startswith("proc:"):
        kind = path.split(":", 1)[1]
        if kind == "cube":
            return make_cube_mesh()
        if kind.startswith("sphere"):
            return make_sphere_mesh()
        if kind.startswith("trefoil"):
            # proc:trefoil or proc:trefoil-SEGxRING (e.g. trefoil-512x480)
            from ..scene.trimesh import make_trefoil_mesh

            if "-" in kind:
                seg, ring = (int(x) for x in kind.split("-", 1)[1].split("x"))
                return make_trefoil_mesh(seg, ring)
            return make_trefoil_mesh(512, 480)
        return None
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".obj":
            return load_obj(path)
        if ext == ".sub":
            from .sub_mesh import read_sub_mesh
            from .fs import open_stream

            with open_stream(path) as f:
                return read_sub_mesh(f)
        if ext in (".json", ".mesh"):
            return load_json_mesh(path)
    except (OSError, ValueError, KeyError) as e:
        import logging

        logging.getLogger(__name__).warning("mesh load failed %s: %s", path, e)
    return None


def load_point_cloud_file(path: str):
    """JSON geometry with point_list topology -> HostPoints
    (ref shape_provider.zig PointList branch; sow writes these).

    Two vertex layouts are accepted:
    - flat "positions" (+ optional "radii"/"positions_end"): a static or
      two-endpoint cloud;
    - the reference particle-exporter layout (particle_exporter.zig):
      "vertices": {"positions": [[...frame0...], [...frame1...]],
      "radius_samples": [...]} plus "frames_per_second"/"start_frame" —
      a full simulation stack resolved per render frame."""
    from ..scene.points import HostPoints

    with open(path) as f:
        root = json.load(f)
    geo = root.get("geometry", root)
    verts = geo.get("vertices")
    radius = float(geo.get("point_radius", 0.01))
    if isinstance(verts, dict) and isinstance(verts.get("positions"), list) \
            and verts["positions"] and isinstance(verts["positions"][0], list):
        pf = np.asarray(verts["positions"], np.float32)
        pf = pf.reshape(pf.shape[0], -1, 3)  # [F,P,3]
        rs = verts.get("radius_samples")
        rf = np.asarray(rs, np.float32).reshape(pf.shape[0], -1) if rs else None
        return HostPoints(
            positions=pf[0],
            radii=(rf[0] if rf is not None else np.full(pf.shape[1], radius, np.float32)),
            position_frames=pf,
            radius_frames=rf,
            fps=float(geo.get("frames_per_second", 0.0)) or 120.0,
            start_frame=int(geo.get("start_frame", 0)),
        )
    pos = np.asarray(geo.get("positions", verts), np.float32).reshape(-1, 3)
    r = geo.get("radii")
    radii = (
        np.asarray(r, np.float32).reshape(-1)
        if r is not None
        else np.full(len(pos), radius, np.float32)
    )
    pe = geo.get("positions_end")
    return HostPoints(
        positions=pos,
        radii=radii,
        positions_end=(
            np.asarray(pe, np.float32).reshape(-1, 3) if pe is not None else None
        ),
    )
