"""Cem Yuksel HAIR format reader (http://www.cemyuksel.com/research/hairmodels/).

ref: src/core/scene/shape/curve/hair_reader.zig — strands of line segments
are regrouped into cubic Béziers (3 segments per cubic; a short remainder
repeats its last point), converted from HAIR's coordinate convention, and
paired with per-point widths. The output feeds scene.curves.HostCurves.
"""

from __future__ import annotations

import struct

import numpy as np

from ..scene.curves import HostCurves

# ref hair_reader.zig fromHAIRspace: axis swizzle + global scale
_HAIR_SCALE = 0.004


def read_hair(stream) -> HostCurves:
    data = stream.read()
    if data[:4] != b"HAIR":
        raise ValueError("not a HAIR file (bad signature)")
    num_strands, num_vertices, flags, default_segments = struct.unpack_from(
        "<IIII", data, 4
    )
    default_thickness, _default_alpha = struct.unpack_from("<ff", data, 20)
    # default color 3f + 88 info bytes follow
    off = 4 + 4 * 4 + 4 * 2 + 12 + 88

    has_segments = bool(flags & 1)
    has_vertices = bool(flags & 2)
    has_thickness = bool(flags & 4)
    has_transparency = bool(flags & 8)
    has_color = bool(flags & 16)
    if not has_vertices:
        raise ValueError("HAIR file without vertex data")

    if has_segments:
        segments = np.frombuffer(data, "<u2", num_strands, off).astype(np.int64)
        off += 2 * num_strands
    else:
        segments = np.full(num_strands, default_segments, np.int64)

    verts = np.frombuffer(data, "<f4", num_vertices * 3, off).reshape(-1, 3)
    off += 4 * num_vertices * 3

    if has_thickness:
        thickness = np.frombuffer(data, "<f4", num_vertices, off).astype(np.float32)
        off += 4 * num_vertices
    else:
        thickness = np.full(num_vertices, default_thickness, np.float32)
    # transparency/color arrays are skipped (the material supplies color)

    # HAIR space -> scene space (ref fromHAIRspace)
    pos = np.stack(
        [-verts[:, 1], verts[:, 2], verts[:, 0]], axis=-1
    ).astype(np.float32) * _HAIR_SCALE
    widths_src = thickness * (_HAIR_SCALE * 0.625)  # ref: thickness * 0.0025

    pts, wid, starts, sids, sus = [], [], [], [], []
    src = 0
    dst = 0
    for s in range(num_strands):
        nseg = int(segments[s])
        sv = pos[src : src + nseg + 1]
        sw = widths_src[src : src + nseg + 1]
        src += nseg + 1
        # regroup into cubics of 3 segments; remainder repeats its end point
        full = nseg // 3
        rem = nseg % 3
        ncurve = full + (1 if rem else 0)
        if ncurve == 0:
            continue
        out_p = []
        out_w = []
        for c in range(full):
            out_p.extend(sv[c * 3 : c * 3 + 3])
            out_w.extend(sw[c * 3 : c * 3 + 3])
        out_p.append(sv[full * 3])
        out_w.append(sw[full * 3])
        if rem:
            end = full * 3 + rem
            # degenerate tail cubic (ref hair_reader.zig rem handling)
            out_p.extend([sv[min(full * 3 + 1, end)], sv[end], sv[end]])
            out_w.extend([sw[min(full * 3 + 1, end)], sw[end], sw[end]])
        for c in range(ncurve):
            starts.append(dst + c * 3)
            sids.append(s)
            sus.append((c / ncurve, (c + 1) / ncurve))
        pts.extend(out_p)
        wid.extend(out_w)
        dst += len(out_p)

    return HostCurves(
        points=np.asarray(pts, np.float32),
        widths=np.asarray(wid, np.float32),
        curve_starts=np.asarray(starts, np.int64),
        strand_ids=np.asarray(sids, np.int32),
        strand_u=np.asarray(sus, np.float32),
    )


def write_hair(path: str, strands: list[np.ndarray], thickness: float = 1.0):
    """Minimal HAIR writer (tests/tools): strands = list of [K,3] polylines
    in SCENE space; converted back through the reader's transform."""
    num_strands = len(strands)
    segments = np.asarray([len(s) - 1 for s in strands], np.uint16)
    verts_scene = np.concatenate(strands, axis=0).astype(np.float32)
    # inverse of fromHAIRspace: scene (x,y,z) -> hair (z, -x, y) / s
    inv = np.stack(
        [verts_scene[:, 2], -verts_scene[:, 0], verts_scene[:, 1]], axis=-1
    ) / _HAIR_SCALE
    with open(path, "wb") as f:
        f.write(b"HAIR")
        flags = 1 | 2  # segments + vertices
        f.write(struct.pack("<IIII", num_strands, len(inv), flags, 0))
        # reader maps file thickness -> scene width via *0.0025
        f.write(struct.pack("<ff", thickness / (_HAIR_SCALE * 0.625), 1.0))
        f.write(struct.pack("<fff", 0.0, 0.0, 0.0))
        f.write(b"\x00" * 88)
        f.write(segments.astype("<u2").tobytes())
        f.write(inv.astype("<f4").tobytes())
