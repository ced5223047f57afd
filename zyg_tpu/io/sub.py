"""SUB container IO — zyg's binary image/volume format.

Layout (ref: src/core/image/encoding/sub/sub_reader.zig): 4-byte magic
"SUB\\0", u64 little-endian JSON size, a JSON header with
``image.description.{dimensions, type}`` and binary blob descriptors
(``image.pixels.binary.{offset,size}``, optional ``image.topology`` sparse
bitfield), then the binary section. The topology bitfield marks present
voxels with MSB-first bits inside little-endian u32 words (ref:
src/base/memory/bitfield.zig get()).

Types: Byte1 (u8), Float1 (f32), Float2 (2xf32 — density+emission-ish; we
return channel 0). Dense reads return float32[nz, ny, nx].
"""

from __future__ import annotations

import json
import struct

import numpy as np

_MAGIC = b"SUB\x00"


def _expand_bitfield(bits: np.ndarray, n: int) -> np.ndarray:
    """u32 words, MSB-first per word -> bool[n]."""
    words = bits.astype("<u4")
    shifts = np.arange(31, -1, -1, dtype=np.uint32)
    mask = ((words[:, None] >> shifts[None, :]) & 1).astype(bool)
    return mask.reshape(-1)[:n]


def read_sub_volume(path: str) -> np.ndarray | None:
    """Read a SUB volume as a dense float32[nz, ny, nx] grid (channel 0)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        return None
    (json_size,) = struct.unpack_from("<Q", data, 4)
    header = json.loads(data[12 : 12 + json_size].rstrip(b"\x00").decode())
    image = header["image"]
    desc = image["description"]
    nx, ny, nz = (int(x) for x in desc["dimensions"][:3])
    image_type = desc.get("type", "Float1")
    binary_start = 12 + json_size
    num = nx * ny * nz

    pix = image["pixels"]["binary"]
    pix_off = binary_start + int(pix.get("offset", 0))
    pix_size = int(pix.get("size", 0))

    if image_type == "Byte1":
        itemsize, dtype, ch = 1, np.uint8, 1
    elif image_type == "Float2":
        itemsize, dtype, ch = 8, "<f4", 2
    else:
        itemsize, dtype, ch = 4, "<f4", 1

    out = np.zeros(num * ch, np.float32)
    if "topology" in image:
        topo = image["topology"]["binary"]
        t_off = binary_start + int(topo.get("offset", 0))
        nwords = -(-num // 32)
        words = np.frombuffer(data, "<u4", count=nwords, offset=t_off)
        present = _expand_bitfield(words, num)
        k = int(present.sum())
        vals = np.frombuffer(data, dtype, count=k * ch, offset=pix_off).astype(np.float32)
        if image_type == "Byte1":
            vals = vals / 255.0
        out = out.reshape(num, ch)
        out[present] = vals.reshape(k, ch)
        out = out.reshape(-1)
    else:
        k = pix_size // itemsize if pix_size else num
        vals = np.frombuffer(data, dtype, count=min(k, num) * ch, offset=pix_off).astype(np.float32)
        if image_type == "Byte1":
            vals = vals / 255.0
        out[: vals.size] = vals
    return out.reshape(nz, ny, nx, ch)[..., 0].copy()


def write_sub_volume(path: str, grid: np.ndarray, sparse: bool = True) -> None:
    """Write a dense float32[nz, ny, nx] grid as a Float1 SUB file.

    sparse=True writes a topology bitfield skipping zero voxels, the layout
    the reference's volume assets use."""
    grid = np.asarray(grid, np.float32)
    nz, ny, nx = grid.shape
    flat = grid.reshape(-1)
    num = flat.size

    blobs = []
    image: dict = {
        "description": {"dimensions": [nx, ny, nz], "type": "Float1"},
    }
    offset = 0
    if sparse:
        present = flat != 0.0
        nwords = -(-num // 32)
        idx = np.arange(num)
        words = np.zeros(nwords, "<u4")
        w = idx[present] >> 5
        b = (31 - (idx[present] & 31)).astype(np.uint32)
        np.add.at(words, w, (np.uint32(1) << b).astype("<u4"))
        topo_bytes = words.tobytes()
        image["topology"] = {"binary": {"offset": offset, "size": len(topo_bytes)}}
        blobs.append(topo_bytes)
        offset += len(topo_bytes)
        pix_bytes = flat[present].astype("<f4").tobytes()
    else:
        pix_bytes = flat.astype("<f4").tobytes()
    image["pixels"] = {"binary": {"offset": offset, "size": len(pix_bytes)}}
    blobs.append(pix_bytes)

    header = json.dumps({"image": image}).encode()
    # pad to 8-byte alignment like the reference writer
    pad = (-len(header)) % 8
    header += b"\x00" * pad
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        for blob in blobs:
            f.write(blob)
