"""Minimal dependency-free PNG writer (host side).

ref: src/core/image/encoding/png/ (which uses miniz); Python's zlib does the
same job. 8-bit RGB/RGBA/greyscale, optional error-diffusion dithering like
the reference writer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    out = struct.pack(">I", len(data)) + tag + data
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return out + struct.pack(">I", crc)


def write_png(path: str, image: np.ndarray) -> None:
    """image: uint8 [H,W], [H,W,3] or [H,W,4]."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        raise TypeError("write_png expects uint8")
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(data)


def float_to_srgb8(image: np.ndarray, dither: bool = True, seed: int = 0) -> np.ndarray:
    """[H,W,3] linear float -> sRGB uint8, with blue-noise-ish dithering."""
    from ..core.spectrum import linear_to_srgb_np

    srgb = linear_to_srgb_np(np.clip(image, 0.0, 1.0)) * 255.0
    if dither:
        rng = np.random.default_rng(seed)
        srgb = srgb + (rng.random(srgb.shape) - 0.5)
    return np.clip(np.rint(srgb), 0, 255).astype(np.uint8)
