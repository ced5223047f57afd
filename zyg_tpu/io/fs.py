"""Filesystem: mount-point stack + gzip-transparent streams + frame names.

ref: src/core/file/system.zig — pushMount/popMount resolve relative asset
names against a stack of mount directories; read_stream.zig sniffs the gzip
magic and wraps transparently; frameDependantName substitutes frame numbers
into printf-style names.
"""

from __future__ import annotations

import gzip
import io
import os
import re

_mounts: list[str] = []


def push_mount(path: str) -> None:
    _mounts.insert(0, path)


def pop_mount() -> None:
    if _mounts:
        _mounts.pop(0)


def clear_mounts() -> None:
    _mounts.clear()


def resolve(name: str, base_dir: str = "") -> str | None:
    """First existing path among mounts (then base_dir, then name itself)."""
    if os.path.isabs(name) and os.path.exists(name):
        return name
    candidates = [os.path.join(m, name) for m in _mounts]
    if base_dir:
        candidates.append(os.path.join(base_dir, name))
    candidates.append(name)
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def open_stream(name: str, base_dir: str = ""):
    """Binary stream for an asset; gzip is unwrapped transparently
    (ref read_stream.zig gzip magic sniff)."""
    path = resolve(name, base_dir)
    if path is None:
        raise FileNotFoundError(name)
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        data = gzip.decompress(f.read())
        f.close()
        return io.BytesIO(data)
    return f


def read_text(name: str, base_dir: str = "") -> str:
    with open_stream(name, base_dir) as f:
        return f.read().decode()


def frame_dependant_name(name: str, frame: int) -> str:
    """Substitute a frame number (ref file/system.zig frameDependantName):
    'bla_{f:04}.png'-style or a bare '#'-run ('img_####.exr')."""
    m = re.search(r"#+", name)
    if m:
        width = len(m.group(0))
        return name[: m.start()] + str(frame).zfill(width) + name[m.end() :]
    if "{" in name:
        try:
            return name.format(f=frame, frame=frame)
        except (KeyError, IndexError):
            return name
    return name
