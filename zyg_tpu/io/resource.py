"""Resource cache: variant-keyed host store + per-frame sequences.

ref: src/core/resource/cache.zig:86 (entries keyed by name+options, so the
same file loaded under different options coexists) and cache.zig:131
(frameDependant entries: a resource whose filename carries a '#' frame
pattern resolves per frame — sequences reload, static entries persist).

The cache holds HOST-side decoded resources (images, density grids, host
meshes, hair/point sets). Device arenas are rebuilt per scene compile; the
expensive part a frame loop repeats — file IO + decode + (for meshes) the
SAH build submitted at add time — is what this skips.
"""

from __future__ import annotations

from .fs import frame_dependant_name

_current_frame = 0


def set_frame(frame: int) -> None:
    """Select the frame used to resolve '#'-patterned resource names
    (ref cli/main.zig per-frame loop -> cache.zig:131 frame keys)."""
    global _current_frame
    _current_frame = int(frame)


def current_frame() -> int:
    return _current_frame


def resolve_name(name: str) -> str:
    """Substitute the current frame into a '#'-patterned name; static
    names pass through unchanged."""
    if "#" in name or "{f" in name:
        return frame_dependant_name(name, _current_frame)
    return name


class ResourceCache:
    """Variant-keyed store: key = (kind, frame-resolved name, options)."""

    def __init__(self):
        self._store: dict = {}

    def get_or_load(self, kind: str, name: str, options: tuple, loader):
        """Return the cached resource or load it via `loader(resolved_name)`.

        Failed loads (loader returns None) are NOT cached, matching the
        reference's retry-on-next-lookup behavior.
        """
        resolved = resolve_name(name)
        key = (kind, resolved, options)
        if key in self._store:
            return self._store[key]
        val = loader(resolved)
        if val is not None:
            self._store[key] = val
        return val

    def invalidate(self, kind: str | None = None) -> None:
        if kind is None:
            self._store.clear()
        else:
            self._store = {
                k: v for k, v in self._store.items() if k[0] != kind
            }

    def __len__(self) -> int:
        return len(self._store)


GLOBAL = ResourceCache()
