"""Build libzyg.so — the C ABI shim over the Python su_* surface.

The reference produces a native libzyg that CDLL-based hosts load (the
Blender plugin, src/blender-plugin/engine.py:29, and any C/C++ embedder).
Here the same ABI is provided by zyg_tpu/native/libzyg.c, which embeds
CPython and forwards into zyg_tpu.capi.capi. Build on demand with the
system compiler + python3-config (no pybind11)."""

from __future__ import annotations

import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.dirname(__file__))  # zyg_tpu/
_SRC = os.path.join(_DIR, "native", "libzyg.c")
_OUT = os.path.join(_DIR, "native", "libzyg.so")


def _embed_flags() -> list[str]:
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION"
    )
    flags = [f"-I{inc}"]
    if libdir:
        flags += [f"-L{libdir}", f"-Wl,-rpath,{libdir}"]
    flags += [f"-lpython{ver}", "-ldl", "-lm"]
    return flags


def build_shim(force: bool = False) -> str | None:
    """Compile libzyg.so; returns its path or None when no toolchain."""
    try:
        if (
            force
            or not os.path.exists(_OUT)
            or os.path.getmtime(_OUT) < os.path.getmtime(_SRC)
        ):
            cmd = (
                ["gcc", "-O2", "-shared", "-fPIC", _SRC, "-o", _OUT]
                + _embed_flags()
            )
            subprocess.run(cmd, check=True, capture_output=True)
        return _OUT
    except (OSError, subprocess.CalledProcessError) as e:
        err = getattr(e, "stderr", b"")
        if err:
            import sys

            print(err.decode(errors="replace"), file=sys.stderr)
        return None
