"""Native (C++) host components, loaded via ctypes.

The reference's scene pipeline is native Zig; the TPU build keeps the hot
host-side pieces native C++ (the device compute path is JAX/XLA). Libraries
compile on demand with g++ into this directory and load via ctypes — no
pybind11 dependency. Every native entry point has a pure-numpy fallback so
the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libzygbvh.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "bvh_builder.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", _LIB_PATH, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.zyg_build_bvh2.restype = ctypes.c_int
        lib.zyg_build_bvh2.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def build_bvh_native(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int = 4):
    """C++ binned-SAH build; returns a scene.bvh.FlatBVH or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..scene.bvh import FlatBVH

    pmin = np.ascontiguousarray(prim_min, np.float32)
    pmax = np.ascontiguousarray(prim_max, np.float32)
    n = pmin.shape[0]
    # spatial-split duplication budget (SBVH-lite, ref builder_base.zig
    # spatial splits): straddling references may duplicate up to 25%
    prim_cap = n + n // 4 + 16
    cap = max(2 * prim_cap, 4)
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    hit_link = np.empty(cap, np.int32)
    miss_link = np.empty(cap, np.int32)
    first_prim = np.empty(cap, np.int32)
    prim_count = np.empty(cap, np.int32)
    prim_order = np.empty(prim_cap, np.int32)
    nprims = ctypes.c_int(0)
    m = lib.zyg_build_bvh2(
        pmin, pmax, n, leaf_size,
        nodes_min, nodes_max, hit_link, miss_link, first_prim, prim_count,
        prim_order, cap, prim_cap, ctypes.byref(nprims),
    )
    if m <= 0:
        return None
    return FlatBVH(
        nodes_min=nodes_min[:m].copy(),
        nodes_max=nodes_max[:m].copy(),
        hit_link=hit_link[:m].copy(),
        miss_link=miss_link[:m].copy(),
        first_prim=first_prim[:m].copy(),
        prim_count=prim_count[:m].copy(),
        prim_order=prim_order[: nprims.value].copy(),
    )
