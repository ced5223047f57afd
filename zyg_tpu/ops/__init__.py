"""Pallas TPU kernels for the renderer's hot ops.

Each op has a pure-XLA fallback used on CPU (tests run on the virtual CPU
mesh) and a Pallas path used on TPU. `use_pallas()` picks per backend.
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    """True when the default backend can run compiled Mosaic kernels.

    ZYG_TPU_NO_PALLAS=1 forces the XLA fallbacks even on TPU — the A/B
    switch tools/verify_fused.py uses to pin fused-vs-XLA output on
    hardware (read at trace time, so flipping it between Driver builds
    yields two different compiled programs)."""
    if os.environ.get("ZYG_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)
