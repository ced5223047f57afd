"""Pallas TPU kernels for the renderer's hot ops.

Each op has a pure-XLA fallback used on CPU (tests run on the virtual CPU
mesh) and a Pallas path used on TPU. `use_pallas()` picks per backend.
"""

from __future__ import annotations

import jax


def use_pallas() -> bool:
    """True when the default backend can run compiled Mosaic kernels."""
    return jax.default_backend() not in ("cpu",)
