"""Regenerate the golden-image regression EXRs (tests/goldens/).

Run on CPU (forced below — goldens are platform-pinned to the CI
platform) after a REVIEWED estimator change only:
    python tools/generate_goldens.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import golden_configs as gc  # noqa: E402
from zyg_tpu.io.exr import write_exr  # noqa: E402


def main():
    names = sys.argv[1:] or list(gc.CONFIGS)
    os.makedirs(gc.GOLDEN_DIR, exist_ok=True)
    for name in names:
        img = gc.render_config(name)
        path = gc.golden_path(name)
        write_exr(
            path,
            {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]},
            half=False,  # f32: the gate's tolerance must not eat half rounding
        )
        print(f"{name}: {img.shape[1]}x{img.shape[0]} mean={img.mean():.5f} -> {path}")


if __name__ == "__main__":
    main()
