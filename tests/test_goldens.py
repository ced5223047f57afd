"""Golden-image regression gate over BASELINE.md configs 1-4.

Locks the verified estimator output in place (stand-in for the
2-sigma-vs-Zig acceptance; see golden_configs.py). Comparisons are
STATISTICAL, not bit-exact: fixed seeds make an unchanged build
reproduce the goldens exactly, but a legitimate 1-ulp numeric refactor
diverges individual MC paths chaotically (CLAUDE.md) while leaving the
estimator's statistics intact. The gate therefore checks
  - mean energy (catches estimator bias: MIS weights, pdfs, clamps),
  - 4x4-downsampled RMSE (spatially-localized bias with noise averaged),
  - raw RMSE only against GROSS breakage.
The diff itself runs through the `it` Diff operator (ref
it/operator.zig Diff), exercising that tool as the regression harness.
"""

import os

import numpy as np
import pytest

import golden_configs as gc
from zyg_tpu.tools import it as it_mod


@pytest.mark.parametrize("name", sorted(gc.CONFIGS))
def test_golden(name, tmp_path):
    golden = gc.golden_path(name)
    assert os.path.exists(golden), (
        f"missing golden {golden}; run tools/generate_goldens.py"
    )
    img = gc.render_config(name)
    fresh = str(tmp_path / f"{name}.exr")
    from zyg_tpu.io.exr import write_exr

    write_exr(
        fresh,
        {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]},
        half=False,
    )
    _, stats = it_mod.op_diff([golden, fresh])
    ref = it_mod.load_image(golden)
    scale = max(float(ref.mean()), 1e-6)

    # estimator bias: mean energy within 1.5%
    mean_ratio = img.mean() / scale
    assert abs(mean_ratio - 1.0) < 0.015, (
        f"{name}: mean energy drifted x{mean_ratio:.4f} (stats {stats[0]})"
    )
    # localized bias: 4x4 box-downsampled RMSE within 6% of mean energy
    d4 = it_mod.op_downsample(ref, 4) - it_mod.op_downsample(img, 4)
    rmse4 = float(np.sqrt(np.mean(d4 * d4)))
    assert rmse4 / scale < 0.06, f"{name}: downsampled rmse {rmse4/scale:.4f}"
    # gross breakage: raw per-pixel RMSE (chaotic path divergence allowed)
    assert stats[0]["rmse"] / scale < 0.35, f"{name}: raw rmse blew up {stats[0]}"
