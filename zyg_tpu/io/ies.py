"""IES (IESNA LM-63) photometric profile reader.

ref: src/core/scene/light/ies.zig / emittance.zig — the reference
reconstructs an intensity texture from the candela grid and modulates light
emission by angle. Here the profile is reduced to a 1D normalized intensity
curve over the polar angle from the light's emission axis (horizontal
angles averaged — the common axially-symmetric case), resampled to a fixed
number of bins so it packs into the material table.
"""

from __future__ import annotations

import numpy as np

PROFILE_BINS = 32  # resampled intensity bins over theta in [0, pi]


def parse_ies(text: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Parse LM-63 text -> (vertical_angles_deg[V], intensity[V]) averaged
    over horizontal angles. Returns None on malformed input."""
    lines = text.splitlines()
    # skip to the TILT line, numbers start after it
    start = None
    tilt_include = False
    for i, ln in enumerate(lines):
        if ln.upper().startswith("TILT="):
            start = i + 1
            tilt_include = "INCLUDE" in ln.upper()
            break
    if start is None:
        return None
    tokens: list[float] = []
    for ln in lines[start:]:
        for tok in ln.replace(",", " ").split():
            try:
                tokens.append(float(tok))
            except ValueError:
                return None
    if tilt_include:
        # LM-63 tilt block is TOKEN-counted (values may wrap across lines):
        # lamp-to-luminaire geometry, #pairs n, n angles, n factors
        if len(tokens) < 2:
            return None
        n_pairs = int(tokens[1])
        if n_pairs < 0 or len(tokens) < 2 + 2 * n_pairs:
            return None
        tokens = tokens[2 + 2 * n_pairs :]
    if len(tokens) < 13:
        return None
    # header: lamps, lumens/lamp, multiplier, n_vert, n_horiz, photometric
    # type, units, w, l, h, ballast, future, watts
    n_vert = int(tokens[3])
    n_horiz = int(tokens[4])
    photometric_type = int(tokens[5])
    if photometric_type != 1:
        # Type B/A files parametrize angles differently (negative verticals);
        # interpreting them as Type-C polar data would be silently wrong
        return None
    mult = tokens[2]
    base = 13
    if n_vert <= 0 or n_horiz <= 0:
        return None
    if len(tokens) < base + n_vert + n_horiz + n_vert * n_horiz:
        return None
    v_angles = np.asarray(tokens[base : base + n_vert], np.float64)
    if (v_angles < 0.0).any() or (np.diff(v_angles) < 0.0).any():
        return None
    base += n_vert + n_horiz
    candela = np.asarray(
        tokens[base : base + n_vert * n_horiz], np.float64
    ).reshape(n_horiz, n_vert)
    intensity = mult * candela.mean(axis=0)
    return v_angles, intensity


def ies_profile_bins(text: str, bins: int = PROFILE_BINS) -> np.ndarray | None:
    """LM-63 text -> float32[bins] normalized intensity over theta in
    [0, pi] (theta from the light's emission axis). Normalized so the
    cosine-weighted hemisphere average is 1 — the profile redistributes the
    material's emission without changing its total power
    (ref emittance.zig: radiance set from flux)."""
    parsed = parse_ies(text)
    if parsed is None:
        return None
    v_angles, intensity = parsed
    theta = np.linspace(0.0, 180.0, bins)
    prof = np.interp(theta, v_angles, intensity, left=intensity[0], right=intensity[-1])
    # normalize: mean over solid angle weighted by |cos| (flux-preserving
    # for a flat emitter whose unprofiled emission is cosine-distributed)
    th = np.deg2rad(theta)
    w = np.abs(np.cos(th)) * np.sin(th)
    denom = float((prof * w).sum() / max(w.sum(), 1e-12))
    if denom <= 0.0:
        return None
    return (prof / denom).astype(np.float32)
