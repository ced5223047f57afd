"""Environment-map importance sampling for dome/canopy lights.

ref: src/core/scene/shape/shape_sampler.zig (ImageImpl = Distribution2D over
the emission texture, used by dome/canopy sampleTo/pdf). The reference's
conditional/marginal CDF tables need a per-lane 2D binary search; on TPU the
same distribution is realized as a host-built **alias table** over texels:
sampling is ONE table-row gather (Walker/Vose O(1) method) and the matching
pdf evaluation is one row gather by texel id — no dependent search chain.

Mappings match shapes.build_fragment / light_sampling.light_radiance exactly:
- DOME: lat-long, u = phi/2pi + 0.5 (phi = atan2(x, z) in light space),
  v = arccos(y)/pi; covers the full direction sphere.
- CANOPY: equidistant azimuthal disk over the upper hemisphere (local z up):
  r = theta * 2/pi, u = 0.5*r*x/|xy| + 0.5, v = 0.5*r*y/|xy| + 0.5.

pdf convention: solid-angle pdf using the jacobian at the ACTUAL direction
(not the texel center), which is exactly the density induced by uniform
jitter within the chosen texel — sample and eval stay consistent to fp
precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm
from ..core.gather import small_gather

_ENV_ARRAYS = ("table", "light")


@jax.tree_util.register_pytree_node_class
class EnvSampler:
    """Alias-table importance sampler for one or more env (dome/canopy)
    lights. `width`/`height`/`canopy` are STATIC aux data.

    table: float32[E, K, 4] rows = (prob, alias, pdf_self, pdf_alias) where
    pdf_* are the *uv-space* densities (W*H * normalized weight) of the texel
    itself and its alias partner. light: int32[E] light indices.
    """

    table: jax.Array
    light: jax.Array

    def __init__(self, *, width: int, height: int, canopy: tuple, **arrays):
        self.width = int(width)
        self.height = int(height)
        self.canopy = tuple(canopy)  # bool per env entry (static)
        for k in _ENV_ARRAYS:
            setattr(self, k, arrays[k])

    def tree_flatten(self):
        return (
            tuple(getattr(self, k) for k in _ENV_ARRAYS),
            (self.width, self.height, self.canopy),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        width, height, canopy = aux
        return cls(
            width=width, height=height, canopy=canopy,
            **dict(zip(_ENV_ARRAYS, children)),
        )


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------


def _alias_table(w: np.ndarray):
    """Walker/Vose alias method. w: float64[K] >= 0 (not all zero).
    Returns (prob[K], alias[K]) with P(pick k) == w[k]/sum(w)."""
    k = len(w)
    p = w * (k / w.sum())
    prob = np.ones(k, np.float64)
    alias = np.arange(k, dtype=np.int64)
    small = [i for i in range(k) if p[i] < 1.0]
    large = [i for i in range(k) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return prob.astype(np.float32), alias.astype(np.int32)


def build_env_entry(image: np.ndarray, canopy: bool, max_w: int = 256):
    """One env light's table rows. image: [H,W,C] linear radiance.
    Returns float32[K,4] (prob, alias, pdf_uv_self, pdf_uv_alias)."""
    img = np.asarray(image, np.float64)
    h_full, w_full = img.shape[:2]
    # downsample the importance proxy (power-conserving box filter); the
    # sampled radiance still comes from the full-res texture
    fx = max(1, int(np.ceil(w_full / max_w)))
    fy = max(1, int(np.ceil(h_full / (max_w // 2))))
    h, w = h_full // fy, w_full // fx
    lum = img[..., :3] @ np.array([0.2126, 0.7152, 0.0722])
    lum = lum[: h * fy, : w * fx].reshape(h, fy, w, fx).mean(axis=(1, 3))

    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    if canopy:
        # texel solid angle ~ 2*pi*sin(theta)/r per unit uv area; r = 2theta/pi
        dx = xs[None, :] - 0.5
        dy = ys[:, None] - 0.5
        r = 2.0 * np.sqrt(dx * dx + dy * dy)
        inside = r <= 1.0
        theta = r * (np.pi / 2.0)
        jac = np.where(inside, 2.0 * np.pi * np.sin(theta) / np.maximum(r, 1e-6), 0.0)
        weight = lum * jac
    else:
        theta = ys * np.pi
        weight = lum * np.sin(theta)[:, None]
    weight = weight.reshape(-1)
    total = weight.sum()
    if total <= 0.0:
        weight = np.ones_like(weight)
        total = weight.sum()
    weight = np.maximum(weight, 1e-4 * total / len(weight))  # keep pdf > 0
    prob, alias = _alias_table(weight)
    pdf_uv = (weight / weight.sum()) * (w * h)  # uv-space density per texel
    table = np.stack(
        [prob, alias.astype(np.float32), pdf_uv.astype(np.float32), pdf_uv[alias].astype(np.float32)],
        axis=-1,
    ).astype(np.float32)
    return table, w, h


def build_env_sampler(entries):
    """entries: list of (image, canopy: bool, light_index). All proxies are
    resampled to a common (w, h) (that of the first entry)."""
    if not entries:
        return None
    tables, canopies, lights = [], [], []
    w0 = h0 = None
    for image, canopy, light_idx in entries:
        table, w, h = build_env_entry(image, canopy)
        if w0 is None:
            w0, h0 = w, h
        elif (w, h) != (w0, h0):
            # rebuild at the common proxy resolution via resize of the image
            img = np.asarray(image, np.float32)
            yi = (np.linspace(0, img.shape[0] - 1, h0 * 2)).astype(np.int64)
            xi = (np.linspace(0, img.shape[1] - 1, w0 * 2)).astype(np.int64)
            table, w, h = build_env_entry(img[yi][:, xi], canopy, max_w=w0)
        tables.append(table)
        canopies.append(bool(canopy))
        lights.append(int(light_idx))
    return EnvSampler(
        width=w0,
        height=h0,
        canopy=tuple(canopies),
        table=jnp.asarray(np.stack(tables)),
        light=jnp.asarray(np.array(lights, np.int32)),
    )


# ---------------------------------------------------------------------------
# Device sample / pdf
# ---------------------------------------------------------------------------


def _uv_to_dir_local(env: EnvSampler, entry_is_canopy, uv):
    """Inverse of the fragment uv mappings, in light-object space."""
    # dome lat-long
    phi = (uv[..., 0] - 0.5) * (2.0 * jnp.pi)
    theta = uv[..., 1] * jnp.pi
    st = jnp.sin(theta)
    dome = jnp.stack([st * jnp.sin(phi), jnp.cos(theta), st * jnp.cos(phi)], -1)
    if not any(env.canopy):
        return dome
    # canopy equidistant disk (local z up)
    dx = 2.0 * (uv[..., 0] - 0.5)
    dy = 2.0 * (uv[..., 1] - 0.5)
    r = jnp.sqrt(dx * dx + dy * dy)
    th_c = jnp.minimum(r, 1.0) * (jnp.pi / 2.0)
    s_c = jnp.sin(th_c) / jnp.maximum(r, 1e-8)
    can = jnp.stack([dx * s_c, dy * s_c, jnp.cos(th_c)], -1)
    return jnp.where(entry_is_canopy[..., None], can, dome)


def _dir_local_to_uv(env: EnvSampler, entry_is_canopy, ldir):
    phi = jnp.arctan2(ldir[..., 0], ldir[..., 2])
    dome_uv = jnp.stack(
        [phi * (0.5 / jnp.pi) + 0.5, jnp.arccos(jnp.clip(ldir[..., 1], -1.0, 1.0)) / jnp.pi],
        -1,
    )
    if not any(env.canopy):
        return dome_uv
    lz = jnp.clip(ldir[..., 2], -1.0, 1.0)
    r = jnp.arccos(lz) * (2.0 / jnp.pi)
    lxy = jnp.sqrt(jnp.maximum(ldir[..., 0] ** 2 + ldir[..., 1] ** 2, 1e-20))
    can_uv = jnp.stack(
        [0.5 * (r * ldir[..., 0] / lxy) + 0.5, 0.5 * (r * ldir[..., 1] / lxy) + 0.5], -1
    )
    return jnp.where(entry_is_canopy[..., None], can_uv, dome_uv)


def _entry_of_light(env: EnvSampler, light_idx):
    """Map light index -> env entry index (or -1). E is tiny: select chain."""
    e = jnp.full(light_idx.shape, -1, jnp.int32)
    for k in range(env.light.shape[0]):
        e = jnp.where(light_idx == env.light[k], k, e)
    return e


def _is_canopy(env: EnvSampler, entry):
    c = jnp.zeros(entry.shape, bool)
    for k, flag in enumerate(env.canopy):
        if flag:
            c = c | (entry == k)
    return c


def _jacobian(env: EnvSampler, entry_is_canopy, uv, ldir):
    """|dOmega/duv| at the direction: dome 2pi^2 sin(theta);
    canopy 2pi sin(theta)/r."""
    sin_t_dome = jnp.sqrt(jnp.maximum(1.0 - ldir[..., 1] ** 2, 1e-8))
    jac = (2.0 * jnp.pi * jnp.pi) * sin_t_dome
    if any(env.canopy):
        lz = jnp.clip(ldir[..., 2], -1.0, 1.0)
        r = jnp.arccos(lz) * (2.0 / jnp.pi)
        sin_t_can = jnp.sqrt(jnp.maximum(1.0 - lz * lz, 1e-8))
        jac_c = (2.0 * jnp.pi) * sin_t_can / jnp.maximum(r, 1e-6)
        jac = jnp.where(entry_is_canopy, jac_c, jac)
    return jac


def sample(env: EnvSampler, entry, rot, xi):
    """Importance-sample a direction for env entry per lane.

    entry: int32[N] env entry index (>=0 where applicable); rot: [N,3,3]
    light prop rotation; xi: [N,2] uniforms. Returns (wi[N,3], pdf[N] solid
    angle, uv[N,2])."""
    w, h = env.width, env.height
    K = w * h
    ent = jnp.maximum(entry, 0)
    # stretch xi0 over the table: integer part picks the slot, fraction
    # (re-stretched) both decides prob-vs-alias and jitters u
    x = xi[..., 0] * K
    slot = jnp.clip(x.astype(jnp.int32), 0, K - 1)
    frac = x - slot.astype(jnp.float32)
    row = env.table[ent, slot]  # ONE gather [N,4]
    take_alias = frac >= row[..., 0]
    texel = jnp.where(take_alias, row[..., 1].astype(jnp.int32), slot)
    pdf_uv = jnp.where(take_alias, row[..., 3], row[..., 2])
    # jitter within the texel; re-stretch frac into [0,1)
    ju = jnp.where(
        take_alias,
        (frac - row[..., 0]) / jnp.maximum(1.0 - row[..., 0], 1e-7),
        frac / jnp.maximum(row[..., 0], 1e-7),
    )
    ju = jnp.clip(ju, 0.0, 0.999999)
    tx = texel % w
    ty = texel // w
    uv = jnp.stack(
        [(tx.astype(jnp.float32) + ju) / w, (ty.astype(jnp.float32) + xi[..., 1]) / h],
        -1,
    )
    is_can = _is_canopy(env, ent)
    ldir = _uv_to_dir_local(env, is_can, uv)
    wi = vm.object_to_world_normal(rot, ldir)
    pdf = pdf_uv / _jacobian(env, is_can, uv, ldir)
    return wi, pdf, uv


def pdf(env: EnvSampler, light_idx, rot, wi):
    """Solid-angle pdf sample() would have for direction wi toward light_idx.
    Lanes whose light has no env entry get 0 (callers select)."""
    entry = _entry_of_light(env, light_idx)
    ent = jnp.maximum(entry, 0)
    w, h = env.width, env.height
    is_can = _is_canopy(env, ent)
    ldir = vm.safe_normalize(vm.world_to_object_normal(rot, wi))
    uv = _dir_local_to_uv(env, is_can, ldir)
    tx = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    texel = ty * w + tx
    pdf_uv = env.table[ent, texel, 2]  # ONE gather
    p = pdf_uv / _jacobian(env, is_can, uv, ldir)
    return jnp.where(entry >= 0, p, 0.0)
