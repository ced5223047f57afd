"""Batched 3-vector / quaternion / transform math.

All functions operate on arrays whose last axis is the vector axis (size 3),
broadcasting over any leading batch axes — the TPU-native replacement for the
reference's SIMD ``Vec4f`` (ref: src/base/math/).

Transform convention (ref: src/core/scene/composed_transformation.zig):
a composed transform is (rotation rows, position, scale) where ``rot[i]`` is
the i-th *object basis axis expressed in world space*, so

    object_to_world_vector(v) = (v * scale) @ rot      # sum_i v_i*s_i*rot[i]
    world_to_object_vector(v) = (v @ rot^T) / scale
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot_keep(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def squared_length(v):
    return dot(v, v)


def normalize(v, eps: float = 0.0):
    return v * jnp.reciprocal(jnp.maximum(length(v), eps))[..., None]


def safe_normalize(v):
    return normalize(v, eps=1e-20)


def reflect(n, v):
    """Reflect v about normal n (both pointing away from surface).

    Matches ref src/base/math/vector4.zig semantics: 2*dot(v,n)*n - v.
    """
    return 2.0 * dot_keep(v, n) * n - v


def distance(a, b):
    return length(a - b)


def lerp(a, b, t):
    return a + (b - a) * t


def reciprocal_safe(x, eps: float = 1e-20):
    return jnp.where(jnp.abs(x) < eps, jnp.sign(x) * (1.0 / eps) + (x == 0.0) * (1.0 / eps), 1.0 / x)


def max_component(v):
    return jnp.max(v, axis=-1)


def average3(v):
    return jnp.mean(v, axis=-1)


# ---------------------------------------------------------------------------
# Orthonormal frames
# ---------------------------------------------------------------------------


def orthonormal_basis(n):
    """Build a right-handed ONB (t, b) around unit normal n.

    Branch-free Duff et al. 2017 construction (same method as the reference's
    ``Frame.init`` in src/base/math/vector4.zig).
    Returns (t, b) with t×b = n.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def frame_to_world(t, b, n, v):
    """Local (tangent-space) vector v -> world, given frame rows t,b,n."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def world_to_frame(t, b, n, v):
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions  (x, y, z, w) layout
# ---------------------------------------------------------------------------


def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_to_mat3(q):
    """Quaternion -> 3x3 rotation with rows = rotated basis axes.

    Matches ref src/base/math/quaternion.zig toMat3x3 layout.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    d = 2.0
    xx, yy, zz = d * x * x, d * y * y, d * z * z
    xy, xz, yz = d * x * y, d * x * z, d * y * z
    wx, wy, wz = d * w * x, d * w * y, d * w * z
    r0 = jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)
    r1 = jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)
    r2 = jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def mat3_to_quat(m):
    """3x3 rotation (rows = basis axes) -> quaternion (x,y,z,w).

    Shepperd's method, branch-free via select over the four cases.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-20)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-20)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m20 + m02) / s, (m21 - m12) / s], -1)

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-20)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-20)) * 2.0
        return jnp.stack([(m20 + m02) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
    use_w = tr > 0.0
    use_x = (~use_w) & (m00 > m11) & (m00 > m22)
    use_y = (~use_w) & (~use_x) & (m11 > m22)
    out = jnp.where(use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz)))
    return out


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_slerp(a, b, t):
    cosom = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(cosom < 0.0, -b, b)
    cosom = jnp.abs(cosom)
    # fall back to lerp when nearly parallel
    om = jnp.arccos(jnp.clip(cosom, -1.0, 1.0))
    sinom = jnp.sin(om)
    close = cosom > 0.9995
    wa = jnp.where(close, 1.0 - t, jnp.sin((1.0 - t) * om) / jnp.maximum(sinom, 1e-12))
    wb = jnp.where(close, t, jnp.sin(t * om) / jnp.maximum(sinom, 1e-12))
    out = wa * a + wb * b
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Composed transforms (SoA): rot [...,3,3] rows=axes, pos [...,3], scale [...,3]
# ---------------------------------------------------------------------------


# The 3x3 products are written as explicit component arithmetic instead of
# einsum/matmul: XLA:TPU lowers tiny batched einsums onto the MXU, which is
# both slower for [N,3]x[3,3] shapes and (at default precision) bf16 —
# explicit mul/add stays on the VPU at exact f32.


def _rows(rot):
    return rot[..., 0, :], rot[..., 1, :], rot[..., 2, :]


def object_to_world_vector(rot, scale, v):
    r0, r1, r2 = _rows(rot)
    vs = v * scale
    return (
        vs[..., 0:1] * r0 + vs[..., 1:2] * r1 + vs[..., 2:3] * r2
    )


def object_to_world_normal(rot, v):
    r0, r1, r2 = _rows(rot)
    return v[..., 0:1] * r0 + v[..., 1:2] * r1 + v[..., 2:3] * r2


def object_to_world_point(rot, scale, pos, p):
    return object_to_world_vector(rot, scale, p) + pos


def world_to_object_vector(rot, scale, v):
    r0, r1, r2 = _rows(rot)
    o = jnp.stack(
        [
            jnp.sum(v * r0, axis=-1),
            jnp.sum(v * r1, axis=-1),
            jnp.sum(v * r2, axis=-1),
        ],
        axis=-1,
    )
    return o / scale


def world_to_object_normal(rot, v):
    r0, r1, r2 = _rows(rot)
    return jnp.stack(
        [
            jnp.sum(v * r0, axis=-1),
            jnp.sum(v * r1, axis=-1),
            jnp.sum(v * r2, axis=-1),
        ],
        axis=-1,
    )


def world_to_object_point(rot, scale, pos, p):
    return world_to_object_vector(rot, scale, p - pos)


def look_at_rotation(position, look_at, up):
    """Rotation rows from a look-at spec (ref src/base/json.zig readTransformation).

    dir = normalize(look_at - position); right = -cross(dir, up); rows=(right,up,dir).
    """
    import numpy as np

    direction = np.asarray(look_at, np.float32) - np.asarray(position, np.float32)
    direction = direction / np.linalg.norm(direction)
    up = np.asarray(up, np.float32)
    right = -np.cross(direction, up)
    return np.stack([right, up, direction], axis=0)


# ---------------------------------------------------------------------------
# Sampling mappings (ref src/base/math/sample_distribution.zig, sincos etc.)
# ---------------------------------------------------------------------------


def sample_hemisphere_cosine(uv):
    """Cosine-weighted hemisphere sample in local frame (z-up). Returns (dir, pdf)."""
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u)
    phi = (2.0 * jnp.pi) * v
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    pdf = z / jnp.pi
    return jnp.stack([x, y, z], axis=-1), pdf


def sample_hemisphere_uniform(uv):
    u, v = uv[..., 0], uv[..., 1]
    z = 1.0 - u
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * jnp.pi) * v
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1), jnp.full_like(u, 1.0 / (2.0 * jnp.pi))


def sample_sphere_uniform(uv):
    u, v = uv[..., 0], uv[..., 1]
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * jnp.pi) * v
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1), jnp.full_like(u, 1.0 / (4.0 * jnp.pi))


def sample_disk_concentric(uv):
    """Concentric disk mapping (ref sample_distribution.zig diskConcentric)."""
    s = 2.0 * uv - 1.0
    sx, sy = s[..., 0], s[..., 1]
    zero = (sx == 0.0) & (sy == 0.0)
    use_x = jnp.abs(sx) > jnp.abs(sy)
    r = jnp.where(use_x, sx, sy)
    ratio = jnp.where(use_x, sy / jnp.where(sx == 0.0, 1.0, sx), sx / jnp.where(sy == 0.0, 1.0, sy))
    phi = jnp.where(use_x, (jnp.pi / 4.0) * ratio, (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio)
    x = jnp.where(zero, 0.0, r * jnp.cos(phi))
    y = jnp.where(zero, 0.0, r * jnp.sin(phi))
    return jnp.stack([x, y], axis=-1)


def sample_triangle_uniform(uv):
    """Low-distortion uniform barycentric mapping (sqrt-free, Heitz 2019)."""
    u, v = uv[..., 0], uv[..., 1]
    lt = u < v
    uu = jnp.where(lt, 0.5 * u, u - 0.5 * v)
    vv = jnp.where(lt, v - 0.5 * u, 0.5 * v)
    # (uu, vv) now uniform on the unit triangle uu+vv<=1
    return jnp.stack([uu, vv], axis=-1)
