"""Cameras. Perspective matches ref src/core/camera/camera_perspective.zig:
NDC x in [-1,1], y in [ratio,-ratio] (ratio=h/w), z = 1/tan(fov/2), fov is
horizontal; rays = left_top + d_x*(px+ux) + d_y*(py+uy), rotated to world by
the camera transform (rows-as-axes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import vecmath as vm


class CameraArrays(NamedTuple):
    """Device-side camera constants.

    Rays are an affine function of pixel coords c=(cx,cy):
        origin_local = o_base + o_dx*cx + o_dy*cy   (+ aperture lens offset)
        dir_local    = d_base + d_dx*cx + d_dy*cy
    Perspective: o_* = 0, d_* = left_top/d_x/d_y (ref camera_perspective.zig).
    Orthographic: o_* spans the world-space sensor, d_base = +z.
    Branch-free — both projections share one jitted ray generator.
    """

    rot: jax.Array  # [3,3] rows = camera axes in world
    pos: jax.Array  # [3]
    o_base: jax.Array  # [3]
    o_dx: jax.Array  # [3]
    o_dy: jax.Array  # [3]
    d_base: jax.Array  # [3]
    d_dx: jax.Array  # [3]
    d_dy: jax.Array  # [3]
    aperture_radius: jax.Array  # scalar
    focus_distance: jax.Array  # scalar
    # textured/bladed aperture (ref camera/aperture.zig + rendering/
    # shaper.zig): Walker alias table over the DxD opacity raster; None =
    # concentric disk. ap_dim is float[2] (w, h) for texel->[-1,1] uv.
    ap_prob: jax.Array = None  # [T]
    ap_alias: jax.Array = None  # int32[T]
    ap_dim: jax.Array = None  # float[2]
    # shutter-slope inverse CDF (ref camera_base.zig setShutter /
    # sampleShutterTime): K+1 control points of t(u); None = uniform
    shutter_icdf: jax.Array = None  # [K+1]

    @property
    def left_top(self):  # perspective sensor corner (for sampleTo)
        return self.d_base

    @property
    def d_x(self):
        return self.d_dx

    @property
    def d_y(self):
        return self.d_dy


@dataclass
class PerspectiveCamera:
    resolution: tuple[int, int] = (1280, 720)
    fov: float = np.deg2rad(60.0)  # horizontal, radians
    rotation: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    aperture_radius: float = 0.0
    focus_distance: float = 0.0
    crop: tuple[int, int, int, int] | None = None
    projection: str = "perspective"  # "perspective" | "orthographic"
    ortho_width: float = 2.0  # world-space sensor width (orthographic)
    # stereo (ref camera_perspective.zig setStereo): interpupillary distance;
    # > 0 renders two layers with eyes offset +-ipd/2 along the camera x axis
    ipd: float = 0.0
    # frame timing + shutter (ref camera_base.zig frame_step/frame_duration,
    # take_loader.zig loadShutter): frame f spans
    # [f*frame_step + open*dur, f*frame_step + close*dur], dur = frame_step
    # when motion_blur else 0
    frame_step: float = 1.0 / 60.0
    shutter_open: float = 0.0
    shutter_close: float = 1.0
    motion_blur: bool = True
    # shutter slope bezier handles (ref take_loader.zig loadShutter
    # "slope"): 4 floats shape the opening ramp, 8 add the closing ramp
    shutter_slope: tuple = ()
    # textured aperture (ref aperture.zig setShape): grayscale opacity
    # raster [H,W] (loaded from the take's aperture.shape image), OR a
    # procedural blade polygon (ref shaper.zig drawAperture)
    aperture_image: np.ndarray = None
    aperture_blades: int = 0
    aperture_roundness: float = 0.0
    # autofocus (ref camera_perspective.zig setFocus/updateFocus): cast a
    # ray through this NDC point at start_frame, focus at the hit
    focus_point: tuple | None = None
    focus_offset: float = 0.0

    def frame_interval(self, frame: int) -> tuple[float, float]:
        t0 = frame * self.frame_step
        dur = self.frame_step if self.motion_blur else 0.0
        return (t0 + self.shutter_open * dur, t0 + self.shutter_close * dur)

    @property
    def num_layers(self) -> int:
        return 2 if self.ipd > 0.0 else 1

    def _aperture_raster(self) -> np.ndarray | None:
        """Opacity raster of the aperture opening: the take's shape image,
        or a rasterized blade polygon (ref shaper.zig ApertureN: point is
        inside when lerp(max plane distance, |c|, roundness) <= radius)."""
        if self.aperture_image is not None:
            img = np.asarray(self.aperture_image, np.float32)
            return img if img.ndim == 2 else img[..., :3].mean(axis=-1)
        n = int(self.aperture_blades)
        if n <= 3:
            return None
        dim, ss = 128, 2
        rot = np.pi
        delta = 2.0 * np.pi / n
        angles0 = rot + np.arange(n) * delta
        angles1 = rot + (np.arange(n) + 1) * delta
        b = np.stack([np.sin(angles0), np.cos(angles0)], -1)
        c = np.stack([np.sin(angles1), np.cos(angles1)], -1)
        cb = c - b
        pn = np.stack([cb[:, 1], -cb[:, 0]], -1)
        pn /= np.maximum(np.linalg.norm(pn, axis=-1, keepdims=True), 1e-12)
        pd = np.sum(pn * b, axis=-1)  # [n]
        t = (np.arange(dim * ss) + 0.5) / (dim * ss)
        yy, xx = np.meshgrid(t, t, indexing="ij")
        cpt = np.stack([xx, yy], -1) * 2.0 - 1.0  # centered, radius 1
        lc = np.linalg.norm(cpt, axis=-1)
        mt = np.max(
            (cpt[..., None, :] * pn).sum(-1) / pd, axis=-1
        )
        inside = (mt + (lc - mt) * self.aperture_roundness) <= 1.0
        inside &= lc <= 1.0
        f = inside.astype(np.float32)
        return f.reshape(dim, ss, dim, ss).mean(axis=(1, 3))

    def _aperture_bake(self):
        """(prob, alias, dims) alias table over the raster, or None."""
        if getattr(self, "_ap_cache", None) is not None:
            return self._ap_cache
        raster = self._aperture_raster()
        if raster is None:
            self._ap_cache = (None, None, None)
            return self._ap_cache
        from ..scene.env_sampling import _alias_table

        w = np.maximum(raster.astype(np.float64).ravel(), 0.0)
        if w.sum() <= 0.0:
            self._ap_cache = (None, None, None)
            return self._ap_cache
        prob, alias = _alias_table(w)
        self._ap_cache = (
            prob.astype(np.float32),
            alias.astype(np.int32),
            np.asarray([raster.shape[1], raster.shape[0]], np.float32),
        )
        return self._ap_cache

    def _shutter_icdf(self, k: int = 32) -> np.ndarray | None:
        """Inverse CDF control points of the shutter response (ref
        camera_base.zig setShutter: trapezoid open/close ramps, optional
        cubic bezier slope handles). None = uniform shutter."""
        if (
            self.shutter_open <= 0.0
            and self.shutter_close >= 1.0
            and len(self.shutter_slope) < 4
        ):
            return None
        if getattr(self, "_shutter_cache", None) is not None:
            return self._shutter_cache
        m = 512
        t = (np.arange(m) + 0.5) / m
        f = np.ones(m, np.float64)
        op, cl = float(self.shutter_open), float(self.shutter_close)
        sl = [float(x) for x in self.shutter_slope]

        def bezier_y_at_x(cp, xs):
            # 16-step bisection per sample (ref camera_base searchBezier)
            u = np.full(len(xs), 0.5)
            step = 0.25
            for _ in range(16):
                omu = 1.0 - u
                cx = (
                    omu**3 * cp[0][0]
                    + 3 * omu**2 * u * cp[1][0]
                    + 3 * omu * u**2 * cp[2][0]
                    + u**3 * cp[3][0]
                )
                u = np.where(xs < cx, u - step, np.where(xs > cx, u + step, u))
                step *= 0.5
            omu = 1.0 - u
            return (
                omu**3 * cp[0][1]
                + 3 * omu**2 * u * cp[1][1]
                + 3 * omu * u**2 * cp[2][1]
                + u**3 * cp[3][1]
            )

        ramp_in = t < op
        if op > 0.0:
            if len(sl) >= 4:
                f[ramp_in] = bezier_y_at_x(
                    [(0.0, 0.0), (sl[0], sl[1]), (sl[2], sl[3]), (op, 1.0)],
                    t[ramp_in],
                )
            else:
                f[ramp_in] = t[ramp_in] / op
        ramp_out = t > cl
        if cl < 1.0:
            if len(sl) >= 8:
                f[ramp_out] = bezier_y_at_x(
                    [(cl, 1.0), (sl[4], sl[5]), (sl[6], sl[7]), (1.0, 0.0)],
                    t[ramp_out],
                )
            else:
                f[ramp_out] = (1.0 - t[ramp_out]) / (1.0 - cl)
        cdf = np.concatenate([[0.0], np.cumsum(np.maximum(f, 0.0))])
        cdf /= max(cdf[-1], 1e-20)
        xs = np.linspace(0.0, 1.0, m + 1)
        u = np.linspace(0.0, 1.0, k + 1)
        icdf = np.interp(u, cdf, xs).astype(np.float32)
        self._shutter_cache = icdf
        return icdf

    def arrays(self, layer: int = 0) -> CameraArrays:
        w, h = self.resolution
        ratio = h / w
        zero = np.zeros(3, np.float32)
        if self.projection == "orthographic":
            ew = self.ortho_width
            eh = ew * ratio
            o_base = np.array([-0.5 * ew, 0.5 * eh, 0.0], np.float32)
            o_dx = np.array([ew / w, 0.0, 0.0], np.float32)
            o_dy = np.array([0.0, -eh / h, 0.0], np.float32)
            d_base = np.array([0.0, 0.0, 1.0], np.float32)
            d_dx = d_dy = zero
        else:
            z = 1.0 / np.tan(0.5 * self.fov)
            d_base = np.array([-1.0, ratio, z], np.float32)
            right_top = np.array([1.0, ratio, z], np.float32)
            left_bottom = np.array([-1.0, -ratio, z], np.float32)
            d_dx = (right_top - d_base) / w
            d_dy = (left_bottom - d_base) / h
            o_base = o_dx = o_dy = zero
        pos = np.asarray(self.position, np.float32)
        if self.ipd > 0.0:
            # eye offset along the camera's x axis (rotation row 0)
            sign = -1.0 if layer == 0 else 1.0
            pos = pos + sign * 0.5 * self.ipd * np.asarray(self.rotation[0], np.float32)
        ap_prob, ap_alias, ap_dim = self._aperture_bake()
        icdf = self._shutter_icdf()
        return CameraArrays(
            rot=jnp.asarray(self.rotation, jnp.float32),
            pos=jnp.asarray(pos, jnp.float32),
            o_base=jnp.asarray(o_base),
            o_dx=jnp.asarray(o_dx),
            o_dy=jnp.asarray(o_dy),
            d_base=jnp.asarray(d_base),
            d_dx=jnp.asarray(d_dx),
            d_dy=jnp.asarray(d_dy),
            aperture_radius=jnp.float32(self.aperture_radius),
            focus_distance=jnp.float32(self.focus_distance),
            ap_prob=None if ap_prob is None else jnp.asarray(ap_prob),
            ap_alias=None if ap_alias is None else jnp.asarray(ap_alias),
            ap_dim=None if ap_dim is None else jnp.asarray(ap_dim),
            shutter_icdf=None if icdf is None else jnp.asarray(icdf),
        )

    @property
    def sensor_area_factor(self) -> float:
        """'a' in the reference: normalized sensor area for light tracing pdfs."""
        w, h = self.resolution
        ratio = h / w
        z = 1.0 / np.tan(0.5 * self.fov)
        return abs((2.0 / z) * (2.0 * ratio / z))


def camera_sample_to(cam: CameraArrays, resolution, p):
    """Connect a world point to the camera (ref camera_perspective.zig
    sampleTo): returns (pixel_xy int[N,2], dir_to_cam[N,3], t[N], pdf[N],
    valid[N]). pdf is w.r.t. sensor-area importance (wa*wb)."""
    w, h = resolution
    po = vm.world_to_frame(cam.rot[0], cam.rot[1], cam.rot[2], p - cam.pos)
    t = vm.length(po)
    dirs = po / jnp.maximum(t, 1e-20)[..., None]
    cos_theta = dirs[..., 2]
    valid = cos_theta > 1e-6

    # project onto the sensor plane
    z = cam.left_top[2]
    pd = (z / jnp.maximum(dirs[..., 2], 1e-6))[..., None] * dirs
    offset = pd - cam.left_top
    x = offset[..., 0] / cam.d_x[0]
    y = offset[..., 1] / cam.d_y[1]
    px = jnp.floor(x).astype(jnp.int32)
    py = jnp.floor(y).astype(jnp.int32)
    valid = valid & (px >= 0) & (px < w) & (py >= 0) & (py < h)

    # sensor area factor a (ref camera_perspective.zig update: self.a)
    ratio = h / w
    a = jnp.abs((2.0 / z) * (2.0 * ratio / z))
    cos2 = cos_theta * cos_theta
    wa = cos_theta / jnp.maximum(t * t, 1e-12)
    wb = 1.0 / jnp.maximum(a * cos2 * cos2, 1e-12)
    pdf = wa * wb
    # direction from the world point TOWARD the camera
    dir_to_cam = vm.safe_normalize(cam.pos - p)
    return jnp.stack([px, py], -1), dir_to_cam, t, jnp.where(valid, pdf, 0.0), valid


def sample_aperture(cam: CameraArrays, lens_uv):
    """Point on the aperture in [-1,1]^2 (ref aperture.zig sample):
    shaped apertures draw a texel from the alias table (one gather —
    camera-rate only) + in-texel jitter; default = concentric disk."""
    if cam.ap_prob is None:
        return vm.sample_disk_concentric(lens_uv)
    t = cam.ap_prob.shape[0]
    u0 = jnp.clip(lens_uv[..., 0], 0.0, 1.0 - 1e-7) * t
    k = jnp.clip(u0.astype(jnp.int32), 0, t - 1)
    f = u0 - k.astype(jnp.float32)
    pk = cam.ap_prob[k]
    take_alias = f >= pk
    # rescale the flip uniform back to [0,1) for the in-texel x offset
    fx = jnp.where(
        take_alias,
        (f - pk) / jnp.maximum(1.0 - pk, 1e-12),
        f / jnp.maximum(pk, 1e-12),
    )
    texel = jnp.where(take_alias, cam.ap_alias[k], k)
    w = cam.ap_dim[0]
    tx = (texel % w.astype(jnp.int32)).astype(jnp.float32)
    ty = (texel // w.astype(jnp.int32)).astype(jnp.float32)
    u = (tx + jnp.clip(fx, 0.0, 1.0)) / w
    v = (ty + lens_uv[..., 1]) / cam.ap_dim[1]
    return jnp.stack([u, v], -1) * 2.0 - 1.0


def sample_shutter_time(cam: CameraArrays, u):
    """Map a uniform to shutter-relative time through the baked inverse
    CDF (ref camera_base.zig sampleShutterTime); identity when uniform."""
    if cam.shutter_icdf is None:
        return u
    from ..core.gather import small_gather

    k = cam.shutter_icdf.shape[0] - 1
    x = jnp.clip(u, 0.0, 1.0 - 1e-7) * k
    i = x.astype(jnp.int32)
    f = x - i.astype(jnp.float32)
    a = small_gather(cam.shutter_icdf, i)
    b = small_gather(cam.shutter_icdf, jnp.minimum(i + 1, k))
    return a + f * (b - a)


def generate_rays(cam: CameraArrays, pixel_xy, pixel_uv, lens_uv=None):
    """pixel_xy int[N,2], pixel_uv float[N,2] -> (origin[N,3], dir[N,3]).

    ref camera_perspective.zig generateVertex.
    """
    coords = pixel_xy.astype(jnp.float32) + pixel_uv
    origin_l = cam.o_base + cam.o_dx * coords[..., 0:1] + cam.o_dy * coords[..., 1:2]
    direction = cam.d_base + cam.d_dx * coords[..., 0:1] + cam.d_dy * coords[..., 1:2]
    if lens_uv is not None:
        # physical aperture: sample a disk of radius aperture_radius
        use = cam.aperture_radius > 0.0
        lens = cam.aperture_radius * sample_aperture(cam, lens_uv)
        lens_l = jnp.stack([lens[..., 0], lens[..., 1], jnp.zeros_like(lens[..., 0])], -1)
        t = cam.focus_distance / jnp.where(jnp.abs(direction[..., 2:3]) < 1e-6, 1e-6, direction[..., 2:3])
        focus = t * direction
        origin_l = jnp.where(use, origin_l + lens_l, origin_l)
        direction = jnp.where(use, focus - lens_l, direction)

    # normalize AFTER the rotation: look_at rotations are not orthonormalized
    # (ref json.zig keeps the raw up vector), so the transform can scale
    # lengths — downstream intersectors assume unit directions.
    d_world = vm.normalize(vm.object_to_world_normal(cam.rot, vm.normalize(direction)))
    o_world = vm.object_to_world_normal(cam.rot, origin_l) + cam.pos
    return o_world, d_world
