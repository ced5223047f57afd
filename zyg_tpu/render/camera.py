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

    def frame_interval(self, frame: int) -> tuple[float, float]:
        t0 = frame * self.frame_step
        dur = self.frame_step if self.motion_blur else 0.0
        return (t0 + self.shutter_open * dur, t0 + self.shutter_close * dur)

    @property
    def num_layers(self) -> int:
        return 2 if self.ipd > 0.0 else 1

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
        lens = cam.aperture_radius * vm.sample_disk_concentric(lens_uv)
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
