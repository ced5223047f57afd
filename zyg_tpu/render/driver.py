"""Render driver: frame orchestration (ref: src/core/rendering/driver.zig).

Owns the compiled per-frame render function. The reference farms 32x32 tiles
to worker threads; here a frame is a batch of H*W ray lanes, spp accumulated
by a ``lax.scan`` inside one jit, sharded across devices by parallel/.

Deterministic seeding law matches ref src/core/rendering/worker.zig:136-149:
    pixel_id     = y * W + x                  (filter radius 0)
    sobol sample = pixel_id * num_expected_samples + iteration
    sobol seed   = hi32(sample) + iteration//num_expected_samples
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sobol import SobolSampler
from ..io.take import Take, IntegratorSettings
from ..utils.progress import Progressor
from ..scene.types import SceneData
from . import sensor as sensor_mod
from . import camera as camera_mod
from .camera import PerspectiveCamera, generate_rays
from .integrator import aov as aov_mod
from .integrator import pt as pt_mod
from .integrator import ptmis as ptmis_mod
from .sensor import Framebuffer


def _render_samples(
    scene: SceneData,
    cam_arrays,
    fb: Framebuffer,
    pixel_xy,  # int32 [N,2]
    pixel_ids,  # uint32 [N]
    first_iteration,  # int32 scalar: global sample index of first sample
    *,
    num_samples: int,
    num_expected_samples: int,
    integrator: IntegratorSettings,
    clamp_max: tuple,
    filter_name: str = "Blackman",
    filter_radius: int = 0,
    resolution: tuple = (0, 0),
    photon_map=None,
    photons_not_only: bool = False,
    photon_max_per_cell: int = 64,
    light_split_depth: int = 0,
    aovs: tuple = (),
    frame_width: int = 0,
    oversample_slack: int = 0,
    pixel_spread: float = 0.0,
):
    """Accumulate `num_samples` consecutive samples into fb (one jit).

    Returns (fb, rays, aov_sums) — aov_sums is {} unless `aovs` are enabled
    on the persistent-wavefront path."""

    # PTMIS/PTDL uses the persistent wavefront (lane regeneration): ~3x
    # utilization vs the per-sample scan below. Reconstruction filters of
    # radius 1/2 (ref sensor.zig addSample unrolled splats) stay on it —
    # finished samples splat (2r+1)^2 footprints as static rolls inside
    # integrate_persistent; only exotic radius>2 filters fall to the scan.
    if integrator.kind in ("PTMIS", "PTDL") and filter_radius <= 2:
        acc, rays, aov_sums, num_iters, counts = ptmis_mod.integrate_persistent(
            scene,
            cam_arrays,
            pixel_xy,
            pixel_ids,
            first_iteration,
            num_samples,
            num_expected_samples,
            ptmis_mod.PtmisSettings(
                max_depth=integrator.max_depth_surface,
                max_depth_volume=integrator.max_depth_volume,
                caustics=integrator.caustics,
                pixel_spread=pixel_spread,
                nee_only=integrator.kind == "PTDL",
                photons_not_only_through_specular=photons_not_only,
                light_split_depth=light_split_depth,
                light_split_threshold=integrator.light_split_threshold,
                regularize_roughness=integrator.regularize_roughness,
                collect_aovs=aovs,
                bsdf_split=getattr(integrator, "bsdf_split", True),
            ),
            clamp_max,
            photon_map=photon_map,
            photon_max_per_cell=photon_max_per_cell,
            # per-sample lane->pixel shuffle (work balancing, 174->145
            # iterations on the Cornell bench); the flushes ride the Pallas
            # column-accumulator (ops/accum.py, ~1.8ms/iter at 2M lanes)
            frame_width=frame_width,
            oversample_slack=oversample_slack,
            filter_name=filter_name,
            filter_radius=filter_radius,
            resolution=resolution,
        )
        # per-pixel sample counts (oversampling makes them unequal) are the
        # box-filter weights; the non-shuffled path adds a uniform count
        w_add = counts if counts is not None else float(num_samples)
        return Framebuffer(fb.value + acc, fb.weight + w_add), (rays, num_iters), aov_sums

    def one_sample(carry, s):
        fb, total_rays = carry
        iteration = first_iteration + s
        sample_index = pixel_ids * jnp.uint32(num_expected_samples) + iteration.astype(jnp.uint32)
        seed = jnp.zeros_like(pixel_ids) + (iteration // num_expected_samples).astype(jnp.uint32)
        smp = SobolSampler.start_pixel(sample_index, seed)

        s4 = smp.sample_4d()
        _time = camera_mod.sample_shutter_time(cam_arrays, smp.sample_1d())
        smp.increment_padding()

        o, d = generate_rays(cam_arrays, pixel_xy, s4[..., 0:2], s4[..., 2:4])

        if integrator.kind == "AOV":
            radiance, _, rays = aov_mod.integrate(
                scene,
                o,
                d,
                smp,
                aov_mod.AovSettings(
                    value=integrator.aov_value,
                    num_samples=integrator.aov_num_samples,
                    radius=integrator.aov_radius,
                    light_split_threshold=integrator.light_split_threshold,
                    light_split_depth=light_split_depth,
                ),
                photon_map=photon_map,
                photon_max_per_cell=photon_max_per_cell,
            )
        elif integrator.kind == "PT":
            radiance, _, rays = pt_mod.integrate(
                scene, o, d, smp, pt_mod.PtSettings(max_depth=integrator.max_depth_surface)
            )
            radiance = sensor_mod.clamp_radiance(radiance, clamp_max[1])
        else:  # PTMIS (default) / PTDL
            iv, _, rays = ptmis_mod.integrate(
                scene,
                o,
                d,
                smp,
                ptmis_mod.PtmisSettings(
                    max_depth=integrator.max_depth_surface,
                    max_depth_volume=integrator.max_depth_volume,
                    caustics=integrator.caustics,
                    pixel_spread=pixel_spread,
                    nee_only=integrator.kind == "PTDL",
                    photons_not_only_through_specular=photons_not_only,
                    light_split_depth=light_split_depth,
                    light_split_threshold=integrator.light_split_threshold,
                    regularize_roughness=integrator.regularize_roughness,
                    bsdf_split=getattr(integrator, "bsdf_split", True),
                ),
                photon_map=photon_map,
                photon_max_per_cell=photon_max_per_cell,
                time=_time,
            )
            radiance = (
                sensor_mod.clamp_radiance(iv.emission, clamp_max[0])
                + sensor_mod.clamp_radiance(iv.direct, clamp_max[1])
                + sensor_mod.clamp_radiance(iv.indirect, clamp_max[2])
            )

        if filter_radius > 0:
            fb = sensor_mod.splat_filtered(
                fb, radiance, pixel_xy, s4[..., 0:2],
                resolution[0], resolution[1], filter_name, filter_radius,
            )
        else:
            fb = fb.add_box(radiance)
        return (fb, total_rays + rays), None

    (fb, rays), _ = jax.lax.scan(
        one_sample, (fb, jnp.int32(0)), jnp.arange(num_samples, dtype=jnp.int32)
    )
    return fb, rays, {}


# pixel-tile lane bound for heavy scenes that are NOT mesh-only (volume
# grids / photon gathers: nested loops without compaction cascades).
# Measured on smoke.take (v5e, 8spp steady state): 64k 1.22 / 256k 1.39 /
# 2M 1.36 Mrays/s — dead-lane masking made medium tiles safe + fastest
_HEAVY_TILE = 1 << 18


@dataclass
class Driver:
    """Progressive frame renderer for one camera."""

    take: Take
    scene: SceneData
    camera: PerspectiveCamera = None  # type: ignore
    layer: int = 0  # stereo layer (camera.num_layers > 1)
    # multi-device rendering (ref tile_queue.zig work distribution -> here
    # static pixel sharding over a jax Mesh, parallel/mesh.py). None = auto:
    # shard when >1 real accelerator devices exist. Tests/dryrun pass True
    # to exercise the sharded path on the virtual CPU mesh.
    use_mesh: bool = None  # type: ignore

    def __post_init__(self):
        self.camera = self.camera or self.take.cameras[0]
        devs = jax.devices()
        auto = len(devs) > 1 and devs[0].platform != "cpu"
        self._mesh = None
        if self.use_mesh if self.use_mesh is not None else auto:
            from ..parallel.mesh import render_mesh

            self._mesh = render_mesh(devs)
        w, h = self.camera.resolution
        ys, xs = np.divmod(np.arange(w * h, dtype=np.int64), w)
        self._pixel_xy = jnp.asarray(np.stack([xs, ys], axis=-1), jnp.int32)
        self._pixel_ids = jnp.asarray(np.arange(w * h), jnp.uint32)
        self._fb = Framebuffer.zeros(w * h)
        self._splat = jnp.zeros((w * h, 3), jnp.float32)
        self._particles_traced = 0
        self._iteration = 0
        self.rays_traced = 0
        self.last_iterations = 0  # wavefront loop iterations (diagnostics)
        self._photon_map = None
        clamp = self.take.sensor.clamp
        self._clamp_max = (clamp.emission, clamp.direct, clamp.indirect)
        self._render_cache: dict[int, callable] = {}
        self.progress = Progressor(quiet=True)
        # NEE splitting (ref take.zig light_sampling split_threshold): every
        # lane pays the full static pick width, so enable only where the
        # variance win is real — many-light scenes with a tree. 2^2 finite
        # picks + 1 infinite bounds the cost at ~4x NEE for ~NxN light counts.
        # sensor AOVs ride the persistent-wavefront path only (the scan
        # path has no per-bounce capture); alpha coverage is implied by the
        # Transparent buffer class (ref buffer_transparent.zig)
        aovs = tuple(self.take.aovs)
        if self.take.sensor.alpha_transparency and "alpha" not in aovs:
            aovs = aovs + ("alpha",)
        persistent = (
            self.take.integrator.kind in ("PTMIS", "PTDL")
            and int(round(self.take.sensor.filter_radius)) <= 2
        )
        self._persistent = persistent
        self._aov_names = aovs if persistent else ()
        if aovs and not persistent:
            import logging

            logging.getLogger("zyg_tpu").warning(
                "sensor AOVs/alpha (%s) require the persistent wavefront "
                "path (PTMIS/PTDL with filter_radius <= 2); this take uses "
                "%s with filter_radius %s — AOV planes will not be rendered",
                ", ".join(aovs), self.take.integrator.kind,
                self.take.sensor.filter_radius,
            )
        self._aov = {}
        # per-sample lane->pixel shuffle: AOV accumulators scatter by pid
        # (expensive under shuffling), so only shuffle when no AOVs ride
        self._frame_width = w if (persistent and not self._aov_names) else 0
        lt = self.scene.light_tree
        # static pick budget 2^S (+1 infinite) per vertex stands in for the
        # ref's dynamic <=64 splits (light_tree.zig:249): every lane pays
        # the full width, so scale S with the light count where the
        # variance win covers it (16+ lights -> 4 picks, 256+ -> 8)
        if lt is not None and self.take.integrator.light_split_threshold > 0.0:
            self._light_split_depth = (
                3 if lt.num_finite >= 256 else 2 if lt.num_finite >= 16 else 0
            )
        else:
            self._light_split_depth = 0
        # chunking: the persistent-wavefront path (PTMIS/PTDL, box filter)
        # streams samples through resident lanes, so its footprint does not
        # grow with spp — run all samples in one dispatch. The scan path
        # bounds lanes*samples to keep device steps short.
        spp = max(self.take.num_samples_per_pixel, 1)
        # scenes with nested device loops (mesh BVH traversal, volume grid
        # tracking, photon-map gathers) must keep dispatches short — long
        # fused dispatches have crashed the remote TPU worker
        self._heavy_loops = (
            self.scene.meshes is not None
            or self.scene.curves is not None
            or self.scene.points is not None
            or self.scene.grids is not None
            or self.take.photon.num_photons > 0
        )
        if persistent:
            # shuffled chunks carry a [3*chunk, N] flush buffer — cap at 16
            # samples (384MB at 1080p) to bound it
            self.chunk_size = min(spp, 8 if self._heavy_loops else (16 if self._frame_width else 64))
        else:
            lane_budget = 4_000_000
            by_lanes = max(1, lane_budget // max(w * h, 1))
            self.chunk_size = min(spp, 16, by_lanes)

    def _pixel_spread(self) -> float:
        """Pixel-cone angular width for analytic-procedural filtering
        (2*tan(fov/2)/width — the driver-side stand-in for the
        reference's per-ray screen-space differentials)."""
        cam = self.camera
        fov = getattr(cam, "fov", None)
        if not fov:
            return 0.0
        import math

        return 2.0 * math.tan(float(fov) * 0.5) / max(cam.resolution[0], 1)

    def _render_fn(self, num_samples: int, oversample_slack: int = 0, sharded: bool = False):
        key = (
            num_samples, oversample_slack, sharded,
            getattr(self, "_photon_max_per_cell", 64),
        )
        fn = self._render_cache.get(key)
        if fn is None:
            # num_expected_samples is clamped to >=2: the ==1 constant folds
            # `pixel_ids*1+s` away and trips a pathological XLA/Mosaic compile
            # (~400s observed on v5e vs ~6s normally). The seeding stays
            # deterministic and collision-free either way.
            base = functools.partial(
                _render_samples,
                num_samples=num_samples,
                num_expected_samples=max(self.take.num_samples_per_pixel, 2),
                integrator=self.take.integrator,
                clamp_max=self._clamp_max,
                filter_name=self.take.sensor.filter_name,
                filter_radius=int(round(self.take.sensor.filter_radius)),
                resolution=self.camera.resolution,
                photons_not_only=self.take.photon.not_only_through_specular,
                photon_max_per_cell=getattr(self, "_photon_max_per_cell", 64),
                light_split_depth=self._light_split_depth,
                aovs=self._aov_names,
                frame_width=self._frame_width,
                oversample_slack=oversample_slack,
                pixel_spread=self._pixel_spread(),
            )
            if not sharded:
                fn = jax.jit(base)
            else:
                # pixel sharding over the device mesh: each device runs the
                # full wavefront on its pixel slice (seeding stays global —
                # pixel_ids ride the shard); framebuffer/AOVs stay sharded
                # until resolve, only the ray counters cross devices
                from jax.sharding import PartitionSpec as P
                from ..parallel.mesh import shard_map

                mesh = self._mesh
                axis = mesh.axis_names[0]

                def per_shard(scene, cam, fb, pxy, pid, first_it, photon_map):
                    fb2, rays, aov_t = base(
                        scene, cam, fb, pxy, pid, first_it, photon_map=photon_map
                    )
                    if isinstance(rays, tuple):
                        rays = (
                            jax.lax.psum(rays[0], axis),
                            jax.lax.pmax(rays[1], axis),
                        )
                    else:
                        rays = jax.lax.psum(rays, axis)
                    return fb2, rays, aov_t

                smapped = shard_map(
                    per_shard,
                    mesh=mesh,
                    in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
                    out_specs=(P(axis), P(), P(axis)),
                    check_vma=False,
                )
                jitted = jax.jit(smapped)
                fn = lambda scene, cam, fb, pxy, pid, it, photon_map=None: jitted(
                    scene, cam, fb, pxy, pid, it, photon_map
                )
            self._render_cache[key] = fn
        return fn

    def start_frame(self):
        w, h = self.camera.resolution
        self._autofocus()
        self._fb = Framebuffer.zeros(w * h)
        self._splat = jnp.zeros((w * h, 3), jnp.float32)
        self._aov = ptmis_mod.aov_init(self._aov_names, w * h)
        self._particles_traced = 0
        self._iteration = 0
        self.rays_traced = 0

    def _autofocus(self):
        """Focus at the geometry under the camera's focus point (ref
        camera_perspective.zig updateFocus: one probe ray at start of
        frame). No-op without a focus point or a finite aperture."""
        cam = self.camera
        if cam.focus_point is None or not (
            cam.aperture_radius > 0.0 or cam.ipd > 0.0
        ):
            return
        from ..scene import shapes

        w, h = cam.resolution
        px = jnp.asarray(
            [[int(cam.focus_point[0] * w) % max(w, 1),
              int(cam.focus_point[1] * h) % max(h, 1)]], jnp.int32
        )
        arrays = cam.arrays(self.layer)
        o, d = generate_rays(arrays, px, jnp.full((1, 2), 0.5, jnp.float32))
        hit = jax.jit(
            functools.partial(shapes.intersect_scene, ray_class="camera")
        )(self.scene, o, d, jnp.float32(0.0), jnp.float32(3.0e37))
        t = float(np.asarray(hit.t)[0])
        if np.isfinite(t) and t < 3.0e36:
            cam.focus_distance = t + cam.focus_offset

    def render_particles(self, num_per_pixel: int | None = None):
        """Backward (light-tracing) pass: trace W*H*ppp light paths and
        accumulate camera splats (ref driver.zig renderFrameBackward)."""
        from .integrator import lighttracer as lt_mod

        ppp = num_per_pixel if num_per_pixel is not None else self.take.num_particles_per_pixel
        if ppp <= 0:
            return
        w, h = self.camera.resolution
        fn = self._particle_fn()
        self.progress.start(ppp)
        for it in range(ppp):
            keys = self._pixel_ids * jnp.uint32(max(ppp, 2)) + jnp.uint32(self._particles_traced)
            splat, rays = fn(self.scene, self.camera.arrays(self.layer), keys)
            self._splat = self._splat + splat
            self._particles_traced += 1
            self.rays_traced += int(rays)
            self.progress.tick()

    def _particle_fn(self):
        from .integrator import lighttracer as lt_mod

        fn = self._render_cache.get("particles")
        if fn is None:
            # full light paths only without a forward pass; otherwise the
            # lighttracer contributes caustic chains only (ref take.zig:
            # full_light_path and !surface_integrator)
            settings = lt_mod.LighttracerSettings(
                max_depth=min(self.take.integrator.max_depth_surface, 8),
                full_light_path=self.take.num_samples_per_pixel == 0,
            )
            base = functools.partial(
                lt_mod.trace,
                resolution=self.camera.resolution,
                settings=settings,
            )
            w, h = self.camera.resolution
            if self._mesh is not None and (w * h) % self._mesh.devices.size == 0:
                # light paths shard over devices; the splat framebuffers are
                # psum-merged over ICI (the reference's atomic splats /
                # photon all_gather analog, ref photon_map.zig:51-82)
                from jax.sharding import PartitionSpec as P
                from ..parallel.mesh import shard_map

                axis = self._mesh.axis_names[0]

                def per_shard(scene, cam, keys):
                    splat, rays = base(scene, cam, ray_keys=keys)
                    return jax.lax.psum(splat, axis), jax.lax.psum(rays, axis)

                fn = jax.jit(
                    shard_map(
                        per_shard,
                        mesh=self._mesh,
                        in_specs=(P(), P(), P(axis)),
                        out_specs=(P(), P()),
                        check_vma=False,
                    )
                )
            else:
                jfn = jax.jit(base)
                fn = lambda scene, cam, keys, _f=jfn: _f(scene, cam, ray_keys=keys)
            self._render_cache["particles"] = fn
        return fn

    def render_iterations(self, num: int | None = None):
        """Render `num` further samples per pixel (default: take spp).

        Mesh scenes run in pixel tiles of bounded lane count: the fused
        integrator + nested BVH-traversal loop has crashed the TPU worker
        (kernel fault, likely VMEM pressure) above ~10^5 lanes."""
        num = num if num is not None else self.take.num_samples_per_pixel
        n_pixels = self._pixel_ids.shape[0]
        # filtered splats write across tile borders — only tile box-filter runs
        can_tile = self._heavy_loops and self.take.sensor.filter_radius == 0
        # mesh-only heavy scenes run FULL-FRAME: the wide-BVH compaction
        # cascade (trimesh.traverse) keeps traversal cost mean-driven at
        # large widths and the dispatch under the TPU-worker wall-time
        # limit. Volume grids keep 256k tiles despite having compaction
        # cascades (volume.py track_stage): a measured full-frame A/B on
        # smoke.take was neutral-to-worse (3.33 tiled vs 3.20 Mrays/s) —
        # the tracking loop is not width-bound. Photon gathers still tile
        # (occupancy-bounded scans, no cascade).
        mesh_only = (
            self.scene.meshes is not None
            and self.scene.curves is None
            and self.scene.grids is None
            and self.scene.points is None
            and self.take.photon.num_photons <= 0
        )
        tile_n = 1 << 21 if mesh_only else _HEAVY_TILE
        tile = min(n_pixels, tile_n) if can_tile else n_pixels
        self.progress.start(num * ((n_pixels + tile - 1) // tile))
        done = 0
        while done < num:
            n = min(self.chunk_size, num - done)
            # final chunk: oversample — fast lanes keep regenerating past
            # their quota (extra sample indices, per-pixel count weights)
            # so the wavefront drains at the MEAN path length, not the
            # slowest lane's. Non-final chunks keep exact quotas (their
            # sample-index ranges abut the next chunk's).
            slack = (
                max(2, n // 2)
                if (self._frame_width > 0 and done + n >= num)
                else 0
            )
            ndev = self._mesh.devices.size if self._mesh is not None else 1
            for t0 in range(0, n_pixels, tile):
                t1 = min(t0 + tile, n_pixels)
                # shard the tile's pixels across the device mesh when they
                # divide evenly (ragged final tiles fall back to one device)
                fn = self._render_fn(
                    n, slack,
                    sharded=self._mesh is not None and (t1 - t0) % ndev == 0,
                )
                fb_t = Framebuffer(self._fb.value[t0:t1], self._fb.weight[t0:t1])
                fb_t, rays, aov_t = fn(
                    self.scene,
                    self.camera.arrays(self.layer),
                    fb_t,
                    self._pixel_xy[t0:t1],
                    self._pixel_ids[t0:t1],
                    jnp.int32(self._iteration),
                    photon_map=self._photon_map,
                )
                if isinstance(rays, tuple):  # persistent path: (rays, iters)
                    rays, wf_iters = rays
                    self.last_iterations = int(wf_iters)
                self._fb = Framebuffer(
                    self._fb.value.at[t0:t1].set(fb_t.value),
                    self._fb.weight.at[t0:t1].set(fb_t.weight),
                )
                for name, part in aov_t.items():
                    mode = ptmis_mod.AOV_SPECS[name][1]
                    cur = self._aov[name][t0:t1]
                    merged = (
                        cur + part if mode == "sum"
                        else jnp.minimum(cur, part) if mode == "min"
                        else jnp.maximum(cur, part)
                    )
                    self._aov[name] = self._aov[name].at[t0:t1].set(merged)
                self.rays_traced += int(rays)
                self.progress.tick()
            self._iteration += n
            done += n
        return self._fb

    def bake_photons(self):
        """Trace photon paths and build the hashed photon grid (ref
        driver.zig bakePhotons -> photon_map.compileIteration)."""
        from .integrator import photon as photon_mod

        ps = self.take.photon
        if ps.num_photons <= 0:
            self._photon_map = None
            return
        settings = photon_mod.PhotonSettings(
            num_photons=ps.num_photons,
            max_bounces=ps.max_bounces,
            search_radius=ps.search_radius,
            full_light_path=ps.full_light_path,
        )
        n = ps.num_photons
        keys = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(977)
        p, wi, alpha, valid = jax.jit(
            functools.partial(photon_mod.bake, settings=settings)
        )(self.scene, keys)
        self._photon_map = jax.jit(
            functools.partial(
                photon_mod.build_map, search_radius=ps.search_radius, num_paths=n
            )
        )(p, wi, alpha, valid)
        # bound the gather's per-bucket scan by the ACTUAL max occupancy —
        # sparse caustic maps need a handful of iterations, not 64. Rounded
        # up to a power of two so progressive re-bakes with slightly
        # different occupancy reuse the compiled render fn (the bound is a
        # static jit arg).
        occ = int(jnp.max(jnp.diff(self._photon_map.cell_start)))
        self._photon_max_per_cell = 1 << max(occ - 1, 0).bit_length()
        # the bound rides the _render_fn cache key: progressive re-bakes
        # with the same pow2 occupancy reuse the compiled fn (the map
        # itself is a traced argument, not a capture)

    def render_frame(self) -> np.ndarray:
        """Full frame at take spp (+ particle pass). Returns linear [H,W,3]."""
        self.start_frame()
        if self.take.photon.num_photons > 0:
            self.bake_photons()
        if self.take.num_particles_per_pixel > 0:
            self.render_particles()
        if self.take.num_samples_per_pixel > 0:
            self.render_iterations(self.take.num_samples_per_pixel)
        return self.resolve()

    def save_state(self, path: str):
        """Checkpoint the sensor state (accumulated framebuffer/weights,
        splats, AOVs, sample counter) so a later process can resume the
        SAME frame mid-accumulation (ref: the reference restarts whole
        sample ranges; here the progressive buffers round-trip exactly)."""
        np.savez_compressed(
            path,
            fb_value=np.asarray(self._fb.value),
            fb_weight=np.asarray(self._fb.weight),
            splat=np.asarray(self._splat),
            iteration=np.int64(self._iteration),
            rays=np.int64(self.rays_traced),
            particles=np.int64(self._particles_traced),
            **{f"aov_{k}": np.asarray(v) for k, v in self._aov.items()},
        )

    def load_state(self, path: str):
        """Restore a save_state checkpoint; render_iterations continues
        from the saved sample index (the seeding law makes the remaining
        samples identical to an uninterrupted run)."""
        z = np.load(path)
        n = self._fb.value.shape[0]
        if z["fb_value"].shape[0] != n:
            raise ValueError(
                f"checkpoint resolution mismatch: {z['fb_value'].shape[0]} vs {n}"
            )
        self._fb = Framebuffer(
            jnp.asarray(z["fb_value"]), jnp.asarray(z["fb_weight"])
        )
        self._splat = jnp.asarray(z["splat"])
        self._iteration = int(z["iteration"])
        self.rays_traced = int(z["rays"])
        self._particles_traced = int(z["particles"])
        for k in list(self._aov):
            key = f"aov_{k}"
            if key in z:
                self._aov[k] = jnp.asarray(z[key])

    def resolve(self, tonemapped: bool = False) -> np.ndarray:
        w, h = self.camera.resolution
        img = self._fb.resolve().reshape(h, w, 3)
        if self._particles_traced > 0:
            # light-traced splats: normalized by paths-per-pixel and ADDED to
            # the forward image (BDPT t=1 convention; ref driver.zig:269)
            img = img + (self._splat / self._particles_traced).reshape(h, w, 3)
        if tonemapped:
            img = sensor_mod.tonemap(
                img,
                self.take.sensor.tonemapper,
                self.take.sensor.exposure,
                look=getattr(self.take.sensor, "look", "Substitute"),
            )
        return np.asarray(jax.device_get(img))

    def resolve_aov(self, name: str) -> np.ndarray:
        """One resolved AOV plane [H,W,C] (ref sensor.zig resolve AOV
        layers): sum-mode buffers average over samples (normals renormalize),
        min/max buffers pass through."""
        w, h = self.camera.resolution
        buf = self._aov[name]
        c, mode = ptmis_mod.AOV_SPECS[name]
        if mode == "sum":
            img = buf / jnp.maximum(self._fb.weight[..., None], 1e-20)
            if name in ("geometric_normal", "shading_normal"):
                ln = jnp.sqrt(jnp.sum(img * img, axis=-1, keepdims=True))
                img = img / jnp.maximum(ln, 1e-20)
        else:
            img = buf
        return np.asarray(jax.device_get(img)).reshape(h, w, c)

    def resolve_alpha(self) -> np.ndarray | None:
        """[H,W] coverage when the Transparent buffer class is active."""
        if "alpha" not in self._aov:
            return None
        return np.clip(self.resolve_aov("alpha")[..., 0], 0.0, 1.0)

    def memory_stats(self) -> dict:
        """Device-memory byte counts per scene category (ref cli/main.zig
        --stats report via numBytes())."""
        def tree_bytes(t):
            if t is None:
                return 0
            return sum(x.nbytes for x in jax.tree.leaves(t) if hasattr(x, "nbytes"))

        sc = self.scene
        return {
            "props": sum(
                tree_bytes(x)
                for x in (sc.prop_shape, sc.prop_rot, sc.prop_pos, sc.prop_scale,
                          sc.prop_material, sc.prop_light)
            ),
            "materials": tree_bytes(sc.materials),
            "lights": tree_bytes(sc.lights),
            "meshes": tree_bytes(sc.meshes),
            "textures": tree_bytes(sc.textures),
            "framebuffer": tree_bytes(self._fb) + tree_bytes(self._splat),
        }

    def render_layers(self) -> list[np.ndarray]:
        """Render every stereo layer (ref sensor.zig multi-layer buffers);
        layer 0 reuses this driver, further layers get their own."""
        out = [self.render_frame()]
        for layer in range(1, self.camera.num_layers):
            d = Driver(take=self.take, scene=self.scene, camera=self.camera, layer=layer)
            out.append(d.render_frame())
        return out

    def export_frame(self, path: str):
        """Write by extension: .png (tonemapped sRGB8), .exr (linear HDR),
        .hdr (RGBE) — ref exporting/sink.zig ImageSequence."""
        ext = path.rsplit(".", 1)[-1].lower()
        alpha = self.resolve_alpha()
        if ext == "exr":
            from ..io.exr import write_exr

            img = self.resolve(tonemapped=False)
            channels = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
            if alpha is not None:
                channels["A"] = alpha
            write_exr(path, channels)
        elif ext == "hdr":
            from ..io.rgbe import write_hdr

            write_hdr(path, self.resolve(tonemapped=False))
        else:
            from ..io.png import write_png, float_to_srgb8

            img = self.resolve(tonemapped=True)
            rgb8 = float_to_srgb8(img)
            if alpha is not None:
                a8 = (np.clip(alpha, 0, 1) * 255.0 + 0.5).astype(np.uint8)
                rgb8 = np.concatenate([rgb8, a8[..., None]], axis=-1)
            write_png(path, rgb8)
        # AOV companion files: <stem>_<name>.exr (ref exporting per-AOV
        # sinks); alpha is folded into the beauty output instead
        stem = path.rsplit(".", 1)[0]
        for name in self._aov_names:
            if name == "alpha":
                continue
            from ..io.exr import write_exr

            plane = self.resolve_aov(name)
            if plane.shape[-1] == 3:
                ch = {"R": plane[..., 0], "G": plane[..., 1], "B": plane[..., 2]}
            else:
                ch = {"Y": plane[..., 0]}
            write_exr(f"{stem}_{name}.exr", ch)
