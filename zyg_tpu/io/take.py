"""Take (render description) loader — source-compatible with zyg take JSON.

ref: src/cli/take_loader.zig + src/core/take/take.zig. A take bundles the
scene filename, camera(s), sampler, surface/volume integrators, sensor
settings, post processors, and exporters.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..render.camera import PerspectiveCamera
from ..render.sensor import Clamp, SensorSettings
from ..scene.loader import read_transformation


DEFAULT_DEPTH = {"surface": 16, "volume": 256}


@dataclass
class IntegratorSettings:
    kind: str = "PTMIS"  # AOV | PT | PTDL | PTMIS
    max_depth_surface: int = 16
    max_depth_volume: int = 256
    caustics: bool = True
    light_split_threshold: float = 0.5**4  # st^4 remap (ref take.zig:263-271)
    regularize_roughness: float = 0.0
    # BSDF path splitting at glass vertices (ref vertex.zig Pool — always
    # on in the reference; exposed as a take key here because the wavefront
    # serialization trades lane time for variance)
    bsdf_split: bool = True
    aov_value: str = "AO"
    aov_num_samples: int = 1
    aov_radius: float = 1.0


@dataclass
class PhotonSettings:
    """ref take.zig PhotonSettings + loadPhotonSettings (take.zig:245)."""

    num_photons: int = 0  # photon paths per frame; 0 = photon map off
    max_bounces: int = 2
    search_radius: float = 0.01
    full_light_path: bool = False
    # gather at every primary diffuse vertex, not just after specular chains
    # (ref View.photons_not_only_through_specular = !lighttracer)
    not_only_through_specular: bool = False


@dataclass
class Exporter:
    kind: str = "Image"  # Image | FFMPEG
    format: str = "PNG"  # PNG | EXR | RGBE
    error_diffusion: bool = True


@dataclass
class Take:
    scene_filename: str = ""
    cameras: list[PerspectiveCamera] = field(default_factory=list)
    num_samples_per_pixel: int = 1
    num_particles_per_pixel: int = 0
    sampler: str = "Sobol"  # Sobol | Random
    integrator: IntegratorSettings = field(default_factory=IntegratorSettings)
    sensor: SensorSettings = field(
        default_factory=lambda: SensorSettings(clamp=Clamp())
    )
    exporters: list[Exporter] = field(default_factory=list)
    photon: PhotonSettings = field(default_factory=PhotonSettings)
    start_frame: int = 0
    num_frames: int = 1
    # enabled sensor AOV classes (ref take.zig View.loadAOV; names are the
    # keys of ptmis.AOV_SPECS)
    aovs: tuple = ()


# reference AOV JSON keys -> AOV_SPECS names (ref aov_value.zig Class)
AOV_NAME_MAP = {
    "Albedo": "albedo",
    "Depth": "depth",
    "MaterialId": "material_id",
    "GeometricNormal": "geometric_normal",
    "ShadingNormal": "shading_normal",
    "Roughness": "roughness",
    "Emission": "emission",
    "Direct": "direct",
    "Indirect": "indirect",
}


def parse_aovs(node: dict) -> tuple:
    """{"Albedo": true, ...} -> tuple of enabled AOV names."""
    out = []
    for key, enabled in node.items():
        name = AOV_NAME_MAP.get(key)
        if name and bool(enabled):
            out.append(name)
    return tuple(out)


def _load_camera(node: dict) -> PerspectiveCamera:
    cam = PerspectiveCamera()
    for kind, body in node.items():
        if kind not in ("Perspective", "Orthographic"):
            continue
        params = body.get("parameters", {})
        if kind == "Orthographic":
            cam.projection = "orthographic"
            cam.ortho_width = float(params.get("extent", params.get("width", 2.0)))
        if "fov" in params:
            cam.fov = float(np.deg2rad(params["fov"]))
        if "lens" in params:
            cam.aperture_radius = float(params["lens"].get("radius", 0.0))
        if "aperture" in params:
            ap = params["aperture"]
            cam.aperture_radius = float(ap.get("radius", cam.aperture_radius))
            # shaped bokeh (ref camera_perspective.zig setParameters):
            # an opacity image, or a procedural blade polygon
            shape = ap.get("shape", "")
            if shape:
                from ..scene.loader import load_image

                cam.aperture_image = load_image(shape)
            else:
                cam.aperture_blades = int(ap.get("blades", 0))
                cam.aperture_roundness = float(ap.get("roundness", 0.0))
        if "focus" in params:
            fo = params["focus"]
            cam.focus_distance = float(fo.get("distance", 0.0))
            # autofocus through an NDC point (ref setFocus use_point)
            if "point" in fo:
                pt = [float(x) for x in fo["point"]]
                cam.focus_point = (pt[0], pt[1])
                cam.focus_offset = pt[2] if len(pt) > 2 else 0.0
        if "stereo" in params:
            cam.ipd = float(params["stereo"].get("ipd", 0.062))
        if "shutter" in params or "shutter" in body:
            sh = params.get("shutter", body.get("shutter", {}))
            if "frame_step" in sh:
                cam.frame_step = float(sh["frame_step"])
            elif "frames_per_second" in sh:
                fps = float(sh["frames_per_second"])
                cam.frame_step = 1.0 / fps if fps > 0 else 0.0
            cam.shutter_open = float(sh.get("open", 0.0))
            cam.shutter_close = float(sh.get("close", 1.0))
            cam.motion_blur = bool(sh.get("motion_blur", True))
            # bezier slope handles (ref take_loader.zig loadShutter)
            cam.shutter_slope = tuple(float(x) for x in sh.get("slope", ()))[:8]
        trafo = read_transformation(body.get("transformation"))
        cam.rotation = trafo.rotation
        cam.position = trafo.position
        res = body.get("resolution", [1280, 720])
        cam.resolution = (int(res[0]), int(res[1]))
        if "crop" in body:
            cam.crop = tuple(int(v) for v in body["crop"])
        break
    return cam


def _load_integrator(node: dict, take: Take) -> None:
    surface = node.get("surface", {})
    for kind in ("AOV", "PT", "PTDL", "PTMIS"):
        if kind not in surface:
            continue
        body = surface[kind] or {}
        s = take.integrator
        s.kind = kind
        depth = body.get("depth", {})
        if isinstance(depth, dict):
            s.max_depth_surface = int(depth.get("surface", DEFAULT_DEPTH["surface"]))
            s.max_depth_volume = int(depth.get("volume", DEFAULT_DEPTH["volume"]))
        elif isinstance(depth, (int, float)):
            s.max_depth_surface = int(depth)
        s.caustics = bool(body.get("caustics", True))
        s.regularize_roughness = float(body.get("regularize_roughness", 0.0))
        s.bsdf_split = bool(body.get("bsdf_split", True))
        ls = body.get("light_sampling", {})
        st = float(np.clip(ls.get("split_threshold", 0.5), 0.0, 1.0))
        s.light_split_threshold = (st * st) * (st * st)
        if kind == "AOV":
            s.aov_value = body.get("value", "AO")
            s.aov_num_samples = int(body.get("num_samples", 1))
            s.aov_radius = float(body.get("radius", 1.0))
        break
    particle = node.get("particle")
    if particle:
        take.num_particles_per_pixel = int(particle.get("particles_per_pixel", 1))
        # with both integrators active, caustic chains move to the
        # lighttracer (ref take.zig: caustics_path = caustics and !lighttracer)
        if "surface" in node:
            take.integrator.caustics = False


def _load_sensor(node: dict) -> SensorSettings:
    clamp = Clamp()
    cl = node.get("clamp")
    if isinstance(cl, dict):
        clamp.emission = float(cl.get("emission", np.inf))
        clamp.direct = float(cl.get("direct", np.inf))
        clamp.indirect = float(cl.get("indirect", np.inf))
    settings = SensorSettings(clamp=clamp)
    settings.alpha_transparency = bool(node.get("alpha_transparency", False))
    filt = node.get("filter")
    if isinstance(filt, dict):
        for name in ("Blackman", "Mitchell"):
            if name in filt:
                settings.filter_name = name
                settings.filter_radius = 2.0
                break
    return settings


def load_take_dict(root: dict, base_dir: str = "") -> Take:
    take = Take()
    take.scene_filename = root.get("scene", "")
    if take.scene_filename and base_dir:
        take.scene_filename = os.path.join(base_dir, take.scene_filename)

    if "camera" in root:
        take.cameras.append(_load_camera(root["camera"]))
    for cn in root.get("cameras", []):
        take.cameras.append(_load_camera(cn))

    sampler = root.get("sampler", {})
    for name, body in sampler.items():
        take.sampler = name if name in ("Random", "Sobol") else "Sobol"
        take.num_samples_per_pixel = int(body.get("samples_per_pixel", 1))

    if "integrator" in root:
        _load_integrator(root["integrator"], take)

    if "sensor" in root:
        take.sensor = _load_sensor(root["sensor"])

    if isinstance(root.get("aov"), dict):
        take.aovs = parse_aovs(root["aov"])

    ph = root.get("photon")
    if isinstance(ph, dict):
        take.photon = PhotonSettings(
            num_photons=int(ph.get("num_photons", 0)),
            max_bounces=int(ph.get("max_bounces", 2)),
            search_radius=float(ph.get("search_radius", 0.01)),
            full_light_path=bool(ph.get("full_light_path", False)),
            not_only_through_specular=take.num_particles_per_pixel == 0,
        )

    for pp in root.get("post", []):
        if "tonemapper" in pp:
            for tname, tbody in pp["tonemapper"].items():
                take.sensor.tonemapper = tname
                if isinstance(tbody, dict):
                    take.sensor.exposure = float(tbody.get("exposure", 0.0))
                    # AgX look (ref agx.zig Look; the reference CLI defaults
                    # the bare "AgX" key to Substitute)
                    take.sensor.look = str(tbody.get("look", take.sensor.look))
                else:
                    take.sensor.exposure = 0.0

    exp = root.get("export")
    if isinstance(exp, dict):
        if "Image" in exp:
            fmt = exp["Image"].get("format", "PNG").upper()
            take.exporters.append(Exporter("Image", fmt, bool(exp["Image"].get("error_diffusion", True))))
        if "FFMPEG" in exp:
            take.exporters.append(Exporter("FFMPEG", "MP4"))

    return take


def load_take_file(path: str) -> Take:
    from . import fs

    with fs.open_stream(path) as f:
        root = json.loads(f.read().decode())
    resolved = fs.resolve(path) or path
    return load_take_dict(root, base_dir=os.path.dirname(resolved))
