"""Host-side scene compiler: scene JSON (zyg format) -> SceneData arrays.

Source-compatible with the reference's scene files
(ref: src/util/scene_loader.zig, src/base/json.zig readTransformation):
entities with type Prop/Light, shape {type|file}, materials by name (with
local material definitions), transformations with position/scale/rotation or
look_at/up, nested child entities inheriting the parent transform.

Everything here is plain numpy on the host; `compile_scene` produces the
device pytree.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax.numpy as jnp

from .types import SceneData, Materials, Lights, ShapeType, MaterialKind
from .trimesh import HostMesh, build_arena
from .textures import TextureBuilder
from ..core.spectrum import LUMINANCE_WEIGHTS


# ---------------------------------------------------------------------------
# Transformation parsing (matches ref/src/base/json.zig exactly)
# ---------------------------------------------------------------------------


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def rotation_matrix_from_euler_degrees(xyz) -> np.ndarray:
    """R = Rz * Rx * Ry, rows then used as object axes (ref json.zig:169-180)."""
    x, y, z = (np.deg2rad(float(v)) for v in xyz)
    return (_rot_z(z) @ _rot_x(x) @ _rot_y(y)).astype(np.float32)


def _read_vec3(value, default=(0.0, 0.0, 0.0)) -> np.ndarray:
    if value is None:
        return np.array(default, np.float32)
    if isinstance(value, (int, float)):
        return np.full(3, float(value), np.float32)
    return np.array([float(v) for v in value[:3]], np.float32)


@dataclass
class Transformation:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))

    def compose(self, child: "Transformation") -> "Transformation":
        """self (parent) ∘ child — ref composed_transformation.zig transform()."""
        rot = child.rotation @ self.rotation
        scale = self.scale * child.scale
        pos = ((child.position * self.scale) @ self.rotation) + self.position
        return Transformation(pos.astype(np.float32), rot.astype(np.float32), scale.astype(np.float32))


def read_transformation(value: dict | None, base: Transformation | None = None) -> Transformation:
    t = Transformation() if base is None else Transformation(base.position, base.rotation, base.scale)
    if value is None:
        return t
    up = np.array([0.0, 1.0, 0.0], np.float32)
    look_at = None
    for key, v in value.items():
        if key == "position":
            t.position = _read_vec3(v)
        elif key == "scale":
            t.scale = _read_vec3(v, default=(1.0, 1.0, 1.0))
        elif key == "rotation":
            t.rotation = rotation_matrix_from_euler_degrees(_read_vec3(v))
        elif key == "look_at":
            look_at = _read_vec3(v)
        elif key == "up":
            up = _read_vec3(v)
    if look_at is not None:
        direction = look_at - t.position
        direction = direction / np.linalg.norm(direction)
        right = -np.cross(direction, up)
        t.rotation = np.stack([right, up, direction], axis=0).astype(np.float32)
    return t


# ---------------------------------------------------------------------------
# Materials
# ---------------------------------------------------------------------------

_SHAPE_NAMES = {
    "Canopy": ShapeType.CANOPY,
    "Cube": ShapeType.CUBE,
    "Disk": ShapeType.DISK,
    "Distant": ShapeType.DISTANT,
    "Dome": ShapeType.DOME,
    "Rectangle": ShapeType.RECTANGLE,
    "Sphere": ShapeType.SPHERE,
    # zyg alias: the sun is a Distant light
    "Celestial_disk": ShapeType.DISTANT,
}


@dataclass
class MaterialDesc:
    kind: int = int(MaterialKind.SUBSTITUTE)
    color: np.ndarray = field(default_factory=lambda: np.full(3, 0.5, np.float32))
    roughness: float = 0.8
    metallic: float = 0.0
    ior: float = 1.46
    specular: float = 1.0
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    two_sided: bool = False
    attenuation_distance: float = 0.0
    anisotropy: float = 0.0
    subsurface_color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    volumetric_anisotropy: float = 0.0
    color_tex: int = -1
    roughness_tex: int = -1
    normal_tex: int = -1
    emission_tex: int = -1
    mask_tex: int = -1  # opacity cutout (ref material_base.zig mask)
    density_grid: int = -1  # index into the builder's 3D grid list
    translucency: float = 0.0
    ies: "np.ndarray | None" = None  # [32] profile bins
    coating_thickness: float = 0.0
    coating_ior: float = 1.5
    coating_roughness: float = 0.2
    priority: int = 0  # nested-dielectric priority (ref medium.zig)
    # hair material (ref hair_material.zig): beta_n azimuthal roughness
    # (roughness doubles as beta_m), explicit absorption from melanin
    hair_beta_n: float = 0.3
    hair_mu_a: "np.ndarray | None" = None
    anisotropy_rotation: float = 0.0  # turns (ref anisotropy_rotation key)
    abbe: float = 0.0  # glass dispersion (ref material_provider.zig:193)
    # metallic flakes (ref substitute_material.zig flakes_*)
    flakes_coverage: float = 0.0
    flakes_color: np.ndarray = field(default_factory=lambda: np.full(3, 0.8, np.float32))
    flakes_alpha: float = 0.01
    flakes_res: float = 4.0


# ref material/metal_presets.zig iorAndAbsorption: complex IoR (eta, k)
METAL_PRESETS = {
    "Aluminium": ((1.50694, 0.926041, 0.68251), (7.6307, 6.3849, 5.6230)),
    "Gold": ((0.18267, 0.49447, 1.3761), (3.1178, 2.3515, 1.8324)),
    "Silver": ((0.13708, 0.12945, 0.14075), (4.0625, 3.1692, 2.6034)),
    "Iron": ((2.9038, 2.8857, 2.6420), (3.0798, 2.9157, 2.8025)),
}


def metal_preset_f0(name: str) -> np.ndarray:
    """Conductor reflectance at normal incidence from the preset's complex
    IoR (ref fresnel.conductor with cos=1, ior_outside=1)."""
    eta, k = METAL_PRESETS.get(name, ((1.5, 1.5, 1.5), (1.0, 1.0, 1.0)))
    eta = np.asarray(eta, np.float64)
    k = np.asarray(k, np.float64)
    f0 = ((eta - 1.0) ** 2 + k * k) / ((eta + 1.0) ** 2 + k * k)
    return f0.astype(np.float32)


def _read_color(v) -> np.ndarray:
    if isinstance(v, (int, float)):
        return np.full(3, float(v), np.float32)
    if isinstance(v, dict):
        # {"temperature": K} etc. — handled minimally for now
        if "temperature" in v:
            from ..core.spectrum import blackbody

            return blackbody(float(v["temperature"]))
        if "value" in v:
            return _read_color(v["value"])
    return np.array([float(x) for x in v[:3]], np.float32)


# emissive meshes below this triangle count keep the flat area CDF; above
# it a primitive light tree drives NEE triangle selection (ref
# light_tree.zig:520)
_PRIM_TREE_MIN = 512


def _read_texcoord(sampler) -> int:
    """ref material_provider.zig readTextureSampler "texcoord":
    UV0 (default) | Triplanar | ObjectPos."""
    if not isinstance(sampler, dict):
        return 0
    return {"UV0": 0, "Triplanar": 1, "ObjectPos": 2}.get(
        sampler.get("texcoord", "UV0"), 0
    )


def _read_address(sampler) -> tuple[bool, bool]:
    """ref material_provider.zig readTextureSampler "address": scalar or
    [u, v] of "Clamp"/"Repeat"."""
    if not isinstance(sampler, dict):
        return False, False
    adr = sampler.get("address")
    if isinstance(adr, (list, tuple)):
        return str(adr[0]) == "Clamp", str(adr[1 if len(adr) > 1 else 0]) == "Clamp"
    if isinstance(adr, str):
        c = adr == "Clamp"
        return c, c
    return False, False


def parse_material(
    value: dict,
    builder: "SceneBuilder | None" = None,
    base_dir: str = "",
    image_provider=None,
) -> MaterialDesc:
    """Parse one material JSON node (ref: material_provider.zig loadMaterial).

    Texture-valued parameters ({"file": ...} nodes) are packed into the
    builder's texture arena when a builder is provided. {"id": N} nodes
    resolve through `image_provider` (the C API's su_image_create store,
    ref capi.zig materialRefersToImage / capi-test/test.py:120); the
    texture slot remembers the image id so su_image_update propagates."""
    rendering = value.get("rendering", value)
    desc = MaterialDesc()

    def tex(v, srgb):
        if builder is not None and isinstance(v, dict):
            from . import procedural as prcd

            if prcd.is_procedural(v):
                def _load(name):
                    return load_image(os.path.join(base_dir, name))

                spec = prcd.analytic_spec(v)
                if spec is not None:
                    # pure Checker/Noise nodes evaluate ANALYTICALLY at
                    # shade time (ref procedural_checker/noise.zig with
                    # context.zig ray differentials); the arena keeps a
                    # low-res bake only as fallback data (alias tables,
                    # sample_nearest)
                    img = prcd.bake(v, load_image=_load, res=128)
                    tid = builder.add_texture_image(img, srgb=False)
                    builder.textures.add_procedural_meta(tid, spec)
                    return tid
                # graphs with image operands / combinators bake to the
                # arena at compile (ref texture/procedural*.zig)
                img = prcd.bake(v, load_image=_load)
                return builder.add_texture_image(img, srgb=False)
        if builder is not None and isinstance(v, dict) and "file" in v:
            cu, cv2 = _read_address(v.get("sampler"))
            return builder.load_texture(
                os.path.join(base_dir, v["file"]), srgb=srgb,
                clamp_u=cu, clamp_v=cv2,
                texcoord=_read_texcoord(v.get("sampler")),
            )
        if (
            builder is not None
            and image_provider is not None
            and isinstance(v, dict)
            and "id" in v
        ):
            img = image_provider(int(v["id"]))
            if img is None:
                return -1
            return builder.add_capi_image_ref(int(v["id"]), img, srgb=srgb)
        return -1
    for kind_name, body in rendering.items():
        if kind_name == "Substitute":
            desc.kind = int(MaterialKind.SUBSTITUTE)
        elif kind_name == "Glass":
            desc.kind = int(MaterialKind.GLASS)
            desc.roughness = 0.0
            desc.color = np.ones(3, np.float32)
            desc.ior = 1.46
        elif kind_name == "Light":
            desc.kind = int(MaterialKind.LIGHT)
        elif kind_name == "Debug":
            desc.kind = int(MaterialKind.DEBUG)
        elif kind_name == "Volumetric":
            desc.kind = int(MaterialKind.VOLUMETRIC)
        elif kind_name == "Hair":
            desc.kind = int(MaterialKind.HAIR)
            desc.roughness = 0.3  # beta_m default (ref hair_material.zig)
            desc.color = np.full(3, 0.5, np.float32)
        elif kind_name == "Sky":
            desc.kind = int(MaterialKind.SKY)
        else:
            continue
        if not isinstance(body, dict):
            continue
        for key, v in body.items():
            if key in ("color", "attenuation_color"):
                t = tex(v, srgb=True)
                if t >= 0:
                    desc.color_tex = t
                    desc.color = np.ones(3, np.float32)
                else:
                    desc.color = _read_color(v)
            elif key == "subsurface_color":
                desc.subsurface_color = _read_color(v)
            elif key == "normal":
                desc.normal_tex = tex(v, srgb=False)
            elif key == "mask":
                desc.mask_tex = tex(v, srgb=False)
            elif key == "roughness":
                if kind_name == "Hair" and isinstance(v, (list, tuple)):
                    # vec2: (beta_m longitudinal, beta_n azimuthal)
                    desc.roughness = float(v[0])
                    desc.hair_beta_n = float(v[1] if len(v) > 1 else v[0])
                    continue
                t = tex(v, srgb=False)
                if t >= 0:
                    desc.roughness_tex = t
                    desc.roughness = 1.0
                elif isinstance(v, (int, float)):
                    desc.roughness = float(v)
                    if kind_name == "Hair":
                        desc.hair_beta_n = float(v)
            elif key == "eumelanin" and kind_name == "Hair":
                ce = float(v)
                cp = float(body.get("pheomelanin", 0.0))
                # ref hair_material.zig absorptionFromMelanin
                desc.hair_mu_a = (
                    ce * np.array([0.419, 0.697, 1.37], np.float32)
                    + cp * np.array([0.187, 0.4, 1.05], np.float32)
                )
            elif key == "metallic":
                desc.metallic = float(v)
            elif key == "metal_preset":
                # ref material_provider.zig:277: color <- conductor
                # reflectance, fully metallic
                desc.color = metal_preset_f0(str(v))
                desc.metallic = 1.0
            elif key == "ior":
                desc.ior = float(v)
            elif key == "abbe":
                desc.abbe = float(v)
            elif key == "specular":
                desc.specular = float(v)
            elif key == "anisotropy_rotation":
                if isinstance(v, (int, float)):
                    desc.anisotropy_rotation = float(v)
            elif key == "anisotropy":
                # surface materials: GGX anisotropy; volumetric: HG g
                if kind_name == "Volumetric":
                    desc.volumetric_anisotropy = float(v)
                else:
                    desc.anisotropy = float(v)
            elif key == "attenuation_distance":
                desc.attenuation_distance = float(v)
            elif key == "two_sided":
                desc.two_sided = bool(v)
            elif key == "translucency":
                desc.translucency = float(v)
            elif key == "priority":
                # nested-dielectric priority (ref material_provider.zig:189)
                desc.priority = int(v)
            elif key == "flakes" and isinstance(v, dict):
                # ref material_provider.zig:326 + substitute_material.zig
                # setFlakesRoughness/setFlakesSize
                desc.flakes_coverage = float(v.get("coverage", 0.5))
                if "color" in v:
                    desc.flakes_color = _read_color(v["color"])
                r = float(np.clip(v.get("roughness", 0.1), 0.01, 1.0))
                desc.flakes_alpha = r * r
                size = float(v.get("size", 0.01))
                n_fl = 1.5396 / max(size * size, 1e-12)
                desc.flakes_res = max(4.0, float(np.ceil(np.sqrt(n_fl / 4.0))))
            elif key == "coating" and isinstance(v, dict):
                # ref substitute_coating.zig: thickness-attenuated clearcoat
                desc.coating_thickness = float(v.get("thickness", 0.001))
                desc.coating_ior = float(v.get("ior", 1.5))
                cr = v.get("roughness", 0.2)
                desc.coating_roughness = float(cr) if isinstance(cr, (int, float)) else 0.2
            elif key == "emittance":
                spectrum = _read_color(v.get("spectrum", [1.0, 1.0, 1.0]))
                desc.emission = np.float32(v.get("value", 1.0)) * spectrum
                if "emission_map" in v:
                    desc.emission_tex = tex(v["emission_map"], srgb=False)
                if "profile" in v and isinstance(v["profile"], dict) and "file" in v["profile"]:
                    # IES angular profile (ref emittance.zig profile)
                    from ..io import fs
                    from ..io.ies import ies_profile_bins

                    try:
                        desc.ies = ies_profile_bins(
                            fs.read_text(v["profile"]["file"], base_dir)
                        )
                    except (OSError, FileNotFoundError):
                        desc.ies = None
            elif key in ("density", "density_map") and builder is not None:
                # heterogeneous volume density (ref volumetric_material.zig
                # density_map): a voxel file or a procedural recipe
                grid = _load_density_grid(v, base_dir)
                if grid is not None:
                    desc.density_grid = builder.add_density_grid(grid)
        break
    return desc


def _load_density_grid(v, base_dir: str):
    """Density node -> host float32[nz,ny,nx] grid, or None.

    Accepts {"file": "*.npy"|"*.sub"} or
    {"procedural": {"type": "fbm", "resolution": N, "octaves": K, "seed": S}}.
    """
    from .grids import make_fbm_grid

    if not isinstance(v, dict):
        return None
    if "procedural" in v:
        p = v["procedural"]
        if p.get("type") == "constant":
            n = int(p.get("resolution", 4))
            return np.full((n, n, n), float(p.get("value", 1.0)), np.float32)
        return make_fbm_grid(
            n=int(p.get("resolution", 64)),
            octaves=int(p.get("octaves", 4)),
            seed=int(p.get("seed", 7)),
            sharpness=float(p.get("sharpness", 2.0)),
        ) * float(p.get("scale", 1.0))
    if "file" in v:
        from ..io.resource import GLOBAL as _rc

        def _load(path):
            try:
                if path.endswith(".npy"):
                    return np.asarray(np.load(path), np.float32)
                if path.endswith(".sub"):
                    from ..io.sub import read_sub_volume

                    return read_sub_volume(path)
            except (OSError, ValueError):
                return None
            return None

        # volume sequences (smoke_####.sub) resolve per frame; static
        # grids cache across the frame loop (ref cache.zig:131)
        return _rc.get_or_load(
            "grid", os.path.join(base_dir, v["file"]), (), _load
        )
    return None


def materials_to_table(descs: list[MaterialDesc]) -> Materials:
    n = max(len(descs), 1)
    descs = descs or [MaterialDesc()]
    return Materials(
        kind=jnp.asarray([d.kind for d in descs], jnp.int32),
        color=jnp.asarray(np.stack([d.color for d in descs]), jnp.float32),
        roughness=jnp.asarray([d.roughness for d in descs], jnp.float32),
        metallic=jnp.asarray([d.metallic for d in descs], jnp.float32),
        ior=jnp.asarray([d.ior for d in descs], jnp.float32),
        specular=jnp.asarray([d.specular for d in descs], jnp.float32),
        emission=jnp.asarray(np.stack([d.emission for d in descs]), jnp.float32),
        two_sided=jnp.asarray([d.two_sided for d in descs], bool),
        attenuation_distance=jnp.asarray([d.attenuation_distance for d in descs], jnp.float32),
        anisotropy=jnp.asarray([d.anisotropy for d in descs], jnp.float32),
        subsurface_color=jnp.asarray(np.stack([d.subsurface_color for d in descs]), jnp.float32),
        volumetric_anisotropy=jnp.asarray([d.volumetric_anisotropy for d in descs], jnp.float32),
        color_tex=jnp.asarray([d.color_tex for d in descs], jnp.int32),
        roughness_tex=jnp.asarray([d.roughness_tex for d in descs], jnp.int32),
        normal_tex=jnp.asarray([d.normal_tex for d in descs], jnp.int32),
        emission_tex=jnp.asarray([d.emission_tex for d in descs], jnp.int32),
        mask_tex=jnp.asarray([d.mask_tex for d in descs], jnp.int32),
        density_grid=jnp.asarray([d.density_grid for d in descs], jnp.int32),
        translucency=jnp.asarray([d.translucency for d in descs], jnp.float32),
        ies=jnp.asarray(
            np.stack(
                [d.ies if d.ies is not None else np.ones(32, np.float32) for d in descs]
            ),
            jnp.float32,
        ),
        coating_thickness=jnp.asarray([d.coating_thickness for d in descs], jnp.float32),
        coating_ior=jnp.asarray([d.coating_ior for d in descs], jnp.float32),
        coating_roughness=jnp.asarray([d.coating_roughness for d in descs], jnp.float32),
        priority=jnp.asarray([d.priority for d in descs], jnp.int32),
        hair=jnp.asarray(np.stack([_hair_constants(d) for d in descs]), jnp.float32),
        anisotropy_rotation=jnp.asarray([d.anisotropy_rotation for d in descs], jnp.float32),
        abbe=jnp.asarray([d.abbe for d in descs], jnp.float32),
        flakes_coverage=jnp.asarray([d.flakes_coverage for d in descs], jnp.float32),
        flakes_alpha=jnp.asarray([d.flakes_alpha for d in descs], jnp.float32),
        flakes_res=jnp.asarray([d.flakes_res for d in descs], jnp.float32),
        flakes_color=jnp.asarray(np.stack([d.flakes_color for d in descs]), jnp.float32),
    )


def _hair_constants(d: MaterialDesc) -> np.ndarray:
    """[mu_a(3), v0, s, alpha] (ref hair_material.zig commit())."""
    if d.kind != int(MaterialKind.HAIR):
        return np.zeros(6, np.float32)
    bm = float(np.clip(d.roughness, 1e-3, 1.0))
    bn = float(np.clip(d.hair_beta_n, 1e-3, 1.0))
    v0 = (0.726 * bm + 0.812 * bm * bm + 3.7 * bm**20) ** 2
    s = 0.626657069 * (0.265 * bn + 1.194 * bn * bn + 5.372 * bn**22)
    if d.hair_mu_a is not None:
        mu_a = np.asarray(d.hair_mu_a, np.float64)
    else:
        denom = (
            5.969 - 0.215 * bn + 2.532 * bn**2 - 10.73 * bn**3
            + 5.574 * bn**4 + 0.245 * bn**5
        )
        sq = np.log(np.clip(np.asarray(d.color, np.float64), 1e-5, 1.0)) / denom
        mu_a = sq * sq
    alpha = np.deg2rad(2.0)
    return np.concatenate([mu_a, [v0, s, alpha]]).astype(np.float32)


# ---------------------------------------------------------------------------
# Scene building
# ---------------------------------------------------------------------------


@dataclass
class PropDesc:
    shape: int
    trafo: Transformation
    material: int
    visible_camera: bool = True
    visible_reflection: bool = True
    visible_shadow: bool = True
    is_light: bool = False
    mesh_id: int = -1
    curve_id: int = -1  # curve-shape arena id (ref shape/curve/)
    cloud_id: int = -1  # point-cloud arena id (ref shape/point/)
    shadow_catcher: bool = False  # ref scene_loader.zig:312 setShadowCatcher
    # keyframed motion: [(time_seconds, Transformation), ...] or None
    # (ref util/animation_loader.zig / scene/space.zig setFrames)
    animation: "list | None" = None


def _np_mat3_to_quat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix (rows = object axes) -> quaternion [x,y,z,w] (host)."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [(m[1, 2] - m[2, 1]) / s, (m[2, 0] - m[0, 2]) / s,
             (m[0, 1] - m[1, 0]) / s, 0.25 * s], np.float64)
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12)) * 2
    q = np.empty(4, np.float64)
    q[i] = 0.25 * s
    q[j] = (m[i, j] + m[j, i]) / s
    q[k] = (m[i, k] + m[k, i]) / s
    q[3] = (m[j, k] - m[k, j]) / s
    return q


def _np_quat_to_mat3(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
            [2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)],
            [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def _np_slerp(qa: np.ndarray, qb: np.ndarray, t: float) -> np.ndarray:
    d = float(np.dot(qa, qb))
    if d < 0.0:
        qb = -qb
        d = -d
    if d > 0.9995:
        q = qa + t * (qb - qa)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * qa + np.sin(t * th) * qb) / np.sin(th)


def eval_animation(anim: list, t: float) -> Transformation:
    """Piecewise lerp/slerp a keyframe track at time t (seconds); clamped at
    the ends (ref scene/space.zig transformationAtMaybeStatic slerp)."""
    times = [k[0] for k in anim]
    if t <= times[0]:
        return anim[0][1]
    if t >= times[-1]:
        return anim[-1][1]
    i = 0
    while i + 1 < len(times) and times[i + 1] <= t:
        i += 1
    span = max(times[i + 1] - times[i], 1e-12)
    f = (t - times[i]) / span
    a, b = anim[i][1], anim[i + 1][1]
    q = _np_slerp(_np_mat3_to_quat(np.asarray(a.rotation, np.float64)),
                  _np_mat3_to_quat(np.asarray(b.rotation, np.float64)), f)
    return Transformation(
        position=((1 - f) * a.position + f * b.position).astype(np.float32),
        rotation=_np_quat_to_mat3(q).astype(np.float32),
        scale=((1 - f) * a.scale + f * b.scale).astype(np.float32),
    )


def parse_animation(value, parent: Transformation, default: Transformation):
    """Entity "animation" node -> [(time, Transformation)] (ref
    util/animation_loader.zig: keyframes with time/transformation, or
    transformations+times, stepped by frames_per_second)."""
    if not isinstance(value, dict):
        return None
    fps = float(value.get("frames_per_second", 0.0))
    step = (1.0 / fps) if fps > 0.0 else (1.0 / 60.0)
    frames = []
    if "keyframes" in value:
        t = 0.0
        for kf in value["keyframes"]:
            kt = float(kf.get("time", t))
            trafo = parent.compose(read_transformation(kf.get("transformation"), base=default))
            frames.append((kt, trafo))
            t = kt + step
    elif "transformations" in value:
        times = value.get("times", [])
        t = 0.0
        for i, tr in enumerate(value["transformations"]):
            kt = float(times[i]) if i < len(times) else t
            frames.append((kt, parent.compose(read_transformation(tr, base=default))))
            t = kt + step
    return frames or None


def load_image(path: str):
    """Load an image file by extension (PNG/HDR/EXR). Returns numpy or None."""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".png":
            from ..io.png import read_png

            return read_png(path)
        if ext == ".hdr":
            from ..io.rgbe import read_hdr

            return read_hdr(path)
        if ext == ".exr":
            from ..io.exr import read_exr

            chans = read_exr(path)
            keys = [k for k in ("R", "G", "B") if k in chans] or sorted(chans)
            return np.stack([chans[k] for k in keys], axis=-1)
    except (OSError, ValueError, KeyError, AssertionError) as e:
        import logging

        logging.getLogger(__name__).warning("texture load failed %s: %s", path, e)
    return None


class SceneBuilder:
    base_dir: str = ""

    def __init__(self):
        self.props: list[PropDesc] = []
        self.materials: list[MaterialDesc] = []
        self.textures = TextureBuilder()
        self.meshes: list[HostMesh] = []
        self.density_grids: list[np.ndarray] = []
        self._mesh_by_name: dict[str, int] = {}
        self._mat_by_name: dict[str, int] = {}
        self.curve_shapes: list = []
        self._curves_by_name: dict[str, int] = {}
        self.point_clouds: list = []
        self._points_by_name: dict[str, int] = {}
        # pending portal entities (ref scene_loader.zig loadPortal): each
        # {"trafo": Transformation, "light": raw light index, "prop": created
        # prop index or None} — resolved in build() once lights are known
        self.portals: list[dict] = []
        # fallback material id 0
        self._fallback = self.add_material(MaterialDesc(color=np.array([1.0, 0.0, 0.6], np.float32)))

    def load_texture(
        self, path: str, srgb: bool = False,
        clamp_u: bool = False, clamp_v: bool = False, texcoord: int = 0,
    ) -> int:
        key = (path, srgb, clamp_u, clamp_v, texcoord)
        if not hasattr(self, "_tex_by_path"):
            self._tex_by_path = {}
        if key in self._tex_by_path:
            return self._tex_by_path[key]
        # decoded pixels ride the process-wide variant-keyed cache (ref
        # resource/cache.zig:86): per-frame scene rebuilds skip the IO +
        # decode for static names; '#'-patterned sequences reload
        from ..io.resource import GLOBAL as _rc

        img = _rc.get_or_load("image", path, (), load_image)
        if img is None:
            return -1
        tid = self.textures.add(
            img, srgb=srgb, clamp_u=clamp_u, clamp_v=clamp_v, texcoord=texcoord
        )
        self._tex_by_path[key] = tid
        return tid

    def add_texture_image(self, image: np.ndarray, srgb: bool = False) -> int:
        return self.textures.add(image, srgb=srgb)

    def add_capi_image_ref(self, image_id: int, image: np.ndarray, srgb: bool = False) -> int:
        """Texture slot backed by a C-API image id: su_image_update replaces
        the slot's pixels via refresh_capi_image (ref capi.zig image store)."""
        img = np.asarray(image)
        if img.ndim == 4:  # [D,H,W,C] from su_image_create — 2D slice
            img = img[0]
        tid = self.textures.add(img, srgb=srgb)
        if not hasattr(self, "_capi_tex_refs"):
            self._capi_tex_refs = {}
        self._capi_tex_refs[tid] = (int(image_id), bool(srgb))
        return tid

    def refresh_capi_image(self, image_id: int, image: np.ndarray) -> bool:
        """Propagate su_image_update into every texture slot referencing
        `image_id`. Returns True when any slot changed."""
        changed = False
        for tid, (iid, srgb) in getattr(self, "_capi_tex_refs", {}).items():
            if iid == int(image_id):
                img = np.asarray(image)
                if img.ndim == 4:
                    img = img[0]
                self.textures.replace(tid, img, srgb=srgb)
                changed = True
        return changed

    def add_density_grid(self, grid: np.ndarray) -> int:
        self.density_grids.append(np.asarray(grid, np.float32))
        return len(self.density_grids) - 1

    def add_material(self, desc: MaterialDesc, name: str | None = None) -> int:
        idx = len(self.materials)
        self.materials.append(desc)
        if name:
            self._mat_by_name[name] = idx
        return idx

    def material_id(self, name: str, local_materials: dict[str, dict]) -> int:
        if name in self._mat_by_name:
            return self._mat_by_name[name]
        if name in local_materials:
            return self.add_material(
                parse_material(local_materials[name], self, self.base_dir), name
            )
        return self._fallback

    def add_prop(self, desc: PropDesc) -> int:
        self.props.append(desc)
        return len(self.props) - 1

    def add_mesh(self, mesh: HostMesh, name: str | None = None) -> int:
        if name and name in self._mesh_by_name:
            return self._mesh_by_name[name]
        self.meshes.append(mesh)
        # async BLAS build (ref shape_provider.zig:127): the SAH build runs
        # on a pool thread while the rest of the scene loads. Named meshes
        # cache the build future process-wide (content-fingerprinted) so a
        # frame loop's per-frame scene rebuilds skip static SAH builds
        # (ref resource/cache.zig:86 variant entries).
        if not hasattr(self, "_mesh_builds"):
            self._mesh_builds = []
        from .trimesh import submit_blas_build

        if name:
            import zlib

            from ..io.resource import GLOBAL as _rc

            pos = np.asarray(mesh.positions)
            idx = np.asarray(mesh.indices)
            fp = (
                pos.shape, idx.shape,
                zlib.crc32(pos[:: max(1, len(pos) // 64)].tobytes()),
                zlib.crc32(idx[:: max(1, len(idx) // 64)].tobytes()),
                mesh.positions_end is not None,
            )
            fut = _rc.get_or_load(
                "blas", name, fp, lambda _: submit_blas_build(mesh)
            )
        else:
            fut = submit_blas_build(mesh)
        self._mesh_builds.append(fut)
        mid = len(self.meshes) - 1
        if name:
            self._mesh_by_name[name] = mid
        return mid

    def add_curves(self, curves, name: str | None = None) -> int:
        """Register a HostCurves set (hair strands); returns curve id."""
        if name and name in self._curves_by_name:
            return self._curves_by_name[name]
        if not hasattr(self, "curve_shapes"):
            self.curve_shapes = []
        if not hasattr(self, "_curve_builds"):
            self._curve_builds = []
        self.curve_shapes.append(curves)
        from .curves import submit_blas_build as submit_curve_build

        self._curve_builds.append(submit_curve_build(curves))
        cid = len(self.curve_shapes) - 1
        if name:
            self._curves_by_name[name] = cid
        return cid

    def add_curve_prop(self, curve_id: int, trafo: Transformation, material: int, **kw) -> int:
        return self.add_prop(
            PropDesc(
                shape=int(ShapeType.CURVES),
                trafo=trafo,
                material=material,
                curve_id=curve_id,
                **kw,
            )
        )

    def add_points(self, cloud, name: str | None = None) -> int:
        """Register a HostPoints cloud; returns cloud id."""
        if name and name in self._points_by_name:
            return self._points_by_name[name]
        self.point_clouds.append(cloud)
        pid = len(self.point_clouds) - 1
        if name:
            self._points_by_name[name] = pid
        return pid

    def add_point_prop(self, cloud_id: int, trafo: Transformation, material: int, **kw) -> int:
        return self.add_prop(
            PropDesc(
                shape=int(ShapeType.POINTS),
                trafo=trafo,
                material=material,
                cloud_id=cloud_id,
                **kw,
            )
        )

    def add_mesh_prop(self, mesh_id: int, trafo: Transformation, material: int, **kw) -> int:
        return self.add_prop(
            PropDesc(
                shape=int(ShapeType.TRIANGLE_MESH),
                trafo=trafo,
                material=material,
                mesh_id=mesh_id,
                **kw,
            )
        )

    # -- light power: luminance-weighted emission * emitting measure
    def _light_weight(self, p: PropDesc) -> float:
        m = self.materials[p.material]
        lum = float(np.dot(np.asarray(LUMINANCE_WEIGHTS, np.float64), m.emission))
        if m.kind == int(MaterialKind.VOLUMETRIC):
            # volume light power ~ emission x world volume x mean density
            # (ref scene.zig extent = shape.volume(scale) for volumetric)
            if lum <= 0.0 or p.shape != int(ShapeType.CUBE):
                return 0.0
            s = p.trafo.scale
            vol = float(s[0] * s[1] * s[2])
            dens = 1.0
            if m.density_grid >= 0 and self.density_grids:
                dens = float(np.mean(self.density_grids[m.density_grid]))
            return lum * vol * max(dens, 1e-6)
        if m.emission_tex >= 0:
            # emission maps scale the radiance per texel — weight by the
            # map's mean luminance (ref shape_sampler ImageImpl totals)
            img = np.asarray(self.textures._images[m.emission_tex], np.float64)
            lum *= float(
                (img[..., :3] @ np.asarray(LUMINANCE_WEIGHTS, np.float64)).mean()
            )
        if lum <= 0.0:
            return 0.0
        s = p.trafo.scale
        shape = ShapeType(p.shape)
        if shape == ShapeType.RECTANGLE:
            area = float(s[0] * s[1])
        elif shape == ShapeType.DISK:
            area = float(np.pi * (0.5 * s[0]) ** 2)
        elif shape == ShapeType.SPHERE:
            area = float(4.0 * np.pi * (0.5 * s[0]) ** 2)
        elif shape == ShapeType.CUBE:
            area = float(2.0 * (s[0] * s[1] + s[0] * s[2] + s[1] * s[2]))
        elif shape == ShapeType.DISTANT:
            area = float(2.0 * np.pi * (1.0 - np.sqrt(1.0 / (s[0] ** 2 + 1.0))))
        elif shape == ShapeType.TRIANGLE_MESH:
            area = self._mesh_world_area(p)
        else:  # canopy/dome env
            area = 4.0 * np.pi
        if m.two_sided:
            area *= 2.0
        return lum * area

    def _mesh_world_area(self, p: PropDesc) -> float:
        mesh = self.meshes[p.mesh_id]
        pos = np.asarray(mesh.positions, np.float32)
        idx = np.asarray(mesh.indices, np.int32)
        # world-space vertices under the prop transform
        w = (pos * p.trafo.scale) @ p.trafo.rotation + p.trafo.position
        e1 = w[idx[:, 1]] - w[idx[:, 0]]
        e2 = w[idx[:, 2]] - w[idx[:, 0]]
        return float(0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum())

    def _mesh_light_tree(self, p: PropDesc, mesh_host_info: list[dict]):
        """Primitive light tree over one emissive mesh's triangles (ref
        light_tree.zig:520): position/orientation-aware NEE triangle
        selection for LARGE emitters — the flat area CDF picks far-side
        triangles as readily as near ones.

        Returns (tree, aux arrays dict, arena_base) for SceneData."""
        from .light_tree import build_light_tree

        mesh = self.meshes[p.mesh_id]
        pos = np.asarray(mesh.positions, np.float32)
        idx = np.asarray(mesh.indices, np.int32)
        w = (pos * p.trafo.scale) @ p.trafo.rotation + p.trafo.position
        v0, v1, v2 = w[idx[:, 0]], w[idx[:, 1]], w[idx[:, 2]]
        info = mesh_host_info[p.mesh_id]
        order = np.asarray(info["order"])
        # spatial splits duplicate straddling refs — the tree samples the
        # FIRST copy of each triangle only; every copy's hit maps to that
        # canonical local entry below, keeping both pdf sides consistent
        _, sel = np.unique(order, return_index=True)
        sel = np.sort(sel)
        ord_u = order[sel]
        v0, v1, v2 = v0[ord_u], v1[ord_u], v2[ord_u]
        cn = np.cross(v1 - v0, v2 - v0)
        areas = 0.5 * np.linalg.norm(cn, axis=-1)
        nrm = cn / np.maximum(np.linalg.norm(cn, axis=-1, keepdims=True), 1e-20)
        cent = (v0 + v1 + v2) / 3.0
        radii = np.sqrt(
            np.maximum.reduce(
                [np.sum((v - cent) ** 2, axis=-1) for v in (v0, v1, v2)]
            )
        )
        two = bool(self.materials[p.material].two_sided)
        cones = np.concatenate([nrm, np.ones((len(nrm), 1), np.float32)], -1)
        tree = build_light_tree(
            cent.astype(np.float32), radii.astype(np.float32),
            cones.astype(np.float32),
            np.maximum(areas, 1e-12).astype(np.float32),
            np.full(len(nrm), two, bool), np.ones(len(nrm), bool),
        )
        arena_ids = np.asarray(info["arena_ids"], np.int64)
        base = int(arena_ids.min())
        # every arena copy of a triangle maps to its canonical local entry
        local_by_tri = np.full(int(order.max()) + 1, -1, np.int32)
        local_by_tri[ord_u] = np.arange(len(ord_u), dtype=np.int32)
        local_of = np.full(int(arena_ids.max()) - base + 1, -1, np.int32)
        local_of[arena_ids - base] = local_by_tri[order]
        aux = {
            "arena": jnp.asarray(arena_ids[sel].astype(np.int32)),
            "area": jnp.asarray(areas.astype(np.float32)),
            "local_of": jnp.asarray(local_of),
        }
        return tree, aux, base

    def _mesh_light_cdf(self, p: PropDesc, mesh_host_info: list[dict]):
        """Per-triangle world-area CDF; triangle ids are ARENA-global
        (padded layout — taken from build_arena's host info)."""
        mesh = self.meshes[p.mesh_id]
        pos = np.asarray(mesh.positions, np.float32)
        idx = np.asarray(mesh.indices, np.int32)
        w = (pos * p.trafo.scale) @ p.trafo.rotation + p.trafo.position
        e1 = w[idx[:, 1]] - w[idx[:, 0]]
        e2 = w[idx[:, 2]] - w[idx[:, 0]]
        areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        info = mesh_host_info[p.mesh_id]
        order = np.asarray(info["order"])
        # dedupe spatially-split copies: CDF over first copies only (a
        # duplicated entry would double its triangle's sampling weight
        # while the uniform-area pdf stayed 1/total — bias)
        _, sel = np.unique(order, return_index=True)
        sel = np.sort(sel)
        areas = areas[order[sel]]  # BVH leaf order, canonical copies
        total = max(float(areas.sum()), 1e-20)
        cdf = np.cumsum(areas / total).astype(np.float32)
        cdf[-1] = 1.0
        return cdf, np.asarray(info["arena_ids"])[sel], total

    def build(self, time0: float = 0.0, time1: float | None = None) -> SceneData:
        """Compile to device arrays. [time0, time1] is the frame's shutter
        interval (seconds); animated props are resolved to start/end
        transforms and interpolated per lane at trace time
        (ref scene/space.zig setFrames + transformationAtMaybeStatic)."""
        props = self.props or [
            PropDesc(int(ShapeType.SPHERE), Transformation(scale=np.zeros(3, np.float32)), 0)
        ]
        if time1 is None:
            time1 = time0
        animated_props: dict[int, int] = {}
        animated_curves: dict[int, bool] = {}
        animated_points: dict[int, bool] = {}
        animated_lights: dict[int, bool] = {}
        end_trafo: dict[int, Transformation] = {}
        key_trafos: dict[int, list[Transformation]] = {}
        # shutter keyframe count: scenes whose animations have keyframes
        # strictly INSIDE the shutter resample the interval at K=8 uniform
        # frames (the static-shape analog of the reference's tick-granular
        # keyframe chain, space.zig:163 setFrames); plain two-point
        # animations keep K=1 (endpoint slerp, zero extra cost)
        K = 1
        if time1 > time0:
            for p in props:
                if p.animation and any(
                    time0 < kt < time1 for kt, _ in p.animation
                ):
                    K = 8
                    break
        infinite_shapes = {
            int(ShapeType.DOME), int(ShapeType.CANOPY), int(ShapeType.DISTANT),
        }
        for i, p in enumerate(props):
            if not p.animation:
                continue
            samples = [
                eval_animation(
                    p.animation, time0 + (time1 - time0) * (j / K)
                )
                for j in range(K + 1)
            ]
            t_start = samples[0]
            t_end = samples[-1]
            p.trafo = t_start
            moving = time1 > time0 and any(
                not (
                    np.allclose(t_start.position, tj.position)
                    and np.allclose(t_start.rotation, tj.rotation)
                    and np.allclose(t_start.scale, tj.scale)
                )
                for tj in samples[1:]
            )
            if not moving:
                continue
            if (p.is_light and p.mesh_id >= 0) or p.shape in infinite_shapes:
                from ..utils.log import warning

                warning(
                    "motion blur on emissive-mesh/infinite-light props is "
                    f"not supported yet; prop {i} rendered at shutter start"
                )
                continue
            if p.curve_id >= 0:
                animated_curves[i] = True
            elif p.cloud_id >= 0:
                animated_points[i] = True
            else:
                # analytic (incl. analytic LIGHTS: NEE/pdfs take per-lane
                # transforms, light_sampling._animated_transforms) and mesh
                # props. Mesh rigid motion rides the instance-table
                # ENDPOINTS (trimesh.py; interior keyframes resample to the
                # endpoint chord there); fragments use the animated_props
                # path. key = (prop, shape): dict KEYS ride the pytree
                # treedef, so jit specializes statically
                animated_props[(i, p.shape)] = True
                if p.is_light:
                    animated_lights[i] = True
            end_trafo[i] = t_end
            key_trafos[i] = samples
        # emissive volumetric props are lights automatically (ref
        # scene.zig createLight: Class Volume/VolumeImage for
        # mat.scatteringVolume() with emission) — cube volumes only (MVP)
        for p in props:
            m = self.materials[p.material]
            if (
                m.kind == int(MaterialKind.VOLUMETRIC)
                and float(np.max(np.asarray(m.emission))) > 0.0
                and p.shape == int(ShapeType.CUBE)
            ):
                p.is_light = True
        # portal lights (ref scene_loader.zig loadPortal + light_material.zig
        # preparePortalSampling): the linked env light becomes an invisible
        # prototype and a portal rect with its material takes over emission
        portal_pending = []
        if self.portals:
            from ..utils.log import warning

            lights_declared = [
                i for i, p in enumerate(props)
                if p.is_light and self._light_weight(p) > 0.0
            ]
            for pe in self.portals:
                if pe["prop"] is None:
                    li = pe["light"]
                    if li >= len(lights_declared):
                        warning(f"Portal links undefined light {li}")
                        pe["prop"] = -1
                        continue
                    linked = lights_declared[li]
                    lp = props[linked]
                    lm = self.materials[lp.material]
                    if lp.shape != int(ShapeType.DOME) or lm.emission_tex < 0:
                        warning(
                            "Portal link must be an image-mapped dome light"
                        )
                        pe["prop"] = -1
                        continue
                    lp.is_light = False
                    lp.visible_camera = False
                    lp.visible_reflection = False
                    lp.visible_shadow = False
                    props.append(
                        PropDesc(
                            shape=int(ShapeType.RECTANGLE),
                            trafo=pe["trafo"],
                            material=lp.material,
                            is_light=True,
                            visible_shadow=False,
                        )
                    )
                    pe["prop"] = len(props) - 1
                    pe["dome_prop"] = linked
                if pe["prop"] >= 0:
                    portal_pending.append(pe)

        light_props = [i for i, p in enumerate(props) if p.is_light and self._light_weight(p) > 0.0]
        weights = np.array([self._light_weight(props[i]) for i in light_props], np.float32)
        if len(light_props) == 0:
            light_props = [0]
            weights = np.zeros(1, np.float32)
        total = weights.sum()
        cdf = np.concatenate([[0.0], np.cumsum(weights) / (total if total > 0 else 1.0)]).astype(np.float32)
        cdf[-1] = 1.0

        prop_light = np.full(len(props), -1, np.int32)
        for li, pi in enumerate(light_props):
            prop_light[pi] = li

        # bake the portal-image windowed distributions (host; ref
        # light_material.zig PortalLuminanceContext)
        portals_dict = {}
        for pe in portal_pending:
            from .portal import build_portal_dist, make_portal_dist

            pp = props[pe["prop"]]
            dome_rot = np.asarray(props[pe["dome_prop"]].trafo.rotation, np.float64)
            env_img = np.asarray(
                self.textures._images[self.materials[pp.material].emission_tex]
            )
            lum, _power = build_portal_dist(
                env_img, dome_rot, np.asarray(pp.trafo.rotation, np.float64)
            )
            li = light_props.index(pe["prop"])
            portals_dict[(li, pe["prop"])] = make_portal_dist(lum, dome_rot)

        # world bounding sphere over finite props (emission sampling of
        # infinite lights; conservative prop-sphere union)
        wmin = np.full(3, np.inf)
        wmax = np.full(3, -np.inf)
        for p in props:
            if p.shape in (int(ShapeType.CANOPY), int(ShapeType.DOME), int(ShapeType.DISTANT)):
                continue
            r = float(np.linalg.norm(np.asarray(p.trafo.scale, np.float64)))
            c = np.asarray(p.trafo.position, np.float64)
            wmin = np.minimum(wmin, c - r)
            wmax = np.maximum(wmax, c + r)
        if not np.isfinite(wmin).all():
            wmin, wmax = np.full(3, -1.0), np.full(3, 1.0)
        world_center = tuple(float(x) for x in 0.5 * (wmin + wmax))
        world_radius = float(max(np.linalg.norm(wmax - wmin) * 0.5, 1e-3))

        if self.meshes:
            meshes, mesh_host_info, mesh_host_arena = build_arena(
                self.meshes,
                return_host_info=True,
                prebuilt=getattr(self, "_mesh_builds", None),
            )
        else:
            meshes, mesh_host_info, mesh_host_arena = None, [], None
        mesh_props = [i for i, p in enumerate(props) if p.mesh_id >= 0]
        curve_arena = None
        curve_props = [i for i, p in enumerate(props) if p.curve_id >= 0]
        if getattr(self, "curve_shapes", None) and curve_props:
            from .curves import build_arena as build_curve_arena

            curve_arena = build_curve_arena(
                self.curve_shapes, prebuilt=getattr(self, "_curve_builds", None)
            )
        point_arena = None
        point_props = [i for i, p in enumerate(props) if p.cloud_id >= 0]
        if getattr(self, "point_clouds", None) and point_props:
            from .points import build_arena as build_point_arena
            from .points import resolve_motion

            # frame-sequence clouds (sow particles) resolve to this frame's
            # shutter span here; static clouds pass through unchanged
            point_arena = build_point_arena(
                [resolve_motion(c, time0, time1) for c in self.point_clouds]
            )
        texture_arena = self.textures.build()

        # participating media: volumetric-material props never binary-block
        # shadow rays — NEE multiplies by their transmittance instead
        # (ref scene.zig visibility -> propTransmittance)
        volume_props = {}
        visible_shadow = []
        for i, p in enumerate(props):
            m = self.materials[p.material]
            if m.kind == int(MaterialKind.VOLUMETRIC):
                volume_props[(i, p.material, m.density_grid, p.shape)] = True
                visible_shadow.append(False)
            else:
                visible_shadow.append(p.visible_shadow)
        # mesh instance table (ref prop_tree.zig; dense two-phase walk)
        mesh_instances = None
        if meshes is not None and mesh_props:
            from .trimesh import build_instance_table

            instances = []
            for i in mesh_props:
                p = props[i]
                ins = {
                    "prop": i,
                    "mesh": p.mesh_id,
                    "rot": np.asarray(p.trafo.rotation, np.float32),
                    "pos": np.asarray(p.trafo.position, np.float32),
                    "scale": np.asarray(p.trafo.scale, np.float32),
                    "vis": (p.visible_camera, p.visible_reflection, visible_shadow[i]),
                }
                if i in end_trafo:
                    te = end_trafo[i]
                    ins["rot1"] = np.asarray(te.rotation, np.float32)
                    ins["pos1"] = np.asarray(te.position, np.float32)
                    ins["scale1"] = np.asarray(te.scale, np.float32)
                instances.append(ins)
            mesh_instances = build_instance_table(mesh_host_arena, instances)

        mat_features = {}
        if any(d.coating_thickness > 0.0 for d in self.materials):
            mat_features["coating"] = True
        if any(d.translucency > 0.0 for d in self.materials):
            mat_features["translucency"] = True
        if any(d.ies is not None for d in self.materials):
            mat_features["ies"] = True
        # media present: any material that can fill a prop interior — glass
        # (Beer absorption / rough refraction) or volumetric; without any,
        # the integrators compile the medium machinery away entirely
        if any(
            d.kind in (int(MaterialKind.GLASS), int(MaterialKind.VOLUMETRIC))
            for d in self.materials
        ):
            mat_features["media"] = True
        # finer-grained gates: glass BSDF sampling and volumetric
        # null-interface machinery each compile to nothing when absent
        if any(d.kind == int(MaterialKind.GLASS) for d in self.materials):
            mat_features["glass"] = True
        if any(d.kind == int(MaterialKind.VOLUMETRIC) for d in self.materials):
            mat_features["volumetric"] = True
        if any(d.kind == int(MaterialKind.HAIR) for d in self.materials):
            mat_features["hair"] = True
        # emissive media: tracking collects absorption emission and NEE gets
        # volume lights (ref trackingEmission + light.zig Volume class)
        if any(
            d.kind == int(MaterialKind.VOLUMETRIC)
            and float(np.max(np.asarray(d.emission))) > 0.0
            for d in self.materials
        ):
            mat_features["vol_emission"] = True
        if any(
            d.kind == int(MaterialKind.GLASS) and d.abbe > 0.0
            for d in self.materials
        ):
            mat_features["dispersion"] = True
        # spectral (non-grey) media: when every VOLUMETRIC material's
        # attenuation and subsurface colors are channel-uniform, mu_t and
        # mu_s are grey and decomposition-tracking collision weights are
        # EXACTLY 1 — the tracking loops drop the whole per-step spectral
        # weight machinery (volume.py grey paths). Only a non-grey
        # volumetric medium compiles the spectral estimator (glass
        # interiors always take the closed form, so they don't gate this).
        if any(
            d.kind == int(MaterialKind.VOLUMETRIC)
            and (
                float(np.ptp(np.asarray(d.color))) > 0.0
                or float(np.ptp(np.asarray(d.subsurface_color))) > 0.0
            )
            for d in self.materials
        ):
            mat_features["spectral_media"] = True
        # opacity cutouts (ref stochasticOpacity): the passthrough bounce
        # and the shadow re-march loop compile only when a mask exists
        if any(d.mask_tex >= 0 for d in self.materials):
            mat_features["mask"] = True
        # metallic flakes: the 3x3x4 jittered-grid search compiles only
        # when a material has coverage > 0
        if any(d.flakes_coverage > 0.0 for d in self.materials):
            mat_features["flakes"] = True
        # triplanar/object-space texture coordinates: the alternate-uv
        # computation compiles only when a texture asks for it
        if any(tc > 0 for tc in getattr(self.textures, "_texcoord", [])):
            mat_features["triplanar"] = True
        # shadow catchers (ref vertex.zig shadow_catcher_*): dual-occlusion
        # NEE + shadow-density alpha compile only when a catcher exists
        if any(p.shadow_catcher for p in self.props):
            mat_features["shadow_catchers"] = True
        # anisotropic GGX only compiles when a surface material asks for it
        if any(
            d.kind == int(MaterialKind.SUBSTITUTE) and d.anisotropy > 0.0
            for d in self.materials
        ):
            mat_features["aniso"] = True
        # rough dielectrics do NEE too (ref glass_sample.zig:51 canEvaluate
        # is true for the rough path) — only compile the microfacet-dielectric
        # eval when such a material exists
        from ..render.materials import MIN_ROUGHNESS

        if any(
            d.kind == int(MaterialKind.GLASS) and d.roughness > MIN_ROUGHNESS * 1.001
            for d in self.materials
        ):
            mat_features["rough_glass"] = True

        grid_arena = None
        if self.density_grids:
            from .grids import build_grid_arena

            grid_arena = build_grid_arena(self.density_grids)

        # many-light tree over finite lights (ref light_tree_builder.zig);
        # CDF-only selection is kept as the fallback and for light tracing
        light_tree = None
        if len(light_props) >= 2 and float(weights.sum()) > 0.0:
            from .light_tree import build_light_tree

            lcen, lrad, lcone, lfin = [], [], [], []
            for pi in light_props:
                p = props[pi]
                c, r, cone, finite = self._light_bounds(p)
                lcen.append(c)
                lrad.append(r)
                lcone.append(cone)
                lfin.append(finite)
            light_tree = build_light_tree(
                np.stack(lcen),
                np.asarray(lrad, np.float32),
                np.stack(lcone),
                weights,
                np.asarray(
                    [self.materials[props[i].material].two_sided for i in light_props], bool
                ),
                np.asarray(lfin, bool),
            )
        # env-map importance sampling for dome/canopy lights with emission
        # maps (ref shape_sampler.zig ImageImpl: Distribution2D over the
        # emission texture; realized as an alias table — see env_sampling)
        env_sampler = None
        env_entries = []
        for li, pi in enumerate(light_props):
            p = props[pi]
            m = self.materials[p.material]
            if (
                p.shape in (int(ShapeType.DOME), int(ShapeType.CANOPY))
                and m.emission_tex >= 0
            ):
                env_entries.append(
                    (
                        self.textures._images[m.emission_tex],
                        p.shape == int(ShapeType.CANOPY),
                        li,
                    )
                )
        if env_entries:
            from .env_sampling import build_env_sampler

            env_sampler = build_env_sampler(env_entries)

        animated_ids = {i for i, _ in animated_props}
        groups: dict[int, list[int]] = {}
        for i, p in enumerate(props):
            if p.mesh_id < 0 and p.curve_id < 0 and p.cloud_id < 0 and i not in animated_ids:
                groups.setdefault(p.shape, []).append(i)
        prop_groups = {k: jnp.asarray(v, jnp.int32) for k, v in sorted(groups.items())}

        # motion arrays (only when something moves): [P, K+1, 10] keyframe
        # rows (quat | pos | scale), consecutive quats sign-aligned on the
        # host so the device slerp takes the shortest arc
        prop_keys = None
        if animated_props or animated_curves or animated_points:
            # device-convention quaternions (vm.quat_to_mat3): use the
            # trimesh converter, NOT _np_mat3_to_quat — the loader's host
            # pair is self-consistent but CONJUGATE to the device's
            # (caught by TestAnimatedLight: a rotated animated light's
            # normal flipped)
            from .trimesh import _np_quat as _mat3_to_quat_device

            P = len(props)
            keys = np.zeros((P, K + 1, 10), np.float32)
            for i, p in enumerate(props):
                samples = key_trafos.get(i) or [p.trafo] * (K + 1)
                qprev = None
                for j, tj in enumerate(samples):
                    q = _mat3_to_quat_device(np.asarray(tj.rotation, np.float64))
                    if qprev is not None and np.dot(qprev, q) < 0.0:
                        q = -q
                    qprev = q
                    keys[i, j, 0:4] = q
                    keys[i, j, 4:7] = tj.position
                    keys[i, j, 7:10] = tj.scale
            prop_keys = jnp.asarray(keys)
        # volume lights sample interior points, not surfaces: keyed by the
        # static "volume" entry instead of their (cube) shape
        vol_light = [
            self.materials[props[i].material].kind == int(MaterialKind.VOLUMETRIC)
            for i in light_props
        ]
        # NOTE: keys are STRINGS ("3", "volume", "portal") — jax sorts
        # pytree dict keys and mixed int/str keys are not orderable
        portal_lis = {li for (li, _pp) in portals_dict}
        light_shapes = {
            str(int(props[i].shape)): True
            for li, (i, v) in enumerate(zip(light_props, vol_light))
            if not v and li not in portal_lis
        }
        if any(vol_light):
            light_shapes["volume"] = True
        if portals_dict:
            light_shapes["portal"] = True
        vol_light_dist = {}
        for li, pi in enumerate(light_props):
            m = self.materials[props[pi].material]
            if vol_light[li] and m.density_grid >= 0 and self.density_grids:
                from ..core.distribution import Distribution3D

                vol_light_dist[li] = Distribution3D.build(
                    self.density_grids[m.density_grid]
                )

        # emissive-mesh triangle CDF arena (+ primitive light trees for
        # LARGE emitters, ref light_tree.zig:520)
        light_area = []
        tri_off, tri_cnt = [], []
        tri_cdf_parts, tri_idx_parts = [], []
        mesh_light_trees = {}
        off = 0
        for li, pi in enumerate(light_props):
            p = props[pi]
            if p.mesh_id >= 0 and weights[li] > 0.0:
                mcdf, tids, total = self._mesh_light_cdf(p, mesh_host_info)
                light_area.append(total)
                tri_off.append(off)
                tri_cnt.append(len(tids))
                tri_cdf_parts.append(mcdf)
                tri_idx_parts.append(tids)
                off += len(tids)
                if len(tids) >= _PRIM_TREE_MIN and not p.animation:
                    tr, aux, base = self._mesh_light_tree(p, mesh_host_info)
                    mesh_light_trees[(li, base)] = (tr, aux)
            else:
                light_area.append(0.0)
                tri_off.append(-1)
                tri_cnt.append(0)
        tri_cdf = (
            jnp.asarray(np.concatenate(tri_cdf_parts), jnp.float32)
            if tri_cdf_parts
            else jnp.zeros((1,), jnp.float32)
        )
        tri_idx = (
            jnp.asarray(np.concatenate(tri_idx_parts), jnp.int32)
            if tri_idx_parts
            else jnp.zeros((1,), jnp.int32)
        )

        return SceneData(
            prop_shape=jnp.asarray([p.shape for p in props], jnp.int32),
            prop_rot=jnp.asarray(np.stack([p.trafo.rotation for p in props]), jnp.float32),
            prop_pos=jnp.asarray(np.stack([p.trafo.position for p in props]), jnp.float32),
            prop_scale=jnp.asarray(np.stack([p.trafo.scale for p in props]), jnp.float32),
            prop_material=jnp.asarray([p.material for p in props], jnp.int32),
            prop_visible_camera=jnp.asarray([p.visible_camera for p in props], bool),
            prop_visible_reflection=jnp.asarray([p.visible_reflection for p in props], bool),
            prop_visible_shadow=jnp.asarray(visible_shadow, bool),
            materials=materials_to_table(self.materials),
            lights=Lights(
                prop=jnp.asarray(light_props, jnp.int32),
                two_sided=jnp.asarray([self.materials[props[i].material].two_sided for i in light_props], bool),
                cdf=jnp.asarray(cdf, jnp.float32),
                area=jnp.asarray(light_area, jnp.float32),
                tri_offset=jnp.asarray(tri_off, jnp.int32),
                tri_count=jnp.asarray(tri_cnt, jnp.int32),
                tri_cdf=tri_cdf,
                tri_idx=tri_idx,
                volume=jnp.asarray(vol_light, bool),
            ),
            prop_light=jnp.asarray(prop_light, jnp.int32),
            meshes=meshes,
            mesh_props=jnp.asarray(mesh_props, jnp.int32) if meshes is not None else None,
            prop_mesh=jnp.asarray([p.mesh_id for p in props], jnp.int32) if meshes is not None else None,
            mesh_instances=mesh_instances,
            curves=curve_arena,
            # animated curve/point props leave the static scans — they get
            # the per-lane shutter-transform pass (shapes._intersect_curves)
            curve_props=jnp.asarray(
                [i for i in curve_props if i not in animated_curves], jnp.int32
            ) if curve_arena is not None else None,
            prop_curve=jnp.asarray([p.curve_id for p in props], jnp.int32) if curve_arena is not None else None,
            prop_shadow_catcher=jnp.asarray(
                [p.shadow_catcher for p in props], bool
            ),
            points=point_arena,
            point_props=jnp.asarray(
                [i for i in point_props if i not in animated_points], jnp.int32
            ) if point_arena is not None else None,
            prop_cloud=jnp.asarray([p.cloud_id for p in props], jnp.int32) if point_arena is not None else None,
            textures=texture_arena,
            prop_groups=prop_groups,
            light_shapes=light_shapes,
            volume_props=volume_props,
            grids=grid_arena,
            light_tree=light_tree,
            mat_features=mat_features,
            env=env_sampler,
            vol_light_dist=vol_light_dist or None,
            portals=portals_dict or None,
            mesh_light_trees=mesh_light_trees or None,
            animated_props=animated_props or None,
            animated_curves=animated_curves or None,
            animated_points=animated_points or None,
            animated_lights=animated_lights or None,
            world_center=world_center,
            world_radius=world_radius,
            prop_keys=prop_keys,
        )

    def _light_bounds(self, p: PropDesc):
        """(center[3], radius, cone[4], finite) of one light prop — the
        bounding sphere + normal cone the tree's importance uses
        (ref light_tree_builder.zig light properties)."""
        t = p.trafo
        pos = np.asarray(t.position, np.float32)
        rot = np.asarray(t.rotation, np.float32)
        s = np.asarray(t.scale, np.float32)
        full = np.array([0.0, 0.0, 1.0, -1.0], np.float32)
        if p.shape == int(ShapeType.RECTANGLE):
            r = 0.5 * float(np.hypot(s[0], s[1]))
            return pos, r, np.concatenate([rot[2], [1.0]]).astype(np.float32), True
        if p.shape == int(ShapeType.DISK):
            return pos, 0.5 * float(s[0]), np.concatenate([rot[2], [1.0]]).astype(np.float32), True
        if p.shape == int(ShapeType.SPHERE):
            return pos, 0.5 * float(s[0]), full, True
        if p.shape == int(ShapeType.CUBE):
            return pos, 0.5 * float(np.linalg.norm(s)), full, True
        if p.shape == int(ShapeType.TRIANGLE_MESH) and p.mesh_id >= 0:
            v = np.asarray(self.meshes[p.mesh_id].positions, np.float32)
            vw = (v * s) @ rot + pos  # rows of rot are object axes in world
            lo, hi = vw.min(axis=0), vw.max(axis=0)
            c = 0.5 * (lo + hi)
            return c.astype(np.float32), 0.5 * float(np.linalg.norm(hi - lo)), full, True
        # infinite shapes (distant/canopy/dome)
        return pos, 0.0, full, False


def load_scene_dict(
    root: dict,
    builder: SceneBuilder | None = None,
    base_dir: str = "",
    time0: float = 0.0,
    time1: float | None = None,
) -> SceneData:
    builder = builder or SceneBuilder()
    local_materials: dict[str, dict] = {}
    for m in root.get("materials", []):
        if "name" in m:
            local_materials[m["name"]] = m
    _load_entities(root.get("entities", []), Transformation(), local_materials, builder, base_dir)
    return builder.build(time0, time1)


def _is_point_cloud_file(path: str) -> bool:
    """Cheap sniff: JSON geometry with point_list topology (sow output)."""
    if not path.endswith((".json", ".mesh")):
        return False
    try:
        with open(path, "rb") as f:
            head = f.read(4096)
        return b"point_list" in head
    except OSError:
        return False


def _load_entities(entities, parent: Transformation, local_materials, builder: SceneBuilder, base_dir: str):
    builder.base_dir = base_dir
    for e in entities:
        if "file" in e:
            path = os.path.join(base_dir, e["file"])
            with open(path) as f:
                sub = json.load(f)
            for m in sub.get("materials", []):
                if "name" in m and m["name"] not in local_materials:
                    local_materials[m["name"]] = m
            _load_entities(sub.get("entities", []), parent, local_materials, builder, os.path.dirname(path))
            continue
        etype = e.get("type")
        local = read_transformation(e.get("transformation"))
        trafo = parent.compose(local)
        anim = parse_animation(e.get("animation"), parent, local)
        if etype == "Sky":
            _load_sky(e, builder)
        elif etype == "Portal":
            # portal rect linked to an env light (ref scene_loader.zig
            # loadPortal: "shape" must resolve to a rectangle, "light"
            # indexes the scene's lights in declaration order)
            stype = e.get("shape", {}).get("type")
            if stype not in (None, "Rectangle"):
                from ..utils.log import warning

                warning(f"Portal shape {stype!r} unsupported (Rectangle only)")
            else:
                builder.portals.append(
                    {"trafo": trafo, "light": int(e.get("light", 0)), "prop": None}
                )
        elif etype == "Instancer":
            _load_instancer(e, trafo, local_materials, builder, base_dir)
        elif etype in ("Prop", "Light"):
            shape_node = e.get("shape", {})
            stype = shape_node.get("type")
            mesh_id = -1
            curve_id = -1
            cloud_id = -1
            if stype in _SHAPE_NAMES:
                shape = int(_SHAPE_NAMES[stype])
            elif "file" in shape_node and _is_point_cloud_file(
                os.path.join(base_dir, shape_node["file"])
            ):
                # point-list geometry (ref shape_provider.zig PointList
                # branch; sow writes these)
                from ..io.mesh import load_point_cloud_file

                fname = shape_node["file"]
                if fname in builder._points_by_name:
                    cloud_id = builder._points_by_name[fname]
                else:
                    cloud = load_point_cloud_file(os.path.join(base_dir, fname))
                    cloud_id = builder.add_points(cloud, fname)
                shape = int(ShapeType.POINTS)
            elif "file" in shape_node and shape_node["file"].endswith(".hair"):
                # hair strands (ref shape_provider.zig HAIR branch)
                from ..io.hair import read_hair
                from ..io.fs import open_stream

                fname = shape_node["file"]
                if fname in builder._curves_by_name:
                    curve_id = builder._curves_by_name[fname]
                else:
                    from ..io.resource import GLOBAL as _rc

                    def _load_hair(path):
                        with open_stream(path) as f:
                            return read_hair(f)

                    hair = _rc.get_or_load(
                        "hair", os.path.join(base_dir, fname), (), _load_hair
                    )
                    curve_id = builder.add_curves(hair, fname)
                shape = int(ShapeType.CURVES)
            elif "file" in shape_node:
                from ..io.mesh import load_mesh_file

                fname = shape_node["file"]
                if fname.endswith((".gltf", ".glb")):
                    # glTF expands into its own props (meshes + materials,
                    # ref util/gltf_loader.zig) under this entity's transform
                    from ..io.gltf import load_gltf_into

                    load_gltf_into(builder, os.path.join(base_dir, fname), trafo)
                    if "entities" in e:
                        _load_entities(e["entities"], trafo, local_materials, builder, base_dir)
                    continue
                if fname in builder._mesh_by_name:
                    mesh_id = builder._mesh_by_name[fname]
                else:
                    from ..io.resource import GLOBAL as _rc

                    path = fname if fname.startswith("proc:") else os.path.join(base_dir, fname)
                    mesh = _rc.get_or_load("mesh", path, (), load_mesh_file)
                    mesh_id = builder.add_mesh(mesh, fname) if mesh is not None else -1
                shape = int(ShapeType.TRIANGLE_MESH) if mesh_id >= 0 else None
            else:
                shape = None
            if shape is not None:
                mat_names = e.get("materials", [])
                mat = (
                    builder.material_id(mat_names[0], local_materials)
                    if mat_names
                    else builder._fallback
                )
                is_light = etype == "Light"
                vis = e.get("visibility", {})
                # lights default to non-occluding (ref scene_loader.zig loadProp
                # unoccluding_default: shadow rays pass through area lights)
                occluding = bool(e.get("occluding", not is_light))
                builder.add_prop(
                    PropDesc(
                        shape=shape,
                        trafo=trafo,
                        material=mat,
                        visible_camera=bool(vis.get("in_camera", True)),
                        visible_reflection=bool(vis.get("in_reflection", True)),
                        visible_shadow=occluding and bool(vis.get("in_shadow", True)),
                        is_light=is_light,
                        mesh_id=mesh_id,
                        curve_id=curve_id,
                        cloud_id=cloud_id,
                        shadow_catcher=bool(e.get("shadow_catcher", False)),
                        animation=anim,
                    )
                )
        # children inherit this entity's transform
        if "entities" in e:
            _load_entities(e["entities"], trafo, local_materials, builder, base_dir)


def _load_instancer(e: dict, parent: Transformation, local_materials, builder: SceneBuilder, base_dir: str) -> None:
    """Instancer entity: a prototype replicated under many transforms.

    ref: scene_loader.zig loadInstancer + prop/instancer.zig. Instances of a
    mesh prototype share ONE BVH in the mesh arena (prop_mesh indirection),
    so this is memory-wise two-level instancing; traversal runs per instance.
    Accepts zyg-style nested files ("source") and sow-baked .instancer JSON
    ({prototype, instances:[{position, rotation_matrix|rotation, scale}]})."""
    node = e
    if "source" in e:
        path = os.path.join(base_dir, e["source"])
        try:
            with open(path) as f:
                node = json.load(f)
        except OSError as err:
            import logging

            logging.getLogger(__name__).warning("instancer load failed %s: %s", path, err)
            return

    proto = node.get("prototype")
    instances = node.get("instances", [])
    if proto is None or not instances:
        return

    shape_node = proto.get("shape", {})
    mesh_id = -1
    shape = None
    stype = shape_node.get("type")
    if stype in _SHAPE_NAMES:
        shape = int(_SHAPE_NAMES[stype])
    elif "file" in shape_node:
        from ..io.mesh import load_mesh_file

        fname = shape_node["file"]
        path = fname if fname.startswith("proc:") else os.path.join(base_dir, fname)
        mesh = load_mesh_file(path)
        if mesh is None:
            return
        mesh_id = builder.add_mesh(mesh, fname)
        shape = int(ShapeType.TRIANGLE_MESH)
    if shape is None:
        return

    mat_names = proto.get("materials", e.get("materials", []))
    mat = builder.material_id(mat_names[0], local_materials) if mat_names else builder._fallback

    for inst in instances:
        t = Transformation()
        if "position" in inst:
            t.position = _read_vec3(inst["position"])
        if "rotation_matrix" in inst:
            t.rotation = np.asarray(inst["rotation_matrix"], np.float32).reshape(3, 3)
        elif "rotation" in inst:
            t.rotation = rotation_matrix_from_euler_degrees(_read_vec3(inst["rotation"]))
        if "scale" in inst:
            t.scale = _read_vec3(inst["scale"], default=(1.0, 1.0, 1.0))
        builder.add_prop(
            PropDesc(shape=shape, trafo=parent.compose(t), material=mat, mesh_id=mesh_id)
        )


def _load_sky(e: dict, builder: SceneBuilder) -> None:
    """Sky entity -> baked Preetham dome + distant sun (ref core/sky/sky.zig:
    the reference bakes its Prague-model sky to an env image the same way)."""
    from .sky import bake_sky, sun_radiance, SUN_ANGULAR_RADIUS

    params = e.get("parameters", {})
    turbidity = float(params.get("turbidity", 2.5))
    sun_node = params.get("sun", {})
    if "rotation" in sun_node:
        sun_rot = rotation_matrix_from_euler_degrees(_read_vec3(sun_node["rotation"]))
    else:
        # default: sun overhead shining straight down (ref sky.zig:41)
        sun_rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    sun_dir = sun_rot[2]

    sky_img = bake_sky(sun_dir, turbidity)
    tex = builder.add_texture_image(sky_img)
    sky_mat = builder.add_material(
        MaterialDesc(
            kind=int(MaterialKind.LIGHT),
            emission=np.ones(3, np.float32),
            emission_tex=tex,
        )
    )
    builder.add_prop(
        PropDesc(
            shape=int(ShapeType.DOME),
            trafo=Transformation(),
            material=sky_mat,
            visible_shadow=False,
            is_light=True,
        )
    )
    sun_mat = builder.add_material(
        MaterialDesc(kind=int(MaterialKind.LIGHT), emission=sun_radiance(sun_dir, turbidity))
    )
    radius = float(np.tan(SUN_ANGULAR_RADIUS))
    builder.add_prop(
        PropDesc(
            shape=int(ShapeType.DISTANT),
            trafo=Transformation(
                rotation=sun_rot.astype(np.float32),
                scale=np.array([radius, radius, radius], np.float32),
            ),
            material=sun_mat,
            visible_shadow=False,
            is_light=True,
        )
    )


def load_scene_file(path: str, time0: float = 0.0, time1: float | None = None) -> SceneData:
    from ..io import fs

    with fs.open_stream(path) as f:
        root = json.loads(f.read().decode())
    resolved = fs.resolve(path) or path
    return load_scene_dict(
        root, base_dir=os.path.dirname(resolved), time0=time0, time1=time1
    )
