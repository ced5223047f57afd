"""Scene representation compiled to flat device arrays (SoA).

The reference keeps an entity-component Scene with tagged-union dispatch
(ref: src/core/scene/scene.zig). The TPU-native equivalent is a pytree of
flat arrays: per-prop transforms + shape/material ids, a material parameter
table, and light records with a power CDF. Everything is static-shaped, so a
given scene jits once; prop/material/light counts vary per scene, not per
frame.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ShapeType(enum.IntEnum):
    """Builtin analytic shapes; ids match the reference's resource manager
    builtin order (ref: src/core/resource/manager.zig ShapeID)."""

    CANOPY = 0
    CUBE = 1
    DISK = 2
    DISTANT = 3
    DOME = 4
    RECTANGLE = 5
    SPHERE = 6
    TRIANGLE_MESH = 7  # + mesh_id selects which mesh
    CURVES = 8  # + curve_id: hair/fur segment arenas (ref shape/curve/)
    POINTS = 9  # + cloud_id: sphere-particle clouds (ref shape/point/)


INFINITE_SHAPES = (ShapeType.CANOPY, ShapeType.DISTANT, ShapeType.DOME)


class MaterialKind(enum.IntEnum):
    SUBSTITUTE = 0
    GLASS = 1
    LIGHT = 2
    DEBUG = 3
    VOLUMETRIC = 4
    HAIR = 5
    SKY = 6


class Materials(NamedTuple):
    """SoA material table. One row per material; texture slots are indices
    into the scene's texture atlas (-1 = uniform value only)."""

    kind: jax.Array  # int32[M]
    color: jax.Array  # float32[M,3]  base color / glass absorption color
    roughness: jax.Array  # float32[M]
    metallic: jax.Array  # float32[M]
    ior: jax.Array  # float32[M]
    specular: jax.Array  # float32[M] f0 scale
    emission: jax.Array  # float32[M,3] radiance (value*spectrum)
    two_sided: jax.Array  # bool[M]
    attenuation_distance: jax.Array  # float32[M] (glass/SSS)
    anisotropy: jax.Array  # float32[M] (surface GGX anisotropy)
    subsurface_color: jax.Array  # float32[M,3] single-scatter albedo source
    volumetric_anisotropy: jax.Array  # float32[M] HG g
    # texture indices into the atlas (-1 when uniform)
    color_tex: jax.Array  # int32[M]
    roughness_tex: jax.Array  # int32[M]
    normal_tex: jax.Array  # int32[M]
    emission_tex: jax.Array  # int32[M]
    # heterogeneous volume: density grid index into SceneData.grids (-1 =
    # homogeneous; ref volumetric_material.zig density_map)
    density_grid: jax.Array = None  # int32[M]
    # substitute extras (ref substitute_material.zig)
    translucency: jax.Array = None  # float32[M] diffuse transmission fraction
    # IES angular intensity profile over theta in [0,pi] (ones = no profile;
    # ref emittance.zig profile texture)
    ies: jax.Array = None  # float32[M,32]
    coating_thickness: jax.Array = None  # float32[M] clearcoat layer (0 = off)
    coating_ior: jax.Array = None  # float32[M]
    coating_roughness: jax.Array = None  # float32[M]
    # nested-dielectric priority (ref prop/medium.zig Medium.priority i8):
    # at an interface, the higher-priority medium wins; ties -> newest entry
    priority: jax.Array = None  # int32[M]
    # hair BSDF constants (ref hair_material.zig commit()): packed
    # [mu_a(3), v0, s, alpha_rad] per material; zeros for non-hair rows
    hair: jax.Array = None  # float32[M,6]
    # anisotropy rotation in turns (ref substitute rotation texture)
    anisotropy_rotation: jax.Array = None  # float32[M]
    # glass dispersion (ref glass_material.zig abbe; 0 = none)
    abbe: jax.Array = None  # float32[M]
    # opacity mask texture (ref material_base.zig mask + stochasticOpacity;
    # -1 = fully opaque)
    mask_tex: jax.Array = None  # int32[M]
    # metallic flakes (ref substitute_material.zig flakes_*): coverage 0 =
    # off; res = jittered flake-grid resolution; alpha = flake roughness^2
    flakes_coverage: jax.Array = None  # float32[M]
    flakes_alpha: jax.Array = None  # float32[M]
    flakes_res: jax.Array = None  # float32[M]
    flakes_color: jax.Array = None  # float32[M,3]

    @property
    def count(self) -> int:
        return self.kind.shape[0]


class Lights(NamedTuple):
    """Light records + power distribution (ref: src/core/scene/light/light.zig)."""

    prop: jax.Array  # int32[L] prop index
    two_sided: jax.Array  # bool[L]
    # power-distribution CDF over lights, cdf[0]=0..cdf[L]=1
    cdf: jax.Array  # float32[L+1]
    # emissive-mesh sampling (ref shape_sampler.zig MeshImpl): per-light slice
    # into the triangle CDF arena; -1 offset for non-mesh lights
    area: jax.Array = None  # float32[L] world-space emitting area
    tri_offset: jax.Array = None  # int32[L]
    tri_count: jax.Array = None  # int32[L]
    tri_cdf: jax.Array = None  # float32[sum] per-light normalized area CDF
    tri_idx: jax.Array = None  # int32[sum] arena triangle ids
    # volume lights (ref light.zig Class Volume/VolumeImage): emissive
    # volumetric props — NEE samples a point INSIDE the prop
    volume: jax.Array = None  # bool[L]

    @property
    def count(self) -> int:
        return self.prop.shape[0]


class SceneData(NamedTuple):
    # finite props (participate in intersection)
    prop_shape: jax.Array  # int32[P]
    prop_rot: jax.Array  # float32[P,3,3] rows = object axes in world
    prop_pos: jax.Array  # float32[P,3]
    prop_scale: jax.Array  # float32[P,3]
    prop_material: jax.Array  # int32[P] part-0 material id
    prop_visible_camera: jax.Array  # bool[P]
    prop_visible_reflection: jax.Array  # bool[P]
    prop_visible_shadow: jax.Array  # bool[P]  (occluding)
    materials: Materials
    lights: Lights
    # prop index -> light index (-1 if not a light)
    prop_light: jax.Array  # int32[P]
    # triangle meshes: arena of all mesh BVHs/tris + the props that use them
    meshes: "object" = None  # trimesh.MeshArena | None
    mesh_props: jax.Array = None  # int32[Pm] prop indices with mesh shapes
    prop_mesh: jax.Array = None  # int32[P] mesh id (-1 = analytic)
    # mesh instances (ref prop/prop_tree.zig): dense world-AABB phase +
    # per-round wide-BLAS walks, rigid motion in the per-lane transform
    mesh_instances: "object" = None  # trimesh.InstanceTable | None
    # curve (hair) shapes: rounded-cone segment arena (ref shape/curve/)
    curves: "object" = None  # curves.CurveArena | None
    curve_props: jax.Array = None  # int32[Pc] prop indices with curve shapes
    prop_curve: jax.Array = None  # int32[P] curve shape id (-1 = none)
    # shadow catchers (ref scene.zig propIsShadowCatcher)
    prop_shadow_catcher: jax.Array = None  # bool[P]
    # point clouds: sphere-particle arena (ref shape/point/)
    points: "object" = None  # points.PointArena | None
    point_props: jax.Array = None  # int32[Pp] prop indices with point shapes
    prop_cloud: jax.Array = None  # int32[P] cloud id (-1 = none)
    # texture arena (None when the scene has no image textures)
    textures: "object" = None  # textures.TextureArena | None
    # props grouped by shape type for batched intersection: static dict
    # {shape_type: int32[G] prop indices}; built by the loader
    prop_groups: dict = None
    # shape types present among LIGHTS: static dict {shape_type: True} —
    # dict keys ride the pytree treedef, so jit specializes on them
    light_shapes: dict = None
    # participating media: STATIC dict {(prop, material, grid): True} over
    # props whose material is VOLUMETRIC — shadow rays compute transmittance
    # through these instead of binary occlusion (ref scene.zig visibility);
    # keys ride the treedef so homo/hetero compile statically per prop
    volume_props: dict = None
    grids: "object" = None  # grids.GridArena | None (hetero density arena)
    # many-light sampling tree (None = power-CDF selection only;
    # ref light/light_tree.zig)
    light_tree: "object" = None  # light_tree.LightTree | None
    # STATIC dict of material features present ({"coating", "translucency"});
    # absent features compile to nothing in the BSDF (None = enable all)
    mat_features: dict = None
    # env-map importance sampler for dome/canopy lights with emission maps
    # (ref shape_sampler.zig ImageImpl); None = uniform direction sampling
    env: "object" = None  # env_sampling.EnvSampler | None
    # heterogeneous volume lights: {light_index: Distribution3D over the
    # density grid} (ref shape_sampler.zig VolumeImpl); keys are static
    vol_light_dist: dict = None
    # portal lights (ref portal.zig + shape_sampler.zig PortalImpl):
    # STATIC dict {(light_index, portal_prop): portal.PortalDist} — the
    # int keys ride the treedef, values are device distributions
    portals: dict = None
    # primitive light trees over LARGE emissive meshes (ref
    # light_tree.zig:520 primitive trees): STATIC dict
    # {(light_index, arena_base): (LightTree-over-triangles,
    #  {"arena": local->arena tri id, "area": local tri areas,
    #   "local_of": arena-offset -> local (-1 pad)})}. Small emitters stay
    # on the flat area CDF.
    mesh_light_trees: dict = None
    # motion blur (ref scene/space.zig keyframed transforms): shutter-end
    # transforms for animated props; per-lane time slerps between the two.
    # STATIC dict {prop_index: shape_type} — scenes without motion compile
    # all of this away. None fields when no prop moves.
    animated_props: dict = None
    # animated curve / point-cloud props (STATIC dicts {prop_index: True}):
    # these props leave the static curve_props/point_props scans and get a
    # per-lane shutter transform pass instead (shapes._intersect_curves)
    animated_curves: dict = None
    animated_points: dict = None
    # animated ANALYTIC LIGHT props (subset of animated_props): NEE
    # sampling and hit pdfs override their static transforms per lane
    # (light_sampling._animated_transforms)
    animated_lights: dict = None
    # world bounding sphere (host floats): emission sampling of infinite
    # lights needs a finite aperture (ref scene.zig caustic_aabb / sampleFrom)
    world_center: tuple = (0.0, 0.0, 0.0)
    world_radius: float = 1.0
    # keyframed shutter transforms (ref scene/space.zig setFrames): K+1
    # uniformly-spaced frames across [shutter_open, shutter_close], each
    # row (quat 4 | pos 3 | scale 3). K=1 is plain endpoint slerp; scenes
    # with keyframes INSIDE the shutter resample at K=8 (the TPU analog of
    # the reference's tick-granularity keyframe chain). None = no motion.
    prop_keys: jax.Array = None  # float32[P, K+1, 10]

    @property
    def num_props(self) -> int:
        return self.prop_shape.shape[0]

    def is_infinite(self) -> jax.Array:
        s = self.prop_shape
        out = jnp.zeros_like(s, dtype=bool)
        for t in INFINITE_SHAPES:
            out = out | (s == int(t))
        return out


def default_materials(n: int = 1) -> Materials:
    """A fallback (bright pink) material table, matching the reference's
    fallback material idea (ref: material_provider.zig createFallbackMaterial)."""
    return Materials(
        kind=jnp.zeros((n,), jnp.int32),
        color=jnp.tile(jnp.array([[1.0, 0.0, 0.6]], jnp.float32), (n, 1)),
        roughness=jnp.full((n,), 0.8, jnp.float32),
        metallic=jnp.zeros((n,), jnp.float32),
        ior=jnp.full((n,), 1.46, jnp.float32),
        specular=jnp.ones((n,), jnp.float32),
        emission=jnp.zeros((n, 3), jnp.float32),
        two_sided=jnp.zeros((n,), bool),
        attenuation_distance=jnp.zeros((n,), jnp.float32),
        anisotropy=jnp.zeros((n,), jnp.float32),
        subsurface_color=jnp.zeros((n, 3), jnp.float32),
        volumetric_anisotropy=jnp.zeros((n,), jnp.float32),
        color_tex=jnp.full((n,), -1, jnp.int32),
        roughness_tex=jnp.full((n,), -1, jnp.int32),
        normal_tex=jnp.full((n,), -1, jnp.int32),
        emission_tex=jnp.full((n,), -1, jnp.int32),
        density_grid=jnp.full((n,), -1, jnp.int32),
        translucency=jnp.zeros((n,), jnp.float32),
        ies=jnp.ones((n, 32), jnp.float32),
        coating_thickness=jnp.zeros((n,), jnp.float32),
        coating_ior=jnp.full((n,), 1.5, jnp.float32),
        coating_roughness=jnp.full((n,), 0.2, jnp.float32),
        priority=jnp.zeros((n,), jnp.int32),
    )


RAY_MAX_T = np.float32(2.14748313e9)  # ref: src/core/scene/ray_offset.zig RayMaxT
