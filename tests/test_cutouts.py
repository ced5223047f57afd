"""Stochastic alpha/opacity cutouts (ref material_base.zig stochasticOpacity,
triangle_tree.zig intersectOpacity + visibility): masked materials pass rays
through with probability 1 - opacity, on both camera/bounce rays and NEE
shadow rays."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.take import Take, IntegratorSettings
from zyg_tpu.render.camera import PerspectiveCamera
from zyg_tpu.render.driver import Driver
from zyg_tpu.scene.loader import MaterialDesc, PropDesc, SceneBuilder, Transformation
import zyg_tpu.scene.types as st


def _scene(mask_value):
    """Camera -> masked screen rectangle -> emissive back wall; a floor
    below catches NEE light through the screen."""
    b = SceneBuilder()
    # half-transparent (or given) uniform mask
    mask = np.full((8, 8, 1), mask_value, np.float32)
    mt = b.add_texture_image(mask)
    screen = b.add_material(
        MaterialDesc(color=np.array([0.8, 0.2, 0.2], np.float32), roughness=0.6,
                     mask_tex=mt)
    )
    lightm = b.add_material(
        MaterialDesc(kind=2, emission=np.full(3, 5.0, np.float32))
    )
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(position=np.array([0, 0, 1.0], np.float32),
                             scale=np.array([4.0, 4.0, 1], np.float32)),
        material=screen,
    ))
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    b.add_prop(PropDesc(
        shape=int(st.ShapeType.RECTANGLE),
        trafo=Transformation(position=np.array([0, 0, 3.0], np.float32),
                             rotation=flip,
                             scale=np.array([4.0, 4.0, 1], np.float32)),
        material=lightm, is_light=True,
    ))
    return b.build()


def _render(scene, spp=32):
    take = Take()
    take.num_samples_per_pixel = spp
    take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=3)
    cam = PerspectiveCamera(resolution=(24, 24), fov=np.deg2rad(40))
    cam.position = np.array([0, 0, -2.0], np.float32)
    take.cameras = [cam]
    return Driver(take=take, scene=scene).render_frame()


class TestCutouts:
    def test_feature_gate(self):
        sc = _scene(0.5)
        assert "mask" in sc.mat_features
        sc2_b = SceneBuilder()
        m = sc2_b.add_material(MaterialDesc())
        sc2_b.add_prop(PropDesc(shape=int(st.ShapeType.SPHERE),
                                trafo=Transformation(), material=m))
        assert "mask" not in sc2_b.build().mat_features

    def test_opacity_scales_transmission(self):
        """Center pixels look through the screen at the emissive wall:
        radiance ~ (1 - opacity) * wall + opacity * screen_response."""
        full = _render(_scene(1.0)).mean()          # opaque: dark screen back
        none = _render(_scene(0.0)).mean()          # invisible screen: wall
        half = _render(_scene(0.5)).mean()
        assert full < 0.2
        assert none > 4.0  # wall emission = 5
        mid = 0.5 * (full + none)
        assert abs(half - mid) / mid < 0.2

    def test_shadow_rays_pass_through_cutout(self):
        """A zero-opacity screen between floor and light must not shadow
        the floor: compare NEE-lit floor with and without the screen."""
        def floor_scene(with_screen, mask_value=0.0):
            b = SceneBuilder()
            floor = b.add_material(MaterialDesc(color=np.full(3, 0.7, np.float32), roughness=0.9))
            lightm = b.add_material(MaterialDesc(kind=2, emission=np.full(3, 20.0, np.float32)))
            rot_up = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
            b.add_prop(PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(position=np.array([0, -1.0, 0], np.float32),
                                     rotation=rot_up,
                                     scale=np.array([3.0, 3.0, 1], np.float32)),
                material=floor,
            ))
            if with_screen:
                mt = b.add_texture_image(np.full((4, 4, 1), mask_value, np.float32))
                sm = b.add_material(MaterialDesc(color=np.full(3, 0.5, np.float32),
                                                 mask_tex=mt))
                b.add_prop(PropDesc(
                    shape=int(st.ShapeType.RECTANGLE),
                    trafo=Transformation(position=np.array([0, 0.5, 0], np.float32),
                                         rotation=rot_up,
                                         scale=np.array([3.0, 3.0, 1], np.float32)),
                    material=sm,
                ))
            rot_down = np.array([[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32)
            b.add_prop(PropDesc(
                shape=int(st.ShapeType.RECTANGLE),
                trafo=Transformation(position=np.array([0, 2.0, 0], np.float32),
                                     rotation=rot_down,
                                     scale=np.array([2.0, 2.0, 1], np.float32)),
                material=lightm, is_light=True, visible_shadow=True,
            ))
            take = Take()
            take.num_samples_per_pixel = 48
            take.integrator = IntegratorSettings(kind="PTMIS", max_depth_surface=2)
            cam = PerspectiveCamera(resolution=(16, 16), fov=np.deg2rad(50))
            cam.position = np.array([0, 0.2, -3.0], np.float32)
            cam.look_at = np.array([0, -1.0, 0], np.float32)
            take.cameras = [cam]
            return Driver(take=take, scene=b.build()).render_frame()

        open_img = floor_scene(False).mean()
        thru = floor_scene(True, 0.0).mean()    # invisible screen
        solid = floor_scene(True, 1.0).mean()   # opaque screen shadows
        assert abs(thru - open_img) / open_img < 0.15
        assert solid < open_img * 0.6
