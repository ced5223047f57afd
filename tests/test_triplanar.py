import numpy as np
import jax.numpy as jnp

def test_triplanar_texture_mode(tmp_path):
    """A texcoord=Triplanar texture maps by object position, not mesh uv."""
    from zyg_tpu.io.png import write_png
    from zyg_tpu.scene.loader import load_scene_dict
    from zyg_tpu.scene import shapes
    from zyg_tpu.render import materials as mat

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255  # right half white
    write_png(str(tmp_path / "half.png"), img)
    scene = load_scene_dict(
        {
            "materials": [
                {"name": "m", "rendering": {"Substitute": {
                    "color": {"file": "half.png", "sampler": {"texcoord": "Triplanar"}},
                }}},
            ],
            "entities": [
                # cube mesh so frag.uv is zero (no uvs) but object pos varies
                {"type": "Prop", "shape": {"file": "proc:cube"}, "materials": ["m"],
                 "transformation": {"scale": [1, 1, 1]}},
            ],
        },
        base_dir=str(tmp_path),
    )
    assert "triplanar" in scene.mat_features
    n = 2
    # hit the cube top (+y) at object x = -0.3 and +0.3
    o = jnp.asarray([[-0.3, 3.0, 0.05], [0.3, 3.0, 0.05]], jnp.float32)
    d = jnp.asarray([[0, -1, 0], [0, -1, 0]], jnp.float32)
    hit = shapes.intersect_scene(scene, o, d, jnp.float32(0.0), jnp.float32(10.0))
    frag = shapes.build_fragment(scene, hit, o, d, need_uv=True)
    uv_alt = mat.triplanar_uv(scene, frag)
    params = mat.gather(
        scene.materials, frag.material, None, scene.textures, frag.uv,
        features=scene.mat_features, uv_alt=uv_alt,
    )
    c = np.asarray(params["color"])
    # on the +y face: u = sign(n_y)*op_x + 0.5 -> -0.3+0.5=0.2 (dark),
    # +0.3+0.5=0.8 (white)
    assert c[0].max() < 0.2, c[0]
    assert c[1].min() > 0.8, c[1]
