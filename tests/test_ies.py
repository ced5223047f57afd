"""IES profile tests: LM-63 parsing + angular emission modulation."""

import numpy as np
import jax.numpy as jnp

from zyg_tpu.io.ies import parse_ies, ies_profile_bins

# simple narrow-beam LM-63: bright near 0 deg, dark past 40 deg
IES_TEXT = """IESNA:LM-63-2002
[TEST] narrow beam
TILT=NONE
1 1000.0 1 5 1 1 1 0.1 0.1 0.1
1.0 1.0 0.0
0 22.5 45 90 180
0
1000 800 50 0 0
"""


class TestIes:
    def test_parse(self):
        v, inten = parse_ies(IES_TEXT)
        np.testing.assert_allclose(v, [0, 22.5, 45, 90, 180])
        np.testing.assert_allclose(inten, [1000, 800, 50, 0, 0])

    def test_profile_normalized(self):
        prof = ies_profile_bins(IES_TEXT)
        assert prof.shape == (32,)
        th = np.deg2rad(np.linspace(0, 180, 32))
        w = np.abs(np.cos(th)) * np.sin(th)
        mean = (prof * w).sum() / w.sum()
        np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
        assert prof[0] > prof[-1]

    def test_eval_ies_lerp(self):
        from zyg_tpu.render.materials import eval_ies

        prof = jnp.tile(jnp.asarray(ies_profile_bins(IES_TEXT))[None], (4, 1))
        cos = jnp.asarray([1.0, np.cos(np.deg2rad(30)), 0.0, -1.0])
        v = np.asarray(eval_ies(prof, cos))
        assert v[0] > v[1] > v[2] >= v[3]

    def test_nee_bsdf_consistency(self, tmp_path):
        """Profiled light: NEE radiance == emission at a BSDF hit (MIS)."""
        from zyg_tpu.scene.loader import load_scene_dict
        from zyg_tpu.scene import light_sampling as lsm
        from zyg_tpu.render import materials as mat

        (tmp_path / "spot.ies").write_text(IES_TEXT)
        scene = load_scene_dict(
            {
                "materials": [
                    {
                        "name": "lamp",
                        "rendering": {
                            "Light": {
                                "emittance": {"value": 10.0, "profile": {"file": "spot.ies"}}
                            }
                        },
                    },
                    {"name": "floor", "rendering": {"Substitute": {"color": [0.5, 0.5, 0.5]}}},
                ],
                "entities": [
                    {
                        "type": "Light",
                        "shape": {"type": "Rectangle"},
                        "materials": ["lamp"],
                        "transformation": {"position": [0, 2, 0], "rotation": [-90, 0, 0]},
                    },
                    {
                        "type": "Prop",
                        "shape": {"type": "Rectangle"},
                        "materials": ["floor"],
                        "transformation": {"rotation": [90, 0, 0], "scale": [5, 5, 1]},
                    },
                ],
            },
            base_dir=str(tmp_path),
        )
        assert "ies" in scene.mat_features
        # NEE side: radiance toward points at two angles
        n = 2
        wi = jnp.asarray([[0.0, 1.0, 0.0], [0.894, 0.447, 0.0]], jnp.float32)  # to light
        light_n = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
        li = jnp.zeros((n,), jnp.int32)
        rad = np.asarray(lsm.light_radiance(scene, li, wi, light_n))
        # straight below (0 deg off axis) must beat 63 deg off axis
        assert rad[0].mean() > rad[1].mean() * 2

        # BSDF-hit side must give the SAME values
        params = mat.gather(
            scene.materials, jnp.zeros((n,), jnp.int32) + 1, None, None, None,
            features=scene.mat_features,
        )
        # lamp material id: find it
        lamp_id = int(np.argmax(np.asarray(scene.materials.emission).sum(-1)))
        params = mat.gather(
            scene.materials, jnp.full((n,), lamp_id, jnp.int32), None, None, None,
            features=scene.mat_features,
        )
        em = np.asarray(mat.eval_radiance(params, -wi, light_n))
        np.testing.assert_allclose(em, rad, rtol=1e-5)


# TILT=INCLUDE with a token-counted tilt block wrapped across lines, plus a
# header identical to IES_TEXT — the parser must skip exactly 2+2n tokens
IES_TILT_TEXT = """IESNA:LM-63-2002
[TEST] tilted
TILT=INCLUDE
1 3
0 45
90
1.0 1.0
0.9
1 1000.0 1 5 1 1 1 0.1 0.1 0.1
1.0 1.0 0.0
0 22.5 45 90 180
0
1000 800 50 0 0
"""

IES_TYPE_B_TEXT = """IESNA:LM-63-2002
TILT=NONE
1 1000.0 1 5 1 2 1 0.1 0.1 0.1
1.0 1.0 0.0
-90 -45 0 45 90
0
0 50 1000 50 0
"""


class TestIesRobustness:
    def test_tilt_include_token_counted(self):
        v, inten = parse_ies(IES_TILT_TEXT)
        np.testing.assert_allclose(v, [0, 22.5, 45, 90, 180])
        np.testing.assert_allclose(inten, [1000, 800, 50, 0, 0])

    def test_type_b_rejected(self):
        """Type-B (photometric type 2, negative verticals) must not be
        silently misread as Type-C polar data."""
        assert parse_ies(IES_TYPE_B_TEXT) is None
        assert ies_profile_bins(IES_TYPE_B_TEXT) is None
