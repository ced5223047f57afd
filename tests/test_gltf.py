"""glTF import tests (ref util/gltf_loader.zig parity)."""

import base64
import json
import struct

import numpy as np

from zyg_tpu.scene.loader import load_scene_dict


def make_gltf_doc():
    pos = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32)
    nrm = np.tile([0, 1, 0], (4, 1)).astype(np.float32)
    idx = np.asarray([[0, 2, 1], [0, 3, 2]], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "scale": [2, 1, 2]},
            {"mesh": 0, "translation": [0, 3, 0], "rotation": [1, 0, 0, 0]},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2, "material": 0}]}
        ],
        "materials": [
            {
                "name": "gray",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.6, 0.5, 0.4, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.7,
                },
            }
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }


class TestGltf:
    def test_gltf_and_glb_load(self, tmp_path):
        doc = make_gltf_doc()
        gpath = tmp_path / "scene.gltf"
        gpath.write_text(json.dumps(doc))
        jsb = json.dumps(doc).encode()
        jsb += b" " * ((-len(jsb)) % 4)
        glb = (
            struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(jsb))
            + struct.pack("<II", len(jsb), 0x4E4F534A)
            + jsb
        )
        (tmp_path / "scene.glb").write_bytes(glb)

        for fn in ("scene.gltf", "scene.glb"):
            scene = load_scene_dict(
                {"entities": [{"type": "Prop", "shape": {"file": fn}}]},
                base_dir=str(tmp_path),
            )
            # two nodes -> two mesh props
            assert scene.num_props == 2
            assert scene.meshes is not None
            # node scale baked into vertices: first mesh spans [-2, 2]
            m = np.asarray(scene.materials.color)
            assert np.allclose(m[1], [0.6, 0.5, 0.4], atol=1e-5)

    def test_material_rotation_node(self, tmp_path):
        """Quaternion [1,0,0,0] = 180-degree X rotation baked into normals."""
        doc = make_gltf_doc()
        (tmp_path / "r.gltf").write_text(json.dumps(doc))
        scene = load_scene_dict(
            {"entities": [{"type": "Prop", "shape": {"file": "r.gltf"}}]},
            base_dir=str(tmp_path),
        )
        from zyg_tpu.core import encoding as enc

        words = np.asarray(scene.meshes.tri_n)  # uint32[Tp,3] oct-packed
        tn = np.asarray(enc.oct_normal_unpack(words))  # [Tp,3,3]
        # second prop's triangles (last 2 REAL rows — padding slots pack
        # the zero vector, word 0) have flipped normals
        real = words.sum(axis=1) > 0
        last_real = np.flatnonzero(real)[-1]
        assert tn[last_real, :, 1].max() < 0.0
