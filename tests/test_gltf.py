"""glTF loader tests: hand-built GLB and JSON documents."""

import base64
import json
import struct

import numpy as np

from dxrexperiments_tpu.scene.gltf import load_gltf
from dxrexperiments_tpu.scene.mesh import load_mesh


def make_doc(translation=None):
    # a unit right triangle at z=0 with normals +z, u16 indices
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
    nrm = np.tile(np.array([[0, 0, 1]], "<f4"), (3, 1))
    idx = np.array([0, 1, 2], "<u2")
    bin_data = pos.tobytes() + nrm.tobytes() + idx.tobytes() + b"\x00\x00"
    node = {"mesh": 0}
    if translation:
        node["translation"] = translation
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                    "metallicFactor": 0.9,
                    "roughnessFactor": 0.3,
                }
            }
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    return doc, bin_data


def write_glb(path, doc, bin_data):
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    bin_pad = bin_data + b"\x00" * ((4 - len(bin_data) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_pad)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, total))
        f.write(struct.pack("<I4s", len(js), b"JSON") + js)
        f.write(struct.pack("<I4s", len(bin_pad), b"BIN\x00") + bin_pad)


def test_glb_roundtrip(tmp_path):
    doc, bin_data = make_doc(translation=[5, 0, 0])
    p = str(tmp_path / "tri.glb")
    write_glb(p, doc, bin_data)
    mesh = load_gltf(p)
    assert mesh.num_triangles == 1
    # node translation applied
    np.testing.assert_allclose(mesh.positions[mesh.indices[0, 0]], [5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3, atol=1e-6)
    assert len(mesh.materials) == 1
    m = mesh.materials[0]
    np.testing.assert_allclose(m.albedo[:3], [0.8, 0.2, 0.1])
    assert m.type == 1 and m.reflectivity > 0.8  # metallic -> glossy


def test_gltf_json_with_data_uri(tmp_path):
    doc, bin_data = make_doc()
    doc["buffers"][0]["uri"] = "data:application/octet-stream;base64," + base64.b64encode(
        bin_data
    ).decode()
    p = str(tmp_path / "tri.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    mesh = load_mesh(p, on_error="raise")
    assert mesh.num_triangles == 1


def test_gltf_rotation_node(tmp_path):
    doc, bin_data = make_doc()
    # 90deg about z: (1,0,0) -> (0,1,0)
    s = np.sin(np.pi / 4)
    doc["nodes"][0]["rotation"] = [0, 0, float(s), float(np.cos(np.pi / 4))]
    p = str(tmp_path / "rot.glb")
    write_glb(p, doc, bin_data)
    mesh = load_gltf(p)
    v1 = mesh.positions[mesh.indices[0, 1]]
    np.testing.assert_allclose(v1, [0, 1, 0], atol=1e-6)
