"""Native FBX/Collada importers.

Validated against a synthetic binary-FBX writer (round-trip: exact vertex
and index recovery, node transforms, per-polygon materials, ByPolygonVertex
normals) plus the reference's own ground.fbx when present.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from dxrexperiments_tpu.scene.collada import load_collada
from dxrexperiments_tpu.scene.fbx import load_fbx
from dxrexperiments_tpu.scene.mesh import load_mesh

GROUND = "/root/reference/assets/models/ground.fbx"


# --------------------------------------------------------------------------- #
# Minimal binary-FBX writer (test fixture only)
# --------------------------------------------------------------------------- #
def _prop(v):
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, np.ndarray):
        code = {np.dtype("f8"): b"d", np.dtype("i4"): b"i", np.dtype("i8"): b"l"}[
            v.dtype
        ]
        raw = zlib.compress(v.tobytes())
        return code + struct.pack("<III", len(v), 1, len(raw)) + raw
    raise TypeError(type(v))


def _node_tree(name, props=(), children=(), base=0):
    """Build a node with correct absolute end offsets; children are
    (name, props, children) triples."""
    name_b = name.encode()
    body = b"".join(_prop(p) for p in props)
    header_len = 24 + 1 + len(name_b)
    pos = base + header_len + len(body)
    kid_blobs = []
    for kname, kprops, kchildren in children:
        kb = _node_tree(kname, kprops, kchildren, pos)
        kid_blobs.append(kb)
        pos += len(kb)
    kids = b"".join(kid_blobs)
    if children:
        kids += b"\x00" * 25
        pos += 25
    header = struct.pack("<QQQB", pos, len(props), len(body), len(name_b))
    return header + name_b + body + kids


def write_fbx(path, verts, poly_idx, mat_ids=None, translation=(0, 0, 0)):
    """Emit a minimal binary FBX 7500 with one mesh + one model + 2 mats."""
    geo_children = [
        ("Vertices", [np.asarray(verts, np.float64).reshape(-1)], []),
        ("PolygonVertexIndex", [np.asarray(poly_idx, np.int32)], []),
    ]
    if mat_ids is not None:
        geo_children.append(
            (
                "LayerElementMaterial",
                [],
                [
                    ("MappingInformationType", ["ByPolygon"], []),
                    ("Materials", [np.asarray(mat_ids, np.int32)], []),
                ],
            )
        )
    p70 = (
        "Properties70",
        [],
        [
            (
                "P",
                ["Lcl Translation", "Lcl Translation", "", "A"]
                + [float(t) for t in translation],
                [],
            )
        ],
    )
    objects = (
        "Objects",
        [],
        [
            ("Geometry", [1001, "Geometry::geo", "Mesh"], geo_children),
            ("Model", [2001, "Model::mesh", "Mesh"], [p70]),
            (
                "Material",
                [3001, "Material::red", ""],
                [
                    (
                        "Properties70",
                        [],
                        [
                            (
                                "P",
                                ["DiffuseColor", "Color", "", "A", 0.9, 0.1, 0.1],
                                [],
                            )
                        ],
                    )
                ],
            ),
            ("Material", [3002, "Material::green", ""], []),
        ],
    )
    conns = (
        "Connections",
        [],
        [
            ("C", ["OO", 1001, 2001], []),
            ("C", ["OO", 2001, 0], []),
            ("C", ["OO", 3001, 2001], []),
            ("C", ["OO", 3002, 2001], []),
        ],
    )
    magic = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7500)
    pos = len(magic)
    blobs = []
    for name, props, children in (objects, conns):
        b = _node_tree(name, props, children, pos)
        blobs.append(b)
        pos += len(b)
    with open(path, "wb") as f:
        f.write(magic + b"".join(blobs) + b"\x00" * 25)


QUAD_VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [2, 0, 0], [2, 1, 0]],
    np.float64,
)
# quad (0 1 2 3) + triangle (1 4 5): FBX marks polygon end with ~idx
QUAD_POLY = np.array([0, 1, 2, ~3, 1, 4, ~5], np.int32)


def test_fbx_roundtrip_geometry(tmp_path):
    p = str(tmp_path / "t.fbx")
    write_fbx(p, QUAD_VERTS, QUAD_POLY)
    m = load_fbx(p)
    assert m.num_triangles == 3  # quad fans into 2 + 1
    np.testing.assert_allclose(m.positions, QUAD_VERTS.astype(np.float32))
    np.testing.assert_array_equal(
        m.indices, [[0, 1, 2], [0, 2, 3], [1, 4, 5]]
    )


def test_fbx_transform_baked(tmp_path):
    p = str(tmp_path / "t.fbx")
    write_fbx(p, QUAD_VERTS, QUAD_POLY, translation=(10.0, -2.0, 5.0))
    m = load_fbx(p)
    np.testing.assert_allclose(
        m.positions,
        (QUAD_VERTS + np.array([10.0, -2.0, 5.0])).astype(np.float32),
        atol=1e-5,
    )


def test_fbx_per_polygon_materials(tmp_path):
    p = str(tmp_path / "t.fbx")
    write_fbx(p, QUAD_VERTS, QUAD_POLY, mat_ids=[0, 1])
    m = load_fbx(p)
    assert len(m.materials) == 2
    np.testing.assert_array_equal(m.material_ids, [0, 0, 1])
    np.testing.assert_allclose(m.materials[0].albedo[:3], (0.9, 0.1, 0.1))


@pytest.mark.skipif(not os.path.exists(GROUND), reason="reference asset absent")
def test_fbx_reference_ground():
    m = load_fbx(GROUND)
    assert m.num_triangles == 800
    lo, hi = m.aabb()
    np.testing.assert_allclose(lo, [-200, 0, -200], atol=1e-3)
    np.testing.assert_allclose(hi, [200, 0, 200], atol=1e-3)
    # flat ground: all smooth normals point +/-Y
    assert np.abs(m.normals[:, 1]).min() > 0.99


def test_load_mesh_dispatches_fbx(tmp_path):
    p = str(tmp_path / "t.fbx")
    write_fbx(p, QUAD_VERTS, QUAD_POLY)
    m = load_mesh(p, on_error="raise")
    assert m.num_triangles == 3


DAE = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_effects>
  <effect id="e1"><profile_COMMON><technique sid="t"><phong>
    <diffuse><color>0.2 0.4 0.6 1</color></diffuse>
  </phong></technique></profile_COMMON></effect>
 </library_effects>
 <library_materials>
  <material id="m1"><instance_effect url="#e1"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="g1"><mesh>
   <source id="s1"><float_array id="a1" count="12">0 0 0 1 0 0 1 1 0 0 1 0</float_array>
    <technique_common><accessor source="#a1" count="4" stride="3"/></technique_common>
   </source>
   <vertices id="v1"><input semantic="POSITION" source="#s1"/></vertices>
   <polylist material="sym" count="1">
    <input semantic="VERTEX" source="#v1" offset="0"/>
    <vcount>4</vcount>
    <p>0 1 2 3</p>
   </polylist>
  </mesh></geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node><translate>5 0 0</translate>
    <instance_geometry url="#g1">
     <bind_material><technique_common>
      <instance_material symbol="sym" target="#m1"/>
     </technique_common></bind_material>
    </instance_geometry>
   </node>
  </visual_scene>
 </library_visual_scenes>
</COLLADA>
"""


def test_collada_polylist_transform_material(tmp_path):
    p = str(tmp_path / "t.dae")
    with open(p, "w") as f:
        f.write(DAE)
    m = load_collada(p)
    assert m.num_triangles == 2
    assert m.positions[:, 0].min() >= 5.0  # translate applied
    assert len(m.materials) == 1
    np.testing.assert_allclose(m.materials[0].albedo[:3], (0.2, 0.4, 0.6))
    m2 = load_mesh(p, on_error="raise")
    assert m2.num_triangles == 2
