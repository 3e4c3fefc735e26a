"""Native C++ runtime tests: OBJ fast parser + SAH builder."""

import textwrap

import numpy as np
import pytest

from dxrexperiments_tpu.accel import bvh as bvh_mod
from dxrexperiments_tpu.scene import Scene, cornell_box
from dxrexperiments_tpu.scene.mesh import _load_obj_python, load_obj
from dxrexperiments_tpu.scene.procedural import random_triangle_soup
from dxrexperiments_tpu.utils import native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


OBJ_SAMPLE = textwrap.dedent(
    """
    mtllib m.mtl
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    v 0 0 1
    vn 0 0 1
    vn 0 1 0
    usemtl red
    f 1//1 2//1 3//1 4//1
    usemtl blue
    f 1/2/2 2//2 5//2
    f -5 -4 -1
    """
)
MTL_SAMPLE = "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n"


@needs_native
def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ_SAMPLE)
    (tmp_path / "m.mtl").write_text(MTL_SAMPLE)
    mesh_n = load_obj(str(p), use_native=True)
    mesh_p = _load_obj_python(str(p))
    assert mesh_n.num_triangles == mesh_p.num_triangles == 4
    # same triangles as position sets (vertex welding order may differ)
    def tri_set(m):
        tris = m.positions[m.indices].reshape(-1, 9)
        return set(map(tuple, np.round(tris, 5)))

    assert tri_set(mesh_n) == tri_set(mesh_p)
    np.testing.assert_array_equal(mesh_n.material_ids, mesh_p.material_ids)
    assert [m.albedo[:3] for m in mesh_n.materials] == [
        m.albedo[:3] for m in mesh_p.materials
    ]


@needs_native
def test_native_obj_error_on_missing():
    with pytest.raises(IOError):
        native.parse_obj_native("/nonexistent/file.obj")


@needs_native
def test_sah_bvh_structure_and_traversal():
    mesh = random_triangle_soup(1000, seed=4)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0 = np.asarray(data["v0"])
    e1 = np.asarray(data["e1"])
    e2 = np.asarray(data["e2"])
    nodes = bvh_mod.build_bvh_sah(v0, e1, e2, n, leaf_size=8, spatial=False)
    assert nodes is not None
    # Without spatial splits every triangle appears exactly once across
    # leaves (spatial=True may duplicate straddling references).
    child = nodes["child"]
    leaves = child[:, 0] < 0
    covered = []
    for m in np.nonzero(leaves)[0]:
        start = -child[m, 0] - 1
        covered.extend(nodes["order"][start : start + child[m, 1]].tolist())
    assert sorted(covered) == list(range(n))

    from tests.test_bvh import scalar_mt

    def tri_test(k, o, d):
        return scalar_mt(
            v0[k].astype(np.float64), e1[k].astype(np.float64),
            e2[k].astype(np.float64), o, d,
        )

    rs = np.random.default_rng(3)
    for _ in range(25):
        o = rs.uniform(-12, 12, 3)
        d = -o / np.linalg.norm(o)
        t_sah, k_sah = bvh_mod.traverse_nodes_numpy(nodes, tri_test, o, d, 1e-4, np.inf)
        best = (np.inf, -1)
        for k in range(n):
            t = tri_test(k, o, d)
            if t is not None and 1e-4 < t < best[0]:
                best = (t, k)
        assert k_sah == best[1]


def test_implicit_to_node_arrays_roundtrip():
    mesh, _ = cornell_box()
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0 = np.asarray(data["v0"])
    e1 = np.asarray(data["e1"])
    e2 = np.asarray(data["e2"])
    implicit = bvh_mod.build_bvh(v0, e1, e2, n, leaf_size=4)
    nodes = bvh_mod.to_node_arrays(implicit)

    from tests.test_bvh import scalar_mt

    def tri_test(k, o, d):
        return scalar_mt(
            v0[k].astype(np.float64), e1[k].astype(np.float64),
            e2[k].astype(np.float64), o, d,
        )

    rs = np.random.default_rng(6)
    for _ in range(25):
        o = rs.uniform(-0.9, 0.9, 3)
        o[1] = rs.uniform(0.1, 1.9)
        d = rs.normal(size=3)
        d /= np.linalg.norm(d)
        a = bvh_mod.traverse_numpy(implicit, tri_test, o, d, 1e-4, np.inf)
        b = bvh_mod.traverse_nodes_numpy(nodes, tri_test, o, d, 1e-4, np.inf)
        assert a[1] == b[1]


@needs_native
def test_sbvh_spatial_splits_correct_and_tighter():
    """Default (spatial-split SBVH) build: straddling triangles may be
    referenced by several leaves with CLIPPED boxes — closest hits must
    still match brute force exactly, every triangle stays reachable, and
    the duplication budget (1.5x) holds."""
    mesh = random_triangle_soup(1500, seed=11)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))
    nodes = bvh_mod.build_bvh_sah(v0, e1, e2, n, leaf_size=8, spatial=True)
    assert nodes is not None
    order = nodes["order"]
    assert len(order) <= n + n // 2  # duplication budget
    assert set(order.tolist()) == set(range(n))  # every tri reachable

    # node boxes contain their children (clipped refs shrink, never grow)
    child = nodes["child"]
    internal = np.nonzero(child[:, 0] >= 0)[0]
    for m in internal:
        for c in child[m]:
            assert (nodes["nodes_lo"][m] <= nodes["nodes_lo"][c] + 1e-6).all()
            assert (nodes["nodes_hi"][m] >= nodes["nodes_hi"][c] - 1e-6).all()

    from tests.test_bvh import scalar_mt

    def tri_test(k, o, d):
        return scalar_mt(
            v0[k].astype(np.float64), e1[k].astype(np.float64),
            e2[k].astype(np.float64), o, d,
        )

    rs = np.random.default_rng(7)
    for _ in range(25):
        o = rs.uniform(-12, 12, 3)
        d = -o / np.linalg.norm(o)
        t_sah, k_sah = bvh_mod.traverse_nodes_numpy(
            nodes, tri_test, o, d, 1e-4, np.inf
        )
        best = (np.inf, -1)
        for k in range(n):
            t = tri_test(k, o, d)
            if t is not None and 1e-4 < t < best[0]:
                best = (t, k)
        assert k_sah == best[1]


@needs_native
def test_sah_quality_beats_morton_on_soup():
    """SAH should touch fewer nodes than the Morton median tree."""
    mesh = random_triangle_soup(2000, seed=9)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))
    sah = bvh_mod.build_bvh_sah(v0, e1, e2, n, leaf_size=8)
    morton = bvh_mod.to_node_arrays(bvh_mod.build_bvh(v0, e1, e2, n, leaf_size=8))

    def count_visits(nodes, o, d):
        inv_d = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
        stack, visits = [0], 0
        while stack:
            m = stack.pop()
            visits += 1
            if not bvh_mod.ray_aabb(
                o, inv_d, nodes["nodes_lo"][m], nodes["nodes_hi"][m], 1e-4, np.inf
            ):
                continue
            l, r = nodes["child"][m]
            if l >= 0:
                stack.extend((int(l), int(r)))
        return visits

    rs = np.random.default_rng(1)
    v_sah = v_mor = 0
    for _ in range(30):
        o = rs.uniform(-12, 12, 3)
        d = -o / np.linalg.norm(o)
        v_sah += count_visits(sah, o, d)
        v_mor += count_visits(morton, o, d)
    assert v_sah <= v_mor * 1.1  # SAH at least competitive, usually better
