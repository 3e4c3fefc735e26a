"""BVH build + reference traversal tests."""

import numpy as np

from dxrexperiments_tpu.accel import bvh as bvh_mod
from dxrexperiments_tpu.scene import Scene, cornell_box
from dxrexperiments_tpu.scene.procedural import random_triangle_soup


def build_scene_arrays(mesh):
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    return (
        np.asarray(data["v0"]),
        np.asarray(data["e1"]),
        np.asarray(data["e2"]),
        n,
    )


def scalar_mt(v0, e1, e2, o, d):
    p = np.cross(d, e2)
    det = np.dot(e1, p)
    if abs(det) < 1e-12:
        return None
    inv = 1.0 / det
    tv = o - v0
    u = np.dot(tv, p) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(tv, e1)
    v = np.dot(d, q) * inv
    if v < 0 or u + v > 1:
        return None
    return np.dot(e2, q) * inv


def test_morton_codes_are_spatially_sorted():
    pts = np.array([[0, 0, 0], [1, 1, 1], [0.1, 0.1, 0.1]], np.float32)
    codes = bvh_mod.morton_codes(pts, pts.min(0), pts.max(0))
    assert codes[0] < codes[2] < codes[1]


def test_layout_sizes():
    lay = bvh_mod.choose_layout(100, leaf_size=8)
    assert lay.num_leaves * lay.leaf_size >= 100
    assert lay.num_nodes == 2 * lay.num_leaves - 1


def test_build_bvh_contains_all_triangles():
    mesh = random_triangle_soup(500, seed=1)
    v0, e1, e2, n = build_scene_arrays(mesh)
    bvh = bvh_mod.build_bvh(v0, e1, e2, n)
    order = bvh["order"]
    real = order[order >= 0]
    assert len(real) == n
    assert sorted(real.tolist()) == list(range(n))
    # Root AABB covers all triangles.
    p0, p1, p2 = v0[:n], v0[:n] + e1[:n], v0[:n] + e2[:n]
    lo = np.minimum(np.minimum(p0, p1), p2).min(0)
    hi = np.maximum(np.maximum(p0, p1), p2).max(0)
    assert np.all(bvh["nodes_lo"][0] <= lo + 1e-5)
    assert np.all(bvh["nodes_hi"][0] >= hi - 1e-5)


def test_parent_aabbs_contain_children():
    mesh = random_triangle_soup(300, seed=2)
    v0, e1, e2, n = build_scene_arrays(mesh)
    bvh = bvh_mod.build_bvh(v0, e1, e2, n)
    first_leaf = (1 << bvh["levels"]) - 1
    for node in range(first_leaf):
        for c in (2 * node + 1, 2 * node + 2):
            finite = np.isfinite(bvh["nodes_lo"][c]).all()
            if finite:
                assert np.all(bvh["nodes_lo"][node] <= bvh["nodes_lo"][c] + 1e-6)
                assert np.all(bvh["nodes_hi"][node] >= bvh["nodes_hi"][c] - 1e-6)


def test_device_build_matches_host():
    mesh = random_triangle_soup(200, seed=3)
    v0, e1, e2, n = build_scene_arrays(mesh)
    host = bvh_mod.build_bvh(v0, e1, e2, n)
    import jax.numpy as jnp

    dev = bvh_mod.build_bvh_device(
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), n
    )
    assert dev["levels"] == host["levels"]
    np.testing.assert_array_equal(np.asarray(dev["order"]), host["order"])
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(dev["nodes_lo"]), posinf=1e30),
        np.nan_to_num(host["nodes_lo"], posinf=1e30),
        atol=1e-5,
    )


def test_traversal_matches_brute_force():
    mesh, _ = cornell_box()
    v0, e1, e2, n = build_scene_arrays(mesh)
    bvh = bvh_mod.build_bvh(v0, e1, e2, n, leaf_size=4)

    def tri_test(k, o, d):
        return scalar_mt(
            v0[k].astype(np.float64),
            e1[k].astype(np.float64),
            e2[k].astype(np.float64),
            o,
            d,
        )

    rs = np.random.default_rng(5)
    for _ in range(50):
        o = rs.uniform(-0.9, 0.9, 3)
        o[1] = rs.uniform(0.1, 1.9)
        d = rs.normal(size=3)
        d /= np.linalg.norm(d)
        t_bvh, k_bvh = bvh_mod.traverse_numpy(bvh, tri_test, o, d, 1e-4, np.inf)
        # brute force
        best = (np.inf, -1)
        for k in range(n):
            t = tri_test(k, o, d)
            if t is not None and 1e-4 < t < best[0]:
                best = (t, k)
        assert k_bvh == best[1]
        if best[1] >= 0:
            np.testing.assert_allclose(t_bvh, best[0], rtol=1e-6)


def test_traversal_large_soup():
    mesh = random_triangle_soup(2000, seed=7)
    v0, e1, e2, n = build_scene_arrays(mesh)
    bvh = bvh_mod.build_bvh(v0, e1, e2, n, leaf_size=8)

    def tri_test(k, o, d):
        return scalar_mt(
            v0[k].astype(np.float64),
            e1[k].astype(np.float64),
            e2[k].astype(np.float64),
            o,
            d,
        )

    rs = np.random.default_rng(11)
    hits = 0
    for _ in range(20):
        o = rs.uniform(-12, 12, 3)
        d = -o / np.linalg.norm(o)  # aim at the cluster
        t_bvh, k_bvh = bvh_mod.traverse_numpy(bvh, tri_test, o, d, 1e-4, np.inf)
        best = (np.inf, -1)
        for k in range(n):
            t = tri_test(k, o, d)
            if t is not None and 1e-4 < t < best[0]:
                best = (t, k)
        assert k_bvh == best[1]
        hits += k_bvh >= 0
    assert hits >= 2  # the test actually exercises some hits
