"""8-wide packet BVH traversal vs brute-force reference (interpret mode).

The wide kernel (traverse_pallas._make_traverse8_kernel) consumes the
collapsed tree (accel.bvh.collapse_wide) that shares leaf slot ranges with
the binary pack, so hits must agree with both the binary kernel and the
brute-force oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.accel import bvh as bvh_mod
from dxrexperiments_tpu.ops import intersect, traverse_pallas
from dxrexperiments_tpu.scene import Scene, cornell_box
from dxrexperiments_tpu.scene.procedural import random_triangle_soup


def build(mesh, leaf_size=8, sah=False):
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))
    if sah:
        nodes = bvh_mod.build_bvh_sah(v0, e1, e2, n, leaf_size)
        if nodes is None:
            pytest.skip("native SAH unavailable")
    else:
        nodes = bvh_mod.to_node_arrays(bvh_mod.build_bvh(v0, e1, e2, n, leaf_size))
    packed = traverse_pallas.pack_for_traversal(nodes, data, leaf_size)
    return data, packed


def rays_for(mesh_kind, n, seed=0):
    rs = np.random.default_rng(seed)
    if mesh_kind == "cornell":
        o = rs.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32)
        o[:, 1] = rs.uniform(0.1, 1.9, size=n)
        d = rs.normal(size=(n, 3)).astype(np.float32)
    else:
        o = rs.uniform(-14, 14, size=(n, 3)).astype(np.float32)
        d = (-o + rs.normal(scale=2.0, size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_collapse_wide_structure():
    mesh = random_triangle_soup(500, seed=1, extent=10.0)
    data, packed = build(mesh, leaf_size=8)
    nodes8 = np.asarray(packed["bvh8_nodes"])
    assert nodes8.shape[0] % 8 == 0 and nodes8.shape[1] == 8
    counts = nodes8[:, 7]
    childs = nodes8[:, 6]
    # internal slots point at real wide nodes
    internal = counts < -0.5
    assert (childs[internal] >= 0).all()
    assert (childs[internal] < nodes8.shape[0] // 8).all()
    # leaf slots reference slot ranges
    leaf = counts > 0.5
    assert (childs[leaf] < 0).all()
    # every triangle slot reachable exactly once across wide leaves
    starts = (-childs[leaf] - 1).astype(np.int64)
    assert len(np.unique(starts)) == leaf.sum()


@pytest.mark.parametrize("sah", [False, True])
def test_traverse8_closest_cornell(sah):
    mesh, _ = cornell_box(glossy_tall_box=True)
    data, packed = build(mesh, leaf_size=8, sah=sah)
    o, d = rays_for("cornell", 600)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4)
    got = traverse_pallas.traverse8_closest(
        packed, o, d, t_min=1e-4, leaf_size=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=2e-4, atol=2e-5
    )
    agree = (np.asarray(got["tri"])[hit] == np.asarray(ref["tri"])[hit]).mean()
    assert agree > 0.98, agree


@pytest.mark.slow
def test_traverse8_closest_soup():
    mesh = random_triangle_soup(3000, seed=2, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 600, seed=3)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4)
    got = traverse_pallas.traverse8_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=2e-4, atol=2e-5
    )
    agree = (np.asarray(got["tri"])[hit] == np.asarray(ref["tri"])[hit]).mean()
    assert agree > 0.98, agree


@pytest.mark.slow
def test_traverse8_matches_binary_kernel():
    mesh = random_triangle_soup(2000, seed=9, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 500, seed=10)
    a = traverse_pallas.traverse_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    b = traverse_pallas.traverse8_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    hit = np.asarray(a["hit"])
    np.testing.assert_allclose(
        np.asarray(a["t"])[hit], np.asarray(b["t"])[hit], rtol=1e-6
    )


def test_traverse8_any():
    mesh, _ = cornell_box()
    data, packed = build(mesh, leaf_size=8)
    o, d = rays_for("cornell", 600, seed=7)
    tmax = jnp.asarray(
        np.random.default_rng(8).uniform(0.05, 4.0, 600).astype(np.float32)
    )
    ref = intersect.intersect_any(data, o, d, t_min=1e-4, t_max=tmax)
    got = traverse_pallas.traverse8_any(
        packed, o, d, t_min=1e-4, t_max=tmax, leaf_size=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_traverse8_backface_cull():
    mesh, _ = cornell_box()
    data, packed = build(mesh, leaf_size=8)
    o, d = rays_for("cornell", 300, seed=5)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4, cull_backface=True)
    got = traverse_pallas.traverse8_closest(
        packed, o, d, t_min=1e-4, leaf_size=8, cull_backface=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
