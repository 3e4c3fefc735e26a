"""Fat-node front-to-back traversal kernel vs the binary kernel and the
brute-force oracle (interpret mode, CPU). The fat kernel must agree
hit-for-hit with the binary kernel on every field — traversal ORDER differs
(near-child-first) but the set of tested leaves that can win is identical."""

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


@pytest.mark.parametrize("sah", [False, True])
def test_fat_matches_binary_soup(sah):
    mesh = random_triangle_soup(3000, seed=2, extent=10.0)
    data, packed = build(mesh, leaf_size=16, sah=sah)
    o, d = rays_for("soup", 700, seed=3)
    a = traverse_pallas.traverse_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    b = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    for k in ("hit", "t", "tri", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, err_msg=k
        )


def test_fat_matches_oracle_cornell():
    mesh, _ = cornell_box(glossy_tall_box=True)
    data, packed = build(mesh, leaf_size=8)
    o, d = rays_for("cornell", 600)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4)
    got = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=2e-4, atol=2e-5
    )
    agree = (np.asarray(got["tri"])[hit] == np.asarray(ref["tri"])[hit]).mean()
    assert agree > 0.98, agree


def test_fat_any_matches_binary():
    mesh = random_triangle_soup(2000, seed=5, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 500, seed=7)
    a = traverse_pallas.traverse_any(
        packed, o, d, t_min=1e-4, t_max=8.0, leaf_size=16, interpret=True
    )
    b = traverse_pallas.traverse_fat_any(
        packed, o, d, t_min=1e-4, t_max=8.0, leaf_size=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fat_per_ray_tmax_masks_lanes():
    """t_max = 0 lanes (the integrator's inactive-lane mask) must report a
    clean miss regardless of origin/direction garbage."""
    mesh = random_triangle_soup(2000, seed=5, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 500, seed=9)
    t_max = jnp.where(jnp.arange(500) % 3 == 0, 0.0, 3.0e37)
    got = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, t_max=t_max, leaf_size=16, interpret=True
    )
    masked = np.asarray(t_max) == 0.0
    assert not np.asarray(got["hit"])[masked].any()
    full = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    live = ~masked
    np.testing.assert_array_equal(
        np.asarray(got["hit"])[live], np.asarray(full["hit"])[live]
    )
    np.testing.assert_allclose(
        np.asarray(got["t"])[live], np.asarray(full["t"])[live], atol=1e-6
    )


def test_fat_tile_variants_agree():
    mesh = random_triangle_soup(1500, seed=11, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 700, seed=13)
    base = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=2048
    )
    small = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=256
    )
    for k in ("hit", "t", "tri"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(small[k]), atol=1e-6, err_msg=k
        )


def test_fat_nodes_root_leaf():
    """Single-leaf tree (tiny mesh below any split) still builds a valid
    fat root with an empty second child."""
    mesh = random_triangle_soup(4, seed=1, extent=2.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 200, seed=17)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4)
    got = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))


@pytest.mark.parametrize("lb,hg", [(True, 0), (False, 2), (True, 2), (True, 4)])
def test_fat_variant_flags_agree(lb, hg):
    """leaf_bestt (best-t leaf clamp + gated epilogue) and half_gate
    (sub-tile lane gating off SMEM-stashed leaf AABBs) are pure-pruning
    variants: hit-for-hit identical to the flat kernel."""
    mesh = random_triangle_soup(2000, seed=4, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    o, d = rays_for("soup", 512, seed=5)
    base = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        leaf_bestt=False, half_gate=0,
    )
    var = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        leaf_bestt=lb, half_gate=hg,
    )
    for k in ("hit", "t", "tri", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(var[k]), atol=0, err_msg=k
        )
    base_any = traverse_pallas.traverse_fat_any(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
    )
    var_any = traverse_pallas.traverse_fat_any(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        half_gate=hg,
    )
    np.testing.assert_array_equal(np.asarray(base_any), np.asarray(var_any))


@pytest.mark.parametrize("group,co", [(2, False), (4, False), (4, True)])
def test_fat_grouped_layout_agrees(group, co):
    """The sub-packet layout kernel ([8, G, R] rays, per-sub-packet leaf
    gating) is a pure relayout + pruning variant: hit-for-hit identical to
    the flat fat kernel, closest and occlusion, incl. common_origin."""
    mesh = random_triangle_soup(2000, seed=4, extent=10.0)
    data, packed = build(mesh, leaf_size=16)
    if co:
        rs = np.random.default_rng(6)
        o1 = np.array([0.0, 0.0, 24.0], np.float32)
        o = jnp.asarray(np.broadcast_to(o1, (512, 3)).copy())
        d = rs.normal(size=(512, 3)).astype(np.float32)
        d[:, 2] -= 1.5
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
    else:
        o, d = rays_for("soup", 512, seed=5)
    base = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        leaf_bestt=False, half_gate=0, common_origin=co,
    )
    var = traverse_pallas.traverse_fat_closest(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        group=group, common_origin=co,
    )
    for k in ("hit", "t", "tri", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(var[k]), atol=0, err_msg=k
        )
    base_any = traverse_pallas.traverse_fat_any(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
    )
    var_any = traverse_pallas.traverse_fat_any(
        packed, o, d, t_min=1e-4, leaf_size=16, interpret=True, tile=512,
        group=group,
    )
    np.testing.assert_array_equal(np.asarray(base_any), np.asarray(var_any))
