"""Pallas kernel vs jnp reference intersector (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from dxrexperiments_tpu.ops import intersect, intersect_pallas
from dxrexperiments_tpu.scene import Scene, cornell_box
from dxrexperiments_tpu.trace.integrator import _interpolate_hit


def cornell_scene():
    mesh, materials = cornell_box(glossy_tall_box=True)
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    return sc.build()


def random_rays(n, seed=0, inside=True):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32)
    if inside:
        o[:, 1] = rs.uniform(0.1, 1.9, size=n)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_closest_matches_reference():
    scene = cornell_scene()
    o, d = random_rays(300)
    ref = intersect.intersect_closest(scene, o, d, t_min=1e-4)
    got = intersect_pallas.trace_closest(
        scene, o, d, t_min=1e-4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["tri"])[hit], np.asarray(ref["tri"])[hit]
    )
    np.testing.assert_allclose(
        np.asarray(got["u"])[hit], np.asarray(ref["u"])[hit], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["v"])[hit], np.asarray(ref["v"])[hit], atol=2e-4
    )


def test_closest_attributes_match_interpolation():
    scene = cornell_scene()
    o, d = random_rays(300, seed=3)
    got = intersect_pallas.trace_closest(scene, o, d, t_min=1e-4, interpret=True)
    ref = intersect.intersect_closest(scene, o, d, t_min=1e-4)
    pos, nrm, mat = _interpolate_hit(
        scene, ref, o, d
    )
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["normal"])[hit], np.asarray(nrm)[hit], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["position"])[hit], np.asarray(pos)[hit], atol=1e-3
    )
    tri = np.asarray(ref["tri"])[hit]
    want_mid = np.asarray(scene["mat_id"])[tri]
    np.testing.assert_array_equal(np.asarray(got["mat_id"])[hit], want_mid)
    np.testing.assert_allclose(
        np.asarray(got["albedo"])[hit],
        np.asarray(mat["albedo"])[hit],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["roughness"])[hit], np.asarray(mat["roughness"])[hit], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got["type"])[hit], np.asarray(mat["type"])[hit])


def test_closest_backface_culling():
    scene = cornell_scene()
    o, d = random_rays(200, seed=5)
    ref = intersect.intersect_closest(scene, o, d, t_min=1e-4, cull_backface=True)
    got = intersect_pallas.trace_closest(
        scene, o, d, t_min=1e-4, cull_backface=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(got["tri"])[hit], np.asarray(ref["tri"])[hit])


def test_any_matches_reference():
    scene = cornell_scene()
    o, d = random_rays(300, seed=9)
    # Mixed finite segments exercise t ranges.
    tmax = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 5.0, size=300).astype(np.float32)
    )
    ref = intersect.intersect_any(scene, o, d, t_min=1e-4, t_max=tmax)
    got = intersect_pallas.trace_any(scene, o, d, t_min=1e-4, t_max=tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ray_padding_roundtrip():
    scene = cornell_scene()
    o, d = random_rays(77, seed=11)  # deliberately not TILE_R-aligned
    got = intersect_pallas.trace_closest(scene, o, d, interpret=True)
    assert got["hit"].shape == (77,)
    ref = intersect.intersect_closest(scene, o, d)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))


def test_mid_size_scene_chunking():
    """Scenes between 512 and a 512-multiple exercise per-chunk attribute
    blocks (regression: susanne's 968 padded tris produced lane-misaligned
    chunks)."""
    from dxrexperiments_tpu.scene.procedural import sphere_mesh

    sc = Scene()
    sc.add_model(sphere_mesh((0, 0, 0), 1.0, lat=16, lon=32))  # 960 tris
    data = sc.build(accel="none")
    assert data["v0"].shape[0] % 512 == 0
    o, d = random_rays(200, seed=13, inside=False)
    ref = intersect.intersect_closest(data, o, d, t_min=1e-4)
    got = intersect_pallas.trace_closest(data, o, d, t_min=1e-4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], rtol=2e-4, atol=2e-5
    )
