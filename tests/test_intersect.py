"""Intersector tests against closed forms and a NumPy reference MT."""

import jax.numpy as jnp
import numpy as np

from dxrexperiments_tpu.ops import intersect
from dxrexperiments_tpu.scene import Scene, cornell_box
from dxrexperiments_tpu.scene.mesh import Mesh


def single_triangle_scene(v0, v1, v2):
    sc = Scene()
    pos = np.asarray([v0, v1, v2], np.float32)
    mesh = Mesh(pos, None, np.array([[0, 1, 2]], np.int32))
    sc.add_model(mesh)
    return sc.build()


def numpy_mt(v0, e1, e2, o, d):
    """Classic scalar Möller–Trumbore for verification."""
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
    t = np.dot(e2, q) * inv
    return (t, u, v)


def test_single_triangle_hit_miss():
    data = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    origins = jnp.asarray(
        [[0.2, 0.2, 1.0], [0.9, 0.9, 1.0], [0.2, 0.2, -1.0]], jnp.float32
    )
    dirs = jnp.asarray([[0, 0, -1], [0, 0, -1], [0, 0, -1]], jnp.float32)
    h = intersect.intersect_closest(data, origins, dirs)
    hits = np.asarray(h["hit"])
    assert hits[0] and not hits[1]  # u+v>1 outside
    assert not hits[2]  # behind the ray? no: origin z=-1 going -z, plane z=0 behind
    np.testing.assert_allclose(float(h["t"][0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(h["u"][0]), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(h["v"][0]), 0.2, atol=1e-5)


def test_backface_culling():
    data = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    # CCW triangle faces +z; a ray traveling +z (from behind) hits the backface.
    o = jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1]], jnp.float32)
    h_nocull = intersect.intersect_closest(data, o, d, cull_backface=False)
    h_cull = intersect.intersect_closest(data, o, d, cull_backface=True)
    assert bool(h_nocull["hit"][0])
    assert not bool(h_cull["hit"][0])
    # Frontal ray still hits with culling on.
    o2 = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d2 = jnp.asarray([[0, 0, -1]], jnp.float32)
    assert bool(intersect.intersect_closest(data, o2, d2, cull_backface=True)["hit"][0])


def test_t_range_clipping():
    data = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    assert not bool(
        intersect.intersect_closest(data, o, d, t_min=0.0, t_max=0.5)["hit"][0]
    )
    assert bool(
        intersect.intersect_closest(data, o, d, t_min=0.0, t_max=1.5)["hit"][0]
    )
    assert not bool(
        intersect.intersect_closest(data, o, d, t_min=1.5, t_max=10.0)["hit"][0]
    )


def test_closest_of_two():
    sc = Scene()
    for z in (0.0, -1.0):
        pos = np.array([[0, 0, z], [1, 0, z], [0, 1, z]], np.float32)
        sc.add_model(Mesh(pos, None, np.array([[0, 1, 2]], np.int32)))
    data = sc.build()
    o = jnp.asarray([[0.2, 0.2, 2.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    h = intersect.intersect_closest(data, o, d)
    assert bool(h["hit"][0])
    np.testing.assert_allclose(float(h["t"][0]), 2.0, atol=1e-5)  # nearer plane z=0
    assert int(h["tri"][0]) == 0


def test_matches_numpy_mt_random():
    mesh, materials = cornell_box()
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build()
    n = int(data["num_tris"])
    v0 = np.asarray(data["v0"][:n])
    e1 = np.asarray(data["e1"][:n])
    e2 = np.asarray(data["e2"][:n])

    rs = np.random.default_rng(7)
    origins = rs.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32)
    origins[:, 1] = rs.uniform(0.1, 1.9, size=64)
    dirs = rs.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    h = intersect.intersect_closest(
        data, jnp.asarray(origins), jnp.asarray(dirs), t_min=1e-4
    )
    for i in range(64):
        best = (np.inf, -1)
        for k in range(n):
            r = numpy_mt(v0[k], e1[k], e2[k], origins[i].astype(np.float64), dirs[i].astype(np.float64))
            if r and 1e-4 < r[0] < best[0]:
                best = (r[0], k)
        if best[1] < 0:
            assert not bool(h["hit"][i]), i
        else:
            assert bool(h["hit"][i]), i
            np.testing.assert_allclose(float(h["t"][i]), best[0], rtol=1e-3)
            assert int(h["tri"][i]) == best[1], i


def test_any_hit_occlusion():
    data = single_triangle_scene([-10, -10, 0], [10, -10, 0], [0, 10, 0])
    o = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, 1]], jnp.float32)
    occ = np.asarray(intersect.intersect_any(data, o, d))
    assert occ[0] and not occ[1]
    # Segment shorter than the distance: not occluded.
    occ2 = np.asarray(intersect.intersect_any(data, o, d, t_max=jnp.asarray([0.5, 0.5])))
    assert not occ2[0]


def test_padding_triangles_never_hit():
    data = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    assert data["v0"].shape[0] == 8  # padded to sublane alignment
    # Rays that miss the real triangle but would hit "zero" triangles if they
    # weren't masked.
    o = jnp.asarray([[5.0, 5.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    assert not bool(intersect.intersect_closest(data, o, d)["hit"][0])
    assert not bool(intersect.intersect_any(data, o, d)[0])
