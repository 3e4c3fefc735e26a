"""PRIME t_max seeding tests (round 5): scene-dominating triangles are
selected into a world-space side table (scene.select_prime_triangles), the
bounce closest stage pre-tests packets against them and clamps t_max
(trace/integrator._prime_seed_tmax), and the clamp NEVER changes results —
it only hands the packet kernels a tighter far interval so TLAS/BVH slab
unions stay origin-cell-local (RESULTS.md round-4 instance-union finding).

The hierarchy being accelerated is the reference's native two-level shape
(/root/reference/Helpers/TopLevelASGenerator.cpp:64-83); the pre-pass has no
reference counterpart.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.scene.mesh import Mesh
from dxrexperiments_tpu.scene.materials import Material
from dxrexperiments_tpu.scene.procedural import (
    random_triangle_soup,
    sphere_mesh,
)
from dxrexperiments_tpu.scene.scene import Scene, select_prime_triangles
from dxrexperiments_tpu.scene.dynamic import refit_scene_instances
from dxrexperiments_tpu.trace.integrator import (
    RAY_EPSILON,
    RAY_MAX_T,
    _prime_seed_tmax,
    _trace_closest,
)


def _floor_mesh(ext=20.0):
    return Mesh(
        np.array(
            [[-ext, 0, -ext], [-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext]],
            np.float32,
        ),
        None,
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )


def _grid_scene(k=3):
    """k x k unit spheres at y=1 over a large floor — a small instanced:K."""
    sc = Scene()
    white = sc.add_material(Material(albedo=(0.73, 0.73, 0.73, 1.0)))
    sph = sphere_mesh((0.0, 0.0, 0.0), 1.0, lat=6, lon=8)
    for i in range(k):
        for j in range(k):
            t = np.eye(4, dtype=np.float32)
            t[0, 3] = (i - k / 2) * 2.5
            t[2, 3] = (j - k / 2) * 2.5
            t[1, 3] = 1.0
            sc.add_model(sph, transform=t, material=white)
    sc.add_model(_floor_mesh(), material=white)
    return sc


def _bounce_rays(n=512, seed=3):
    """Incoherent bounce-like rays: origins near the sphere shells, random
    directions (down-facing lanes get floor seeds, up-facing get none)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4.0, 4.0, size=(n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 2.5, size=n).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_prime_selection_flat_and_soup():
    scene = _grid_scene().build(accel="bvh")
    assert "prime_v0" in scene
    pv0 = np.asarray(scene["prime_v0"])
    pe1 = np.asarray(scene["prime_e1"])
    pe2 = np.asarray(scene["prime_e2"])
    assert pv0.shape == pe1.shape == pe2.shape
    areas = 0.5 * np.linalg.norm(np.cross(pe1, pe2), axis=-1)
    # the floor's two 800-area triangles dominate the ~0.1-area sphere tris
    assert areas.max() > 100.0
    # flat on the floor plane (y-extent zero for the biggest ones)
    ys = np.stack([pv0[:, 1], (pv0 + pe1)[:, 1], (pv0 + pe2)[:, 1]])
    assert np.abs(ys[:, np.argmax(areas)]).max() < 1e-6

    soup = Scene()
    soup.add_model(random_triangle_soup(5000, seed=0, extent=10.0))
    packed = soup.build(accel="bvh")
    assert "prime_v0" not in packed  # nothing dominates -> zero overhead


def test_prime_selection_two_level_and_refit():
    sc = _grid_scene()
    scene = sc.build_two_level()
    assert "prime_v0" in scene
    src = scene["tlas_meta"].value["prime_src"]
    assert len(src["inst"]) == len(np.asarray(scene["prime_v0"]))

    # shift every instance; the prime table must track world space
    new_tf = np.stack([inst.transform for inst in sc.instances]).copy()
    new_tf[:, 0, 3] += 3.0
    new_tf[:, 1, 3] += 0.5
    refit = refit_scene_instances(scene, jnp.asarray(new_tf))
    exp_v0 = (
        np.einsum("nij,nj->ni", new_tf[src["inst"], :3, :3], src["v0"])
        + new_tf[src["inst"], :3, 3]
    )
    np.testing.assert_allclose(
        np.asarray(refit["prime_v0"]), exp_v0, rtol=1e-6, atol=1e-6
    )
    exp_e1 = np.einsum("nij,nj->ni", new_tf[src["inst"], :3, :3], src["e1"])
    np.testing.assert_allclose(
        np.asarray(refit["prime_e1"]), exp_e1, rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("build", ["flat", "two_level"])
@pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
def test_seeding_changes_nothing(build, impl):
    sc = _grid_scene()
    scene = sc.build(accel="bvh") if build == "flat" else sc.build_two_level()
    assert "prime_v0" in scene
    o, d = _bounce_rays()
    # emulate the production stage's masked t_max (some inactive lanes)
    active = np.ones((o.shape[0],), bool)
    active[::7] = False
    t_full = jnp.where(jnp.asarray(active), RAY_MAX_T, 0.0)
    t_seeded = _prime_seed_tmax(scene, o, d, t_full)

    # the mechanism must actually engage: down-facing active lanes clamp
    seeded = np.asarray(t_seeded)
    assert (seeded[active] < RAY_MAX_T * 0.5).sum() > 50
    assert (seeded[~active] == 0.0).all()
    # conservative: seeds only ever tighten
    assert (seeded <= np.asarray(t_full)).all()

    kw = dict(cull=False, impl=impl, tile=512)
    h0, p0, n0, m0 = _trace_closest(scene, o, d, RAY_EPSILON, t_full, **kw)
    h1, p1, n1, m1 = _trace_closest(scene, o, d, RAY_EPSILON, t_seeded, **kw)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    for k in m0:
        np.testing.assert_array_equal(np.asarray(m0[k]), np.asarray(m1[k]))


def test_seeding_parity_after_refit():
    sc = _grid_scene()
    scene = sc.build_two_level()
    new_tf = np.stack([inst.transform for inst in sc.instances]).copy()
    new_tf[:, 1, 3] += 0.75
    scene = refit_scene_instances(scene, jnp.asarray(new_tf))
    o, d = _bounce_rays(seed=11)
    t_full = jnp.full((o.shape[0],), RAY_MAX_T)
    t_seeded = _prime_seed_tmax(scene, o, d, t_full)
    assert (np.asarray(t_seeded) < RAY_MAX_T * 0.5).sum() > 50
    kw = dict(cull=False, impl="jnp", tile=512)
    h0, p0, *_ = _trace_closest(scene, o, d, RAY_EPSILON, t_full, **kw)
    h1, p1, *_ = _trace_closest(scene, o, d, RAY_EPSILON, t_seeded, **kw)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
