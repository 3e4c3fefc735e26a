"""Ray-reorder paths: block permutation + opt-in traversal sorting.

Blocking (integrator._block_perm) re-tiles raster packets into 32x64-pixel
frustum blocks — measured 17x on 200k-tri closest-hit. The (origin-Morton,
octant) sort (integrator._ray_sort_order) is an opt-in for incoherent ray
batches (it measured NEGATIVE on the dense instanced scene, so call sites
default it off). Both must be exact permutations: results bit-identical to
the unsorted path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.scene import Scene
from dxrexperiments_tpu.scene.procedural import random_triangle_soup
from dxrexperiments_tpu.trace import integrator


def soup_scene(n=2000):
    sc = Scene()
    sc.add_model(random_triangle_soup(n, seed=4, extent=10.0))
    return sc.build(accel="bvh")


def rays(n, seed=0):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_block_perm_is_permutation():
    perm, inv = integrator._block_perm(64, 128)
    assert sorted(perm.tolist()) == list(range(64 * 128))
    np.testing.assert_array_equal(perm[inv], np.arange(64 * 128))


def test_sorted_closest_matches_unsorted():
    scene = soup_scene()
    o, d = rays(600, seed=1)
    plain = integrator._trace_closest(
        scene, o, d, 1e-4, 3.0e37, cull=False, impl="pallas_interpret"
    )
    srt = integrator._trace_closest(
        scene, o, d, 1e-4, 3.0e37, cull=False, impl="pallas_interpret",
        sort_rays=True,
    )
    for a, b in zip(plain, srt):
        if isinstance(a, dict):
            for k in a:
                np.testing.assert_allclose(
                    np.asarray(a[k]), np.asarray(b[k]), rtol=1e-6, atol=1e-6
                )
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )


def test_sorted_any_matches_unsorted():
    scene = soup_scene()
    o, d = rays(600, seed=2)
    tmax = jnp.asarray(
        np.random.default_rng(3).uniform(0.5, 20.0, 600).astype(np.float32)
    )
    plain = integrator._trace_any(
        scene, o, d, 1e-4, tmax, "pallas_interpret"
    )
    srt = integrator._trace_any(
        scene, o, d, 1e-4, tmax, "pallas_interpret", sort_rays=True
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(srt))


@pytest.mark.slow
def test_blocked_render_matches_unblocked():
    """render_sample with blocking (pallas_interpret + BVH) must equal the
    jnp path (never blocked) — proves the permutation round-trips."""
    from dxrexperiments_tpu.core.camera import Camera, camera_params
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.scene.lights import default_lights
    from dxrexperiments_tpu.trace import default_options, render_sample

    sc = Scene()
    sc.add_model(random_triangle_soup(1500, seed=5, extent=10.0))
    sc.lights = default_lights()
    sc.environment = envmap.gradient_env()
    scene = sc.build(accel="bvh")
    cam = Camera()
    cam.set_eye_at_up((20.0, 14.0, 20.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    h, w = 32, 64  # one block exactly
    cam.set_aspect(w, h)
    params = camera_params(cam)
    options = default_options()
    a = render_sample(scene, options, params, w, h, impl="pallas_interpret")
    b = render_sample(scene, options, params, w, h, impl="jnp")
    diff = np.abs(np.asarray(a["color"]) - np.asarray(b["color"]))
    assert (diff > 1e-3).mean() < 0.01
