"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dxrexperiments_tpu.parallel import (
    make_render_mesh,
    progressive_step_sharded,
    render_samples_sharded,
    replicate_scene,
    stack_cameras,
)


def needs_devices(n):
    return pytest.mark.skipif(
        jax.device_count() < n, reason=f"needs {n} virtual devices"
    )


def setup(width, height, n_samples):
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cornell_setup

    return _cornell_setup(width, height, n_samples)


@needs_devices(8)
def test_mesh_shapes():
    mesh = make_render_mesh(n_tile=4, n_spp=2)
    assert mesh.shape == {"tile": 4, "spp": 2}
    mesh2 = make_render_mesh()
    assert mesh2.shape["tile"] == jax.device_count()


@needs_devices(8)
def test_sharded_matches_single_chip_mean():
    """The sharded S-sample mean must equal the unsharded computation."""
    width, height = 32, 32
    scene, options, cams, _ = setup(width, height, 4)
    cameras = stack_cameras(cams)

    mesh = make_render_mesh(n_tile=2, n_spp=4)
    scene_r = replicate_scene(scene, mesh)
    sharded = np.asarray(
        render_samples_sharded(scene_r, options, cameras, width, height, mesh)
    )

    from dxrexperiments_tpu.trace.integrator import render_sample

    singles = [
        np.asarray(render_sample(scene, options, c, width, height)["color"])
        for c in cams
    ]
    np.testing.assert_allclose(sharded, np.mean(singles, axis=0), atol=1e-5)


@needs_devices(8)
def test_progressive_step_sharded_accumulates():
    width, height = 32, 32
    scene, options, cams, accum = setup(width, height, 2)
    cameras = stack_cameras(cams)
    mesh = make_render_mesh(n_tile=4, n_spp=2)
    scene_r = replicate_scene(scene, mesh)
    accum = jax.device_put(accum, NamedSharding(mesh, P("tile", None, None)))

    out = progressive_step_sharded(
        scene_r, options, cameras, accum, width, height, mesh
    )
    arr = np.asarray(out)
    assert arr.shape == (height, width, 3)
    assert np.isfinite(arr).all() and arr.max() > 0
    # Output keeps the row sharding (trailing Nones are normalized away).
    assert out.sharding.spec in (P("tile"), P("tile", None, None))


@needs_devices(8)
def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_two_level_matches_single_chip():
    """Tile/spp-sharded rendering of a TWO-LEVEL (TLAS/BLAS) scene on the
    virtual 8-device mesh must match the unsharded render — the multi-chip
    axis composes with the refittable instance path (scene replicated,
    including the host-static tlas metadata)."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.trace.integrator import default_options, render_sample

    width = height = 32
    sc, cam = build_scene("instanced:2")
    cam.set_aspect(width, height)
    scene = sc.build_two_level()
    options = default_options()
    cams = [camera_params(cam, frame_count=i) for i in range(4)]
    cameras = stack_cameras(cams)

    mesh = make_render_mesh(n_tile=2, n_spp=4)
    scene_r = replicate_scene(scene, mesh)
    sharded = np.asarray(
        render_samples_sharded(scene_r, options, cameras, width, height, mesh)
    )
    singles = [
        np.asarray(render_sample(scene, options, c, width, height)["color"])
        for c in cams
    ]
    np.testing.assert_allclose(sharded, np.mean(singles, axis=0), atol=1e-5)
