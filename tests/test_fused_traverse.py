"""Fused traversal megakernel vs the jnp wavefront oracle (interpret mode).

The fused-traversal kernel (ops/fused_traverse_pallas.py) must reproduce the
wavefront integrator sample-for-sample on BVH scenes: identical RNG routing,
identical shading epilogue, hit-for-hit identical intersections (modulo fp
reassociation on knife-edge pairs and BVH-order tie-breaking).
"""

import jax
import numpy as np
import pytest

from dxrexperiments_tpu.core.camera import Camera, camera_params
from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
from dxrexperiments_tpu.scene import Scene, cornell_box, envmap
from dxrexperiments_tpu.scene.lights import directional_light, point_light
from dxrexperiments_tpu.scene.materials import Material
from dxrexperiments_tpu.scene.procedural import random_triangle_soup
from dxrexperiments_tpu.trace import default_options, render_sample

W = H = 32  # one 32x32 block/tile


def cornell_bvh(env="const"):
    mesh, materials = cornell_box(glossy_tall_box=True)
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.0, -0.6, -0.8), (0.9, 0.9, 0.9, 0.6)),
        "point": point_light((0.0, 1.8, 0.0), (1.0, 0.9, 0.7, 6.0)),
    }
    if env == "const":
        sc.environment = envmap.constant_env((0.05, 0.1, 0.2), strength=1.5)
    else:
        sc.environment = envmap.gradient_env()
    return sc.build(accel="bvh")


def soup_bvh(n=500):
    mesh = random_triangle_soup(n, seed=11, extent=3.0)
    sc = Scene()
    sc.add_material(Material.reference_default())
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.2, -0.8, -0.5), (1.0, 1.0, 0.9, 0.8)),
        "point": point_light((0.5, 2.0, 0.5), (1.0, 0.9, 0.7, 5.0)),
    }
    sc.environment = envmap.gradient_env()
    return sc.build(accel="bvh")


def cam_stack(frames, jitters=None):
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    return [
        camera_params(
            cam,
            jitter=(0.0, 0.0) if jitters is None else jitters[i],
            frame_count=f,
        )
        for i, f in enumerate(frames)
    ]


def fused_one(scene, options, cam, w=W, h=H):
    cams = jax.tree.map(lambda x: x[None], cam)
    env_kind = int(scene["env"]["kind"])
    return ftp.fused_traverse_progressive_sum(
        scene, options, cams, w, h, env_kind, interpret=True
    )


def oracle_one(scene, options, cam, w=W, h=H):
    # The brute-force jnp path ignores the BVH entirely — an independent
    # correctness oracle for the traversal.
    return render_sample(
        scene, options, cam, w, h, mode="progressive", impl="jnp",
        env_kind=int(scene["env"]["kind"]),
    )["color"]


def assert_images_match(got, want, frac=0.005, tol=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    diff = np.abs(got - want)
    bad = (diff > tol).any(axis=-1).mean()
    assert bad <= frac, f"{bad:.4%} pixels differ by more than {tol}"
    assert float(np.median(diff)) < 1e-5


OPTION_CASES = [
    {},
    {"debug": 2},
    {"no_indirect_diffuse": True},
    {"cosine_hemisphere_sampling": False},
    {"show_direct_lighting_only": True},
    {"show_indirect_diffuse_only": True},
]


@pytest.mark.parametrize("opts", OPTION_CASES)
def test_ft_matches_oracle_options(opts):
    scene = cornell_bvh()
    options = default_options(**opts)
    cam = cam_stack([7], jitters=[(0.3 / W, -0.2 / H)])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want)


@pytest.mark.slow
def test_ft_gradient_env():
    # Reference = the wavefront TRAVERSAL path: same BVH visit order, so
    # knife-edge tie-breaks match (the jnp brute oracle itself differs from
    # any traversal at ~1% of edge pixels on this scene; measured r3).
    scene = cornell_bvh(env="gradient")
    options = default_options()
    cam = cam_stack([3])[0]
    got = fused_one(scene, options, cam)
    want = render_sample(
        scene, options, cam, W, H, mode="progressive",
        impl="pallas_interpret", env_kind=int(scene["env"]["kind"]),
    )["color"]
    assert_images_match(got, want)


@pytest.mark.slow
def test_ft_soup_deep_tree():
    """A 600-triangle soup exercises real multi-level traversal, partial
    leaves and incoherent secondary packets."""
    scene = soup_bvh()
    options = default_options()
    cam = cam_stack([5])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want)


@pytest.mark.slow
def test_ft_multi_sample_sum():
    """S samples in one launch == the sum of S single-sample launches."""
    scene = cornell_bvh()
    options = default_options()
    cams = cam_stack([2, 31], jitters=[(0.001, 0.002), (0.002, -0.004)])
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *cams
    )
    env_kind = int(scene["env"]["kind"])
    got = ftp.fused_traverse_progressive_sum(
        scene, options, stacked, W, H, env_kind, interpret=True
    )
    want = sum(np.asarray(fused_one(scene, options, c)) for c in cams)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.slow
def test_ft_raster_fallback():
    """Image sizes that don't tile into 32x32 blocks use raster slabs with
    dead-lane padding; result must still match the oracle."""
    w, h = 40, 24  # 960 rays < tile 1024 -> one padded tile, raster order
    mesh, materials = cornell_box(glossy_tall_box=True)
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.0, -0.6, -0.8), (0.9, 0.9, 0.9, 0.6)),
        "point": point_light((0.0, 1.8, 0.0), (1.0, 0.9, 0.7, 6.0)),
    }
    sc.environment = envmap.constant_env((0.05, 0.1, 0.2), strength=1.5)
    scene = sc.build(accel="bvh")
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(w, h)
    camp = camera_params(cam, jitter=(0.0, 0.0), frame_count=4)
    options = default_options()
    got = fused_one(scene, options, camp, w, h)
    # jnp-oracle reference with a tie-break-tolerant bound (traversal vs
    # brute order differs at ~1% of knife-edge pixels at this tiny size);
    # a raster px/py mapping bug would scramble far more than 2%.
    want = oracle_one(scene, options, camp, w, h)
    assert_images_match(got, want, frac=0.02)


def test_ft_realtime_matches_wavefront():
    scene = cornell_bvh()
    opts = default_options()
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    camp = camera_params(cam, jitter=(0.003, -0.002), frame_count=5)
    ref = render_sample(
        scene, opts, camp, W, H, mode="realtime", jitter_scale=10.0,
        impl="jnp",
    )
    got = ftp.fused_traverse_realtime_outputs(
        scene, opts, camp, W, H, int(scene["env"]["kind"]), interpret=True
    )
    for k in ("color", "direct", "indirect_specular", "albedo", "roughness"):
        g = np.asarray(got[k])
        r = np.asarray(ref[k])
        diff = np.abs(g - r)
        bad = (diff > 1e-3).reshape(diff.shape[0] * diff.shape[1], -1)
        assert bad.any(axis=-1).mean() <= 0.005, k
        assert float(np.median(diff)) < 1e-5, k


def test_progressive_step_uses_fused_traverse():
    """make_progressive_step on a BVH scene routes through the fused
    traversal kernel and accumulates identically to the wavefront step."""
    from dxrexperiments_tpu.models.progressive import make_progressive_step

    scene = cornell_bvh()
    options = default_options()
    cam = cam_stack([0])[0]
    accum = np.zeros((H, W, 3), np.float32)
    maxit = np.asarray(64.0, np.float32)
    step_ft = make_progressive_step(scene, W, H, impl="pallas_interpret")
    got = np.asarray(
        step_ft(accum, options, cam, scene["lights"], scene["env"], maxit)
    )
    # routing check: with accum_count 0 the step must equal the fused
    # kernel's own single sample exactly (same code path, same RNG)
    want = np.asarray(fused_one(scene, options, cam))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_render_step_realtime_bvh_uses_fused_traverse():
    from dxrexperiments_tpu.trace.integrator import make_render_step
    from dxrexperiments_tpu.core.camera import camera_params

    scene = cornell_bvh()
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    camp = camera_params(cam, frame_count=1)
    step = make_render_step(
        scene, W, H, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret",
    )
    out = step(default_options(), camp, scene["lights"], scene["env"])
    assert set(out) >= {"color", "direct", "indirect_specular", "albedo",
                        "roughness"}
    assert np.isfinite(np.asarray(out["color"])).all()


@pytest.mark.slow
def test_ft_hbm_dma_variant(monkeypatch):
    """Big-scene kernel variant (HBM leaf DMA + VMEM node reduce) must match
    the resident variant; forced by dropping the residency thresholds."""
    scene = soup_bvh()
    options = default_options()
    cam = cam_stack([5])[0]
    want = np.asarray(fused_one(scene, options, cam))
    monkeypatch.setattr(ftp, "RESIDENT_MAX_ROWS", 0)
    monkeypatch.setattr(ftp, "SMEM_NODES_MAX_COLS", 0)
    got = np.asarray(fused_one(scene, options, cam))
    np.testing.assert_allclose(got, want, atol=1e-6)


def area_rig():
    from dxrexperiments_tpu.scene.lights import area_light

    return {
        "dir": [directional_light((0.0, -0.6, -0.8), (0.9, 0.9, 0.9, 0.3))],
        "point": [],
        "area": [area_light(
            (-0.4, 1.96, -0.4), (0.8, 0, 0), (0, 0, 0.8),
            (1.0, 0.9, 0.7, 4.0),
        )],
    }


def cornell_area(textured=False, env="gradient"):
    mesh, materials = cornell_box(
        glossy_tall_box=True, textured_floor=textured
    )
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    sc.lights = area_rig()
    if env == "gradient":
        sc.environment = envmap.gradient_env()
    else:
        rs = np.random.default_rng(3)
        sc.environment = envmap.cubemap_env(
            rs.uniform(0, 2, (6, 8, 8, 3)).astype(np.float32), strength=1.3
        )
    return sc.build(accel="bvh")


@pytest.mark.slow
@pytest.mark.parametrize("opts", [{}, {"debug": 2}, {"no_indirect_diffuse": True}])
def test_ft_area_light_rig(opts):
    """1 dir + 1 area rig: the area light's stratified soft-shadow rays ride
    the fused kernel's multi-direction occlusion walk; draws come from the
    oracle's decoupled TEA chain bit-exactly. Residual = knife-edge
    traversal-vs-brute tie-breaks only (median 0)."""
    scene = cornell_area()
    options = default_options(**opts)
    cam = cam_stack([7], jitters=[(0.3 / W, -0.2 / H)])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want, frac=0.01)


def test_ft_area_light_direct_only():
    """Direct-lighting-only view isolates the in-kernel area estimator
    against the wavefront traversal path (same BVH visit order)."""
    scene = cornell_area()
    options = default_options(show_direct_lighting_only=True)
    cam = cam_stack([3])[0]
    got = fused_one(scene, options, cam)
    want = render_sample(
        scene, options, cam, W, H, mode="progressive",
        impl="pallas_interpret", env_kind=int(scene["env"]["kind"]),
    )["color"]
    assert_images_match(got, want, frac=0.01)


def test_ft_area_light_realtime():
    scene = cornell_area()
    opts = default_options()
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    camp = camera_params(cam, jitter=(0.003, -0.002), frame_count=5)
    assert ftp.supports_fused_traverse(scene, "realtime", False)
    ref = render_sample(
        scene, opts, camp, W, H, mode="realtime", jitter_scale=10.0,
        impl="jnp",
    )
    got = ftp.fused_traverse_realtime_outputs(
        scene, opts, camp, W, H, int(scene["env"]["kind"]), interpret=True
    )
    for k in ("color", "direct", "indirect_specular"):
        diff = np.abs(np.asarray(got[k]) - np.asarray(ref[k]))
        bad = (diff > 1e-3).reshape(diff.shape[0] * diff.shape[1], -1)
        assert bad.any(axis=-1).mean() <= 0.01, k
        assert float(np.median(diff)) < 1e-5, k


@pytest.mark.parametrize("kind", ["latlong", "cubemap"])
def test_ft_realtime_env_deferred(kind):
    """Texture env kinds on the REALTIME fused path (env-deferred: hit
    mask + spec dir/weight rows out, env resolved host-side incl. the
    miss->direct AOV routing) — AOV-for-AOV parity with the jnp oracle."""
    scene = _tex_env_scene(kind)
    assert ftp.supports_fused_traverse(scene, "realtime", False)
    opts = default_options()
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    camp = camera_params(cam, jitter=(0.003, -0.002), frame_count=5)
    ref = render_sample(
        scene, opts, camp, W, H, mode="realtime", jitter_scale=10.0,
        impl="jnp",
    )
    got = ftp.fused_traverse_realtime_outputs(
        scene, opts, camp, W, H, int(scene["env"]["kind"]), interpret=True
    )
    for k in ("color", "direct", "indirect_specular", "albedo"):
        diff = np.abs(np.asarray(got[k]) - np.asarray(ref[k]))
        bad = (diff > 1e-3).reshape(diff.shape[0] * diff.shape[1], -1)
        assert bad.any(axis=-1).mean() <= 0.01, k
        assert float(np.median(diff)) < 1e-5, k


TEX_OPTION_CASES = [
    {},
    pytest.param({"debug": 2}, marks=pytest.mark.slow),
    pytest.param({"no_indirect_diffuse": True}, marks=pytest.mark.slow),
    pytest.param({"show_gbuffer_albedo_only": True}, marks=pytest.mark.slow),
    pytest.param({"show_indirect_diffuse_only": True}, marks=pytest.mark.slow),
    {"show_indirect_specular_only": True},
]


@pytest.mark.parametrize("opts", TEX_OPTION_CASES)
def test_ft_tex_deferred_matches_oracle(opts):
    """Albedo textures via the TEX-deferred fused path (BASELINE config 2):
    the kernel emits UVs + per-channel coefficients, the host resolves the
    quad-packed albedo gathers — sample-for-sample parity with the jnp
    oracle including AOV debug modes, under a cubemap env (env deferral
    composes)."""
    scene = cornell_area(textured=True, env="cubemap")
    options = default_options(**opts)
    cam = cam_stack([5], jitters=[(0.002, -0.001)])[0]
    got = np.asarray(fused_one(scene, options, cam))
    want = np.asarray(oracle_one(scene, options, cam))
    diff = np.abs(got - want)
    assert (diff.max(axis=-1) > 1e-3).mean() <= 0.01
    assert float(np.median(diff)) < 1e-5


@pytest.mark.slow
def test_ft_tex_deferred_multi_sample_sum():
    scene = cornell_area(textured=True, env="gradient")
    options = default_options()
    cams = cam_stack([3, 9], jitters=[(0.001, 0.002), (-0.002, 0.001)])
    stacked = jax.tree.map(
        lambda *x: jax.numpy.stack(x), *[c for c in cams]
    )
    total = np.asarray(
        ftp.fused_traverse_progressive_sum(
            scene, options, stacked, W, H, int(scene["env"]["kind"]),
            interpret=True,
        )
    )
    single = sum(np.asarray(fused_one(scene, options, c)) for c in cams)
    # rtol: the S-in-one-launch and S=1 host combines fuse differently in
    # XLA; bright area-lit pixels (~18.0) see ~2e-5 relative reassociation
    np.testing.assert_allclose(total, single, rtol=1e-4, atol=1e-5)


def test_supports_fused_traverse_gate():
    scene = cornell_bvh()
    assert ftp.supports_fused_traverse(scene, "progressive", False)
    assert ftp.supports_fused_traverse(scene, "realtime", False)
    assert not ftp.supports_fused_traverse(scene, "progressive", True)
    no_bvh = {k: v for k, v in scene.items() if k != "bvh"}
    assert not ftp.supports_fused_traverse(no_bvh, "progressive", False)
    lat = dict(
        scene, env=envmap.latlong_env(np.zeros((4, 8, 3), np.float32))
    )
    # texture env kinds run env-DEFERRED on both pipelines
    assert ftp.supports_fused_traverse(lat, "progressive", False)
    assert ftp.supports_fused_traverse(lat, "realtime", False)
    # pre-round-3 packs without the attr lanes are rejected
    stale = dict(
        scene,
        bvh={k: v for k, v in scene["bvh"].items() if k != "mt_attr_lanes"},
    )
    assert not ftp.supports_fused_traverse(stale, "progressive", False)
    # area-light rigs ride the fused path; 2-of-a-kind rigs don't
    area_scene = cornell_area()
    assert ftp.supports_fused_traverse(area_scene, "progressive", False)
    assert ftp.supports_fused_traverse(area_scene, "realtime", False)
    two_dir = dict(
        scene,
        lights={"dir": [scene["lights"]["dir"], scene["lights"]["dir"]]},
    )
    assert not ftp.supports_fused_traverse(two_dir, "progressive", False)
    # textured scenes: progressive tex-deferred yes, realtime no; packs
    # without the UV lanes (mt_attr_lanes < 2) are rejected
    tex_scene = cornell_area(textured=True)
    assert int(tex_scene["bvh"]["mt_attr_lanes"]) == 2
    assert ftp.supports_fused_traverse(tex_scene, "progressive", False)
    assert not ftp.supports_fused_traverse(tex_scene, "realtime", False)
    tex_stale = dict(
        tex_scene, bvh=dict(tex_scene["bvh"], mt_attr_lanes=np.int32(1))
    )
    assert not ftp.supports_fused_traverse(tex_stale, "progressive", False)


def _tex_env_scene(kind):
    mesh, materials = cornell_box(glossy_tall_box=True)
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.0, -0.6, -0.8), (0.9, 0.9, 0.9, 0.6)),
        "point": point_light((0.0, 1.8, 0.0), (1.0, 0.9, 0.7, 6.0)),
    }
    rs = np.random.default_rng(3)
    if kind == "latlong":
        sc.environment = envmap.latlong_env(
            rs.uniform(0, 2, (8, 16, 3)).astype(np.float32), strength=1.3
        )
    else:
        sc.environment = envmap.cubemap_env(
            rs.uniform(0, 2, (6, 8, 8, 3)).astype(np.float32), strength=1.3
        )
    return sc.build(accel="bvh")


@pytest.mark.parametrize("kind", ["latlong", "cubemap"])
@pytest.mark.parametrize(
    "opts",
    [
        {},
        pytest.param({"debugView": 3}, marks=pytest.mark.slow),
        pytest.param({"debugView": 4}, marks=pytest.mark.slow),
        pytest.param({"sampling": 1}, marks=pytest.mark.slow),
    ],
)
def test_ft_env_deferred_matches_oracle(kind, opts):
    """Texture env kinds via the env-DEFERRED fused path: the kernel emits
    bounce dirs + per-channel env weights, the host resolves env with the
    same quad-packed gathers as the wavefront path — sample-for-sample
    parity with the jnp oracle, including AOV debug modes."""
    scene = _tex_env_scene(kind)
    options = dict(default_options(), **opts)
    cam = cam_stack([5], jitters=[(0.002, -0.001)])[0]
    got = np.asarray(fused_one(scene, options, cam))
    want = np.asarray(oracle_one(scene, options, cam))
    bad = np.abs(got - want).max(axis=-1) > 1e-3
    assert bad.mean() <= 0.01, f"bad pixels {bad.mean():.4%}"
    agree = ~bad
    np.testing.assert_allclose(got[agree], want[agree], atol=1e-3)


@pytest.mark.slow
def test_ft_env_deferred_multi_sample_sum():
    scene = _tex_env_scene("latlong")
    options = default_options()
    cams = cam_stack([3, 9], jitters=[(0.001, 0.002), (-0.002, 0.001)])
    stacked = jax.tree.map(
        lambda *x: jax.numpy.stack(x), *[c for c in cams]
    )
    total = np.asarray(
        ftp.fused_traverse_progressive_sum(
            scene, options, stacked, W, H, int(scene["env"]["kind"]),
            interpret=True,
        )
    )
    single = sum(
        np.asarray(fused_one(scene, options, c)) for c in cams
    )
    np.testing.assert_allclose(total, single, atol=1e-5)
