"""Fused megakernel vs the jnp wavefront oracle (interpret mode on CPU).

The megakernel (ops/fused_sample_pallas.py) must reproduce the wavefront
integrator sample-for-sample: identical RNG draw routing, identical shading
epilogue, hit-for-hit identical intersections (modulo fp reassociation on
knife-edge pairs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.core.camera import Camera, camera_params
from dxrexperiments_tpu.models.progressive import make_progressive_step
from dxrexperiments_tpu.ops import fused_sample_pallas
from dxrexperiments_tpu.scene import Scene, cornell_box, envmap
from dxrexperiments_tpu.scene.lights import directional_light, point_light
from dxrexperiments_tpu.trace import default_options, render_sample

W = H = 32  # one 32x32 block/tile; knife-edge fraction scales with size


def cornell(env="const"):
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
    return sc.build()


def cam_stack(frames, jitters=None):
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(W, H)
    cams = [
        camera_params(
            cam,
            jitter=(0.0, 0.0) if jitters is None else jitters[i],
            frame_count=f,
        )
        for i, f in enumerate(frames)
    ]
    return cams


def fused_one(scene, options, cam):
    cams = jax.tree.map(lambda x: x[None], cam)
    env_kind = int(scene["env"]["kind"])
    return fused_sample_pallas.fused_progressive_sum(
        scene, options, cams, W, H, env_kind, interpret=True
    )


def oracle_one(scene, options, cam):
    return render_sample(
        scene, options, cam, W, H, mode="progressive", impl="jnp",
        env_kind=int(scene["env"]["kind"]),
    )["color"]


def assert_images_match(got, want, frac=0.005, tol=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    diff = np.abs(got - want)
    # Knife-edge pairs may resolve differently under fp reassociation;
    # almost all pixels must agree tightly.
    bad = (diff > tol).any(axis=-1).mean()
    assert bad <= frac, f"{bad:.4%} pixels differ by more than {tol}"
    assert float(np.median(diff)) < 1e-5


OPTION_CASES = [
    {},
    {"debug": 2},
    {"no_indirect_diffuse": True},
    {"cosine_hemisphere_sampling": False},
    {"show_direct_lighting_only": True},
    {"show_gbuffer_albedo_only": True},
    {"show_fresnel_term": True},
    {"show_indirect_specular_only": True},
    {"show_indirect_diffuse_only": True},
    {"debug": 2, "no_indirect_diffuse": True},
]


@pytest.mark.parametrize("opts", OPTION_CASES)
def test_fused_matches_oracle_options(opts):
    scene = cornell()
    options = default_options(**opts)
    cam = cam_stack([7], jitters=[(0.3 / W, -0.2 / H)])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want)


def test_fused_light_mc_static_matches():
    """The static debug==2 MC variant (light_mc=True: ONE merged per-lane
    shadow sweep per direct-lighting call instead of two, 9 sweeps -> 7)
    must reproduce the traced is_mc path bit-for-bit — the per-lane merged
    sweep computes exactly the picked light's visibility
    (/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:91-104)."""
    scene = cornell()
    options = default_options(debug=2)
    cam = cam_stack([11], jitters=[(0.25 / W, -0.15 / H)])[0]
    cams = jax.tree.map(lambda x: x[None], cam)
    ek = int(scene["env"]["kind"])
    traced = fused_sample_pallas.fused_progressive_sum(
        scene, options, cams, W, H, ek, interpret=True
    )
    static = fused_sample_pallas.fused_progressive_sum(
        scene, options, cams, W, H, ek, interpret=True, light_mc=True
    )
    np.testing.assert_array_equal(np.asarray(static), np.asarray(traced))
    # and both match the wavefront oracle within the knife-edge bound
    assert_images_match(static, oracle_one(scene, options, cam))


def test_fused_light_mc_step_factory():
    """make_progressive_step(light_mc=True) routes the flag into the
    megakernel and matches the default factory with debug==2."""
    scene = cornell()
    options = default_options(debug=2)
    cams = cam_stack([3, 4], jitters=[(0.1 / W, 0.0), (0.0, -0.1 / H)])
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    stacked["accum_count"] = jnp.zeros((2,), jnp.float32)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    mi = jnp.asarray(8, jnp.int32)
    args = (accum, options, stacked, scene["lights"], scene["env"], mi)
    base = make_progressive_step(
        scene, W, H, samples_per_step=2, impl="pallas_interpret"
    )(*args)
    mc = make_progressive_step(
        scene, W, H, samples_per_step=2, impl="pallas_interpret",
        light_mc=True,
    )(*args)
    np.testing.assert_array_equal(np.asarray(mc), np.asarray(base))


def test_fused_gradient_env():
    scene = cornell(env="gradient")
    options = default_options()
    cam = cam_stack([3])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want)


def test_fused_multi_sample_sum():
    """S-sample fused dispatch == sum of S single-sample oracles."""
    scene = cornell()
    options = default_options()
    frames = [0, 1, 2, 3]
    jitters = [(0.1 / W, 0.0), (-0.2 / W, 0.1 / H), (0.0, -0.3 / H), (0.25 / W, 0.25 / H)]
    cams = cam_stack(frames, jitters)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    got = fused_sample_pallas.fused_progressive_sum(
        scene, options, stacked, W, H, 0, interpret=True
    )
    want = sum(oracle_one(scene, options, c) for c in cams)
    assert_images_match(got, want, tol=4e-3)


def _tex_env_cornell(kind):
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
    return sc.build()


@pytest.mark.parametrize("kind", ["latlong", "cubemap"])
@pytest.mark.parametrize(
    "opts",
    [
        {},
        pytest.param({"debug": 2}, marks=pytest.mark.slow),
        pytest.param({"no_indirect_diffuse": True}, marks=pytest.mark.slow),
        pytest.param(
            {"show_indirect_diffuse_only": True}, marks=pytest.mark.slow
        ),
        pytest.param(
            {"show_indirect_specular_only": True}, marks=pytest.mark.slow
        ),
    ],
)
def test_fused_env_deferred_matches_oracle(kind, opts):
    """Texture env kinds via the brute megakernel's ENV-DEFERRED path
    (round 4): the kernel emits bounce dirs + per-channel env weights, the
    host resolves env with the same quad-packed gathers as the wavefront
    path — sample-for-sample parity with the jnp oracle incl. AOV modes."""
    scene = _tex_env_cornell(kind)
    options = default_options(**opts)
    cam = cam_stack([5], jitters=[(0.002, -0.001)])[0]
    got = fused_one(scene, options, cam)
    want = oracle_one(scene, options, cam)
    assert_images_match(got, want)


@pytest.mark.slow
def test_fused_env_deferred_multi_sample_sum():
    """S-sample deferred dispatch == sum of per-sample fused renders."""
    scene = _tex_env_cornell("latlong")
    options = default_options()
    cams = cam_stack([3, 9], jitters=[(0.001, 0.002), (-0.002, 0.001)])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    got = fused_sample_pallas.fused_progressive_sum(
        scene, options, stacked, W, H, int(scene["env"]["kind"]),
        interpret=True,
    )
    want = sum(np.asarray(fused_one(scene, options, c)) for c in cams)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_make_progressive_step_uses_fused_and_matches():
    """The step factory's fused path equals its wavefront path."""
    scene = cornell()
    options = default_options()
    cams = cam_stack([0, 1], jitters=[(0.0, 0.0), (0.1 / W, -0.1 / H)])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    stacked["accum_count"] = jnp.zeros((2,), jnp.float32)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    mi = jnp.asarray(1024, jnp.int32)

    step_fused = make_progressive_step(
        scene, W, H, samples_per_step=2, impl="pallas_interpret"
    )
    step_ref = make_progressive_step(
        scene, W, H, samples_per_step=2, impl="jnp"
    )
    got = step_fused(accum, options, stacked, scene["lights"], scene["env"], mi)
    want = step_ref(accum, options, stacked, scene["lights"], scene["env"], mi)
    assert_images_match(got, want, tol=2e-3)


def test_supports_fused_gating():
    scene = cornell()
    assert fused_sample_pallas.supports_fused(scene, "progressive", False)
    assert not fused_sample_pallas.supports_fused(scene, "progressive", True)
    assert fused_sample_pallas.supports_fused(scene, "realtime", False)
    assert not fused_sample_pallas.supports_fused(scene, "realtime", True)
    big = dict(scene, mt_pack=jnp.zeros((4, 512, 16)))
    assert not fused_sample_pallas.supports_fused(big, "progressive", False)
    # Texture env kinds ride the megakernel ENV-DEFERRED in BOTH pipelines
    # (progressive round 4; realtime later the same round).
    lat = dict(scene, env=envmap.latlong_env(np.zeros((4, 8, 3), np.float32)))
    assert fused_sample_pallas.supports_fused(lat, "progressive", False)
    assert fused_sample_pallas.supports_fused(lat, "realtime", False)


def test_fused_realtime_matches_wavefront():
    """The fused realtime megakernel must reproduce the wavefront realtime
    path's five outputs (fp-reassociation tolerance)."""
    import numpy as np
    import jax.numpy as jnp
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.trace.integrator import default_options, render_sample
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    w = h = 48
    sc, cam = build_scene("cornell-glossy")
    cam.set_aspect(w, h)
    scene = sc.build()
    opts = default_options()
    camp = camera_params(cam, jitter=(0.003, -0.002), frame_count=5)
    ref = render_sample(
        scene, opts, camp, w, h, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret",
    )
    got = fsp.fused_realtime_outputs(
        scene, opts, camp, w, h, int(scene["env"]["kind"]), interpret=True
    )
    for k in ("color", "direct", "indirect_specular", "albedo", "roughness"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), atol=5e-6, err_msg=k
        )


@pytest.mark.parametrize("kind", ["latlong", "cubemap"])
def test_fused_realtime_env_deferred_matches_wavefront(kind):
    """Texture env kinds via the brute megakernel's realtime ENV-DEFERRED
    path: rows 0-2 carry the hit-only direct term, row 10 the hit mask,
    11-13/14-16 the specular bounce dir + per-channel env weight (the FT
    realtime-deferred layout); the host substitutes env(primary) on miss
    and adds ws * env(spec_dir) — parity with the jnp wavefront realtime
    path (RealtimeRaytracing.hlsl miss->direct routing)."""
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    scene = _tex_env_cornell(kind)
    assert fsp.supports_fused(scene, "realtime", False)
    opts = default_options()
    camp = cam_stack([5], jitters=[(0.003, -0.002)])[0]
    ref = render_sample(
        scene, opts, camp, W, H, mode="realtime", jitter_scale=10.0,
        impl="jnp", env_kind=int(scene["env"]["kind"]),
    )
    got = fsp.fused_realtime_outputs(
        scene, opts, camp, W, H, int(scene["env"]["kind"]), interpret=True
    )
    for k in ("color", "direct", "indirect_specular", "albedo"):
        assert_images_match(got[k], ref[k])
    np.testing.assert_allclose(
        np.asarray(got["roughness"]), np.asarray(ref["roughness"]), atol=1e-5
    )


@pytest.mark.slow
def test_fused_realtime_env_deferred_batch():
    """S-frame deferred realtime batch == S single deferred frames."""
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    scene = _tex_env_cornell("cubemap")
    opts = default_options()
    cams = cam_stack([3, 9], jitters=[(0.001, 0.002), (-0.002, 0.001)])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    ek = int(scene["env"]["kind"])
    got = fsp.fused_realtime_outputs_batch(
        scene, opts, stacked, W, H, ek, interpret=True
    )
    for i, c in enumerate(cams):
        want = fsp.fused_realtime_outputs(scene, opts, c, W, H, ek,
                                          interpret=True)
        for k in ("color", "direct", "indirect_specular"):
            np.testing.assert_allclose(
                np.asarray(got[k][i]), np.asarray(want[k]), atol=1e-6,
                err_msg=f"{k}[{i}]",
            )


def test_make_render_step_uses_fused_realtime():
    """make_render_step returns the fused realtime step for eligible scenes
    and its output feeds the pipeline contract (direct + indirect_specular)."""
    import numpy as np
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.trace.integrator import make_render_step

    w = h = 32
    sc, cam = build_scene("cornell-glossy")
    cam.set_aspect(w, h)
    scene = sc.build()
    step = make_render_step(
        scene, w, h, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret",
    )
    camp = camera_params(cam, frame_count=1)
    out = step(
        __import__("dxrexperiments_tpu.trace.integrator",
                   fromlist=["default_options"]).default_options(),
        camp, scene["lights"], scene["env"],
    )
    assert set(out) >= {"color", "direct", "indirect_specular", "albedo",
                        "roughness"}
    assert np.asarray(out["direct"]).shape == (h, w, 3)


@pytest.mark.slow
def test_fused_multichunk_matches_wavefront():
    """A >CHUNK_T-triangle scene exercises the in-kernel chunk loops; the
    fused sample must still match the wavefront path."""
    import numpy as np
    from dxrexperiments_tpu.core.camera import Camera, camera_params
    from dxrexperiments_tpu.scene import Scene
    from dxrexperiments_tpu.scene.procedural import random_triangle_soup
    from dxrexperiments_tpu.scene.materials import Material
    from dxrexperiments_tpu.scene.lights import directional_light, point_light
    from dxrexperiments_tpu.scene import envmap as em
    from dxrexperiments_tpu.trace.integrator import default_options, render_sample
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    mesh = random_triangle_soup(700, seed=4, extent=3.0)
    sc = Scene()
    sc.add_material(Material.reference_default())
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.2, -0.8, -0.5), (1.0, 1.0, 0.9, 0.8)),
        "point": point_light((0.0, 4.0, 0.0), (1.0, 0.9, 0.7, 5.0)),
    }
    sc.environment = em.gradient_env()
    scene = sc.build()
    assert int(scene["mt_pack"].shape[1]) > fsp.CHUNK_T

    w = h = 40
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.5, 9.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    cam.set_aspect(w, h)
    opts = default_options()
    camp = camera_params(cam, jitter=(0.001, -0.002), frame_count=3)
    ref = render_sample(scene, opts, camp, w, h, impl="pallas_interpret")
    cams = __import__("jax").tree.map(lambda x: x[None], camp)
    got = fsp.fused_progressive_sum(
        scene, opts, cams, w, h, int(scene["env"]["kind"]), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref["color"]), np.asarray(got), atol=5e-5
    )


def test_fused_list_form_light_rig():
    """supports_fused approves list-form rigs; dispatch must not crash on
    them (ADVICE r2: .items() on a raw list) and must match the dict form."""
    scene = cornell()
    scene_list = dict(
        scene,
        lights={
            "dir": [scene["lights"]["dir"]],
            "point": [scene["lights"]["point"]],
        },
    )
    assert fused_sample_pallas.supports_fused(scene_list, "progressive", False)
    opts = default_options()
    cam = cam_stack([0])[0]
    got = fused_one(scene_list, opts, cam)
    want = fused_one(scene, opts, cam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_fused_clustered_matches_flat(monkeypatch):
    """FUSED_CLUSTERS gating is conservative: bit-identical to the flat
    sweep (it may only SKIP provably-unreachable row windows). Measured
    negative for speed on v5e (see _any_hit_clustered) but kept correct."""
    scene = cornell()
    options = default_options()
    cam = cam_stack([7], jitters=[(0.001, -0.002)])[0]
    flat = np.asarray(fused_one(scene, options, cam))
    monkeypatch.setenv("FUSED_CLUSTERS", "16")
    clustered = np.asarray(fused_one(scene, options, cam))
    np.testing.assert_array_equal(clustered, flat)


@pytest.mark.slow
def test_mxu_split_matches_flat(monkeypatch):
    """DXR_MXU_SPLIT routes a tail of each sweep's triangle rows through
    the MXU dot form of _pair_terms. The dot reassociates the 19-FMA term
    chain, so agreement is to fp32 reassociation tolerance, and the
    lowest-row tie-break must stay exact (ascending span merge order).
    The knob is read at trace time: caches are cleared around each toggle
    so no split-baked trace leaks into other tests."""
    impl = fused_sample_pallas._fused_progressive_sum_impl
    scene = cornell()
    options = default_options()
    cam = cam_stack([7], jitters=[(0.001, -0.002)])[0]
    try:
        impl.clear_cache()
        flat = np.asarray(fused_one(scene, options, cam))
        for rows in ("64", "128"):
            monkeypatch.setenv("DXR_MXU_SPLIT", rows)
            impl.clear_cache()
            split = np.asarray(fused_one(scene, options, cam))
            err = np.abs(split - flat)
            assert np.median(err) <= 1e-6, np.median(err)
            assert err.max() <= 5e-3, err.max()  # bounce-dir chaos tail
            # images must agree structurally, not just numerically
            corr = np.corrcoef(split.ravel(), flat.ravel())[0, 1]
            assert corr > 0.99999, corr
    finally:
        monkeypatch.delenv("DXR_MXU_SPLIT", raising=False)
        impl.clear_cache()
