"""Miss-compacted deferred gathers (ops/deferred_resolve, round 4).

Compaction gathers the same values the full-width resolve does and
scatters them into zeros; the only permitted deviation is the last float32
ulp from XLA fusing the elementwise math differently at the compact shape
(tolerance 1e-5 relative / 2e-6 absolute). Covered: both index methods,
counts that land in each capacity tier AND overflow to the full fallback,
the env/albedo wrappers, and the deferred fused-traversal path end-to-end
with compaction forced on/off.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrexperiments_tpu.ops import deferred_resolve as dr


def _fn(rows):
    return rows[:, :3] * 2.0 + rows[:, 3:4]


@pytest.mark.parametrize("method", ["nonzero", "sort"])
@pytest.mark.parametrize("frac", [0.01, 0.3, 0.9])
def test_compact_apply_matches_full(method, frac):
    rng = np.random.default_rng(hash((method, frac)) % 2**31)
    n = 400
    packed = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    need = jnp.asarray(rng.random(n) < frac)
    want = np.where(np.asarray(need)[:, None], np.asarray(_fn(packed)), 0.0)
    got = dr.compact_apply(
        _fn, need, packed, out_dim=3, caps=(0.125, 0.5), method=method,
        enabled=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_compact_apply_disabled_matches():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    need = jnp.asarray(rng.random(64) < 0.2)
    a = dr.compact_apply(_fn, need, packed, enabled=True, caps=(0.25,))
    b = dr.compact_apply(_fn, need, packed, enabled=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("frac", [0.01, 0.3, 0.9])
@pytest.mark.parametrize("block", [8, 32])
def test_block_compact_apply_matches_full(frac, block):
    """Block mode (round 5): same contract as per-row compaction, block-
    granular need. Exercises n not a multiple of B (padding path), counts
    landing in each tier AND overflowing to the full fallback."""
    rng = np.random.default_rng(hash(("block", frac, block)) % 2**31)
    n = 403
    packed = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    need = jnp.asarray(rng.random(n) < frac)
    want = np.where(np.asarray(need)[:, None], np.asarray(_fn(packed)), 0.0)
    got = dr.compact_apply(
        _fn, need, packed, out_dim=3, caps=(0.125, 0.5), enabled="block",
        block=block,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_block_compact_clustered_need_hits_small_tier():
    """Clustered need (the case block mode exists for): all needed rows in
    one block — the smallest capacity tier must reproduce the full
    resolve exactly."""
    n, block = 256, 32
    packed = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    need = np.zeros(n, bool)
    need[40:60] = True  # spans blocks 1..1 (rows 40..59 in blocks 1,1)
    got = dr.compact_apply(
        _fn, jnp.asarray(need), packed, caps=(0.125, 0.5),
        enabled="block", block=block,
    )
    want = np.where(need[:, None], np.asarray(_fn(packed)), 0.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_block_compact_env_knob(monkeypatch):
    """DXR_COMPACT=block routes through _knobs."""
    monkeypatch.setenv("DXR_COMPACT", "block")
    monkeypatch.setenv("DXR_COMPACT_B", "16")
    rng = np.random.default_rng(7)
    packed = jnp.asarray(rng.normal(size=(128, 4)).astype(np.float32))
    need = jnp.asarray(rng.random(128) < 0.1)
    got = dr.compact_apply(_fn, need, packed)
    want = np.where(np.asarray(need)[:, None], np.asarray(_fn(packed)), 0.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_compact_apply_all_and_none_needed():
    packed = jnp.arange(32.0, dtype=jnp.float32).reshape(8, 4)
    none = dr.compact_apply(_fn, jnp.zeros(8, bool), packed, caps=(0.5,),
                            enabled=True)
    np.testing.assert_array_equal(np.asarray(none), 0.0)
    full = dr.compact_apply(_fn, jnp.ones(8, bool), packed, caps=(0.5,),
                            enabled=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(_fn(packed)))


@pytest.mark.parametrize("kind_name", ["latlong", "cubemap"])
def test_weighted_and_masked_env_match_full(kind_name):
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.ops.fused_traverse_pallas import _safe_dirs
    from dxrexperiments_tpu.scene.envmap import sample_environment

    rng = np.random.default_rng(3)
    if kind_name == "latlong":
        env = envmap.latlong_env(rng.random((16, 32, 3)).astype(np.float32))
    else:
        env = envmap.cubemap_env(rng.random((6, 8, 8, 3)).astype(np.float32))
    kind = int(env["kind"])
    n = 300
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    weights = np.where(
        rng.random((n, 1)) < 0.15, rng.random((n, 3)), 0.0
    ).astype(np.float32)
    # some dead lanes with zero dirs, like the kernel emits
    dead = rng.random(n) < 0.3
    dirs[dead] = 0.0
    weights[dead] = 0.0
    dirs, weights = jnp.asarray(dirs), jnp.asarray(weights)

    got = dr.weighted_env(env, dirs, weights, kind, caps=(0.25,),
                          enabled=True)
    want = np.asarray(weights) * np.asarray(
        sample_environment(env, _safe_dirs(dirs), static_kind=kind)
    )
    want = np.where(np.asarray(weights).any(1, keepdims=True), want, 0.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=2e-6)

    need = jnp.asarray(~dead)
    got_m = dr.masked_env(env, _safe_dirs(dirs), need, kind, caps=(0.9,),
                          enabled=True)
    want_m = np.where(
        np.asarray(need)[:, None],
        np.asarray(sample_environment(env, _safe_dirs(dirs), static_kind=kind)),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=1e-5, atol=2e-6)


def test_masked_albedo_matches_full():
    from dxrexperiments_tpu.scene.materials import Material
    from dxrexperiments_tpu.scene.textures import (
        checker_texture, pack_texture_table, sample_albedo,
    )

    table = pack_texture_table([
        Material(),  # mat 0 untextured
        Material(albedo_texture=checker_texture(4, size=16)),
    ])
    rng = np.random.default_rng(5)
    n = 200
    uv = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    mid = jnp.asarray(rng.integers(0, 2, n).astype(np.float32))
    need = jnp.asarray(rng.random(n) < 0.2)
    got = dr.masked_albedo(table, uv, mid, need, caps=(0.3,), enabled=True)
    want = np.where(
        np.asarray(need)[:, None],
        np.asarray(sample_albedo(table, mid.astype(jnp.int32), uv)),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=2e-6)


def test_auto_build_routes_texture_env_to_ft():
    """Small texture-env / textured-albedo scenes auto-attach a BVH so they
    ride the fused-traversal deferred megakernel instead of the wavefront
    path (round 4); plain small scenes keep the brute pytree."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.scene import envmap

    sc, _ = build_scene("cornell-glossy")
    assert "bvh" not in sc.build()  # analytic env: brute megakernel

    sc, _ = build_scene("cornell-glossy")
    rng = np.random.default_rng(0)
    sc.environment = envmap.latlong_env(
        rng.random((8, 16, 3)).astype(np.float32)
    )
    sd = sc.build()
    assert "bvh" in sd
    assert ftp.supports_fused_traverse(sd, "progressive", False)
    assert ftp.supports_fused_traverse(sd, "realtime", False)

    sc, _ = build_scene("cornell-tex")  # textured albedo, analytic env
    sd = sc.build()
    assert "bvh" in sd
    assert ftp.supports_fused_traverse(sd, "progressive", False)


@pytest.mark.parametrize("mode", ["progressive", "realtime"])
def test_wavefront_env_compaction_matches(mode, monkeypatch):
    """The wavefront path's primary + secondary env evals (miss-shader
    semantics, ProgressiveRaytracing.hlsl:160-164) gather only the rows an
    active lane missed when compaction is on; the rendered sample must
    match the full-width resolve (last-ulp fusion tolerance)."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.trace.integrator import (
        default_options, render_sample,
    )

    w = h = 24
    sc, cam = build_scene("cornell-glossy")
    rng = np.random.default_rng(7)
    sc.environment = envmap.latlong_env(
        rng.random((8, 16, 3)).astype(np.float32)
    )
    cam.set_aspect(w, h)
    sd = sc.build(accel="none")
    cp = camera_params(cam, frame_count=0, accum_count=0)
    kind = int(sd["env"]["kind"])

    def run():
        # render_sample is jitted; the compaction knobs are read at TRACE
        # time, so drop the cache between knob settings.
        render_sample.clear_cache()
        return np.asarray(
            render_sample(
                sd, default_options(), cp, w, h, mode=mode, impl="jnp",
                env_kind=kind,
            )["color"]
        )

    monkeypatch.setenv("DXR_COMPACT", "0")
    base = run()
    monkeypatch.setenv("DXR_COMPACT", "1")
    monkeypatch.setenv("DXR_COMPACT_CAPS", "0.15,0.6")
    np.testing.assert_allclose(run(), base, rtol=3e-6, atol=1e-6)
    assert base.any()


@pytest.mark.slow
@pytest.mark.parametrize("scene_kind", ["env", "tex"])
def test_deferred_fused_traverse_compaction_bit_identical(
    scene_kind, monkeypatch
):
    """End-to-end: the deferred fused-traversal progressive sum with
    compaction ON (tiny caps so the compact branch really runs) equals
    compaction OFF (same gathered values; last-ulp fusion tolerance)."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.trace.integrator import default_options

    w = h = 32
    sc, cam = build_scene(
        "cornell-tex" if scene_kind == "tex" else "cornell-glossy"
    )
    rng = np.random.default_rng(1)
    sc.environment = envmap.latlong_env(
        rng.random((8, 16, 3)).astype(np.float32)
    )
    cam.set_aspect(w, h)
    sd = sc.build(accel="bvh")
    assert ftp.supports_fused_traverse(sd, "progressive", False)
    cams = {
        k: v[None]
        for k, v in camera_params(cam, frame_count=0, accum_count=0).items()
    }
    kind = int(sd["env"]["kind"])

    def run():
        ftp._ft_progressive_deferred_impl.clear_cache()
        return np.asarray(
            ftp.fused_traverse_progressive_sum(
                sd, default_options(), cams, w, h, kind, interpret=True
            )
        )

    monkeypatch.setenv("DXR_COMPACT", "0")
    base = run()
    monkeypatch.setenv("DXR_COMPACT", "1")
    monkeypatch.setenv("DXR_COMPACT_CAPS", "0.1,0.6")
    for method in ("nonzero", "sort"):
        monkeypatch.setenv("DXR_COMPACT_METHOD", method)
        np.testing.assert_allclose(run(), base, rtol=3e-6, atol=1e-6,
                                   err_msg=method)
    # block mode (round 5): tiny blocks so several tiers get exercised at
    # 32x32
    monkeypatch.setenv("DXR_COMPACT", "block")
    monkeypatch.setenv("DXR_COMPACT_B", "64")
    np.testing.assert_allclose(run(), base, rtol=3e-6, atol=1e-6,
                               err_msg="block")
    assert base.any()

def test_packed_wrappers_match_unpacked():
    """weighted_env_packed / masked_albedo_packed (round 5): the wide-
    unperm combines hand the resolvers CONTIGUOUS column slices of one
    wide-unpermuted out block; values must equal the unpacked wrappers
    fed separate dirs/weights (uv/mid) arrays."""
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.scene.materials import Material
    from dxrexperiments_tpu.scene.textures import (
        checker_texture, pack_texture_table,
    )

    rng = np.random.default_rng(7)
    env = envmap.latlong_env(rng.random((8, 16, 3)).astype(np.float32))
    kind = int(env["kind"])
    n = 256
    # a wider "out block" whose columns 2:8 are dirs+weights, 9:12 uv+mid
    wide = rng.normal(size=(n, 12)).astype(np.float32)
    wide[:, 2:5] /= np.linalg.norm(wide[:, 2:5], axis=1, keepdims=True)
    wide[:, 5:8] = np.where(
        rng.random((n, 1)) < 0.2, rng.random((n, 3)), 0.0
    ).astype(np.float32)
    wide[:, 9:11] = rng.random((n, 2)).astype(np.float32)
    wide[:, 11] = rng.integers(0, 2, n).astype(np.float32)
    wide = jnp.asarray(wide)

    a = dr.weighted_env_packed(env, wide[:, 2:8], kind, enabled=False)
    b = dr.weighted_env(env, wide[:, 2:5], wide[:, 5:8], kind,
                        enabled=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    table = pack_texture_table([
        Material(),
        Material(albedo_texture=checker_texture(4, size=16)),
    ])
    need = jnp.asarray(np.asarray(rng.random(n)) < 0.3)
    c = dr.masked_albedo_packed(table, wide[:, 9:12], need, enabled=False)
    d = dr.masked_albedo(table, wide[:, 9:11], wide[:, 11], need,
                         enabled=False)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_wide_unperm_knob_bit_exact(monkeypatch):
    """DXR_WIDE_UNPERM=1 (one wide unperm + packed column slices, the
    shipped default) vs 0 (per-row-group unperm): bit-identical images
    through the FT TEX-deferred combine (32x32-block permutation active
    at this size via the default FT knobs)."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.trace.integrator import default_options

    w = h = 32
    sc, cam = build_scene("cornell-tex")
    rng = np.random.default_rng(2)
    sc.environment = envmap.latlong_env(
        rng.random((8, 16, 3)).astype(np.float32)
    )
    cam.set_aspect(w, h)
    sd = sc.build(accel="bvh")
    cams = {
        k: v[None]
        for k, v in camera_params(cam, frame_count=0, accum_count=0).items()
    }
    kind = int(sd["env"]["kind"])

    def run():
        ftp._ft_progressive_deferred_impl.clear_cache()
        return np.asarray(
            ftp.fused_traverse_progressive_sum(
                sd, default_options(), cams, w, h, kind, interpret=True
            )
        )

    monkeypatch.setenv("DXR_WIDE_UNPERM", "1")
    wide = run()
    monkeypatch.setenv("DXR_WIDE_UNPERM", "0")
    perrow = run()
    np.testing.assert_array_equal(wide, perrow)
    assert wide.any()
