"""Pipeline + denoiser tests: accumulation semantics, reset, denoise filter."""

import jax.numpy as jnp
import numpy as np

from dxrexperiments_tpu.core.camera import Camera
from dxrexperiments_tpu.models import (
    DenoiseCompositor,
    ProgressiveRaytracingPipeline,
    RealtimeRaytracingPipeline,
    denoise_composite,
)
from dxrexperiments_tpu.models.denoise import default_denoise_params, reinhard_tonemap
from dxrexperiments_tpu.scene import Scene, cornell_box, envmap
from dxrexperiments_tpu.scene.lights import directional_light, point_light


def make_pipeline(cls, n=24, **kw):
    mesh, materials = cornell_box(glossy_tall_box=True)
    sc = Scene()
    for m in materials:
        sc.add_material(m)
    sc.add_model(mesh)
    sc.lights = {
        "dir": directional_light((0.0, -0.6, -0.8), (0.9, 0.9, 0.9, 0.6)),
        "point": point_light((0.0, 1.8, 0.0), (1.0, 0.9, 0.7, 6.0)),
    }
    sc.environment = envmap.constant_env((0, 0, 0))
    cam = Camera()
    cam.set_eye_at_up((0.0, 1.0, 3.4), (0.0, 1.0, 0.0), (0, 1, 0))
    cam.set_aspect(1, 1)
    pipe = cls(n, n, seed=7, **kw)
    pipe.set_camera(cam)
    pipe.set_scene(sc)
    return pipe


def run_frames(pipe, n):
    out = None
    for f in range(n):
        pipe.update(elapsed_time=f / 60.0, elapsed_frames=f)
        out = pipe.render()
    return out


def test_progressive_accumulates_and_counts():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    run_frames(pipe, 3)
    assert pipe.accum_count == 3
    img = np.asarray(pipe.get_output())
    assert np.isfinite(img).all() and img.max() > 0


def test_progressive_reset_on_camera_move():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    run_frames(pipe, 3)
    assert pipe.accum_count == 3
    pipe.camera.position = pipe.camera.position + np.array([0.05, 0, 0], np.float32)
    pipe.update(elapsed_time=0.1, elapsed_frames=3)
    assert pipe.accum_count == 1  # reset happened, then this frame counted


def test_progressive_reset_on_dirty():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    run_frames(pipe, 2)
    pipe.mark_dirty()
    pipe.update(elapsed_time=0.1, elapsed_frames=2)
    assert pipe.accum_count == 1


def test_progressive_stops_at_max_iterations():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    pipe.max_iterations = 2
    run_frames(pipe, 2)
    frozen = np.asarray(pipe.get_output())
    run_frames_more = 2
    for f in range(run_frames_more):
        pipe.update(elapsed_time=0.0, elapsed_frames=2 + f)
        pipe.render()
    np.testing.assert_array_equal(np.asarray(pipe.get_output()), frozen)


def test_progressive_accumulation_is_running_mean():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    samples = []
    # Render 3 frames, capturing each frame's fresh sample via accum algebra:
    # accum_k = mean(samples[0..k]).
    prev = np.zeros_like(np.asarray(pipe.accum))
    for f in range(3):
        pipe.update(elapsed_time=0.0, elapsed_frames=f)
        cur_accum = np.asarray(pipe.render())
        k = f  # accumCount used this frame
        sample = cur_accum * (k + 1) - prev * k
        samples.append(sample)
        prev = cur_accum
    manual_mean = np.mean(samples, axis=0)
    np.testing.assert_allclose(prev, manual_mean, atol=1e-4)


def test_progressive_checkpoint_roundtrip():
    pipe = make_pipeline(ProgressiveRaytracingPipeline)
    run_frames(pipe, 3)
    state = pipe.state_dict()
    img_before = np.asarray(pipe.get_output())

    pipe2 = make_pipeline(ProgressiveRaytracingPipeline)
    pipe2.load_state_dict(state)
    np.testing.assert_array_equal(np.asarray(pipe2.get_output()), img_before)
    assert pipe2.accum_count == 3
    # Resumed pipeline continues accumulating without reset (same camera).
    pipe2.last_vp = pipe2.camera.view_proj_matrix()
    pipe2.update(elapsed_time=0.0, elapsed_frames=3)
    assert pipe2.accum_count == 4


def test_realtime_outputs():
    pipe = make_pipeline(RealtimeRaytracingPipeline)
    direct, spec = run_frames(pipe, 2)
    assert pipe.num_outputs == 2
    assert np.isfinite(np.asarray(direct)).all()
    assert np.asarray(spec).max() >= 0


# ---------------------------------------------------------------------- #
# Denoiser
# ---------------------------------------------------------------------- #
def test_denoise_constant_image_is_fixed_point():
    h = w = 40
    direct = jnp.full((h, w, 3), 0.25)
    spec = jnp.full((h, w, 3), 0.1)
    params = default_denoise_params(tonemap=False)
    out = np.asarray(denoise_composite(direct, spec, params))
    np.testing.assert_allclose(out, 0.35, atol=1e-5)


def test_denoise_reduces_noise_preserves_mean():
    rs = np.random.default_rng(3)
    h = w = 48
    direct = jnp.full((h, w, 3), 0.2)
    noise = rs.uniform(0.0, 1.0, size=(h, w, 3)).astype(np.float32)
    params = default_denoise_params(tonemap=False)
    out = np.asarray(denoise_composite(direct, jnp.asarray(noise), params)) - 0.2
    # Interior (away from zero-padded borders by > kernel radius):
    interior = (slice(13, -13), slice(13, -13))
    assert out[interior].std() < noise[interior].std() * 0.35
    np.testing.assert_allclose(
        out[interior].mean(), noise[interior].mean(), atol=0.02
    )


def test_denoise_edge_preserving_via_joint_guide():
    """An edge in the GUIDE keeps the filtered output from bleeding across."""
    h = w = 48
    guide = np.zeros((h, w, 3), np.float32)
    guide[:, w // 2 :] = 1.0  # hard edge in direct lighting
    sig = np.zeros((h, w, 3), np.float32)
    sig[:, w // 2 :] = 1.0
    params = default_denoise_params(tonemap=False, debug_visualize=1)  # filter only
    out = np.asarray(denoise_composite(jnp.asarray(guide), jnp.asarray(sig), params))
    # Left of the edge stays ~0, right stays ~1 (no bleed).
    assert out[:, : w // 2 - 2].max() < 0.05
    assert out[:, w // 2 + 2 :].min() > 0.95


def test_denoise_debug_bypass():
    h = w = 32
    rs = np.random.default_rng(0)
    spec = rs.uniform(size=(h, w, 3)).astype(np.float32)
    direct = np.zeros((h, w, 3), np.float32)
    params = default_denoise_params(tonemap=False, debug_visualize=2)
    out = np.asarray(denoise_composite(jnp.asarray(direct), jnp.asarray(spec), params))
    np.testing.assert_allclose(out, spec, atol=1e-6)  # raw passthrough


def test_denoise_tonemap_and_gamma():
    c = jnp.asarray([[[4.0, 4.0, 4.0]]])
    tm = np.asarray(reinhard_tonemap(c))
    np.testing.assert_allclose(tm, 4.0 / 5.0, atol=1e-5)  # lum/(lum+1) scale
    params = default_denoise_params(
        tonemap=True, gamma_correct=True, debug_visualize=3
    )
    out = np.asarray(denoise_composite(c, jnp.zeros_like(c), params))
    want = (4.0 / 5.0) ** (1 / 2.2)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_denoise_mock_input_harness():
    """The PNG-fixture mock mode (DenoiseCompositor.cpp:52-68) as a unit
    harness: dispatch without live AOVs."""
    d = DenoiseCompositor(default_denoise_params(tonemap=False))
    rs = np.random.default_rng(1)
    d.load_mock_resources(
        np.full((32, 32, 3), 0.3, np.float32),
        rs.uniform(size=(32, 32, 3)).astype(np.float32),
    )
    out = np.asarray(d.dispatch())
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_progressive_samples_per_frame():
    """SPP batching: S samples per dispatch, count advances by S, image
    statistically consistent with S=1 accumulation."""
    pipe1 = make_pipeline(ProgressiveRaytracingPipeline, n=24)
    pipe4 = make_pipeline(ProgressiveRaytracingPipeline, n=24, samples_per_frame=4)
    run_frames(pipe1, 8)
    run_frames(pipe4, 2)
    assert pipe1.accum_count == 8 and pipe4.accum_count == 8
    a = np.asarray(pipe1.get_output())
    b = np.asarray(pipe4.get_output())
    # Different sample sequences but same estimator: images agree to MC noise.
    assert abs(a.mean() - b.mean()) < 0.05
    assert np.isfinite(b).all()


def test_denoise_temporal_accumulation():
    """Temporal half of the spatio-temporal filter: variance shrinks across
    frames for a static camera; reset clears history."""
    rs = np.random.default_rng(2)
    den = DenoiseCompositor(
        default_denoise_params(tonemap=False, max_kernel_size=1),
        temporal_alpha=0.3,
    )
    direct = jnp.zeros((32, 32, 3))
    frames = [
        jnp.asarray(0.5 + rs.normal(0, 0.2, (32, 32, 3)).astype(np.float32))
        for _ in range(12)
    ]
    out1 = np.asarray(den.dispatch(direct, frames[0]))
    for f in frames[1:]:
        out = np.asarray(den.dispatch(direct, f))
    assert out.std() < out1.std() * 0.6  # converging toward the 0.5 mean
    np.testing.assert_allclose(out.mean(), 0.5, atol=0.05)
    den.reset_history()
    out_r = np.asarray(den.dispatch(direct, frames[0]))
    np.testing.assert_allclose(out_r, out1, atol=1e-6)  # history cleared
