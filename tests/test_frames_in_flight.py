"""Frames-in-flight batching: K realtime frames in ONE dispatch.

TPU-native analogue of the reference's 3-deep frame ring
(/root/reference/include/DXRExperimentsApp.h:27,
src/utils/DeviceResources.cpp:580-598): per-frame cameras ride the fused
megakernel's sample-grid axis (each frame writes its own AOV block), or a
lax.map wraps the single-frame renderer for the generic paths. Batched
output must match K sequential single-frame renders (fp-fusion tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxrexperiments_tpu.app.headless import build_scene
from dxrexperiments_tpu.core.camera import camera_params
from dxrexperiments_tpu.models.denoise import (
    default_denoise_params,
    denoise_composite,
    denoise_composite_frames,
)
from dxrexperiments_tpu.models.realtime import (
    RealtimeRaytracingPipeline,
    make_realtime_denoise_frames_step,
)
from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
from dxrexperiments_tpu.trace.integrator import (
    default_options,
    make_render_step,
    render_sample,
)

W = H = 32
AOV_KEYS = ("color", "direct", "indirect_specular", "albedo", "roughness")


def glossy_scene():
    sc, cam = build_scene("cornell-glossy")
    cam.set_aspect(W, H)
    return sc.build(), cam


def cams_k(cam, k):
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.002 * i), frame_count=i)
        for i in range(k)
    ]
    return cams, jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def test_fused_realtime_batch_matches_single():
    """S-axis batched fused realtime == S sequential single-frame launches."""
    scene, cam = glossy_scene()
    opts = default_options()
    cams, stack = cams_k(cam, 3)
    ek = int(scene["env"]["kind"])
    batch = fsp.fused_realtime_outputs_batch(
        scene, opts, stack, W, H, ek, interpret=True
    )
    for i, c in enumerate(cams):
        single = fsp.fused_realtime_outputs(
            scene, opts, c, W, H, ek, interpret=True
        )
        for k in AOV_KEYS:
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(batch[k])[i],
                atol=1e-6, err_msg=f"{k}/frame{i}",
            )


def test_render_step_frames_fused():
    """make_render_step(frames_per_step=K) on a fused-eligible scene returns
    stacked AOVs matching the single-frame step."""
    scene, cam = glossy_scene()
    opts = default_options()
    cams, stack = cams_k(cam, 3)
    step1 = make_render_step(
        scene, W, H, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret",
    )
    stepk = make_render_step(
        scene, W, H, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret", frames_per_step=3,
    )
    out = stepk(opts, stack, scene["lights"], scene["env"])
    for i, c in enumerate(cams):
        ref = step1(opts, c, scene["lights"], scene["env"])
        for k in AOV_KEYS:
            np.testing.assert_allclose(
                np.asarray(ref[k]), np.asarray(out[k])[i],
                atol=1e-6, err_msg=f"{k}/frame{i}",
            )


def test_render_step_frames_wavefront():
    """The generic (lax.map) path: jnp wavefront batched == per-frame."""
    scene, cam = glossy_scene()
    opts = default_options()
    cams, stack = cams_k(cam, 2)
    stepk = make_render_step(
        scene, W, H, mode="realtime", jitter_scale=10.0, impl="jnp",
        frames_per_step=2,
    )
    out = stepk(opts, stack, scene["lights"], scene["env"])
    for i, c in enumerate(cams):
        ref = render_sample(
            scene, opts, c, W, H, mode="realtime", jitter_scale=10.0,
            impl="jnp",
        )
        np.testing.assert_allclose(
            np.asarray(ref["direct"]), np.asarray(out["direct"])[i],
            atol=1e-6,
        )


def test_render_step_frames_fused_traverse():
    """BVH scenes route the frame batch through lax.map of the fused
    traversal realtime kernel."""
    sc, cam = build_scene("cornell-glossy")
    cam.set_aspect(W, H)
    scene = sc.build(accel="bvh")
    assert ftp.supports_fused_traverse(scene, "realtime", False)
    opts = default_options()
    cams, stack = cams_k(cam, 2)
    stepk = make_render_step(
        scene, W, H, mode="realtime", jitter_scale=10.0,
        impl="pallas_interpret", frames_per_step=2,
    )
    out = stepk(opts, stack, scene["lights"], scene["env"])
    ek = int(scene["env"]["kind"])
    for i, c in enumerate(cams):
        ref = ftp.fused_traverse_realtime_outputs(
            scene, opts, c, W, H, ek, interpret=True
        )
        for k in AOV_KEYS:
            np.testing.assert_allclose(
                np.asarray(ref[k]), np.asarray(out[k])[i],
                atol=1e-6, err_msg=f"{k}/frame{i}",
            )


def test_frames_per_step_rejects_progressive():
    scene, _ = glossy_scene()
    with pytest.raises(ValueError):
        make_render_step(scene, W, H, mode="progressive", frames_per_step=2)


def test_pipeline_render_frames_matches_sequential():
    """RealtimeRaytracingPipeline.render_frames == K update()+render()
    (same seed => same per-frame jitter draw order)."""
    sc, cam = build_scene("cornell-glossy")
    cam.set_aspect(W, H)

    def mk():
        p = RealtimeRaytracingPipeline(W, H, seed=7)
        p.set_camera(cam)
        p.set_scene(sc)
        return p

    pa, pb = mk(), mk()
    d_batch, s_batch = pa.render_frames(0, 3)
    for f in range(3):
        pb.update(0.0, f)
        d, s = pb.render()
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(d_batch)[f], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s_batch)[f], atol=1e-6
        )
    # last frame's AOVs become the pipeline's current outputs
    np.testing.assert_array_equal(
        np.asarray(pa.direct), np.asarray(d_batch)[-1]
    )


def test_denoise_composite_frames():
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.random((2, 16, 24, 3), np.float32))
    s = jnp.asarray(rng.random((2, 16, 24, 3), np.float32))
    params = default_denoise_params()
    out = denoise_composite_frames(d, s, params, impl="jnp")
    for i in range(2):
        ref = denoise_composite(d[i], s[i], params, impl="jnp")
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out)[i], atol=1e-6
        )


def test_dispatch_frames_temporal_matches_sequential():
    """Batched temporal dispatch (lax.scan-carried history) must advance
    the history exactly as K sequential dispatch() calls, including the
    first-frame seeding and continuation across batches."""
    from dxrexperiments_tpu.models.denoise import DenoiseCompositor

    rng = np.random.default_rng(11)
    d = jnp.asarray(rng.random((5, 12, 20, 3), np.float32))
    s = jnp.asarray(rng.random((5, 12, 20, 3), np.float32))
    seq = DenoiseCompositor(temporal_alpha=0.3)
    bat = DenoiseCompositor(temporal_alpha=0.3)
    want = [np.asarray(seq.dispatch(d[i], s[i])) for i in range(5)]
    # two batches (3 + 2) to exercise history continuation across dispatches
    got = list(np.asarray(bat.dispatch_frames(d[:3], s[:3])))
    got += list(np.asarray(bat.dispatch_frames(d[3:], s[3:])))
    for i in range(5):
        np.testing.assert_allclose(want[i], got[i], atol=1e-6, err_msg=str(i))
    np.testing.assert_allclose(
        np.asarray(seq._history), np.asarray(bat._history), atol=1e-6
    )
    # non-temporal dispatch_frames == plain batched composite
    plain = DenoiseCompositor()
    out = plain.dispatch_frames(d[:2], s[:2])
    ref = denoise_composite(d[0], s[0], plain.params)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out)[0], atol=1e-6)


def test_realtime_denoise_frames_step():
    """The combined one-dispatch step: K raytraced frames + their denoised
    composites, matching the two-call chain."""
    scene, cam = glossy_scene()
    opts = default_options()
    _, stack = cams_k(cam, 2)
    den = default_denoise_params()
    comb = make_realtime_denoise_frames_step(
        scene, W, H, 2, impl="pallas_interpret", denoise_impl="jnp"
    )
    aovs, img = comb(opts, stack, scene["lights"], scene["env"], den)
    assert np.asarray(img).shape == (2, H, W, 3)
    for i in range(2):
        ref = denoise_composite(
            aovs["direct"][i], aovs["indirect_specular"][i], den, impl="jnp"
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(img)[i], atol=1e-6
        )
