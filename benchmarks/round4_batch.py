"""Round-4 hardware A/B batch: miss-compacted deferred gathers (one TPU
process — back-to-back short TPU processes wedge the tunnel, CLAUDE.md).

Stages (VERDICT r3 #1: "Done = A/B ms in RESULTS.md at 1080p HDR and
susanne+cubemap"):

  1. susanne + cathedral cubemap, FT deferred megakernel, 512^2 S=16:
     compaction ON vs OFF (OFF reproduces the round-3 29.2 ms/sample
     protocol bit-for-bit; ON adds the round-4 miss-compacted gathers).
  2. config 3: cornell-glossy + 8K HDR studio latlong at 1920x1080:
     (a) wavefront, compaction OFF  — the round-3 6.33 spp/s protocol
     (b) wavefront, compaction ON   — ec1d9c6's masked_env gathers
     (c) brute megakernel ENV-DEFERRED (the new production route for
         tiny texture-env scenes), compaction ON and OFF.
  3. cornell + cubemap 512^2 S=16 routing A/B: brute deferred vs FT
     deferred vs wavefront (tiny scenes measured ~2x faster brute on
     const envs; confirms the tex_autoroute routing choice).

The compaction knob (DXR_COMPACT) is read at TRACE time, so each arm
clears the jit caches of the impls it toggles before re-running.

Env is sampled only in the miss shader
(/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:160-164).

Usage: python benchmarks/round4_batch.py [stages] [--interpret]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv

HDR_ENV = "latlong:/root/reference/assets/textures/HdrStudioProductNightStyx001_JPG_8K.jpg"
CUBE_ENV = "cubemap:/root/reference/assets/textures/CathedralRadiance.dds"


def fence(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


def warmup():
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)


def best_of(fn, reps=4, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def clear_deferred_caches():
    """DXR_COMPACT is read at trace time; drop every cached trace that
    baked it in."""
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    for mod, name in (
        (fsp, "_fused_progressive_deferred_impl"),
        (ftp, "_ft_progressive_deferred_impl"),
    ):
        fn = getattr(mod, name, None)
        if fn is not None and hasattr(fn, "clear_cache"):
            fn.clear_cache()


def stage1_susanne_cubemap():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    width = height = 64 if SMOKE else 512
    s_count = 2 if SMOKE else 16
    sc, cam = build_scene("/root/reference/assets/models/susanne.obj")
    sc.environment = parse_env(CUBE_ENV)
    cam.set_aspect(width, height)
    scene = jax.device_put(sc.build(accel="bvh"))
    env_kind = int(scene["env"]["kind"])
    options = jax.device_put(default_options())
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.device_put(jax.tree.map(lambda *x: jnp.stack(x), *cams))

    for tag, compact in (("off", "0"), ("on", "1")):
        os.environ["DXR_COMPACT"] = compact
        clear_deferred_caches()

        def run():
            return ftp.fused_traverse_progressive_sum(
                scene, options, stacked, width, height, env_kind,
                interpret=SMOKE,
            )

        t0 = time.perf_counter()
        fence(run())
        print(f"[s1 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(run) / s_count
        print(
            f"[s1 susanne+cubemap FT-deferred compact={tag}] "
            f"{t*1e3:7.2f} ms/sample ({1.0/t:6.1f} spp/s)",
            flush=True,
        )
    os.environ.pop("DXR_COMPACT", None)


def stage2_config3_hdr1080():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models.progressive import make_progressive_step
    from dxrexperiments_tpu.trace.integrator import default_options

    width, height = (96, 64) if SMOKE else (1920, 1080)
    s_count = 2 if SMOKE else 8
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(HDR_ENV)
    cam.set_aspect(width, height)
    options = jax.device_put(default_options())
    mi = jnp.asarray(1 << 20, jnp.int32)

    def stacked_cams():
        cams = [
            camera_params(cam, jitter=(0.0008 * i, -0.0005 * i),
                          frame_count=i)
            for i in range(s_count)
        ]
        st = jax.tree.map(lambda *x: jnp.stack(x), *cams)
        st["accum_count"] = jnp.arange(s_count, dtype=jnp.float32)
        return jax.device_put(st)

    stacked = stacked_cams()
    accum = jax.device_put(jnp.zeros((height, width, 3), jnp.float32))

    # BOTH make_progressive_step arms route to the brute env-deferred
    # megakernel for a texture-env tiny scene whether or not a BVH is
    # attached (supports_fused accepts BVH-less texture-env scenes too) —
    # the first batch's "wavefront" rows were mislabeled duplicates. The
    # honest wavefront comparator is render_sample, which never step-level
    # fuses progressive.
    from dxrexperiments_tpu.trace.integrator import render_sample

    # compact=on already measured decisively (144.9/145.0 vs 116.1/116.25
    # ms/sample, 2026-08-19 batch) — only the production arm re-runs here
    # so the NEW wavefront comparator shares its process.
    for tag, compact in (
        ("brute-def compact=off", "0"),
    ):
        os.environ["DXR_COMPACT"] = compact
        clear_deferred_caches()
        scene = jax.device_put(sc.build(accel="auto"))
        impl = "pallas_interpret" if SMOKE else "pallas"
        step = make_progressive_step(
            scene, width, height, samples_per_step=s_count, impl=impl
        )

        def run():
            return step(
                accum, options, stacked, scene["lights"], scene["env"], mi
            )

        t0 = time.perf_counter()
        fence(run())
        print(f"[s2 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(run, reps=2) / s_count
        print(
            f"[s2 hdr-1080p {tag}] {t*1e3:7.2f} ms/sample "
            f"({1.0/t:5.2f} spp/s)",
            flush=True,
        )
    os.environ.pop("DXR_COMPACT", None)
    clear_deferred_caches()

    scene_wf = jax.device_put(sc.build(accel="none"))
    cam0 = jax.tree.map(lambda x: x[0], stacked)
    # The 8K HDR env is ~400 MB — baking it into the jit as a constant
    # blows the tunnel's ~100 MB compile-request limit (HTTP 413, measured).
    # Pass env as an ARGUMENT (the production make_progressive_step does the
    # same: geo baked, lights/env as args — integrator.py GEO_CONST notes).
    geo_wf = {k: v for k, v in scene_wf.items() if k != "env"}
    ek = int(scene_wf["env"]["kind"])

    def wf(env):
        return render_sample(
            dict(geo_wf, env=env), options, cam0, width, height,
            mode="progressive", jitter_scale=30.0,
            impl="pallas_interpret" if SMOKE else "pallas",
            env_kind=ek,
        )["color"]

    wf_jit = jax.jit(wf)
    env_arg = scene_wf["env"]
    t0 = time.perf_counter()
    fence(wf_jit(env_arg))
    print(f"[s2 compile wavefront] {time.perf_counter() - t0:.1f}s",
          flush=True)
    t = best_of(lambda: wf_jit(env_arg), reps=2)
    print(f"[s2 hdr-1080p wavefront            ] {t*1e3:7.2f} ms/sample "
          f"({1.0/t:5.2f} spp/s)", flush=True)


def stage3_cornell_cubemap_routing():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import (
        default_options, render_sample,
    )

    width = height = 64 if SMOKE else 512
    s_count = 2 if SMOKE else 16
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(CUBE_ENV)
    cam.set_aspect(width, height)
    options = jax.device_put(default_options())
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.device_put(jax.tree.map(lambda *x: jnp.stack(x), *cams))
    os.environ.pop("DXR_COMPACT", None)  # default (off) — the shipped config
    clear_deferred_caches()

    scene = jax.device_put(sc.build())  # auto: tex_autoroute BVH attached
    env_kind = int(scene["env"]["kind"])
    assert fsp.supports_fused(scene, "progressive", False)

    def brute():
        return fsp.fused_progressive_sum(
            scene, options, stacked, width, height, env_kind,
            interpret=SMOKE,
        )

    def ft():
        return ftp.fused_traverse_progressive_sum(
            scene, options, stacked, width, height, env_kind,
            interpret=SMOKE,
        )

    def wf():
        cam0 = jax.tree.map(lambda x: x[0], stacked)
        return render_sample(
            scene, options, cam0, width, height, mode="progressive",
            jitter_scale=30.0,
            impl="pallas_interpret" if SMOKE else "pallas",
            env_kind=env_kind,
        )["color"]

    for tag, fn, per in (
        ("brute-deferred", brute, s_count),
        ("FT-deferred   ", ft, s_count),
        ("wavefront     ", wf, 1),
    ):
        t0 = time.perf_counter()
        fence(fn())
        print(f"[s3 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(fn) / per
        print(
            f"[s3 cornell+cubemap {tag}] {t*1e3:7.2f} ms/sample "
            f"({1.0/t:6.1f} spp/s)",
            flush=True,
        )
    os.environ.pop("DXR_COMPACT", None)


def stage4_realtime_shave():
    """Realtime epilogue shave A/B (VERDICT r3 #8): DXR_RT_WIDE=1 restores
    the old 16-row zero-init + combined-color rows; default (narrow) writes
    rows 0-9 only and sums color on the host. Both arms in ONE process,
    production config 4 (cornell-glossy 1080p, brute megakernel route),
    per-frame async loop incl. denoise. rt_anatomy pinned the wide tree at
    1.23x per sweep => expect <=2.5 ms/frame at 1080p."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.models.denoise import (
        default_denoise_params, denoise_composite,
    )
    from dxrexperiments_tpu.models.realtime import RealtimeRaytracingPipeline
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    width, height = (128, 72) if SMOKE else (1920, 1080)
    den_params = jax.device_put(default_denoise_params())
    outs = {}
    for tag, wide in (("wide  ", "1"), ("narrow", "0")):
        os.environ["DXR_RT_WIDE"] = wide
        for impl in (
            fsp._fused_realtime_outputs_impl,
            ftp._ft_realtime_outputs_impl,
        ):
            impl.clear_cache()
        scene, cam = build_scene("cornell-glossy")
        cam.set_aspect(width, height)
        pipe = RealtimeRaytracingPipeline(width, height, seed=0)
        pipe.set_camera(cam)
        pipe.set_scene(scene)
        pipe.update(0.0, 0)
        t0 = time.perf_counter()
        d, s = pipe.render()
        out = denoise_composite(d, s, den_params)
        fence(out)
        print(f"[s4 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[tag] = (np.asarray(d), np.asarray(s))

        n = 2 if SMOKE else 8
        best = float("inf")
        for _ in range(1 if SMOKE else 3):
            t0 = time.perf_counter()
            for f in range(n):
                pipe.update(0.0, f)
                d, s = pipe.render()
                out = denoise_composite(d, s, den_params)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / n)
        print(
            f"[s4 rt+denoise 1080p {tag}] {best*1e3:6.2f} ms/frame "
            f"({1.0/best:5.1f} fps)",
            flush=True,
        )
        best = float("inf")
        for _ in range(1 if SMOKE else 3):
            t0 = time.perf_counter()
            for f in range(n):
                pipe.update(0.0, f)
                d, s = pipe.render()
            fence(d)
            best = min(best, (time.perf_counter() - t0) / n)
        print(
            f"[s4 rt only    1080p {tag}] {best*1e3:6.2f} ms/frame "
            f"({1.0/best:5.1f} fps)",
            flush=True,
        )
    os.environ.pop("DXR_RT_WIDE", None)
    for a, b in zip(outs["wide  "], outs["narrow"]):
        assert np.allclose(a, b, atol=0, rtol=0), "shave changed the AOVs"
    print("[s4 parity] wide == narrow bit-exact", flush=True)


def stage5_mxu_split():
    """DXR_MXU_SPLIT sweep on the config-1 protocol (cornell 512^2
    progressive, S=16): route the last K triangle rows of every eligible
    sweep through the MXU dot form while the VPU runs the leading rows.
    If roofline.py's overlap probe is right that the units co-issue, the
    balance point is K ~ c*19/(19+10+19*mxu_slowdown); sweep K to find it
    empirically. K=0 is the shipped flat baseline, same process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    width = height = 64 if SMOKE else 512
    s_count = 2 if SMOKE else 16
    scene, options, cams, _ = _cornell_setup(width, height, 1)
    scene = jax.device_put(scene)
    options = jax.device_put(options)
    env_kind = int(scene["env"]["kind"])
    rng = np.random.default_rng(0)
    stack = []
    for i in range(s_count):
        c = dict(cams[0])
        c["jitter"] = jnp.asarray(
            [(rng.random() - 0.5) / width, (rng.random() - 0.5) / height],
            jnp.float32,
        )
        c["frame_count"] = jnp.asarray(i, jnp.uint32)
        stack.append(c)
    stacked = jax.device_put(jax.tree.map(lambda *x: jnp.stack(x), *stack))

    n_rays = width * height * s_count
    for k in ("0", "64", "96", "128", "160", "192"):
        os.environ["DXR_MXU_SPLIT"] = k
        fsp._fused_progressive_sum_impl.clear_cache()

        def run():
            return fsp.fused_progressive_sum(
                scene, options, stacked, width, height, env_kind,
                interpret=SMOKE,
            )

        t0 = time.perf_counter()
        fence(run())
        dt = time.perf_counter() - t0
        t = best_of(run)
        print(
            f"[s5 mxu-split k={k:>3}] {t*1e3:7.2f} ms/dispatch "
            f"({n_rays/t/1e6:6.1f} Mrays/s)  compile {dt:.1f}s",
            flush=True,
        )
    os.environ.pop("DXR_MXU_SPLIT", None)
    fsp._fused_progressive_sum_impl.clear_cache()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stages = {int(s) for s in args[0].split(",")} if args else {1, 2, 3}
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    t0 = time.perf_counter()
    warmup()
    for num, fn in (
        (1, stage1_susanne_cubemap),
        (2, stage2_config3_hdr1080),
        (3, stage3_cornell_cubemap_routing),
        (4, stage4_realtime_shave),
        (5, stage5_mxu_split),
    ):
        if num not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {num}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch done] {time.perf_counter() - t0:.1f}s total", flush=True)


if __name__ == "__main__":
    main()
