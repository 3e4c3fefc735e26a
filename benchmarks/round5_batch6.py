"""Round-5 batch 6 (ONE TPU process): wide-unperm A/B on the production
deferred combines.

The round-5 refactor replaces the per-row-group unperm transposes/gathers
(~6 per sample brute / ~18 per sample TEX) and the weighted_env/albedo
concatenate copies with ONE wide unperm of the whole out block per
dispatch + contiguous column slices (kernels emit dirs+weights and uv+mid
on adjacent rows). Bit-exact by construction (verified CPU interpret);
this batch measures it on the chip at the three deferred scored configs:

  c3wide   config 3 (cornell-glossy + 8K HDR latlong, 1080p S=8) through
           the production step, tuned block default on both arms.
  c2wide   config 2 (textured cornell + area lights, 512^2 S=8) via the
           FT TEX-deferred impl.
  suswide  susanne + cathedral cubemap (512^2 S=16) via the FT deferred
           impl (env-only rows).

DXR_WIDE_UNPERM=1 (shipped default) vs 0 (the old per-row path), inner
jit caches cleared per arm, parity asserted exact.

Usage: python benchmarks/round5_batch6.py [stages]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

RESULTS: dict[str, float] = {}


def _clear_deferred_caches():
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    fsp._fused_progressive_deferred_impl.clear_cache()
    ftp._ft_progressive_deferred_impl.clear_cache()


def stage_c3wide():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import round4_final as r4
    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models import progressive as prog
    from dxrexperiments_tpu.trace.integrator import default_options

    width, height, S = 1920, 1080, 8
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(r4.HDR_ENV)
    cam.set_aspect(width, height)
    options = jax.device_put(default_options())
    mi = jnp.asarray(1 << 20, jnp.int32)
    cams = [
        camera_params(cam, jitter=(0.0008 * i, -0.0005 * i), frame_count=i)
        for i in range(S)
    ]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    stacked["accum_count"] = jnp.arange(S, dtype=jnp.float32)
    stacked = jax.device_put(stacked)
    accum = jax.device_put(jnp.zeros((height, width, 3), jnp.float32))
    scene = jax.device_put(sc.build(accel="auto"))

    outs = {}
    for arm, knob in (("wide", "1"), ("perrow", "0")):
        os.environ["DXR_WIDE_UNPERM"] = knob
        _clear_deferred_caches()
        step = prog.make_progressive_step(
            scene, width, height, samples_per_step=S
        )
        t0 = time.perf_counter()
        out = step(accum, options, stacked, scene["lights"], scene["env"], mi)
        float(jnp.sum(out))
        print(f"[c3wide compile {arm}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[arm] = out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(
                step(accum, options, stacked, scene["lights"], scene["env"],
                     mi)
            ))
            best = min(best, time.perf_counter() - t0)
        RESULTS[f"c3_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
        print(f"[c3wide {arm}] {best/S*1e3:7.2f} ms/sample "
              f"({S/best:5.2f} spp/s)", flush=True)
    os.environ.pop("DXR_WIDE_UNPERM", None)
    d = np.abs(np.asarray(outs["wide"]) - np.asarray(outs["perrow"]))
    RESULTS["c3_parity_max_abs"] = float(d.max())
    print(f"[c3wide parity] max_abs {d.max():.2e}", flush=True)


def _ft_ab(key, scene_tag, env_uri, s_count):
    import jax
    import numpy as np

    import round5_compact_ab as ab
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    scene, stacked, ek = ab._setup(scene_tag, env_uri, 512, 512, s_count,
                                   "bvh")
    options = jax.device_put(default_options())
    tile_r, block_w, half_gate = ftp._ft_knobs()
    W = H = 512

    imgs = {}
    for arm, knob in (("wide", "1"), ("perrow", "0")):
        os.environ["DXR_WIDE_UNPERM"] = knob
        _clear_deferred_caches()
        fn = jax.jit(
            lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
                sc, options, c, W, H, ek, False, tile_r, block_w, None, 0,
                half_gate,
            )
        )
        try:
            t0 = time.perf_counter()
            imgs[arm] = fn(scene, stacked)
            ab.fence(imgs[arm])
            print(f"[{key} compile {arm}] {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ab.fence(fn(scene, stacked))
                best = min(best, time.perf_counter() - t0)
            RESULTS[f"{key}_{arm}_ms_per_sample"] = round(
                best / s_count * 1e3, 2
            )
            print(f"[{key} {arm}] {best/s_count*1e3:7.2f} ms/sample "
                  f"({s_count/best:5.2f} spp/s)", flush=True)
        except Exception:
            print(f"[{key} {arm}] FAILED:", flush=True)
            traceback.print_exc()
    os.environ.pop("DXR_WIDE_UNPERM", None)
    if len(imgs) == 2:
        d = np.abs(np.asarray(imgs["wide"]) - np.asarray(imgs["perrow"]))
        RESULTS[f"{key}_parity_max_abs"] = float(d.max())
        print(f"[{key} parity] max_abs {d.max():.2e}", flush=True)


def stage_c2wide():
    _ft_ab("c2", "config2", None, 8)


def stage_suswide():
    import round5_compact_ab as ab

    _ft_ab("sus", "/root/reference/assets/models/susanne.obj", ab.CUBE_ENV,
           16)


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"c3wide", "c2wide", "suswide"}
    )
    import jax.numpy as jnp

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (
        ("c3wide", stage_c3wide),
        ("c2wide", stage_c2wide),
        ("suswide", stage_suswide),
    ):
        if name not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {name}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch6 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
