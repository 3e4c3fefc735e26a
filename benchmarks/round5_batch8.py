"""Round-5 batch 8 (ONE TPU process): B=16 vs B=32 production A/B for the
config-3 block default. Batch-5's resolve-only micro had 32:0.05|0.6 at
49.45 vs 16:0.05|0.6 at 50.79 ms/sample; this decides BLOCK_DEFAULT_B at
the production step with parity.

Usage: python benchmarks/round5_batch8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

RESULTS: dict[str, float] = {}


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import round4_final as r4
    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models import progressive as prog
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.trace.integrator import default_options

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

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
    for arm, env_kv in (
        ("b16_shipped", {}),
        ("b32", {"DXR_COMPACT": "block", "DXR_COMPACT_B": "32",
                 "DXR_COMPACT_CAPS": "0.05,0.6"}),
    ):
        for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
            os.environ.pop(k, None)
        os.environ.update(env_kv)
        fsp._fused_progressive_deferred_impl.clear_cache()
        step = prog.make_progressive_step(
            scene, width, height, samples_per_step=S
        )
        t0 = time.perf_counter()
        out = step(accum, options, stacked, scene["lights"], scene["env"], mi)
        float(jnp.sum(out))
        print(f"[compile {arm}] {time.perf_counter() - t0:.1f}s", flush=True)
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
        print(f"[{arm}] {best/S*1e3:7.2f} ms/sample ({S/best:5.2f} spp/s)",
              flush=True)
    for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
        os.environ.pop(k, None)
    d = np.abs(np.asarray(outs["b16_shipped"]) - np.asarray(outs["b32"]))
    RESULTS["parity_max_abs"] = float(d.max())
    print(f"[parity] max_abs {d.max():.2e}", flush=True)
    print(f"[batch8 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
