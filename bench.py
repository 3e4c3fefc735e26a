"""Headline benchmark: primary-ray throughput on the Cornell box.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Matches the reference's runtime telemetry (w*h*fps primary MRays/s,
/root/reference/src/utils/DXSample.cpp:100-123) on BASELINE config 1
(Cornell box progressive). vs_baseline is measured against the 500
MRays/s/chip north-star target in /root/repo/BASELINE.json (the reference
publishes no numbers of its own).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

WIDTH = HEIGHT = 512
WARMUP_FRAMES = 3
BENCH_FRAMES = 32
BASELINE_MRAYS = 500.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models.progressive import progressive_step

    scene, options, cams, accum = _cornell_setup(WIDTH, HEIGHT, 1)
    max_iter = jnp.asarray(1 << 30, jnp.int32)

    # Pre-build per-frame camera pytrees (host work off the hot loop; the
    # reference's analogue is the per-frame constant-buffer staging write).
    import numpy as np
    from dxrexperiments_tpu.core.camera import Camera

    cam0 = cams[0]
    frames = []
    rng = np.random.default_rng(0)
    for f in range(WARMUP_FRAMES + BENCH_FRAMES):
        c = dict(cam0)
        c["jitter"] = jnp.asarray(
            [(rng.random() - 0.5) / WIDTH, (rng.random() - 0.5) / HEIGHT],
            jnp.float32,
        )
        c["frame_count"] = jnp.asarray(f, jnp.uint32)
        c["accum_count"] = jnp.asarray(float(f), jnp.float32)
        frames.append(jax.device_put(c))

    scene = jax.device_put(scene)
    accum = jax.device_put(accum)

    # NOTE: on the axon tunnel block_until_ready() does not synchronize;
    # a scalar readback (jnp.sum -> float) is the only honest fence.
    for f in range(WARMUP_FRAMES):
        accum = progressive_step(
            scene, options, frames[f], accum, max_iter, WIDTH, HEIGHT
        )
    float(jnp.sum(accum))

    t0 = time.perf_counter()
    for f in range(WARMUP_FRAMES, WARMUP_FRAMES + BENCH_FRAMES):
        accum = progressive_step(
            scene, options, frames[f], accum, max_iter, WIDTH, HEIGHT
        )
    float(jnp.sum(accum))
    dt = time.perf_counter() - t0

    mrays = WIDTH * HEIGHT * BENCH_FRAMES / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "primary_mrays_per_sec_cornell512_progressive",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
