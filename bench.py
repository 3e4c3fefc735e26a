"""Headline benchmark: primary-ray throughput on the Cornell box.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Matches the reference's runtime telemetry (w*h*fps primary MRays/s,
/root/reference/src/utils/DXSample.cpp:100-123) on BASELINE config 1
(Cornell box progressive). vs_baseline is measured against the 500
MRays/s/chip north-star target in /root/repo/BASELINE.json (the reference
publishes no numbers of its own).

Measurement notes (axon tunnel):
  * block_until_ready() is a no-op; a scalar readback is the only fence.
  * per-dispatch overhead is ~2 ms, so frames are fused into one dispatch
    with lax.scan (the production interactive path amortizes the same way
    with frames-in-flight).
  * the tunnel needs warm-up + settling; we take the best of 3 reps.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os
WIDTH = HEIGHT = 512
SAMPLES_PER_DISPATCH = int(os.environ.get("BENCH_SPD", "16"))
DISPATCHES = int(os.environ.get("BENCH_DISPATCHES", "8"))
REPS = 3
BASELINE_MRAYS = 500.0

# Secondary BASELINE-config numbers recorded at a specific commit (see
# RESULTS.md for protocols); update BOTH when re-measuring.
SECONDARY_RECORDED_AT = "round5/final (one process, RESULTS.md r5 final section)"
SECONDARY_RECORDED = {
    "realtime_denoise_1080p_fps": 65.2,
    "instanced_983k_512_flattened_ms": 596.6,
    "instanced_983k_512_two_level_ms": 707.6,
    # single-dispatch micros swing with tunnel health (no S-grid to amortize
    # per-dispatch cost); round-3 recorded 30.0/393, round-5 re-runs
    # 37.3-38.9/399.7-401.5 on identical traversal code (RESULTS.md r5)
    "closest_262k_rays_200k_tris_ms": 37.3,
    "incoherent_262k_200k_sorted_ms": 399.7,
    "hdr_env_1080p_spp_per_sec": 16.20,
    "susanne_cubemap_512_ms_per_sample": 12.43,
    "susanne_fused_512_ms_per_sample": 9.07,
    "config2_as_written_512_spp_per_sec": 16.20,
    "realtime_cubemap_512_ms_per_frame": 11.08,
    "config1_light_mc_mrays": 174.53,  # reference's debug==2 MC light pick
}


# Headline measured at the same commit class as the secondaries — emitted
# (clearly labeled stale) only if the axon tunnel wedges and the watchdog
# fires; see RESULTS.md for the fresh-run protocol.
HEADLINE_RECORDED_MRAYS = 165.2


def _watchdog(timeout_s: int) -> None:
    """The axon tunnel can wedge for hours (see CLAUDE.md); if measurement
    doesn't finish in time, emit the last recorded headline CLEARLY MARKED
    stale instead of hanging the caller forever."""
    import json as _json
    import os as _os

    print(
        _json.dumps(
            {
                "metric": "primary_mrays_per_sec_cornell512_progressive",
                "value": HEADLINE_RECORDED_MRAYS,
                "unit": "Mrays/s/chip",
                "vs_baseline": round(
                    HEADLINE_RECORDED_MRAYS / BASELINE_MRAYS, 4
                ),
                "stale": True,
                "stale_reason": (
                    f"TPU tunnel unresponsive for {timeout_s}s; value is the "
                    f"recorded measurement from {SECONDARY_RECORDED_AT}, NOT "
                    "a fresh run"
                ),
                "secondary_recorded": {
                    "recorded_at": SECONDARY_RECORDED_AT,
                    **SECONDARY_RECORDED,
                },
            }
        ),
        flush=True,
    )
    _os._exit(2)


def main() -> None:
    import threading

    timeout_s = int(os.environ.get("BENCH_TIMEOUT_S", "1500"))
    watchdog = None
    if timeout_s > 0:
        watchdog = threading.Timer(timeout_s, _watchdog, args=(timeout_s,))
        watchdog.daemon = True
        watchdog.start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.models.progressive import make_progressive_step

    scene, options, cams, accum0 = _cornell_setup(WIDTH, HEIGHT, 1)
    scene = jax.device_put(scene)
    accum0 = jax.device_put(accum0)
    lights, env = scene["lights"], scene["env"]
    mi = jnp.asarray(1 << 30, jnp.int32)

    # The production path: scene geometry baked into the compiled step,
    # SPP-batched (S stacked cameras per dispatch), per-frame pytrees as args.
    step = make_progressive_step(
        scene, WIDTH, HEIGHT, samples_per_step=SAMPLES_PER_DISPATCH
    )
    rng = np.random.default_rng(0)
    frames = []
    for f in range(DISPATCHES):
        cs = []
        for k in range(SAMPLES_PER_DISPATCH):
            c = dict(cams[0])
            c["jitter"] = jnp.asarray(
                [(rng.random() - 0.5) / WIDTH, (rng.random() - 0.5) / HEIGHT],
                jnp.float32,
            )
            c["frame_count"] = jnp.asarray(
                f * SAMPLES_PER_DISPATCH + k, jnp.uint32
            )
            c["accum_count"] = jnp.asarray(
                float(f * SAMPLES_PER_DISPATCH), jnp.float32
            )
            cs.append(c)
        frames.append(jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *cs)))

    # Warm the tunnel, compile, settle.
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    accum = accum0
    for f in range(2):
        accum = step(accum, options, frames[f], lights, env, mi)
    float(jnp.sum(accum))

    dt = float("inf")
    for _ in range(REPS):
        accum = accum0
        t0 = time.perf_counter()
        for f in range(DISPATCHES):
            accum = step(accum, options, frames[f], lights, env, mi)
        float(jnp.sum(accum))
        dt = min(dt, time.perf_counter() - t0)

    total_samples = DISPATCHES * SAMPLES_PER_DISPATCH
    mrays = WIDTH * HEIGHT * total_samples / dt / 1e6
    if watchdog is not None:
        watchdog.cancel()  # keep the ONE-json-line contract
    print(
        json.dumps(
            {
                "metric": "primary_mrays_per_sec_cornell512_progressive",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
                # Other BASELINE configs, recorded from the tagged round's
                # fresh TPU runs (protocols + scripts in RESULTS.md) — not
                # re-measured on every bench invocation; `recorded_at`
                # distinguishes them from this run's fresh measurement.
                "secondary_recorded": {
                    "recorded_at": SECONDARY_RECORDED_AT,
                    **SECONDARY_RECORDED,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
