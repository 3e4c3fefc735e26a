"""Round-5 measurement batch: ONE TPU process (back-to-back short processes
wedge the tunnel, CLAUDE.md) that lands everything round 5 changed:

  1-8.  The full round4_final secondaries refresh at the round-5 commit —
        stage 6's two-level instanced frame now includes the per-instance
        live-lane masking in the BLAS walks (traverse2_pallas), so the
        flat-vs-two-level delta IS the masking verdict (VERDICT r4 #1:
        done = two-level <= ~620 ms, within ~5% of flat).
  9.    Config-1 light_mc A/B: debug==2 with the traced is_mc flag (both
        shadow sweeps run, select after) vs the static light_mc=True build
        (ONE merged shadow sweep — the reference's own UI sampling mode,
        /root/reference/assets/shaders/ProgressiveRaytracing.hlsl:91-104).
        The kernel's op-linear law predicts 9->7 sweeps ~= +25-29%.
        Parity: the two images must match bit-for-bit (same draws, same
        estimator; selection before the dot changes no lane values).
  10.   Two-level stage-cut (tlas_stage_ab P1..P4, flat vs two-level) —
        re-attributes the round-4 +96.9 ms secondary-closest stage with
        masking in place.

Numbers here update bench.py SECONDARY_RECORDED (recorded_at
"round5/batch"). Usage: python benchmarks/round5_batch.py [stages]
where stages is a comma list out of {1..10}, default all.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import round4_final as r4

RESULTS = r4.RESULTS
fence = r4.fence
best_of = r4.best_of


def stage9_light_mc():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.models.progressive import make_progressive_step

    W = H = 512
    SPD, DISP = 16, 8
    scene, options, cams, accum0 = _cornell_setup(W, H, 1)
    scene = jax.device_put(scene)
    accum0 = jax.device_put(accum0)
    options = dict(options)
    options["debug"] = jnp.asarray(2, jnp.int32)  # the reference's MC mode
    options = jax.device_put(options)
    lights, env = scene["lights"], scene["env"]
    mi = jnp.asarray(1 << 30, jnp.int32)
    rng = np.random.default_rng(0)
    frames = []
    for f in range(DISP):
        cs = []
        for k in range(SPD):
            c = dict(cams[0])
            c["jitter"] = jnp.asarray(
                [(rng.random() - 0.5) / W, (rng.random() - 0.5) / H],
                jnp.float32,
            )
            c["frame_count"] = jnp.asarray(f * SPD + k, jnp.uint32)
            c["accum_count"] = jnp.asarray(float(f * SPD), jnp.float32)
            cs.append(c)
        frames.append(
            jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *cs))
        )

    imgs = {}
    for tag, lmc in (("traced", False), ("static", True)):
        step = make_progressive_step(
            scene, W, H, samples_per_step=SPD, light_mc=lmc
        )
        accum = accum0
        t0 = time.perf_counter()
        for f in range(2):
            accum = step(accum, options, frames[f], lights, env, mi)
        fence(accum)
        print(f"[s9 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        dt = float("inf")
        for _ in range(3):
            accum = accum0
            t0 = time.perf_counter()
            for f in range(DISP):
                accum = step(accum, options, frames[f], lights, env, mi)
            fence(accum)
            dt = min(dt, time.perf_counter() - t0)
        imgs[tag] = accum
        mrays = W * H * DISP * SPD / dt / 1e6
        if lmc:
            RESULTS["config1_light_mc_mrays"] = round(mrays, 2)
        else:
            RESULTS["config1_debug2_traced_mrays"] = round(mrays, 2)
        print(f"[s9 config1 debug2 {tag}] {mrays:6.1f} Mrays/s", flush=True)
    d = np.abs(np.asarray(imgs["traced"]) - np.asarray(imgs["static"]))
    print(f"[s9 parity] max {d.max():.2e} median {np.median(d):.2e}",
          flush=True)
    RESULTS["config1_light_mc_parity_max"] = float(d.max())


def stage10_stage_cut():
    import tlas_stage_ab

    tlas_stage_ab.main()


def main() -> None:
    stages = (
        {int(s) for s in sys.argv[1].split(",")}
        if len(sys.argv) > 1
        else set(range(1, 11))
    )
    t_all = time.perf_counter()
    r4.warmup()
    for num, fn in (
        (1, r4.stage1_headline),
        (2, r4.stage2_susanne),
        (3, r4.stage3_config2),
        (4, r4.stage4_config3),
        (5, r4.stage5_realtime),
        (6, r4.stage6_instanced),
        (7, r4.stage7_micros),
        (8, r4.stage8_realtime_env_routing),
        (9, stage9_light_mc),
        (10, stage10_stage_cut),
    ):
        if num not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {num}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
