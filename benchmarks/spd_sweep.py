"""Sweep samples-per-dispatch on the headline config (Cornell 512^2).

rt_anatomy measured the fused progressive megakernel at 1331 Mray-sweeps/s
at 512^2 S=16 but 1628 at 1080p S=16 — the 512^2 headline is still
launch/fixed-cost-bound at S=16. This sweeps S through the SAME production
path bench.py uses (make_progressive_step, scene baked, stacked cameras)
to find the amortization knee; bench.py's BENCH_SPD default follows the
winner.

One process, bench warm-up protocol. Usage:
  python benchmarks/spd_sweep.py [--interpret]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv
W = H = 64 if SMOKE else 512


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.models.progressive import make_progressive_step

    scene, options, cams, accum0 = _cornell_setup(W, H, 1)
    scene = jax.device_put(scene)
    accum0 = jax.device_put(accum0)
    lights, env = scene["lights"], scene["env"]
    mi = jnp.asarray(1 << 30, jnp.int32)

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print("[warm]", flush=True)

    rng = np.random.default_rng(0)

    def frames_for(spd, dispatches):
        frames = []
        for f in range(dispatches):
            cs = []
            for k in range(spd):
                c = dict(cams[0])
                c["jitter"] = jnp.asarray(
                    [(rng.random() - 0.5) / W, (rng.random() - 0.5) / H],
                    jnp.float32,
                )
                c["frame_count"] = jnp.asarray(f * spd + k, jnp.uint32)
                c["accum_count"] = jnp.asarray(float(f * spd), jnp.float32)
                cs.append(c)
            frames.append(
                jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *cs))
            )
        return frames

    total = 16 if SMOKE else 256  # samples per timed rep, fixed across S
    for spd in ([4] if SMOKE else [16, 32, 64, 128]):
        dispatches = total // spd
        step = make_progressive_step(scene, W, H, samples_per_step=spd)
        frames = frames_for(spd, dispatches)
        accum = accum0
        for f in range(min(2, dispatches)):
            accum = step(accum, options, frames[f], lights, env, mi)
        float(jnp.sum(accum))
        dt = float("inf")
        for _ in range(3):
            accum = accum0
            t0 = time.perf_counter()
            for f in range(dispatches):
                accum = step(accum, options, frames[f], lights, env, mi)
            float(jnp.sum(accum))
            dt = min(dt, time.perf_counter() - t0)
        mrays = W * H * total / dt / 1e6
        print(
            f"[spd {spd:3d}] {dt/total*1e3:6.3f} ms/sample  "
            f"{mrays:7.1f} Mrays/s  ({total} samples, {dispatches} dispatches)",
            flush=True,
        )


if __name__ == "__main__":
    main()
