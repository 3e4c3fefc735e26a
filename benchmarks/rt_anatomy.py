"""Attribute the realtime megakernel's per-ray-sweep gap (TPU, one process).

Observed: progressive 512^2 S=16 runs ~1480 Mray-sweeps/s (9 sweeps,
1.59 ms/sample) while realtime 1080p S=1 runs ~860 (6 sweeps, 14.4 ms).
This probe separates the three candidate causes by measuring the SAME
kernels across {512^2, 1080p} x {S=1, S=16} x {progressive, realtime}:

  - S amortization: progressive S=1 vs S=16 at fixed size
  - resolution:     progressive 1080p vs 512^2 at fixed S
  - realtime tree:  realtime vs progressive S=1 at fixed size
    (16-row out block + 5-AOV epilogue vs 8-row + accumulate)

Usage: python benchmarks/rt_anatomy.py [--interpret]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv


def main() -> None:
    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.trace.integrator import default_options

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print("[warm]", flush=True)

    sc, cam = build_scene("cornell-glossy")
    options = jax.device_put(default_options())

    sizes = [(64, 64)] if SMOKE else [(512, 512), (1920, 1080)]
    for w, h in sizes:
        cam.set_aspect(w, h)
        scene = jax.device_put(sc.build())
        env_kind = int(scene["env"]["kind"])
        n = w * h

        def cams_for(s):
            cs = [
                camera_params(cam, jitter=(0.001 * i, -0.0007 * i),
                              frame_count=i)
                for i in range(s)
            ]
            return jax.device_put(
                jax.tree.map(lambda *xs: jnp.stack(xs), *cs)
            )

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

        for s in ((1,) if SMOKE else (1, 16)):
            stacked = cams_for(s)

            def prog():
                return fsp.fused_progressive_sum(
                    scene, options, stacked, w, h, env_kind,
                    interpret=SMOKE,
                )

            fence(prog()); fence(prog())
            t = best_of(prog) / s
            rate = n * 9 / t / 1e6
            print(
                f"[prog {w}x{h} S={s:2d}] {t*1e3:7.2f} ms/sample "
                f"({n/t/1e6:6.1f} Mrays/s, {rate:7.0f} Mray-sweeps/s)",
                flush=True,
            )

        cam1 = jax.device_put(
            camera_params(cam, jitter=(0.001, -0.0007), frame_count=3)
        )

        def rt():
            return fsp.fused_realtime_outputs(
                scene, options, cam1, w, h, env_kind, interpret=SMOKE,
            )

        fence(rt()); fence(rt())
        t = best_of(rt)
        rate = n * 6 / t / 1e6
        print(
            f"[rt   {w}x{h} S= 1] {t*1e3:7.2f} ms/frame "
            f"({n/t/1e6:6.1f} Mrays/s, {rate:7.0f} Mray-sweeps/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
