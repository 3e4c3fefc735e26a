"""Per-frame timing of the instanced:K scene (BASELINE config 5) on TPU.

Steady-state full-frame progressive sample time at 512x512 through the
flattened (auto) or two-level accel path, with the honest tunnel protocol.

Usage: python benchmarks/instanced_frame.py [K=32] [accel=auto|two-level]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.trace.integrator import default_options, render_sample

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    accel = sys.argv[2] if len(sys.argv) > 2 else "auto"
    w = h = 512

    sc, cam = build_scene(f"instanced:{k}")
    t0 = time.time()
    if accel == "two-level":
        scene = sc.build_two_level()
    else:
        import os

        cache = f"/tmp/instanced_frame_{k}.npy"
        if os.path.exists(cache):
            scene = np.load(cache, allow_pickle=True).item()
        else:
            scene = sc.build(accel="auto")
            np.save(cache, jax.tree.map(np.asarray, scene))
    print(f"build: {time.time()-t0:.1f}s")
    scene = jax.device_put(scene)

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    cam.set_aspect(w, h)
    opts = default_options()
    camp = camera_params(cam)

    def frame(i):
        c = dict(camp)
        c["frame_count"] = jnp.asarray(i, jnp.uint32)
        return render_sample(scene, opts, c, w, h, mode="progressive",
                             impl="pallas", env_kind=0)

    t0 = time.time()
    out = frame(0)
    float(jnp.sum(out["color"]))
    print(f"compile+first: {time.time()-t0:.1f}s")
    float(jnp.sum(frame(1)["color"]))  # settle

    best = float("inf")
    for i in range(4):
        t1 = time.perf_counter()
        out = frame(2 + i)
        float(jnp.sum(out["color"]))
        dt = time.perf_counter() - t1
        best = min(best, dt)
        print(f"frame {i}: {dt*1e3:.0f} ms")
    n_rays = w * h
    print(f"best: {best*1e3:.0f} ms/frame "
          f"({n_rays/best/1e6:.2f} Mprimary-rays/s) accel={accel}")


if __name__ == "__main__":
    main()
