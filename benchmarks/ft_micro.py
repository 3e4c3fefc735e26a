"""Microbenchmark for the fused TRAVERSAL megakernel (TPU).

Times fused_traverse_progressive_sum in isolation with the honest tunnel
protocol, and (optionally) the wavefront BVH path on the same scene for the
before/after delta.

Usage: python benchmarks/ft_micro.py [scene] [S] [WIDTH] [--wavefront]
  scene: cornell | susanne | soup:N   (all built with accel="bvh")
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def build(scene_name: str):
    from dxrexperiments_tpu.app.headless import build_scene

    if scene_name == "susanne":
        sc, cam = build_scene("/root/reference/assets/models/susanne.obj")
    else:
        sc, cam = build_scene(scene_name)
    return sc, cam


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import (
        default_options,
        render_sample,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scene_name = args[0] if args else "susanne"
    s_count = int(args[1]) if len(args) > 1 else 8
    width = height = int(args[2]) if len(args) > 2 else 512
    do_wavefront = "--wavefront" in sys.argv

    sc, cam = build(scene_name)
    cam.set_aspect(width, height)
    scene = sc.build(accel="bvh")
    env_kind = int(scene["env"]["kind"])
    assert ftp.supports_fused_traverse(scene, "progressive", False), (
        "scene not eligible for the fused traversal path"
    )
    options = default_options()
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    scene = jax.device_put(scene)
    stacked = jax.device_put(stacked)

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    def dispatch():
        return ftp.fused_traverse_progressive_sum(
            scene, options, stacked, width, height, env_kind
        )

    t0 = time.perf_counter()
    float(jnp.sum(dispatch()))  # compile
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    float(jnp.sum(dispatch()))  # settle

    best = float("inf")
    reps = 6
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = dispatch()
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)

    n = width * height
    t = int(scene["mt_pack"].shape[1])
    mrays = n * s_count / best / 1e6
    print(
        f"[fused-traverse] {scene_name} ({t} tris) S={s_count} "
        f"{width}x{height}: {best*1e3:.2f} ms/dispatch, "
        f"{best/s_count*1e3:.3f} ms/sample, {mrays:.1f} Mrays/s primary"
    )

    if do_wavefront:
        def wf_one(cam_p):
            return render_sample(
                scene, options, cam_p, width, height,
                mode="progressive", impl="pallas", env_kind=env_kind,
            )["color"]

        wf_jit = jax.jit(lambda c: wf_one(c))
        cam0 = jax.device_put(cams[0])
        float(jnp.sum(wf_jit(cam0)))
        float(jnp.sum(wf_jit(cam0)))
        best_wf = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = wf_jit(cam0)
            float(jnp.sum(out))
            best_wf = min(best_wf, (time.perf_counter() - t0) / reps)
        print(
            f"[wavefront]      {scene_name}: {best_wf*1e3:.2f} ms/sample, "
            f"{n / best_wf / 1e6:.1f} Mrays/s primary "
            f"(fused speedup {best_wf / (best / s_count):.2f}x)"
        )


if __name__ == "__main__":
    main()
