"""Sweep-level attribution of the config-2 fused FLAT result (VERDICT r3
#3): the tex-area megakernel measured 0.98x vs wavefront at 512^2 S=8
(110.9 vs 108.8 ms/sample, round3_batch) with only a whole-kernel
attribution. This probe decomposes by SCENE-VARIANT DELTAS — the same FT
megakernel on config2 with individual cost sources removed:

  full     : config2 as written (1 dir + 1 area(4) = 5 occlusion dirs,
             checker albedo texture, cubemap env -> TEX_ROWS epilogue +
             deferred tex+env gathers)
  pt-light : area light -> point light (2 occlusion dirs) — isolates the
             area soft-shadow walk
  no-tex   : floor texture stripped — isolates the albedo-texture slice
             (TEX epilogue rows + masked_albedo gathers)
  grad-env : cubemap -> gradient env — isolates the env gather slice
  bare     : all three removed — the plain FT traversal cost at 1768 tris

plus DXR_COMPACT on/off on `full` (the round-4 miss-compaction slice) and
the wavefront comparator on `full` (the 108.8 ms round-3 protocol).

Reference anchor: one DispatchRays runs the whole tree
(/root/reference/libs/DXRFramework/RtContext.cpp:192-222).

Usage: python benchmarks/config2_anatomy.py [--interpret]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv


def fence(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


def best_of(fn, reps=3, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def build_variant(tag: str):
    """config2 with one cost source removed per variant."""
    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.scene import envmap
    from dxrexperiments_tpu.scene.lights import point_light

    sc, cam = build_scene("config2")
    if tag in ("pt-light", "bare"):
        # same radiant intent as the area panel, point form
        sc.lights = {
            "dir": sc.lights["dir"],
            "point": [point_light((-4.0, 13.0, 4.0), (1.0, 0.95, 0.85, 40.0))],
            "area": [],
        }
    if tag in ("no-tex", "bare"):
        for m in sc.materials:
            m.albedo_texture = None
    if tag in ("grad-env", "bare"):
        sc.environment = envmap.gradient_env()
    return sc, cam


def main() -> None:
    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import (
        default_options,
        render_sample,
    )

    t_all = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print("[warm]", flush=True)

    s_count, width = (2, 64) if SMOKE else (8, 512)
    height = width
    options = jax.device_put(default_options())
    results = {}

    variants = ("full", "pt-light", "no-tex", "grad-env", "bare")
    for tag in variants:
        try:
            sc, cam = build_variant(tag)
            cam.set_aspect(width, height)
            scene = sc.build(accel="bvh")
            env_kind = int(scene["env"]["kind"])
            assert ftp.supports_fused_traverse(scene, "progressive", False), tag
            cams = [
                camera_params(cam, jitter=(0.001 * i, -0.0007 * i),
                              frame_count=i)
                for i in range(s_count)
            ]
            stacked = jax.device_put(
                jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
            )
            scene = jax.device_put(scene)

            # "0" (compaction off) is the SHIPPED default since round 4's
            # negative A/B; full also runs "1" for the compaction slice.
            compacts = ("0", "1") if tag == "full" else ("0",)
            for compact in compacts:
                os.environ["DXR_COMPACT"] = compact
                if hasattr(ftp._ft_progressive_deferred_impl, "clear_cache"):
                    ftp._ft_progressive_deferred_impl.clear_cache()

                def fused():
                    return ftp.fused_traverse_progressive_sum(
                        scene, options, stacked, width, height, env_kind,
                        interpret=SMOKE,
                    )

                t0 = time.perf_counter()
                fence(fused())
                print(f"[compile {tag} c={compact}] "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                t = best_of(fused) / s_count
                key = tag + ("" if compact == "1" else " compact=off")
                results[key] = t
                print(f"[ft {key:22s}] {t*1e3:7.2f} ms/sample "
                      f"({1.0/t:6.2f} spp/s)", flush=True)

            if tag == "full":
                cam0 = jax.device_put(cams[0])

                def wf():
                    return render_sample(
                        scene, options, cam0, width, height,
                        mode="progressive",
                        impl="pallas_interpret" if SMOKE else "pallas",
                        env_kind=env_kind,
                    )["color"]

                wf_jit = jax.jit(wf)
                fence(wf_jit())
                t = best_of(wf_jit)
                results["wavefront full"] = t
                print(f"[wf full                ] {t*1e3:7.2f} ms/sample "
                      f"({1.0/t:6.2f} spp/s)", flush=True)
        except Exception:
            print(f"[{tag}] FAILED:", flush=True)
            traceback.print_exc()
    os.environ.pop("DXR_COMPACT", None)

    # shipped arms are the compact=off ones (round-4 default)
    if "full compact=off" in results:
        full = results["full compact=off"]
        print("\n--- attribution (deltas vs full, compact=off) ---",
              flush=True)
        for tag in ("pt-light", "no-tex", "grad-env", "bare"):
            key = tag + " compact=off"
            if key in results:
                d = (full - results[key]) * 1e3
                print(f"  {tag:9s} removes {d:7.2f} ms/sample "
                      f"({d/(full*1e3)*100:5.1f}% of full)", flush=True)
    print(f"[anatomy done] {time.perf_counter() - t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
