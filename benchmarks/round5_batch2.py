"""Round-5 batch 2: ONE TPU process (short back-to-back processes wedge the
tunnel, CLAUDE.md) for the measurements the first batch did not land:

  micros   round4_final stage7 closest/incoherent micros, re-run on an
           otherwise-idle host (the first r5 run was contaminated by a
           concurrent CPU smoke test).
  c3       config3_anatomy full set (kernel/resolve attribution + stacked
           and block-compacted combine A/Bs) at 1080p HDR S=8 — the r4 #3
           "defer more / resolve cheaper" decomposition.
  ab       round5_compact_ab c2,sus: block-compaction frame A/B on the
           FT-deferred configs (c3's block arm is covered by the anatomy).
  c2split  config-2 kernel-only dispatch (FT tex-deferred) so full - kernel
           attributes the host resolve/combine the same way the c3 anatomy
           does — pins where the ~17 ms "TEX epilogue" slice actually lives.

Usage: python benchmarks/round5_batch2.py [stages]   (comma list, default all)
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

RESULTS: dict[str, float] = {}


def stage_micros():
    import round4_final as r4

    r4.stage7_micros()
    RESULTS.update(r4.RESULTS)


def stage_c3():
    import config3_anatomy

    sys.argv = ["config3_anatomy"]
    config3_anatomy.main()
    RESULTS.update({f"c3_{k}": v for k, v in config3_anatomy.RESULTS.items()})


def stage_ab():
    import round5_compact_ab

    sys.argv = ["round5_compact_ab", "c2,sus"]
    round5_compact_ab.main()
    RESULTS.update(round5_compact_ab.RESULTS)


def stage_c2split():
    import jax
    import jax.numpy as jnp

    import round5_compact_ab as ab
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    scene, stacked, ek = ab._setup("config2", None, 512, 512, 8, "bvh")
    options = jax.device_put(default_options())
    tile_r, block_w, half_gate = ftp._ft_knobs()

    disp = jax.jit(
        lambda sc, c: ftp._ft_dispatch(
            sc, options, c, 512, 512, ek, False, tile_r=tile_r,
            block_w=block_w, env_deferred=False, tex_deferred=True,
            half_gate=half_gate,
        )[0]
    )
    t0 = time.perf_counter()
    out = disp(scene, stacked)
    ab.fence(out)
    print(f"[compile c2 kernel] {time.perf_counter() - t0:.1f}s", flush=True)
    t = ab.best_of(lambda: disp(scene, stacked)) / 8
    RESULTS["config2_kernel_ms_per_sample"] = round(t * 1e3, 2)
    print(f"[c2 kernel] {t*1e3:7.2f} ms/sample", flush=True)


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"micros", "c3", "ab", "c2split"}
    )
    import jax.numpy as jnp

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (
        ("micros", stage_micros),
        ("c3", stage_c3),
        ("ab", stage_ab),
        ("c2split", stage_c2split),
    ):
        if name not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {name}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch2 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
