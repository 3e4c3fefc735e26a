"""Round-5 batch 7 (ONE TPU process): FT tile sweep on the config-2 TEX
kernel. The wide-unperm combine left config 2 KERNEL-bound (45.5 of 61.7
ms/sample); FT_TILE=1024/32x32 was tuned on susanne + the 200k soup —
config2 is 1768 VMEM-resident tris with area-light walks, a different
regime. Arms are kernel-only dispatches (tile_r/block_w are static args,
fresh jit per arm), then the full production frame at the best arm if it
beats the shipped default.

Usage: python benchmarks/round5_batch7.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

RESULTS: dict[str, float] = {}


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import round5_compact_ab as ab
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    scene, stacked, ek = ab._setup("config2", None, 512, 512, 8, "bvh")
    options = jax.device_put(default_options())
    S, W, H = 8, 512, 512

    arms = [
        (1024, 32, 0),   # shipped default
        (512, 32, 0),    # SEC_TILE-style smaller packets (16x32 blocks)
        (2048, 32, 0),   # bigger launch amortization (64x32)
        (2048, 32, 2),   # + half-gate 2 (the 200k-soup alternative optimum)
        (4096, 64, 0),
    ]
    imgs = {}
    for tile_r, block_w, hg in arms:
        key = f"t{tile_r}_b{block_w}_hg{hg}"
        try:
            disp = jax.jit(
                lambda sc, c, _t=tile_r, _b=block_w, _h=hg: ftp._ft_dispatch(
                    sc, options, c, W, H, ek, False, tile_r=_t,
                    block_w=_b, env_deferred=False, tex_deferred=True,
                    half_gate=_h,
                )[0]
            )
            t0 = time.perf_counter()
            out = disp(scene, stacked)
            ab.fence(out)
            print(f"[compile {key}] {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ab.fence(disp(scene, stacked))
                best = min(best, time.perf_counter() - t0)
            RESULTS[f"c2k_{key}_ms_per_sample"] = round(best / S * 1e3, 2)
            print(f"[c2 kernel {key}] {best/S*1e3:7.2f} ms/sample",
                  flush=True)
            imgs[key] = out
        except Exception:
            print(f"[{key}] FAILED:", flush=True)
            traceback.print_exc()

    # parity across tile arms (same rays, same sweeps — merge order within
    # a packet differs only in association of identical float ops on this
    # kernel family; require exact like the FT tile sweeps of round 3)
    ref = "t1024_b32_hg0"
    if ref in imgs:
        for k, v in imgs.items():
            if k == ref:
                continue
            d = np.abs(np.asarray(v) - np.asarray(imgs[ref]))
            RESULTS[f"c2k_{k}_max_abs_vs_default"] = float(d.max())
            print(f"[parity {k}] max_abs {d.max():.2e}", flush=True)

    # full production frame at the best arm vs shipped, same process
    best_key = min(
        (k for k in RESULTS if k.endswith("_ms_per_sample")),
        key=lambda k: RESULTS[k],
    )
    print(f"[best kernel arm] {best_key} = {RESULTS[best_key]}", flush=True)
    tag = best_key[len("c2k_"):-len("_ms_per_sample")]
    ts, bs, hs = tag.split("_")
    t, b, h = int(ts[1:]), int(bs[1:]), int(hs[2:])
    for arm, (tile_r, block_w, hg) in (("shipped", (1024, 32, 0)),
                                       ("best", (t, b, h))):
        if arm == "best" and (tile_r, block_w, hg) == (1024, 32, 0):
            print("[full] best arm IS the shipped default; skipping",
                  flush=True)
            break
        fn = jax.jit(
            lambda sc, c, _t=tile_r, _b=block_w, _h=hg:
            ftp._ft_progressive_deferred_impl.__wrapped__(
                sc, options, c, W, H, ek, False, _t, _b, None, 0, _h,
            )
        )
        ab.fence(fn(scene, stacked))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ab.fence(fn(scene, stacked))
            best = min(best, time.perf_counter() - t0)
        RESULTS[f"c2full_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
        print(f"[c2 full {arm}] {best/S*1e3:7.2f} ms/sample "
              f"({S/best:5.2f} spp/s)", flush=True)

    print(f"[batch7 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
