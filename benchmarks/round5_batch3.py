"""Round-5 batch 3 (ONE TPU process): act on batch-2's attributions.

  c3sweep   config3_anatomy stages kernel,micros,blocksweep — the real
            1080p need fractions at B in {128..1024} plus the block-B
            resolve sweep (batch 2: ship 104.1, block@1024 90.1 ms/sample;
            stacked_block excluded — it crashed the compiler).
  c3frame   frame-level c3 A/B off vs block at the sweep-winning B
            (round5_compact_ab c3) — decides the production default.
  c2split   config-2 resolve decomposition: unperm-only, albedo-gathers-
            only, env-terms-only micros against the known total (batch 2:
            full 97.2 = kernel 44.05 + resolve ~53 ms/sample).
  prime     round5_prime_ab sec+frame: PRIME t_max seeding + block-local
            octant binning on the 983k instanced scene (the round-4
            "binning negative" /tmp finding gets recorded numbers).

Usage: python benchmarks/round5_batch3.py [stages] (default all)
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


def stage_c3sweep():
    import config3_anatomy

    sys.argv = ["config3_anatomy", "kernel,micros,blocksweep"]
    config3_anatomy.main()
    RESULTS.update({f"c3_{k}": v for k, v in config3_anatomy.RESULTS.items()})


def stage_c3frame():
    import round5_compact_ab

    os.environ["DXR_COMPACT_B"] = os.environ.get("B3_BEST_B", "1024")
    sys.argv = ["round5_compact_ab", "c3", "0.25,0.5"]
    round5_compact_ab.main()
    RESULTS.update(round5_compact_ab.RESULTS)


def stage_c2split():
    import jax
    import jax.numpy as jnp

    import round5_compact_ab as ab
    from dxrexperiments_tpu.ops import deferred_resolve as dr
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    scene, stacked, ek = ab._setup("config2", None, 512, 512, 8, "bvh")
    options = jax.device_put(default_options())
    tile_r, block_w, half_gate = ftp._ft_knobs()
    S, n = 8, 512 * 512
    s_rows = ftp.TEX_ROWS

    disp = jax.jit(
        lambda sc, c: ftp._ft_dispatch(
            sc, options, c, 512, 512, ek, False, tile_r=tile_r,
            block_w=block_w, env_deferred=False, tex_deferred=True,
            half_gate=half_gate,
        )[0]
    )
    out = jax.device_put(jax.block_until_ready(disp(scene, stacked)))
    print("[c2split] kernel out ready", flush=True)

    def best(fn, *args):
        ab.fence(fn(*args))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ab.fence(fn(*args))
            b = min(b, time.perf_counter() - t0)
        return b / S

    # (a) unperm of every row the ship combine reads (34 rows x S)
    unp = jax.jit(
        lambda o: sum(
            jnp.sum(ftp._unperm(o[s_rows * si: s_rows * si + 34], None))
            for si in range(S)
        )
    )
    t = best(unp, out)
    RESULTS["c2_unperm_ms_per_sample"] = round(t * 1e3, 2)
    print(f"[c2 unperm 34xS rows] {t*1e3:7.2f} ms/sample", flush=True)

    # (b) albedo gathers only: the 3 masked_albedo calls per sample on the
    # real uv/mid rows, full-width (production compact=off)
    def alb(sc, o):
        total = 0.0
        for si in range(S):
            base = s_rows * si

            def row1(r0):
                return ftp._unperm(o[base + r0: base + r0 + 1], None)[:, 0]

            for uv_row, mid_row in ((25, 27), (28, 30), (31, 33)):
                uv = jnp.stack([row1(uv_row), row1(uv_row + 1)], axis=-1)
                need = jnp.ones((n,), bool)
                total = total + jnp.sum(
                    dr.masked_albedo(sc["textures"], uv, row1(mid_row), need)
                )
        return total

    t = best(jax.jit(alb), scene, out)
    RESULTS["c2_albedo_gathers_ms_per_sample"] = round(t * 1e3, 2)
    print(f"[c2 albedo gathers 3xS] {t*1e3:7.2f} ms/sample", flush=True)

    # (c) env terms only: 2 weighted_env per sample on real dirs/weights
    def envt(sc, o):
        total = 0.0
        for si in range(S):
            base = s_rows * si

            def rows3(r0):
                return ftp._unperm(o[base + r0: base + r0 + 3], None)

            total = total + jnp.sum(
                dr.weighted_env(sc["env"], rows3(4), rows3(7), ek)
            ) + jnp.sum(
                dr.weighted_env(sc["env"], rows3(10), rows3(13), ek)
            )
        return total

    t = best(jax.jit(envt), scene, out)
    RESULTS["c2_env_terms_ms_per_sample"] = round(t * 1e3, 2)
    print(f"[c2 env terms 2xS] {t*1e3:7.2f} ms/sample", flush=True)


def stage_prime():
    import round5_prime_ab

    sys.argv = ["round5_prime_ab"]
    round5_prime_ab.main()
    RESULTS.update(round5_prime_ab.RESULTS)


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"c3sweep", "c3frame", "c2split", "prime"}
    )
    import jax.numpy as jnp

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (
        ("c3sweep", stage_c3sweep),
        ("c3frame", stage_c3frame),
        ("c2split", stage_c2split),
        ("prime", stage_prime),
    ):
        if name not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {name}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch3 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
