"""Round-5 batch 5 (ONE TPU process): tiny lower tiers for the sparse
resolve terms, informed by batch-4's need fractions.

  c3tiers   config3_anatomy blocksweep at B=16/32 with a ~0.05 lower tier:
            batch 4 showed spec block-need 0.032 and prim-miss 0 both ride
            the 0.2 tier (6x their need, ~12 ms each at 60.7 ms full-width)
            while diffuse needs ~0.53-0.56. Predicted resolve ~40-42
            ms/sample (from 54.11 at 16:0.2|0.55).
  c3prod2   config 3 through the production step with the winning (B,
            caps) emulated via the DXR_COMPACT env override, vs the
            shipped default (B=128, .25/.7) - decides the new
            BLOCK_DEFAULT_* constants.
  c2micros  config-2 per-term need fractions (row + block granularity) on
            the TEX combine's actual masks - sizes tiers for c2block.
  c2block   config-2 production-path A/B: compact off vs block with tiny
            tiers sized so the SPARSE terms (spec env, diffuse env,
            prim-miss env) compact while the dense albedo terms fall
            through to full width. Block mode at 512^2 measured NEGATIVE
            with the old shared caps (97 -> 121); tiny tiers are the one
            untried lever.
  susblock  susanne+cubemap (open scene, 512^2): same tiny-tier arm -
            expected to stay negative (env needs are the miss fraction,
            which is large in open scenes); recorded either way.

Usage: python benchmarks/round5_batch5.py [stages]
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


def _clear_deferred_caches():
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    fsp._fused_progressive_deferred_impl.clear_cache()
    ftp._ft_progressive_deferred_impl.clear_cache()


def stage_c3tiers():
    os.environ["C3_BLOCK_SWEEP"] = (
        "16:0.05|0.6;16:0.05|0.2|0.6;16:0.03|0.55;32:0.05|0.6"
    )
    import config3_anatomy

    sys.argv = ["config3_anatomy", "kernel,blocksweep"]
    config3_anatomy.main()
    RESULTS.update({f"c3_{k}": v for k, v in config3_anatomy.RESULTS.items()})


def stage_c3prod2():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import round4_final as r4
    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models import progressive as prog
    from dxrexperiments_tpu.trace.integrator import default_options

    width, height, S = 1920, 1080, 8
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(r4.HDR_ENV)
    cam.set_aspect(width, height)
    options = jax.device_put(default_options())
    mi = jnp.asarray(1 << 20, jnp.int32)
    cams = [
        camera_params(cam, jitter=(0.0008 * i, -0.0005 * i), frame_count=i)
        for i in range(S)
    ]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    stacked["accum_count"] = jnp.arange(S, dtype=jnp.float32)
    stacked = jax.device_put(stacked)
    accum = jax.device_put(jnp.zeros((height, width, 3), jnp.float32))
    scene = jax.device_put(sc.build(accel="auto"))

    outs = {}
    # tuned arm emulates new defaults via the env override (default_resolve_
    # kwargs defers to DXR_COMPACT when set); shipped arm = current default
    for arm, env_kv in (
        ("tuned_b16", {"DXR_COMPACT": "block", "DXR_COMPACT_B": "16",
                       "DXR_COMPACT_CAPS": "0.05,0.6"}),
        ("shipped_b128", {}),
    ):
        for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
            os.environ.pop(k, None)
        os.environ.update(env_kv)
        _clear_deferred_caches()
        step = prog.make_progressive_step(
            scene, width, height, samples_per_step=S
        )
        t0 = time.perf_counter()
        out = step(accum, options, stacked, scene["lights"], scene["env"], mi)
        float(jnp.sum(out))
        print(f"[c3prod2 compile {arm}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[arm] = out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(
                step(accum, options, stacked, scene["lights"], scene["env"],
                     mi)
            ))
            best = min(best, time.perf_counter() - t0)
        RESULTS[f"c3prod2_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
        print(f"[c3prod2 {arm}] {best/S*1e3:7.2f} ms/sample "
              f"({S/best:5.2f} spp/s)", flush=True)
    for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
        os.environ.pop(k, None)
    d = np.abs(np.asarray(outs["tuned_b16"]) - np.asarray(outs["shipped_b128"]))
    RESULTS["c3prod2_parity_max_abs"] = float(d.max())
    print(f"[c3prod2 parity] max_abs {d.max():.2e}", flush=True)


def _c2_setup():
    import jax

    import round5_compact_ab as ab
    from dxrexperiments_tpu.trace.integrator import default_options

    scene, stacked, ek = ab._setup("config2", None, 512, 512, 8, "bvh")
    options = jax.device_put(default_options())
    return ab, scene, stacked, ek, options


def stage_c2micros():
    import numpy as np
    import jax

    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    ab, scene, stacked, ek, options = _c2_setup()
    tile_r, block_w, half_gate = ftp._ft_knobs()
    S, W, H = 8, 512, 512
    s_rows = ftp.TEX_ROWS
    n = W * H

    disp = jax.jit(
        lambda sc, c: ftp._ft_dispatch(
            sc, options, c, W, H, ek, False, tile_r=tile_r,
            block_w=block_w, env_deferred=False, tex_deferred=True,
            half_gate=half_gate,
        )[0]
    )
    out = np.asarray(jax.block_until_ready(disp(scene, stacked)))
    print("[c2micros] kernel out ready", flush=True)

    # raster-order inv (the order compact_apply sees) - block-perm inverse
    inv = None
    block_h = tile_r // block_w if block_w else 1
    if block_w and not (tile_r % block_w or W % block_w or H % block_h):
        pys, pxs = np.meshgrid(
            np.arange(H, dtype=np.int64), np.arange(W, dtype=np.int64),
            indexing="ij",
        )
        perm = (
            (pys * W + pxs)
            .reshape(H // block_h, block_h, W // block_w, block_w)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n, dtype=np.int64)

    def rows(base, r0, k):
        r = out[base + r0: base + r0 + k, :n].T
        return r[inv] if inv is not None else r

    def nz(x):
        return np.any(x != 0.0, axis=1)

    terms = {k: np.zeros(n, bool) for k in
             ("texp", "texd", "texs", "ed", "es")}
    any_miss = np.zeros(n, bool)
    per_sample = {k: 0.0 for k in terms}
    for si in range(S):
        base = s_rows * si
        b_c, c_c, d_c = (nz(rows(base, r, 3)) for r in (16, 19, 22))
        w_d, w_s = nz(rows(base, 7, 3)), nz(rows(base, 13, 3))
        hit = rows(base, 3, 1)[:, 0] > 0.5
        any_miss |= ~hit
        sample_needs = {
            "texp": b_c | c_c | w_d, "texd": c_c, "texs": d_c,
            "ed": w_d, "es": w_s,
        }
        for k, v in sample_needs.items():
            terms[k] |= v
            per_sample[k] += v.mean() / S
    for k, v in terms.items():
        RESULTS[f"c2_need_row_{k}"] = round(float(per_sample[k]), 4)
        print(f"[c2 need {k}] row {per_sample[k]:.3f} (any-sample "
              f"{v.mean():.3f})", flush=True)
    RESULTS["c2_need_row_prim_miss"] = round(float(any_miss.mean()), 4)
    print(f"[c2 need prim_miss] {any_miss.mean():.3f}", flush=True)
    # block need (per-sample masks drive the per-call conds; report the
    # mean over samples of the block-any fraction)
    for bb in (16, 32, 128):
        nb = n // bb
        for k in ("texp", "texd", "texs", "ed", "es"):
            fr = 0.0
            for si in range(S):
                base = s_rows * si
                if k == "texp":
                    m = (nz(rows(base, 16, 3)) | nz(rows(base, 19, 3))
                         | nz(rows(base, 7, 3)))
                elif k == "texd":
                    m = nz(rows(base, 19, 3))
                elif k == "texs":
                    m = nz(rows(base, 22, 3))
                elif k == "ed":
                    m = nz(rows(base, 7, 3))
                else:
                    m = nz(rows(base, 13, 3))
                fr += np.any(m.reshape(nb, bb), axis=1).mean() / S
            RESULTS[f"c2_need_b{bb}_{k}"] = round(float(fr), 4)
            print(f"[c2 need B={bb:4d} {k}] {fr:.3f}", flush=True)
        mb = np.any(any_miss.reshape(nb, bb), axis=1).mean()
        RESULTS[f"c2_need_b{bb}_prim_miss"] = round(float(mb), 4)
        print(f"[c2 need B={bb:4d} prim_miss] {mb:.3f}", flush=True)


def stage_c2block():
    import jax
    import numpy as np

    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp

    ab, scene, stacked, ek, options = _c2_setup()
    tile_r, block_w, half_gate = ftp._ft_knobs()
    S, W, H = 8, 512, 512

    imgs = {}
    for arm, env_kv in (
        ("off", {"DXR_COMPACT": "0"}),
        ("b16_tiny", {"DXR_COMPACT": "block", "DXR_COMPACT_B": "16",
                      "DXR_COMPACT_CAPS": "0.05,0.3"}),
        ("b16_3tier", {"DXR_COMPACT": "block", "DXR_COMPACT_B": "16",
                       "DXR_COMPACT_CAPS": "0.05,0.3,0.6"}),
    ):
        for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
            os.environ.pop(k, None)
        os.environ.update(env_kv)
        _clear_deferred_caches()
        fn = jax.jit(
            lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
                sc, options, c, W, H, ek, False, tile_r, block_w, None, 0,
                half_gate,
            )
        )
        try:
            t0 = time.perf_counter()
            imgs[arm] = fn(scene, stacked)
            ab.fence(imgs[arm])
            print(f"[c2block compile {arm}] {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ab.fence(fn(scene, stacked))
                best = min(best, time.perf_counter() - t0)
            RESULTS[f"c2block_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
            print(f"[c2block {arm}] {best/S*1e3:7.2f} ms/sample "
                  f"({S/best:5.2f} spp/s)", flush=True)
        except Exception:
            print(f"[c2block {arm}] FAILED:", flush=True)
            traceback.print_exc()
    for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
        os.environ.pop(k, None)
    if "off" in imgs:
        for arm, v in imgs.items():
            if arm == "off":
                continue
            d = np.abs(np.asarray(v) - np.asarray(imgs["off"]))
            RESULTS[f"c2block_{arm}_parity_max_abs"] = float(d.max())
            print(f"[c2block parity {arm}] max_abs {d.max():.2e}", flush=True)


def stage_susblock():
    import jax
    import numpy as np

    import round5_compact_ab as ab
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    scene, stacked, ek = ab._setup(
        "/root/reference/assets/models/susanne.obj", ab.CUBE_ENV,
        512, 512, 16, "bvh",
    )
    options = jax.device_put(default_options())
    tile_r, block_w, half_gate = ftp._ft_knobs()
    S, W, H = 16, 512, 512

    imgs = {}
    for arm, env_kv in (
        ("off", {"DXR_COMPACT": "0"}),
        ("b16_tiny", {"DXR_COMPACT": "block", "DXR_COMPACT_B": "16",
                      "DXR_COMPACT_CAPS": "0.05,0.3,0.7"}),
    ):
        for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
            os.environ.pop(k, None)
        os.environ.update(env_kv)
        _clear_deferred_caches()
        fn = jax.jit(
            lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
                sc, options, c, W, H, ek, False, tile_r, block_w, None, 0,
                half_gate,
            )
        )
        try:
            t0 = time.perf_counter()
            imgs[arm] = fn(scene, stacked)
            ab.fence(imgs[arm])
            print(f"[susblock compile {arm}] {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ab.fence(fn(scene, stacked))
                best = min(best, time.perf_counter() - t0)
            RESULTS[f"sus_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
            print(f"[susblock {arm}] {best/S*1e3:7.2f} ms/sample", flush=True)
        except Exception:
            print(f"[susblock {arm}] FAILED:", flush=True)
            traceback.print_exc()
    for k in ("DXR_COMPACT", "DXR_COMPACT_B", "DXR_COMPACT_CAPS"):
        os.environ.pop(k, None)
    if len(imgs) == 2:
        d = np.abs(np.asarray(imgs["b16_tiny"]) - np.asarray(imgs["off"]))
        RESULTS["sus_parity_max_abs"] = float(d.max())
        print(f"[susblock parity] max_abs {d.max():.2e}", flush=True)


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"c3tiers", "c3prod2", "c2micros", "c2block", "susblock"}
    )
    import jax.numpy as jnp

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (
        ("c3tiers", stage_c3tiers),
        ("c3prod2", stage_c3prod2),
        ("c2micros", stage_c2micros),
        ("c2block", stage_c2block),
        ("susblock", stage_susblock),
    ):
        if name not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {name}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch5 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
