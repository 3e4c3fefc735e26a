"""Config-3 post-routing anatomy (VERDICT r4 #3): decompose the 1080p
cornell-glossy + 8K-HDR-latlong frame (the BASELINE HDR config, production
brute env-deferred route, S=8) into its cost sources, then A/B the "defer
more / resolve cheaper" levers in the SAME process:

  1. full        shipped _fused_progressive_deferred_impl (traced via
                 __wrapped__ in a fresh outer jit — knob-safety per
                 CLAUDE.md's module-global A/B rule).
  2. kernel      the megakernel dispatch alone (sweeps + deferred out-row
                 epilogue; no env resolve, no combine).
  3. resolve     the host combine alone, given the kernel's out rows as a
                 device-resident jit ARG: S x (2 weighted_env) + shared
                 masked_env + unperm + sum.
  4. micros      one full-width weighted_env / masked_env over n rows, the
                 unperm-only chain, and the runtime need fractions (row-
                 and block-level) that bound what compaction can save.
  5. stacked     combine with ALL 2S bounce resolves in ONE weighted_env
                 call over [2*S*n] rows (the ADVICE-r5 es_term pattern).
  6. block       combine with block-compacted resolves
                 (ops/deferred_resolve block mode, round 5) at B=1024,
                 caps 0.25/0.5 — and stacked+block combined.

Every arm's image is compared to the full arm (allclose 1e-5 / report
max-abs) — same gathered values, only evaluation order changes.

Env is miss-only in the reference
(/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:160-164); the
deferred row layout is _fused_progressive_deferred_impl's (16 rows/sample:
0-2 base radiance, 3 hit, 4-6 diffuse bounce dir, 7-9 its per-channel env
weight, 10-12 spec bounce dir, 13-15 its weight).

Usage: python benchmarks/config3_anatomy.py [stages]  (default all)
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

HDR_ENV = (
    "latlong:/root/reference/assets/textures/"
    "HdrStudioProductNightStyx001_JPG_8K.jpg"
)
RESULTS: dict[str, float] = {}
import os as _os

W = int(_os.environ.get("C3_W", "1920"))
H = int(_os.environ.get("C3_H", "1080"))
S = int(_os.environ.get("C3_S", "8"))
INTERPRET = _os.environ.get("C3_INTERPRET", "0") == "1"  # CPU smoke test
BLOCK_B = int(_os.environ.get("C3_BLOCK_B", "1024"))
BLOCK_CAPS = tuple(
    float(c) for c in _os.environ.get("C3_BLOCK_CAPS", "0.25,0.5").split(",")
)


def fence(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


def best_of(fn, reps=2, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"full", "kernel", "resolve", "micros", "stacked", "block"}
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params, primary_ray_grid
    from dxrexperiments_tpu.ops import deferred_resolve as dr
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.trace.integrator import default_options

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(HDR_ENV)
    cam.set_aspect(W, H)
    scene = jax.device_put(sc.build(accel="auto"))
    env_kind = int(scene["env"]["kind"])
    assert env_kind == 2, env_kind  # latlong
    options = jax.device_put(default_options())
    cams = [
        camera_params(cam, jitter=(0.0008 * i, -0.0005 * i), frame_count=i)
        for i in range(S)
    ]
    stacked_cams = jax.device_put(
        jax.tree.map(lambda *x: jnp.stack(x), *cams)
    )
    env = scene["env"]
    n = W * H
    tile_r, block_w, cluster_rows = fsp._env_knobs(
        int(scene["mt_pack"].shape[1])
    )

    # NOTE: every jit below takes `scene`/`env` as an ARG, mirroring the
    # production impls (which are @jax.jit with scene as a parameter) —
    # closing over the 8K HDR quad-packed env bakes ~1 GB of constants
    # into the compile request and the axon tunnel rejects it (HTTP 413).
    def dispatch(sc, cameras):
        return fsp._fused_dispatch(
            sc, options, cameras, W, H, env_kind, INTERPRET,
            tile_r=tile_r, block_w=block_w, cluster_rows=cluster_rows,
            env_deferred=True,
        )

    # primary dirs shared by all S samples (jitter shifts origins only)
    cam0 = jax.tree.map(lambda x: x[0], stacked_cams)

    def combine(env, out, inv, mode, block_b=None, caps=None):
        """The _fused_progressive_deferred_impl host part, evaluation-order
        variants. mode in {ship, stacked, block, stacked_block}."""
        block_kw = (
            {
                "enabled": "block",
                "caps": caps or BLOCK_CAPS,
                "block": block_b or BLOCK_B,
            }
            if "block" in mode else {"enabled": False}
        )

        def rows3(si, r0):
            return fsp._unperm(out[16 * si + r0: 16 * si + r0 + 3], inv)

        def row1(si, r0):
            return fsp._unperm(out[16 * si + r0: 16 * si + r0 + 1], inv)[:, 0]

        _, d_prim = primary_ray_grid(cam0, W, H, 30.0)
        hits = [row1(si, 3) > 0.5 for si in range(S)]
        any_miss = ~functools.reduce(jnp.logical_and, hits)
        e_p = dr.masked_env(
            env, d_prim.reshape(-1, 3), any_miss, env_kind, **block_kw
        )
        base = None
        for si in range(S):
            part = rows3(si, 0) + jnp.where(hits[si][:, None], 0.0, e_p)
            base = part if base is None else base + part

        if mode.startswith("stacked"):
            dirs = jnp.concatenate(
                [rows3(si, r0) for si in range(S) for r0 in (4, 10)], axis=0
            )
            wts = jnp.concatenate(
                [rows3(si, r0) for si in range(S) for r0 in (7, 13)], axis=0
            )
            es = dr.weighted_env(env, dirs, wts, env_kind, **block_kw)
            total = base + jnp.sum(es.reshape(2 * S, n, 3), axis=0)
        else:
            total = base
            for si in range(S):
                total = (
                    total
                    + dr.weighted_env(
                        env, rows3(si, 4), rows3(si, 7), env_kind, **block_kw
                    )
                    + dr.weighted_env(
                        env, rows3(si, 10), rows3(si, 13), env_kind,
                        **block_kw
                    )
                )
        return total.reshape(H, W, 3)

    # ---- stage: full (shipped) --------------------------------------------
    imgs = {}
    if "full" in stages:
        full_fn = jax.jit(
            lambda sc, c: fsp._fused_progressive_deferred_impl.__wrapped__(
                sc, options, c, W, H, env_kind, INTERPRET, tile_r, block_w,
                None, 0, cluster_rows,
            )
        )
        t0 = time.perf_counter()
        imgs["full"] = full_fn(scene, stacked_cams)
        fence(imgs["full"])
        print(f"[compile full] {time.perf_counter() - t0:.1f}s", flush=True)
        t = best_of(lambda: full_fn(scene, stacked_cams)) / S
        RESULTS["full_ms_per_sample"] = round(t * 1e3, 2)
        print(f"[full] {t*1e3:7.2f} ms/sample ({1.0/t:5.2f} spp/s)",
              flush=True)

    # ---- stage: kernel only ------------------------------------------------
    out_inv = None
    if "kernel" in stages or "resolve" in stages or "micros" in stages \
            or "stacked" in stages or "block" in stages:
        disp_fn = jax.jit(lambda sc, c: dispatch(sc, c)[0])
        t0 = time.perf_counter()
        out_dev = disp_fn(scene, stacked_cams)
        fence(out_dev)
        print(f"[compile kernel] {time.perf_counter() - t0:.1f}s", flush=True)
        out_inv = out_dev
    if "kernel" in stages:
        t = best_of(lambda: disp_fn(scene, stacked_cams)) / S
        RESULTS["kernel_ms_per_sample"] = round(t * 1e3, 2)
        print(f"[kernel] {t*1e3:7.2f} ms/sample", flush=True)

    # default knobs use raster slabs (block_w=0) -> no pixel permutation;
    # _unperm(x, None) is a plain transpose (see _fused_dispatch's perm
    # selection). The combine variants below rely on that.
    assert block_w == 0, "set FUSED_BLOCK_W=0 for this anatomy"
    inv = None

    # ---- stage: resolve variants -------------------------------------------
    def run_combine(mode, key, block_b=None, caps=None):
        """Each variant is fenced + try/excepted: a compiler failure on one
        arm (observed: HTTP 500 on the 2S-stacked block-compacted graph)
        must not abort the remaining arms or the micros."""
        import traceback

        try:
            fn = jax.jit(
                lambda e, o: combine(e, o, inv, mode, block_b, caps)
            )
            t0 = time.perf_counter()
            img = fn(env, out_inv)
            fence(img)
            print(f"[compile {key}] {time.perf_counter() - t0:.1f}s",
                  flush=True)
            imgs[key] = img
            t = best_of(lambda: fn(env, out_inv)) / S
            RESULTS[f"{key}_ms_per_sample"] = round(t * 1e3, 2)
            print(f"[{key}] {t*1e3:7.2f} ms/sample", flush=True)
        except Exception:
            print(f"[{key}] FAILED:", flush=True)
            traceback.print_exc()

    if "resolve" in stages:
        run_combine("ship", "resolve_ship")
    if "stacked" in stages:
        run_combine("stacked", "resolve_stacked")
    if "block" in stages:
        run_combine("block", "resolve_block")
        run_combine("stacked_block", "resolve_stacked_block")
    if "blocksweep" in stages:
        # B x caps sweep of the block-compacted combine: smaller blocks
        # track a scattered need mask tighter (lower gathered-row count)
        # at more index/bookkeeping rows — find the knee. C3_BLOCK_SWEEP
        # overrides with "B:caps;B:caps" specs (caps |-separated), e.g.
        # "128:0.25|0.7;256:0.75" — the first sweep showed diffuse block
        # need 0.6-0.8 ABOVE the default 0.5 top tier (diffuse fell back
        # to full width in every arm), so tier choice is the lever.
        spec = _os.environ.get("C3_BLOCK_SWEEP", "")
        if spec:
            for part in spec.split(";"):
                bs, capcsv = part.split(":")
                caps = tuple(float(c) for c in capcsv.split("|"))
                tag = f"b{bs}c" + "_".join(str(c) for c in caps)
                run_combine(
                    "block", f"resolve_block_{tag}",
                    block_b=int(bs), caps=caps,
                )
        else:
            for bb in (128, 256, 512, 1024, 2048):
                run_combine("block", f"resolve_block_b{bb}", block_b=bb)

    # parity across combine variants (identical gathered values)
    ref_key = "resolve_ship" if "resolve_ship" in imgs else None
    if ref_key:
        ref = np.asarray(imgs[ref_key])
        for k, v in imgs.items():
            if k in (ref_key, "full"):
                continue
            d = np.abs(np.asarray(v) - ref)
            rel = d / np.maximum(np.abs(ref), 1e-3)
            print(f"[parity {k} vs {ref_key}] max_abs {d.max():.2e} "
                  f"max_rel {rel.max():.2e}", flush=True)

    # ---- stage: micros + need fractions -------------------------------------
    if "micros" in stages:
        rows = np.asarray(out_inv[:16])
        w_diff = np.asarray(
            fsp._unperm(out_inv[7:10], inv)
        )
        need_row = np.any(w_diff != 0.0, axis=1)
        w_spec = np.asarray(fsp._unperm(out_inv[13:16], inv))
        nr_s = np.any(w_spec != 0.0, axis=1)
        RESULTS["need_frac_row_diffuse"] = round(float(need_row.mean()), 4)
        RESULTS["need_frac_row_spec"] = round(float(nr_s.mean()), 4)
        print(f"[need fractions] diffuse row {need_row.mean():.3f} "
              f"spec row {nr_s.mean():.3f}", flush=True)
        for bb in (16, 32, 64, 128, 256, 512, 1024):
            nb = n // bb
            nd = np.any(need_row[: nb * bb].reshape(nb, bb), axis=1).mean()
            ns = np.any(nr_s[: nb * bb].reshape(nb, bb), axis=1).mean()
            RESULTS[f"need_frac_b{bb}_diffuse"] = round(float(nd), 4)
            RESULTS[f"need_frac_b{bb}_spec"] = round(float(ns), 4)
            print(f"[need B={bb:5d}] diffuse {nd:.3f} spec {ns:.3f}",
                  flush=True)

        dirs = jnp.asarray(
            np.asarray(fsp._unperm(out_inv[4:7], inv), np.float32)
        )
        wts = jnp.asarray(w_diff)
        we = jax.jit(
            lambda e, d, w: dr.weighted_env(
                e, d, w, env_kind, enabled=False
            )
        )
        fence(we(env, dirs, wts))
        t = best_of(lambda: we(env, dirs, wts))
        RESULTS["weighted_env_full_ms"] = round(t * 1e3, 2)
        print(f"[micro weighted_env {n} rows] {t*1e3:7.2f} ms", flush=True)

        unp = jax.jit(
            lambda o: sum(
                jnp.sum(fsp._unperm(o[16 * si + 4: 16 * si + 7], inv))
                for si in range(S)
            )
        )
        fence(unp(out_inv))
        t = best_of(lambda: unp(out_inv))
        RESULTS["unperm_8x3rows_ms"] = round(t * 1e3, 2)
        print(f"[micro unperm 8x3rows] {t*1e3:7.2f} ms", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
