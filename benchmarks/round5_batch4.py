"""Round-5 batch 4 (ONE TPU process): tune + land the config-3 block
default, and pin config-2's composition residual.

  c3sweep2  config3_anatomy blocksweep with tiers that ADMIT the diffuse
            block-need (batch 3: need_b 0.60 @B=128 sat ABOVE the 0.5 top
            tier, so diffuse silently rode the full-width path in every
            arm; the 104 -> 83 win was spec + primary-miss only).
  c3prod    config 3 through the PRODUCTION make_progressive_step — now
            picks up dr.default_resolve_kwargs (block, B=128, caps
            .25/.7) at 1080p. Parity vs DXR_COMPACT=0 production arm.
  c2combine config-2 ship combine on the kernel's out rows as a jit ARG —
            batch-3 components (unperm 3.1 + albedo 5.6 + env 5.7 =
            14.4 ms/sample) don't add up to full-minus-kernel (~53); this
            arm decides combine-cost vs kernel/combine-composition.

Usage: python benchmarks/round5_batch4.py [stages]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

RESULTS: dict[str, float] = {}


def stage_c3sweep2():
    os.environ["C3_BLOCK_SWEEP"] = (
        "128:0.7;128:0.25|0.7;128:0.85;256:0.75;512:0.85;"
        # smaller blocks track the scattered diffuse-miss mask tighter
        # (row need 0.158 vs block need 0.60 @B=128); the lower tier
        # stays small so spec/prim-miss (need_b <= 0.13) ride it while
        # diffuse takes the top tier
        "64:0.25|0.65;32:0.2|0.6;16:0.2|0.55"
    )
    import config3_anatomy

    sys.argv = ["config3_anatomy", "kernel,blocksweep,micros"]
    config3_anatomy.main()
    RESULTS.update({f"c3_{k}": v for k, v in config3_anatomy.RESULTS.items()})


def stage_c3prod():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import round4_final as r4

    os.environ.pop("DXR_COMPACT", None)  # the default engages only if unset
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

    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    outs = {}
    for arm, env_val in (("block_default", None), ("off", "0")):
        if env_val is None:
            os.environ.pop("DXR_COMPACT", None)
        else:
            os.environ["DXR_COMPACT"] = env_val
        # the deferred impl is itself @jax.jit: same shapes would silently
        # reuse arm 1's traced knob constants (CLAUDE.md A/B rule) — drop
        # its cache so each arm re-reads the env at trace time
        fsp._fused_progressive_deferred_impl.clear_cache()
        step = prog.make_progressive_step(
            scene, width, height, samples_per_step=S
        )
        t0 = time.perf_counter()
        out = step(accum, options, stacked, scene["lights"], scene["env"], mi)
        float(jnp.sum(out))
        print(f"[c3prod compile {arm}] {time.perf_counter() - t0:.1f}s",
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
        RESULTS[f"c3prod_{arm}_ms_per_sample"] = round(best / S * 1e3, 2)
        print(f"[c3prod {arm}] {best/S*1e3:7.2f} ms/sample "
              f"({S/best:5.2f} spp/s)", flush=True)
    os.environ.pop("DXR_COMPACT", None)
    d = np.abs(np.asarray(outs["block_default"]) - np.asarray(outs["off"]))
    RESULTS["c3prod_parity_max_abs"] = float(d.max())
    print(f"[c3prod parity] max_abs {d.max():.2e}", flush=True)


def stage_c2combine():
    import jax
    import jax.numpy as jnp

    import round5_compact_ab as ab
    from dxrexperiments_tpu.core.camera import primary_ray_grid
    from dxrexperiments_tpu.ops import deferred_resolve as dr
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    os.environ.pop("DXR_COMPACT", None)
    scene, stacked, ek = ab._setup("config2", None, 512, 512, 8, "bvh")
    options = jax.device_put(default_options())
    tile_r, block_w, half_gate = ftp._ft_knobs()
    S, W, H = 8, 512, 512
    s_rows = ftp.TEX_ROWS

    disp = jax.jit(
        lambda sc, c: ftp._ft_dispatch(
            sc, options, c, W, H, ek, False, tile_r=tile_r,
            block_w=block_w, env_deferred=False, tex_deferred=True,
            half_gate=half_gate,
        )[0]
    )
    out = jax.device_put(jax.block_until_ready(disp(scene, stacked)))
    cam0 = jax.device_put(
        jax.tree.map(lambda x: x[0], stacked)
    )
    print("[c2combine] kernel out ready", flush=True)

    # The production dispatch uses 32x32 pixel blocks at 512^2, so the
    # combine's _unperm is a STATIC-index gather by inv — reconstruct the
    # same inv (fused_traverse_pallas._ft_dispatch block-perm logic) so the
    # mirrored combine pays exactly what the production one does.
    import numpy as np

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
        inv[perm] = np.arange(W * H, dtype=np.int64)
        inv = inv.astype(np.int32)

    def combine(sc, o, c0):
        """Mirror of _ft_progressive_deferred_impl's tex combine
        (fused_traverse_pallas.py) on precomputed out rows."""
        env = sc["env"]

        def rows3_at(base, r0):
            return ftp._unperm(o[base + r0: base + r0 + 3], inv)

        def row1_at(base, r0):
            return ftp._unperm(o[base + r0: base + r0 + 1], inv)[:, 0]

        _, d_prim = primary_ray_grid(c0, W, H, 30.0)
        hits = [row1_at(s_rows * si, 3) > 0.5 for si in range(S)]
        any_miss = ~functools.reduce(jnp.logical_and, hits)
        e_p = dr.masked_env(env, d_prim.reshape(-1, 3), any_miss, ek)

        def nz(x):
            return jnp.any(x != 0.0, axis=-1)

        total = None
        for si in range(S):
            base = s_rows * si
            rows3 = functools.partial(rows3_at, base)
            row1 = functools.partial(row1_at, base)
            hit = hits[si]
            w_d, w_s = rows3(7), rows3(13)
            e_d_term = dr.weighted_env(env, rows3(4), w_d, ek)
            e_s_term = dr.weighted_env(env, rows3(10), w_s, ek)

            def tex_at(uv_row, mid_row, need):
                uv = jnp.stack([row1(uv_row), row1(uv_row + 1)], axis=-1)
                return dr.masked_albedo(
                    sc["textures"], uv, row1(mid_row), need
                )

            b_c, c_c, d_c = rows3(16), rows3(19), rows3(22)
            tex_p = tex_at(25, 27, nz(b_c) | nz(c_c) | nz(e_d_term))
            tex_d = tex_at(28, 30, nz(c_c))
            tex_s = tex_at(31, 33, nz(d_c))
            part = (
                rows3(0)
                + tex_p * b_c
                + tex_p * tex_d * c_c
                + tex_s * d_c
                + tex_p * e_d_term
                + e_s_term
                + jnp.where(hit[:, None], 0.0, e_p)
            )
            total = part if total is None else total + part
        return total.reshape(H, W, 3)

    fn = jax.jit(combine)
    t0 = time.perf_counter()
    img = fn(scene, out, cam0)
    ab.fence(img)
    print(f"[c2combine compile] {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ab.fence(fn(scene, out, cam0))
        best = min(best, time.perf_counter() - t0)
    RESULTS["c2_combine_on_arg_ms_per_sample"] = round(best / S * 1e3, 2)
    print(f"[c2 combine-on-arg] {best/S*1e3:7.2f} ms/sample", flush=True)

    # same-process full impl for the composition residual
    full = jax.jit(
        lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
            sc, options, c, W, H, ek, False, tile_r, block_w, None, 0,
            half_gate,
        )
    )
    ab.fence(full(scene, stacked))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ab.fence(full(scene, stacked))
        best = min(best, time.perf_counter() - t0)
    RESULTS["c2_full_ms_per_sample"] = round(best / S * 1e3, 2)
    print(f"[c2 full] {best/S*1e3:7.2f} ms/sample", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ab.fence(disp(scene, stacked))
        best = min(best, time.perf_counter() - t0)
    RESULTS["c2_kernel_ms_per_sample"] = round(best / S * 1e3, 2)
    print(f"[c2 kernel] {best/S*1e3:7.2f} ms/sample", flush=True)

    # split pipeline: kernel and combine as TWO chained jit programs (out
    # materialized in HBM between them) — the practical alternative if the
    # single-program composition is where the residual lives
    split_img = fn(scene, disp(scene, stacked), cam0)
    ab.fence(split_img)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ab.fence(fn(scene, disp(scene, stacked), cam0))
        best = min(best, time.perf_counter() - t0)
    RESULTS["c2_split_ms_per_sample"] = round(best / S * 1e3, 2)
    print(f"[c2 split kernel+combine] {best/S*1e3:7.2f} ms/sample",
          flush=True)

    import numpy as np

    d = np.abs(np.asarray(split_img) - np.asarray(full(scene, stacked)))
    RESULTS["c2_split_parity_max_abs"] = float(d.max())
    print(f"[c2 split parity vs full] max_abs {d.max():.2e}", flush=True)


def main() -> None:
    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"c3sweep2", "c3prod", "c2combine"}
    )
    import jax.numpy as jnp

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (
        ("c3sweep2", stage_c3sweep2),
        ("c3prod", stage_c3prod),
        ("c2combine", stage_c2combine),
    ):
        if name not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {name}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch4 done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
