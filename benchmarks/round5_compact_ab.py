"""Block-compaction full-frame A/B (round 5): DXR_COMPACT=0 (shipped
full-width resolves) vs DXR_COMPACT=block (ops/deferred_resolve block mode)
on every gather-bound BASELINE config, ONE TPU process.

The per-row compaction measured NEGATIVE in round 4 (index build over N +
scatter-back > skipped rows). Block mode moves every per-row cost to
per-block (any() need reduction, N/B index build, wide-row gathers for
compaction and re-expansion, no scatter) — the only full-price gathers left
run on the compacted rows. This script measures whether that flips the
round-4 verdict at the frame level.

Arms are traced through the impls' ``__wrapped__`` in a fresh outer jit
with the knob env var set per arm (the impls read _knobs() at TRACE time;
re-jitting the wrapper with identical static args would silently reuse arm
1's constants — CLAUDE.md module-global A/B rule).

Configs:
  c2   config 2 as written (OBJ+FBX multi-mesh, checker albedo texture,
       area light, cathedral cubemap), FT tex-deferred, 512^2 S=8 —
       5 gathers/sample (3 albedo + 2 env).
  c3   config 3 (cornell-glossy + 8K HDR latlong), brute env-deferred,
       1080p S=8 — 2 env gathers/sample + shared primary-miss env.
  sus  susanne + cathedral cubemap, FT env-deferred, 512^2 S=16.

Parity per config: block arm vs off arm allclose (same gathered values;
last-ulp fusion tolerance).

Usage: python benchmarks/round5_compact_ab.py [configs] [caps]
  configs: comma list of {c2,c3,sus} (default all)
  caps:    DXR_COMPACT_CAPS for the block arm (default "0.25,0.5,0.75")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CUBE_ENV = "cubemap:/root/reference/assets/textures/CathedralRadiance.dds"
HDR_ENV = (
    "latlong:/root/reference/assets/textures/"
    "HdrStudioProductNightStyx001_JPG_8K.jpg"
)
RESULTS: dict[str, float] = {}
INTERPRET = os.environ.get("R5AB_INTERPRET", "0") == "1"  # CPU smoke
SCALE = int(os.environ.get("R5AB_SCALE", "1"))  # divide sizes for smoke


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


def _setup(scene_tag, env_uri, width, height, s_count, accel):
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params

    sc, cam = build_scene(scene_tag)
    if env_uri is not None:
        sc.environment = parse_env(env_uri)
    cam.set_aspect(width, height)
    scene = jax.device_put(sc.build(accel=accel))
    cams = [
        camera_params(cam, jitter=(0.0008 * i, -0.0005 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.device_put(jax.tree.map(lambda *x: jnp.stack(x), *cams))
    return scene, stacked, int(scene["env"]["kind"])


def run_config(key, build_arm, s_count, caps):
    """build_arm() -> jitted frame fn (reads DXR_COMPACT at trace time).

    Scene rides as a jit ARG inside build_arm (matching the production
    @jax.jit deferred impls) — closing over the 8K HDR env bakes >100 MB
    of constants into the compile request and the tunnel 413s."""
    import numpy as np

    imgs = {}
    for arm, knob in (("off", "0"), ("block", "block")):
        os.environ["DXR_COMPACT"] = knob
        os.environ["DXR_COMPACT_CAPS"] = caps
        fn = build_arm()
        t0 = time.perf_counter()
        imgs[arm] = fn()
        fence(imgs[arm])
        print(f"[compile {key}/{arm}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(fn) / s_count
        RESULTS[f"{key}_{arm}_ms_per_sample"] = round(t * 1e3, 2)
        print(f"[{key} {arm}] {t*1e3:7.2f} ms/sample ({1.0/t:6.2f} spp/s)",
              flush=True)
    os.environ["DXR_COMPACT"] = "0"
    a, b = (np.asarray(imgs[k]) for k in ("off", "block"))
    d = np.abs(a - b)
    rel = d / np.maximum(np.abs(a), 1e-3)
    print(f"[{key} parity] max_abs {d.max():.2e} max_rel {rel.max():.2e}",
          flush=True)
    RESULTS[f"{key}_parity_max_rel"] = float(rel.max())


def main() -> None:
    import jax
    import jax.numpy as jnp

    configs = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1
        else {"c2", "c3", "sus"}
    )
    caps = sys.argv[2] if len(sys.argv) > 2 else "0.25,0.5,0.75"

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    if "c2" in configs:
        from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
        from dxrexperiments_tpu.trace.integrator import default_options

        scene, stacked, ek = _setup("config2", None, 512 // SCALE, 512 // SCALE, 8, "bvh")
        options = jax.device_put(default_options())
        tile_r, block_w, half_gate = ftp._ft_knobs()

        def build_c2():
            f = jax.jit(
                lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
                    sc, options, c, 512 // SCALE, 512 // SCALE, ek, INTERPRET, tile_r,
                    block_w, None, 0, half_gate,
                )
            )
            return lambda: f(scene, stacked)

        run_config("config2", build_c2, 8, caps)

    if "c3" in configs:
        from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
        from dxrexperiments_tpu.trace.integrator import default_options

        scene, stacked, ek = _setup(
            "cornell-glossy", HDR_ENV, 1920 // SCALE, 1080 // SCALE, 8, "auto"
        )
        options = jax.device_put(default_options())
        tile_r, block_w, cl = fsp._env_knobs(int(scene["mt_pack"].shape[1]))

        def build_c3():
            f = jax.jit(
                lambda sc, c: fsp._fused_progressive_deferred_impl.__wrapped__(
                    sc, options, c, 1920 // SCALE, 1080 // SCALE, ek, INTERPRET, tile_r,
                    block_w, None, 0, cl,
                )
            )
            return lambda: f(scene, stacked)

        run_config("config3_hdr1080p", build_c3, 8, caps)

    if "sus" in configs:
        from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
        from dxrexperiments_tpu.trace.integrator import default_options

        scene, stacked, ek = _setup(
            "/root/reference/assets/models/susanne.obj", CUBE_ENV,
            512 // SCALE, 512 // SCALE, 16, "bvh",
        )
        options = jax.device_put(default_options())

        tile_r, block_w, half_gate = ftp._ft_knobs()

        def build_sus():
            f = jax.jit(
                lambda sc, c: ftp._ft_progressive_deferred_impl.__wrapped__(
                    sc, options, c, 512 // SCALE, 512 // SCALE, ek, INTERPRET, tile_r,
                    block_w, None, 0, half_gate,
                )
            )
            return lambda: f(scene, stacked)

        run_config("susanne_cubemap", build_sus, 16, caps)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
