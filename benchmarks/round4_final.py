"""Round-4 end-of-round secondaries refresh: every BASELINE config fresh,
in ONE TPU process (back-to-back short processes wedge the tunnel,
CLAUDE.md), at the final round-4 commit. The numbers printed here update
bench.py's SECONDARY_RECORDED / HEADLINE_RECORDED_MRAYS (recorded_at
"round4/final") — update BOTH when re-running.

Stages (comma list as argv[1], default all):
  1. config 1 headline: Cornell 512^2 progressive, S=16 x 8 dispatches
     (the exact bench.py protocol).
  2. susanne fused + susanne+cubemap FT-deferred (512^2, S=16).
  3. config 2 as written (textures + area light), FT fused, 512^2 S=8.
  4. config 3: cornell-glossy + 8K HDR latlong, 1080p, brute env-deferred
     production route (S=8).
  5. config 4: realtime 1 spp + denoise at 1080p, production per-frame
     async loop.
  6. config 5: 983k-tri instanced frame, one progressive sample at 512^2,
     flattened AND two-level (scene as jit arg: the flat pack exceeds the
     ~100 MB compile-request constant limit).
  7. traversal micros: 262k camera rays / 200k-tri SAH soup fat-kernel
     closest, and the octant+morton-sorted incoherent variant (sort
     INCLUDED in the timing, as recorded in round 3).

Reference anchor for the telemetry convention: w*h*fps primary MRays/s
(/root/reference/src/utils/DXSample.cpp:100-123).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

CUBE_ENV = "cubemap:/root/reference/assets/textures/CathedralRadiance.dds"
HDR_ENV = (
    "latlong:/root/reference/assets/textures/"
    "HdrStudioProductNightStyx001_JPG_8K.jpg"
)

RESULTS: dict[str, float] = {}


def fence(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


def warmup():
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)


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


def stage1_headline():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.models.progressive import make_progressive_step

    W = H = 512
    SPD, DISP = 16, 8
    scene, options, cams, accum0 = _cornell_setup(W, H, 1)
    scene = jax.device_put(scene)
    accum0 = jax.device_put(accum0)
    lights, env = scene["lights"], scene["env"]
    mi = jnp.asarray(1 << 30, jnp.int32)
    step = make_progressive_step(scene, W, H, samples_per_step=SPD)
    rng = np.random.default_rng(0)
    frames = []
    for f in range(DISP):
        cs = []
        for k in range(SPD):
            c = dict(cams[0])
            c["jitter"] = jnp.asarray(
                [(rng.random() - 0.5) / W, (rng.random() - 0.5) / H],
                jnp.float32,
            )
            c["frame_count"] = jnp.asarray(f * SPD + k, jnp.uint32)
            c["accum_count"] = jnp.asarray(float(f * SPD), jnp.float32)
            cs.append(c)
        frames.append(
            jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *cs))
        )
    accum = accum0
    t0 = time.perf_counter()
    for f in range(2):
        accum = step(accum, options, frames[f], lights, env, mi)
    fence(accum)
    print(f"[s1 compile] {time.perf_counter() - t0:.1f}s", flush=True)
    dt = float("inf")
    for _ in range(3):
        accum = accum0
        t0 = time.perf_counter()
        for f in range(DISP):
            accum = step(accum, options, frames[f], lights, env, mi)
        fence(accum)
        dt = min(dt, time.perf_counter() - t0)
    mrays = W * H * DISP * SPD / dt / 1e6
    RESULTS["headline_mrays"] = round(mrays, 2)
    print(f"[s1 headline config1] {mrays:6.1f} Mrays/s", flush=True)


def _fused_spp(scene_tag, env_uri, s_count, width, key):
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    height = width
    sc, cam = build_scene(scene_tag)
    if env_uri is not None:
        sc.environment = parse_env(env_uri)
    cam.set_aspect(width, height)
    scene = jax.device_put(sc.build(accel="bvh"))
    env_kind = int(scene["env"]["kind"])
    options = jax.device_put(default_options())
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.device_put(jax.tree.map(lambda *x: jnp.stack(x), *cams))

    def run():
        return ftp.fused_traverse_progressive_sum(
            scene, options, stacked, width, height, env_kind
        )

    t0 = time.perf_counter()
    fence(run())
    print(f"[compile {key}] {time.perf_counter() - t0:.1f}s", flush=True)
    t = best_of(run) / s_count
    RESULTS[key] = round(t * 1e3, 2)
    print(f"[{key}] {t*1e3:7.2f} ms/sample ({1.0/t:6.2f} spp/s)", flush=True)


def stage2_susanne():
    _fused_spp(
        "/root/reference/assets/models/susanne.obj", None, 16, 512,
        "susanne_fused_512_ms_per_sample",
    )
    _fused_spp(
        "/root/reference/assets/models/susanne.obj", CUBE_ENV, 16, 512,
        "susanne_cubemap_512_ms_per_sample",
    )


def stage3_config2():
    _fused_spp("config2", None, 8, 512, "config2_ms_per_sample")
    if "config2_ms_per_sample" in RESULTS:
        RESULTS["config2_as_written_512_spp_per_sec"] = round(
            1e3 / RESULTS.pop("config2_ms_per_sample"), 2
        )


def stage4_config3():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.models.progressive import make_progressive_step
    from dxrexperiments_tpu.trace.integrator import default_options

    width, height = 1920, 1080
    s_count = 8
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(HDR_ENV)
    cam.set_aspect(width, height)
    options = jax.device_put(default_options())
    mi = jnp.asarray(1 << 20, jnp.int32)
    cams = [
        camera_params(cam, jitter=(0.0008 * i, -0.0005 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    stacked["accum_count"] = jnp.arange(s_count, dtype=jnp.float32)
    stacked = jax.device_put(stacked)
    accum = jax.device_put(jnp.zeros((height, width, 3), jnp.float32))
    scene = jax.device_put(sc.build(accel="auto"))
    step = make_progressive_step(scene, width, height, samples_per_step=s_count)

    def run():
        return step(accum, options, stacked, scene["lights"], scene["env"], mi)

    t0 = time.perf_counter()
    fence(run())
    print(f"[s4 compile] {time.perf_counter() - t0:.1f}s", flush=True)
    t = best_of(run, reps=2) / s_count
    RESULTS["hdr_env_1080p_spp_per_sec"] = round(1.0 / t, 2)
    print(f"[s4 config3 hdr-1080p] {t*1e3:7.2f} ms/sample "
          f"({1.0/t:5.2f} spp/s)", flush=True)


def stage5_realtime():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.models.denoise import (
        default_denoise_params,
        denoise_composite,
    )
    from dxrexperiments_tpu.models.realtime import RealtimeRaytracingPipeline

    W, H = 1920, 1080
    scene, cam = build_scene("cornell-glossy")
    cam.set_aspect(W, H)
    pipe = RealtimeRaytracingPipeline(W, H, seed=0)
    pipe.set_camera(cam)
    pipe.set_scene(scene)
    den_params = jax.device_put(default_denoise_params())
    pipe.update(0.0, 0)
    d, s = pipe.render()
    out = denoise_composite(d, s, den_params)
    fence(out)
    print("[s5 compiled]", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        N = 8
        for f in range(N):
            pipe.update(0.0, f)
            d, s = pipe.render()
            out = denoise_composite(d, s, den_params)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / N)
    RESULTS["realtime_denoise_1080p_fps"] = round(1.0 / best, 1)
    print(f"[s5 config4 realtime+denoise 1080p] {best*1e3:6.2f} ms/frame "
          f"({1.0/best:5.1f} fps)", flush=True)


def stage6_instanced():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.trace.integrator import (
        default_options,
        render_sample,
    )

    k, w, h = 32, 512, 512
    sc, cam = build_scene(f"instanced:{k}")
    cam.set_aspect(w, h)
    opts = jax.device_put(default_options())
    camp = jax.device_put(camera_params(cam))

    for tag, cache_tag, key in (
        ("flat", "", "instanced_983k_512_flattened_ms"),
        ("two-level", "_two-level", "instanced_983k_512_two_level_ms"),
    ):
        cache = f"/tmp/instanced_frame_{k}{cache_tag}.npy"
        if os.path.exists(cache):
            data = np.load(cache, allow_pickle=True).item()
        else:
            data = (
                sc.build_two_level() if tag == "two-level"
                else sc.build(accel="auto")
            )
            np.save(cache, jax.tree.map(np.asarray, data))
        scene = jax.device_put(data)
        env_kind = int(scene["env"]["kind"])
        full = jax.jit(
            lambda s, c, ek=env_kind: render_sample(
                s, opts, c, w, h, mode="progressive", impl="pallas",
                env_kind=ek,
            )["color"]
        )
        t0 = time.perf_counter()
        fence(full(scene, camp))
        print(f"[s6 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(lambda: full(scene, camp), reps=1)
        RESULTS[key] = round(t * 1e3, 1)
        print(f"[s6 instanced {tag}] {t*1e3:7.1f} ms/frame", flush=True)


def stage7_micros():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.accel import bvh as bvh_mod
    from dxrexperiments_tpu.ops import traverse_pallas
    from dxrexperiments_tpu.scene import Scene
    from dxrexperiments_tpu.scene.procedural import random_triangle_soup

    n_tris, n_rays, leaf = 200_000, 512 * 512, 32
    mesh = random_triangle_soup(n_tris, seed=2, extent=10.0)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build(accel="none")
    v0, e1, e2 = (np.asarray(data[kk]) for kk in ("v0", "e1", "e2"))
    nodes = bvh_mod.build_bvh_sah(v0, e1, e2, int(data["num_tris"]), leaf)
    if nodes is None:
        nodes = bvh_mod.to_node_arrays(
            bvh_mod.build_bvh(v0, e1, e2, int(data["num_tris"]), leaf)
        )
    packed = jax.device_put(
        traverse_pallas.pack_for_traversal(nodes, data, leaf)
    )

    # camera blocked rays (the recorded 30.0 ms protocol)
    eye = np.array([0.0, 0.0, 28.0], np.float32)
    side = int(np.sqrt(n_rays))
    ys, xs = np.meshgrid(
        np.linspace(-0.45, 0.45, side, dtype=np.float32),
        np.linspace(-0.45, 0.45, side, dtype=np.float32),
        indexing="ij",
    )
    d = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = (
        d.reshape(side // 32, 32, side // 64, 64, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 3)
    )
    o = np.broadcast_to(eye, (n_rays, 3)).copy()
    oj, dj = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

    def cam_run():
        return traverse_pallas.traverse_fat_closest(
            packed, oj, dj, t_min=1e-4, leaf_size=leaf
        )

    fence(cam_run()["t"])
    t = best_of(lambda: cam_run()["t"], reps=2)
    RESULTS["closest_262k_rays_200k_tris_ms"] = round(t * 1e3, 1)
    print(f"[s7 camera closest] {t*1e3:6.1f} ms", flush=True)

    # incoherent + octant-major/morton host sort, sort INCLUDED
    rs = np.random.default_rng(0)
    o2 = rs.uniform(-14, 14, size=(n_rays, 3)).astype(np.float32)
    d2 = (-o2 + rs.normal(scale=2.0, size=(n_rays, 3))).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)

    def sort_order(oo, dd):
        lo = jnp.min(oo, axis=0)
        hi = jnp.max(oo, axis=0)
        q = jnp.clip((oo - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = jnp.minimum((q * 16.0).astype(jnp.int32), 15)

        def part(x):
            x = (x | (x << 4)) & 0x0F0F
            x = (x | (x << 2)) & 0x3333
            x = (x | (x << 1)) & 0x5555
            return x

        morton = (
            (part(cell[:, 0]) << 2)
            | (part(cell[:, 1]) << 1)
            | part(cell[:, 2])
        )
        octant = (
            (dd[:, 0] < 0).astype(jnp.int32) * 4
            + (dd[:, 1] < 0).astype(jnp.int32) * 2
            + (dd[:, 2] < 0).astype(jnp.int32)
        )
        return jnp.argsort((octant << 12) | morton, stable=True)

    @jax.jit
    def inc_sorted(oo, dd):
        order = sort_order(oo, dd)
        hits = traverse_pallas.traverse_fat_closest(
            packed, oo[order], dd[order], t_min=1e-4, leaf_size=leaf
        )
        return jnp.zeros_like(hits["t"]).at[order].set(hits["t"])

    fence(inc_sorted(o2j, d2j))
    t = best_of(lambda: inc_sorted(o2j, d2j), reps=1)
    RESULTS["incoherent_262k_200k_sorted_ms"] = round(t * 1e3, 1)
    print(f"[s7 incoherent sorted closest] {t*1e3:6.1f} ms", flush=True)


def stage8_realtime_env_routing():
    """Realtime texture-env routing A/B (round-4 realtime env-deferred):
    cornell + cubemap at 512^2, brute env-deferred (new production route
    for <=256-tri scenes) vs FT env-deferred (the old route)."""
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene, parse_env
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    w = h = 512
    sc, cam = build_scene("cornell-glossy")
    sc.environment = parse_env(CUBE_ENV)
    cam.set_aspect(w, h)
    scene = jax.device_put(sc.build(accel="auto"))
    assert fsp.supports_fused(scene, "realtime", False)
    ek = int(scene["env"]["kind"])
    options = jax.device_put(default_options())
    camp = jax.device_put(camera_params(cam, jitter=(0.001, -0.0007),
                                        frame_count=3))

    arms = {
        "brute-deferred (new)": jax.jit(
            lambda: fsp.fused_realtime_outputs(
                scene, options, camp, w, h, ek
            )["color"]
        ),
    }
    if ftp.supports_fused_traverse(scene, "realtime", False):
        arms["FT-deferred (old)"] = jax.jit(
            lambda: ftp.fused_traverse_realtime_outputs(
                scene, options, camp, w, h, ek
            )["color"]
        )
    imgs = {}
    for tag, fn in arms.items():
        t0 = time.perf_counter()
        imgs[tag] = fn()
        fence(imgs[tag])
        print(f"[s8 compile {tag}] {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = best_of(fn)
        if "new" in tag:
            RESULTS["realtime_cubemap_512_ms_per_frame"] = round(t * 1e3, 2)
        print(f"[s8 rt cornell+cubemap {tag}] {t*1e3:7.2f} ms/frame "
              f"({1.0/t:6.1f} fps)", flush=True)
    if len(imgs) == 2:
        vals = list(imgs.values())
        import numpy as np

        d = np.abs(np.asarray(vals[0]) - np.asarray(vals[1]))
        print(f"[s8 parity] median {np.median(d):.2e} "
              f"p99.9 {np.quantile(d, 0.999):.2e}", flush=True)


def main() -> None:
    stages = (
        {int(s) for s in sys.argv[1].split(",")}
        if len(sys.argv) > 1
        else {1, 2, 3, 4, 5, 6, 7, 8}
    )
    t_all = time.perf_counter()
    warmup()
    for num, fn in (
        (1, stage1_headline),
        (2, stage2_susanne),
        (3, stage3_config2),
        (4, stage4_config3),
        (5, stage5_realtime),
        (6, stage6_instanced),
        (7, stage7_micros),
        (8, stage8_realtime_env_routing),
    ):
        if num not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {num}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch done] {time.perf_counter() - t_all:.1f}s", flush=True)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
