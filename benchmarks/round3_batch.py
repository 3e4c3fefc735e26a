"""One-process batch of the round-3 TPU measurements.

The axon tunnel wedges under back-to-back short processes (CLAUDE.md), so
every pending measurement runs in THIS single process, each stage guarded
so one failure doesn't lose the rest:

  1. config2 (OBJ+FBX multi-mesh + checker albedo texture + area light +
     cubemap) through the fused traversal megakernel (tex-deferred) vs the
     wavefront path — BASELINE config 2 as written.
  2. susanne + gradient env through the fused traversal kernel with the
     SBVH (spatial-split) tree vs object-split-only — tree-quality A/B.
  3. 200k-soup camera micro: fat half_gate=2 on both trees, plus the
     grouped sub-packet kernels fatg2/fatg4/fatg8 (gating below the
     1024-lane Mosaic broadcast floor).

Usage: python benchmarks/round3_batch.py [stages] [--interpret]
  stages: e.g. "1,3". --interpret: tiny-shape interpret-mode smoke on CPU
  to validate the script itself without tunnel time.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv


def fence(x):
    """Honest tunnel fence: scalar readback of one leaf (pytrees ok)."""
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


def warmup():
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)


def best_of(fn, reps=4, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def stage1_config2():
    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import (
        default_options,
        render_sample,
    )

    s_count, width = (2, 64) if SMOKE else (8, 512)
    height = width
    sc, cam = build_scene("config2")
    cam.set_aspect(width, height)
    scene = sc.build(accel="bvh")
    env_kind = int(scene["env"]["kind"])
    assert ftp.supports_fused_traverse(scene, "progressive", False)
    options = default_options()
    cams = [
        camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
        for i in range(s_count)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    scene = jax.device_put(scene)
    stacked = jax.device_put(stacked)

    def fused():
        return ftp.fused_traverse_progressive_sum(
            scene, options, stacked, width, height, env_kind,
            interpret=SMOKE,
        )

    t0 = time.perf_counter()
    fence(fused())
    print(f"[config2 fused] compile {time.perf_counter() - t0:.1f}s",
          flush=True)
    fence(fused())
    best = best_of(fused)
    n = width * height
    print(
        f"[config2 fused] S={s_count} {width}x{height}: "
        f"{best/s_count*1e3:.2f} ms/sample ({1.0/(best/s_count):.1f} spp/s, "
        f"{n*s_count/best/1e6:.1f} Mrays/s primary)",
        flush=True,
    )

    cam0 = jax.device_put(cams[0])

    def wf():
        return render_sample(
            scene, options, cam0, width, height, mode="progressive",
            impl="pallas_interpret" if SMOKE else "pallas",
            env_kind=env_kind,
        )["color"]

    wf_jit = jax.jit(wf)
    fence(wf_jit())
    fence(wf_jit())
    best_wf = best_of(wf_jit)
    print(
        f"[config2 wavefront] {best_wf*1e3:.2f} ms/sample "
        f"({1.0/best_wf:.2f} spp/s; fused speedup "
        f"{best_wf/(best/s_count):.2f}x)",
        flush=True,
    )


def stage2_susanne_sbvh():
    """Susanne fused traversal: SBVH-vs-object-split A/B, then an FT_TILE
    sweep (1024/512/256) — sub-1024 tiles are the cheap form of finer leaf
    gating for the fused kernel (the grouped-layout redesign applies only
    if small tiles beat 1024 here)."""
    import os

    import jax
    import jax.numpy as jnp

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params
    from dxrexperiments_tpu.ops import fused_traverse_pallas as ftp
    from dxrexperiments_tpu.trace.integrator import default_options

    s_count, width = (2, 64) if SMOKE else (16, 512)
    height = width

    def measure(tag):
        sc, cam = build_scene("/root/reference/assets/models/susanne.obj")
        cam.set_aspect(width, height)
        scene = sc.build(accel="bvh")
        env_kind = int(scene["env"]["kind"])
        options = default_options()
        cams = [
            camera_params(cam, jitter=(0.001 * i, -0.0007 * i), frame_count=i)
            for i in range(s_count)
        ]
        stacked = jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        )
        scene = jax.device_put(scene)

        def fused():
            return ftp.fused_traverse_progressive_sum(
                scene, options, stacked, width, height, env_kind,
                interpret=SMOKE,
            )

        fence(fused())
        fence(fused())
        best = best_of(fused)
        n = width * height
        print(
            f"[susanne {tag}] S={s_count}: {best/s_count*1e3:.2f} ms/sample "
            f"({n*s_count/best/1e6:.1f} Mrays/s primary)",
            flush=True,
        )

    for spatial in (True, False):
        os.environ["SBVH_SPATIAL"] = "1" if spatial else "0"
        measure(f"sbvh={spatial}")
    os.environ.pop("SBVH_SPATIAL", None)
    for tile in (512, 256):
        os.environ["FT_TILE"] = str(tile)
        try:
            measure(f"tile={tile}")
        except Exception:
            print(f"[susanne tile={tile}] FAILED:", flush=True)
            traceback.print_exc()
    os.environ.pop("FT_TILE", None)


def stage3_soup_micro():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.accel import bvh as bvh_mod
    from dxrexperiments_tpu.ops import traverse_pallas
    from dxrexperiments_tpu.scene import Scene
    from dxrexperiments_tpu.scene.procedural import random_triangle_soup

    n_tris, leaf, n_rays = (3000, 32, 64 * 64) if SMOKE else (200_000, 32, 512 * 512)
    mesh = random_triangle_soup(n_tris, seed=2, extent=10.0)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build(accel="none")
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))

    eye = np.array([0.0, 0.0, 28.0], np.float32)
    side = int(np.sqrt(n_rays))
    ys, xs = np.meshgrid(
        np.linspace(-0.45, 0.45, side, dtype=np.float32),
        np.linspace(-0.45, 0.45, side, dtype=np.float32),
        indexing="ij",
    )
    d = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = (  # 64x32-pixel blocks: compact frustum packets
        d.reshape(side // 32, 32, side // 64, 64, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 3)
    )
    o = jnp.asarray(np.broadcast_to(eye, (n_rays, 3)).copy())
    d = jnp.asarray(d.astype(np.float32))

    for spatial in (True, False):
        nodes = bvh_mod.build_bvh_sah(
            v0, e1, e2, int(data["num_tris"]), leaf, spatial=spatial
        )
        packed = jax.device_put(
            traverse_pallas.pack_for_traversal(nodes, data, leaf)
        )
        refs = len(np.asarray(nodes["order"]))
        variants = (
            [("fat hg2", dict(half_gate=2)),
             ("fatg2", dict(group=2)),
             ("fatg4", dict(group=4)),
             ("fatg8", dict(group=8))]
            if spatial
            else [("fat hg2", dict(half_gate=2))]
        )
        for name, kw in variants:
            try:
                def run():
                    return traverse_pallas.traverse_fat_closest(
                        packed, o, d, t_min=1e-4, leaf_size=leaf,
                        interpret=SMOKE, **kw
                    )

                r = run()
                hits = float(jnp.mean(r["hit"].astype(jnp.float32)))
                fence(run()["t"])
                best = best_of(run)
                print(
                    f"[soup sbvh={spatial} {name}] {best*1e3:7.2f} ms "
                    f"({n_rays/best/1e6:6.1f} Mrays/s, refs {refs}, "
                    f"hit {hits:.3f})",
                    flush=True,
                )
            except Exception:
                print(f"[soup sbvh={spatial} {name}] FAILED:", flush=True)
                traceback.print_exc()


def stage4_incoherent_fatg():
    """Sub-packet gating where it should matter: INCOHERENT rays (octant-
    major sorted, sort included like the recorded 393 ms number). The
    coherent camera micro measured fatg flat — but per-leaf lane
    utilization there is already decent; after an octant sort the
    coherence lives at sub-tile granularity, exactly what group-level
    (tile/G-lane) liveness gating targets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.accel import bvh as bvh_mod
    from dxrexperiments_tpu.ops import traverse_pallas
    from dxrexperiments_tpu.scene import Scene
    from dxrexperiments_tpu.scene.procedural import random_triangle_soup
    from dxrexperiments_tpu.trace.integrator import _ray_sort_order

    n_tris, leaf, n_rays = (3000, 32, 64 * 64) if SMOKE else (200_000, 32, 512 * 512)
    mesh = random_triangle_soup(n_tris, seed=2, extent=10.0)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build(accel="none")
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))
    nodes = bvh_mod.build_bvh_sah(v0, e1, e2, int(data["num_tris"]), leaf)
    packed = jax.device_put(
        traverse_pallas.pack_for_traversal(nodes, data, leaf)
    )

    rs = np.random.default_rng(0)
    o_np = rs.uniform(-14, 14, size=(n_rays, 3)).astype(np.float32)
    d_np = (-o_np + rs.normal(scale=2.0, size=(n_rays, 3))).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    scene_like = {"bvh": {"bvh_nodes": packed["bvh_nodes"]}}

    for name, kw in (("hg2", dict(half_gate=2)),
                     ("fatg2", dict(group=2)),
                     ("fatg4", dict(group=4)),
                     ("fatg8", dict(group=8)),
                     ("fatg16", dict(group=16))):
        try:
            @jax.jit
            def run():
                order = _ray_sort_order(scene_like, o, d)
                r = traverse_pallas.traverse_fat_closest(
                    packed, o[order], d[order], t_min=1e-4,
                    leaf_size=leaf, interpret=SMOKE, **kw
                )
                inv = jnp.argsort(order)
                return {k: v[inv] for k, v in r.items()}

            r = run()
            hits = float(jnp.mean(r["hit"].astype(jnp.float32)))
            fence(run()["t"])
            best = best_of(run)
            print(
                f"[incoher-sorted {name}] {best*1e3:7.2f} ms "
                f"({n_rays/best/1e6:6.2f} Mrays/s, hit {hits:.3f})",
                flush=True,
            )
        except Exception:
            print(f"[incoher-sorted {name}] FAILED:", flush=True)
            traceback.print_exc()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stages = {int(s) for s in args[0].split(",")} if args else {1, 2, 3}
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    t0 = time.perf_counter()
    warmup()
    for num, fn in ((1, stage1_config2), (2, stage2_susanne_sbvh),
                    (3, stage3_soup_micro), (4, stage4_incoherent_fatg)):
        if num not in stages:
            continue
        try:
            fn()
        except Exception:
            print(f"[stage {num}] FAILED:", flush=True)
            traceback.print_exc()
    print(f"[batch done] {time.perf_counter() - t0:.1f}s total", flush=True)


if __name__ == "__main__":
    main()
