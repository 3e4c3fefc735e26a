"""Per-dispatch phase timing of one progressive sample on the instanced
scene: primary closest / direct-light occlusion / bounce closest / bounce
occlusion, each fenced separately — identifies which traversal dispatch owns
the frame time (BASELINE config 5 drill-down).

Round 4 (VERDICT r3 #4): runs BOTH the flattened and the two-level
TLAS/BLAS builds of the same scene through the same phases, attributing
the 16% two-level frame gap (727 vs 627 ms at K=32) to specific phases —
the kernel micro says the instance hierarchy costs only ~4% on coherent
rays, so the question is whether the extra cost sits in the incoherent
bounce stages or spreads uniformly. Reference anchor: TLAS refit semantics
(/root/reference/libs/DXRFramework/Helpers/TopLevelASGenerator.cpp:309+).

Usage: python benchmarks/frame_phases.py [K=32] [flat|two-level|both]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.core.camera import camera_params, primary_ray_grid
    from dxrexperiments_tpu.core import vecmath as vm
    from dxrexperiments_tpu.trace import integrator as I

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    w = h = 512
    sc, cam = build_scene(f"instanced:{k}")
    cam.set_aspect(w, h)

    import os

    def load(tag):
        cache = f"/tmp/instanced_frame_{k}_{tag}.npy"
        if os.path.exists(cache):
            data = np.load(cache, allow_pickle=True).item()
        else:
            data = (
                sc.build_two_level() if tag == "two-level"
                else sc.build(accel="auto")
            )
            np.save(cache, jax.tree.map(np.asarray, data))
        return jax.device_put(data)

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    camp = camera_params(cam)
    o, d = primary_ray_grid(camp, w, h, 30.0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    perm, _inv = I._block_perm(h, w)
    o, d = o[perm], d[perm]

    @jax.jit
    def primary(scene, o, d):
        hit, pos, nrm, _mat = I._trace_closest(
            scene, o, d, I.RAY_EPSILON, I.RAY_MAX_T, cull=False, impl="pallas"
        )
        return hit, pos, nrm

    @jax.jit
    def shadows(scene, pos, hit):
        dl = scene["lights"]["dir"]
        l_dir = jnp.broadcast_to(vm.normalize(-dl["forward"])[0], pos.shape)
        occ = I._trace_any(
            scene, pos, l_dir, I.RAY_EPSILON, I.RAY_MAX_T, "pallas"
        )
        return occ & hit

    @jax.jit
    def bounce(scene, pos, nrm, hit):
        # cosine-hemisphere bounce (deterministic diag draws for timing)
        t, b = vm.orthonormal_basis(nrm)
        r0 = jnp.full(pos.shape[:1], 0.3, jnp.float32)
        r1 = (jnp.arange(pos.shape[0]) % 997).astype(jnp.float32) / 997.0
        r = jnp.sqrt(r0)
        phi = 2.0 * jnp.pi * r1
        bd = (
            (r * jnp.cos(phi))[..., None] * t
            + jnp.sqrt(1.0 - r0)[..., None] * nrm
            + (r * jnp.sin(phi))[..., None] * b
        )
        hit2, pos2, _n2, _m2 = I._trace_closest(
            scene, pos, bd, I.RAY_EPSILON, I.RAY_MAX_T, cull=False,
            impl="pallas",
        )
        return hit2 & hit, pos2

    @jax.jit
    def bounce_shadow(scene, pos2, hit2):
        dl = scene["lights"]["dir"]
        l_dir = jnp.broadcast_to(vm.normalize(-dl["forward"])[0], pos2.shape)
        occ = I._trace_any(
            scene, pos2, l_dir, I.RAY_EPSILON, I.RAY_MAX_T, "pallas"
        )
        return occ & hit2

    def bench(name, fn, *args):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        first = jax.tree.leaves(out)[0]
        float(jnp.sum(first.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            first = jax.tree.leaves(out)[0]
            float(jnp.sum(first.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:14s}: {best*1e3:8.1f} ms", flush=True)
        return best, out

    tags = ("flat", "two-level") if which == "both" else (which,)
    phases = {}
    for tag in tags:
        scene = load(tag)
        print(f"[{tag}]", flush=True)
        hit, pos, nrm = primary(scene, o, d)
        hit2, pos2 = bounce(scene, pos, nrm, hit)
        float(jnp.sum(bounce_shadow(scene, pos2, hit2)))
        row = {}
        row["primary"], _ = bench("primary", primary, scene, o, d)
        row["dir-shadow"], _ = bench("dir-shadow", shadows, scene, pos, hit)
        row["bounce"], _ = bench("bounce", bounce, scene, pos, nrm, hit)
        row["bounce-shadow"], _ = bench(
            "bounce-shadow", bounce_shadow, scene, pos2, hit2
        )
        phases[tag] = row

    if len(phases) == 2:
        print("\n--- two-level minus flat, per phase ---", flush=True)
        tot_d = 0.0
        for name in ("primary", "dir-shadow", "bounce", "bounce-shadow"):
            d_ms = (phases["two-level"][name] - phases["flat"][name]) * 1e3
            tot_d += d_ms
            rel = phases["two-level"][name] / phases["flat"][name]
            print(f"  {name:14s}: {d_ms:+8.1f} ms ({rel:.2f}x)", flush=True)
        print(f"  {'TOTAL':14s}: {tot_d:+8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
