"""Per-dispatch phase timing of one progressive sample on the instanced
scene: primary closest / direct-light occlusion / bounce closest / bounce
occlusion, each fenced separately — identifies which traversal dispatch owns
the frame time (BASELINE config 5 drill-down).

Usage: python benchmarks/frame_phases.py [K=32]
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
    w = h = 512
    sc, cam = build_scene(f"instanced:{k}")
    cam.set_aspect(w, h)

    import os

    cache = f"/tmp/instanced_frame_{k}.npy"
    if os.path.exists(cache):
        scene = np.load(cache, allow_pickle=True).item()
    else:
        scene = sc.build(accel="auto")
        np.save(cache, jax.tree.map(np.asarray, scene))
    scene = jax.device_put(scene)

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

    hit, pos, nrm = primary(scene, o, d)
    occ = shadows(scene, pos, hit)
    hit2, pos2 = bounce(scene, pos, nrm, hit)
    occ2 = bounce_shadow(scene, pos2, hit2)
    float(jnp.sum(occ2))

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
        print(f"{name:14s}: {best*1e3:8.1f} ms")
        return out

    bench("primary", primary, scene, o, d)
    bench("dir-shadow", shadows, scene, pos, hit)
    bench("bounce", bounce, scene, pos, nrm, hit)
    bench("bounce-shadow", bounce_shadow, scene, pos2, hit2)


if __name__ == "__main__":
    main()
