"""Times the INTER-STAGE glue of the two-level path (VERDICT r3 #4,
follow-up to frame_phases.py): the per-phase kernel table measured the
two-level traversal dispatches at NET +1.3 ms vs flat across the four
phase kernels (occlusion phases are 0.84-0.86x — the TLAS early-out helps
any-hit), which exonerates traversal and leaves the ~100 ms frame gap in
the glue between dispatches. Suspects, per closest stage x 3 stages:

  - _interpolate_hit_two_level's instance gathers (inst_nm 9-wide,
    inst_mat_override) on top of the shared tri gathers, and
  - the batched [N,3,3]x[N,3] HIGHEST einsum that maps object-space
    normals to world (flat scenes skip it): HIGHEST dots with tiny K are
    MXU-latency-bound (CLAUDE.md), and dot_general may lower this shape
    badly.

Probe: on the instanced:32 two-level build (983k tris), time (a) full
_interpolate_hit_two_level, (b) the same with the einsum replaced by an
explicit 9-FMA expansion, (c) the einsum alone both ways, (d) flat
_interpolate_hit on the flattened build — all in one process, fenced.

Reference anchor: TLAS refit semantics
(/root/reference/libs/DXRFramework/Helpers/TopLevelASGenerator.cpp:309+).

Usage: python benchmarks/tlas_glue_micro.py [K=32]
"""

from __future__ import annotations

import os
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

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print("[warm]", flush=True)

    camp = camera_params(cam)
    o, d = primary_ray_grid(camp, w, h, 30.0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    def bench(name, fn, *args):
        f = jax.jit(fn)
        fence(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:22s}: {best*1e3:8.2f} ms", flush=True)
        return best

    from dxrexperiments_tpu.ops import traverse2_pallas, traverse_pallas
    from dxrexperiments_tpu.scene.scene import BVH_LEAF_SIZE

    # --- two-level build ------------------------------------------------ #
    scene2 = load("two-level")

    @jax.jit
    def primary2(scene, o, d):
        return traverse2_pallas.traverse2_fat_closest(
            scene["tlas"], o, d, I.RAY_EPSILON, I.RAY_MAX_T,
            leaf_size=BVH_LEAF_SIZE, cull_backface=False, tile=I.FAT_TILE,
        )

    hits2 = primary2(scene2, o, d)
    jax.block_until_ready(hits2)

    print("[two-level glue]", flush=True)
    bench("interp (shipped)",
          lambda s, hh, oo, dd: I._interpolate_hit_two_level(s, hh, oo, dd),
          scene2, hits2, o, d)

    def interp_expand(scene, hits, origins, directions):
        """_interpolate_hit_two_level with the HIGHEST einsum expanded to
        nine [N] FMA columns (identical f32 math, no dot_general)."""
        tri = jnp.maximum(hits["tri"], 0)
        inst = jnp.maximum(hits["inst"], 0)
        u, v = hits["u"], hits["v"]
        ww = 1.0 - u - v
        n_obj = (
            ww[..., None] * scene["n0_obj"][tri]
            + u[..., None] * scene["n1_obj"][tri]
            + v[..., None] * scene["n2_obj"][tri]
        )
        nm = scene["tlas"]["inst_nm"][inst]
        world = jnp.stack(
            [
                nm[:, i, 0] * n_obj[:, 0]
                + nm[:, i, 1] * n_obj[:, 1]
                + nm[:, i, 2] * n_obj[:, 2]
                for i in range(3)
            ],
            axis=-1,
        )
        normal = vm.normalize(world)
        position = origins + hits["t"][..., None] * directions
        override = scene["tlas"]["inst_mat_override"][inst]
        mid = jnp.where(override >= 0, override, scene["mat_id_obj"][tri])
        mat = I._gather_material(scene["materials"], mid)
        return position, normal, mat

    bench("interp (expanded)", interp_expand, scene2, hits2, o, d)

    nm_all = scene2["tlas"]["inst_nm"]
    inst = jnp.maximum(hits2["inst"], 0)
    n_fake = d  # any [N,3] unit-ish vectors

    bench(
        "einsum HIGHEST alone",
        lambda nm, ii, n: jnp.einsum(
            "nij,nj->ni", nm[ii], n,
            precision=jax.lax.Precision.HIGHEST,
        ),
        nm_all, inst, n_fake,
    )
    bench(
        "expand alone",
        lambda nm, ii, n: jnp.stack(
            [
                nm[ii][:, i, 0] * n[:, 0]
                + nm[ii][:, i, 1] * n[:, 1]
                + nm[ii][:, i, 2] * n[:, 2]
                for i in range(3)
            ],
            axis=-1,
        ),
        nm_all, inst, n_fake,
    )
    bench(
        "inst gathers alone",
        lambda s, ii: (
            s["tlas"]["inst_nm"][ii],
            s["tlas"]["inst_mat_override"][ii],
        ),
        scene2, inst,
    )

    # --- flat build ------------------------------------------------------ #
    scene1 = load("flat")

    @jax.jit
    def primary1(scene, o, d):
        return traverse_pallas.traverse_fat_closest(
            scene["bvh"], o, d, I.RAY_EPSILON, I.RAY_MAX_T,
            leaf_size=BVH_LEAF_SIZE, cull_backface=False, tile=I.FAT_TILE,
        )

    hits1 = primary1(scene1, o, d)
    jax.block_until_ready(hits1)
    print("[flat glue]", flush=True)
    bench("interp (flat shipped)",
          lambda s, hh, oo, dd: I._interpolate_hit(s, hh, oo, dd),
          scene1, hits1, o, d)


if __name__ == "__main__":
    main()
