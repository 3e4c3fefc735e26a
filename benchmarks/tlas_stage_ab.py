"""Stage-cut A/B of the instanced frame: flat vs two-level, one process
(VERDICT r3 #4, third probe). frame_phases exonerated the traversal
kernels (+0.5% net), tlas_glue_micro exonerated the interp glue (35.9 vs
36.9 ms), and the dead-lane regime A/B matched live-lane ratios — yet the
FULL single-jit frame reproduces +17% (620.6 vs 726.7 ms in-process). So
the gap is attached to a program STAGE, not a kernel. This probe builds
four partial frames (each its own jit, identical math to trace_rays up to
the cut):

  P1  primary closest (+interp, blocked perm, cull=True)
  P2  P1 + primary direct lighting (batched 2-light occlusion)
  P3  P2 + the batched diffuse+spec secondary CLOSEST (2N rays,
      empty-interval dead lanes)
  P4  the full production trace_rays

and reports per-stage deltas for both builds. The stage whose two-level
delta exceeds its flat delta owns the frame gap; if the gaps only appear
in P4-P3 residue beyond the occlusion micro's prediction, the cost is
whole-program scheduling (buffer-assignment arena: flat 337 MB vs
two-level 1.70 GB measured via memory_analysis()).

Reference anchor: TLAS semantics
(/root/reference/libs/DXRFramework/Helpers/TopLevelASGenerator.cpp:309+).

Usage: python benchmarks/tlas_stage_ab.py [K=32]
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
    from dxrexperiments_tpu.core import rng, vecmath as vm
    from dxrexperiments_tpu.trace import integrator as I
    from dxrexperiments_tpu.trace import sampling
    from dxrexperiments_tpu.trace.integrator import (
        M_PI,
        RAY_EPSILON,
        RAY_MAX_T,
        default_options,
    )

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    w = h = 512
    sc, cam = build_scene(f"instanced:{k}")
    cam.set_aspect(w, h)
    opts = jax.device_put(default_options())

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

    camp = jax.device_put(camera_params(cam))

    def frame_prefix(stop: str):
        """trace_rays re-derivation, cut at `stop` — every line matches the
        production path (raygen, blocked perm, seeds) so deltas attribute
        real stages. Scene rides as a jit ARG (the 983k flat pack exceeds
        the ~100 MB compile-request limit as baked constants)."""

        def run(scene, camera):
            origins, directions = primary_ray_grid(camera, w, h, 30.0)
            o = origins.reshape(-1, 3)
            d = directions.reshape(-1, 3)
            seeds = rng.pixel_seeds(w, h, camera["frame_count"]).reshape(-1)
            perm, _inv = I._block_perm(h, w)
            o, d, seeds = o[perm], d[perm], seeds[perm]

            hit, position, normal, mat = I._trace_closest(
                scene, o, d, 0.0, RAY_MAX_T, cull=True, impl="pallas"
            )
            acc = (
                jnp.sum(position) + jnp.sum(normal) + jnp.sum(mat["albedo"])
            )
            if stop == "P1":
                return acc

            seed = seeds
            seed, direct = I._direct_lighting(
                scene, opts, position, normal, seed, hit, "pallas"
            )
            acc = acc + jnp.sum(direct)
            if stop == "P2":
                return acc

            seed_drawn, r0, r1 = rng.next_rand2(seed)
            cosine = opts["cosine_hemisphere_sampling"]
            tangent, bitangent = vm.orthonormal_basis(normal)
            rr = jnp.sqrt(r0)
            phi = 2.0 * M_PI * r1
            cos_dir = (
                (rr * jnp.cos(phi))[..., None] * tangent
                + jnp.sqrt(jnp.maximum(1.0 - r0, 0.0))[..., None] * normal
                + (rr * jnp.sin(phi))[..., None] * bitangent
            )
            sin_t = jnp.sqrt(jnp.maximum(1.0 - r0 * r0, 0.0))
            uni_dir = (
                (sin_t * jnp.cos(phi))[..., None] * tangent
                + r0[..., None] * normal
                + (sin_t * jnp.sin(phi))[..., None] * bitangent
            )
            sample_dir = jnp.where(cosine, cos_dir, uni_dir)
            seed = jnp.where(opts["no_indirect_diffuse"], seed, seed_drawn)

            is_spec = (mat["type"] == 1) | (mat["type"] == 2)
            spec_active = hit & is_spec & (mat["reflectivity"] > 0.001)
            exponent = jnp.exp((1.0 - mat["roughness"]) * 12.0)
            mirror = vm.normalize(vm.reflect(d, normal))
            seed, phong_dir, _pdf, _brdf = sampling.phong_lobe_sample(
                seed, mirror, exponent
            )

            o2 = jnp.concatenate([position, position])
            d2 = jnp.concatenate([sample_dir, phong_dir])
            act = jnp.concatenate([hit, spec_active])
            t_max_eff = jnp.where(act, RAY_MAX_T, 0.0)
            hit2, pos2, nrm2, mat2 = I._trace_closest(
                scene, o2, d2, RAY_EPSILON, t_max_eff, cull=False,
                impl="pallas",
            )
            return acc + jnp.sum(pos2) + jnp.sum(mat2["albedo"])

        return jax.jit(run)

    def bench(name, fn, *args):
        fence(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:4s}: {best*1e3:8.1f} ms", flush=True)
        return best

    rows = {}
    for tag in ("flat", "two-level"):
        scene = load(tag)
        env_kind = int(scene["env"]["kind"])
        print(f"[{tag}]", flush=True)
        for stop in ("P1", "P2", "P3"):
            rows[(tag, stop)] = bench(stop, frame_prefix(stop), scene, camp)
        full = jax.jit(
            lambda s, o, c: I.render_sample(
                s, o, c, w, h, mode="progressive", impl="pallas",
                env_kind=env_kind,
            )["color"]
        )
        rows[(tag, "P4")] = bench("P4", full, scene, opts, camp)

    print("\n--- per-stage deltas (ms), flat vs two-level ---", flush=True)
    prev = {"flat": 0.0, "two-level": 0.0}
    for stop in ("P1", "P2", "P3", "P4"):
        df = (rows[("flat", stop)] - prev["flat"]) * 1e3
        dt = (rows[("two-level", stop)] - prev["two-level"]) * 1e3
        prev["flat"] = rows[("flat", stop)]
        prev["two-level"] = rows[("two-level", stop)]
        print(
            f"  {stop}: flat {df:8.1f}  two-level {dt:8.1f}  "
            f"excess {dt - df:+8.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
