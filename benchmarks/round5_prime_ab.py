"""PRIME t_max seeding + block-local octant binning A/B (round 5), ONE TPU
process, on the 983k-tri instanced scene (BASELINE config 5) — the two
candidate counters to the two-level instance-union penalty that survived
round 4's attribution (+91.7 ms on the batched secondary closest,
RESULTS.md stage-cut):

  stage sec    isolated 524k-ray diffuse+spec secondary closest (the exact
               production rays: P2-prefix bounce draws), arms:
                 off        production masking only (t_max = active mask)
                 prime      + _prime_seed_tmax far clamp (floor pre-test)
                 binG       block-local octant binning: argsort by
                            (lane//G << 3) | octant — G=1024 keeps packets
                            inside ONE primary block (origin-cell-local),
                            G=2048 trades 2-block origins for tighter
                            direction unions; sort+gather+scatter included
                 prime+bin  both
               Both builds (flat / two-level). Per-lane results are packet-
               composition-independent, so all arms must match EXACTLY.
               This also RECORDS the round-4 "block-local octant sort was
               negative" /tmp finding with publishable numbers (the
               integrator comment cites it without data).

  stage frame  full production render_sample frame A/B, DXR_PRIME=0 vs 1,
               both builds, traced via render_sample.__wrapped__ per arm
               (CLAUDE.md module-global-knob rule), bit-exact parity.

Scenes are REBUILT (not /tmp-cached): caches predate the prime keys.

Usage: python benchmarks/round5_prime_ab.py [stages] [K]
  stages: comma list of {sec,frame} (default both); K: grid size (32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict[str, float] = {}


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

    stages = (
        set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {"sec", "frame"}
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    w = h = int(os.environ.get("PRIME_AB_SIZE", "512"))
    impl = os.environ.get("PRIME_AB_IMPL", "pallas")  # CPU smoke: _interpret
    sc, cam = build_scene(f"instanced:{k}")
    cam.set_aspect(w, h)
    opts = jax.device_put(default_options())
    camp = jax.device_put(camera_params(cam))

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    t0 = time.perf_counter()
    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print(f"[warmup] {time.perf_counter() - t0:.1f}s", flush=True)

    scenes = {}
    for tag in ("flat", "two-level"):
        t0 = time.perf_counter()
        data = (
            sc.build_two_level() if tag == "two-level"
            else sc.build(accel="auto")
        )
        assert "prime_v0" in data, tag
        scenes[tag] = jax.device_put(data)
        print(f"[build {tag}] {time.perf_counter() - t0:.1f}s "
              f"(prime {data['prime_v0'].shape[0]} tris)", flush=True)

    # ---- production bounce rays (the P2-prefix draw, tlas_stage_ab) -------
    def bounce_inputs(scene, camera):
        origins, directions = primary_ray_grid(camera, w, h, 30.0)
        o = origins.reshape(-1, 3)
        d = directions.reshape(-1, 3)
        seeds = rng.pixel_seeds(w, h, camera["frame_count"]).reshape(-1)
        perm, _inv = I._block_perm(h, w)
        o, d, seeds = o[perm], d[perm], seeds[perm]
        hit, position, normal, mat = I._trace_closest(
            scene, o, d, 0.0, RAY_MAX_T, cull=True, impl=impl
        )
        seed = seeds
        seed, _direct = I._direct_lighting(
            scene, opts, position, normal, seed, hit, impl
        )
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
        is_spec = (mat["type"] == 1) | (mat["type"] == 2)
        spec_active = hit & is_spec & (mat["reflectivity"] > 0.001)
        exponent = jnp.exp((1.0 - mat["roughness"]) * 12.0)
        mirror = vm.normalize(vm.reflect(d, normal))
        _seed, phong_dir, _pdf, _brdf = sampling.phong_lobe_sample(
            seed, mirror, exponent
        )
        o2 = jnp.concatenate([position, position])
        d2 = jnp.concatenate([sample_dir, phong_dir])
        act = jnp.concatenate([hit, spec_active])
        return o2, d2, act

    def trace_sum(scene, o2, d2, t_eff, order=None):
        if order is not None:
            o2, d2, t_eff = o2[order], d2[order], t_eff[order]
        hit2, pos2, _n, mat2 = I._trace_closest(
            scene, o2, d2, RAY_EPSILON, t_eff, cull=False, impl=impl,
            tile=512,
        )
        if order is not None:  # scatter back (cost included in the arm)
            pos2 = jnp.zeros_like(pos2).at[order].set(pos2)
            alb = jnp.zeros_like(mat2["albedo"]).at[order].set(mat2["albedo"])
            hit2 = jnp.zeros_like(hit2).at[order].set(hit2)
        else:
            alb = mat2["albedo"]
        # per-lane checksum image: arms must match exactly
        return jnp.sum(pos2, axis=-1) * hit2 + jnp.sum(alb, axis=-1)

    def bin_order(d2, group):
        n = d2.shape[0]
        blk = jnp.arange(n, dtype=jnp.int32) // group
        octant = (
            (d2[:, 0] < 0).astype(jnp.int32) * 4
            + (d2[:, 1] < 0).astype(jnp.int32) * 2
            + (d2[:, 2] < 0).astype(jnp.int32)
        )
        return jnp.argsort(blk * 8 + octant, stable=True)

    if "sec" in stages:
        for tag in ("flat", "two-level"):
            scene = scenes[tag]
            prep = jax.jit(lambda s, c: bounce_inputs(s, c))
            o2, d2, act = jax.block_until_ready(prep(scene, camp))
            o2, d2, act = map(jax.device_put, (o2, d2, act))

            def arm_fn(mode):
                def run(s, o2_, d2_, act_):
                    t_eff = jnp.where(act_, RAY_MAX_T, 0.0)
                    if "prime" in mode:
                        t_eff = I._prime_seed_tmax(s, o2_, d2_, t_eff)
                    order = None
                    if "bin" in mode:
                        g = int(mode.rsplit("bin", 1)[1])
                        order = bin_order(d2_, g)
                    return trace_sum(s, o2_, d2_, t_eff, order)

                return jax.jit(run)

            ref = None
            for mode in ("off", "prime", "bin1024", "bin2048",
                         "prime+bin1024"):
                fn = arm_fn(mode)
                t0 = time.perf_counter()
                out = fn(scene, o2, d2, act)
                fence(out)
                print(f"[compile sec/{tag}/{mode}] "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    fence(fn(scene, o2, d2, act))
                    best = min(best, time.perf_counter() - t0)
                RESULTS[f"sec_{tag}_{mode}_ms"] = round(best * 1e3, 1)
                print(f"[sec {tag} {mode}] {best*1e3:8.1f} ms", flush=True)
                outn = np.asarray(out)
                if ref is None:
                    ref = outn
                else:
                    d_max = float(np.abs(outn - ref).max())
                    print(f"  parity vs off: max_abs {d_max:.2e}", flush=True)
                    RESULTS[f"sec_{tag}_{mode}_parity"] = d_max

    if "frame" in stages:
        for tag in ("flat", "two-level"):
            scene = scenes[tag]
            env_kind = int(scene["env"]["kind"])
            imgs = {}
            for knob in ("0", "1"):
                os.environ["DXR_PRIME"] = knob
                fn = jax.jit(
                    lambda s, o, c: I.render_sample.__wrapped__(
                        s, o, c, w, h, mode="progressive", impl=impl,
                        env_kind=env_kind,
                    )["color"]
                )
                t0 = time.perf_counter()
                imgs[knob] = fn(scene, opts, camp)
                fence(imgs[knob])
                print(f"[compile frame/{tag}/prime={knob}] "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    fence(fn(scene, opts, camp))
                    best = min(best, time.perf_counter() - t0)
                RESULTS[f"frame_{tag}_prime{knob}_ms"] = round(best * 1e3, 1)
                print(f"[frame {tag} prime={knob}] {best*1e3:8.1f} ms",
                      flush=True)
            os.environ["DXR_PRIME"] = "1"
            d_max = float(
                np.abs(np.asarray(imgs["0"]) - np.asarray(imgs["1"])).max()
            )
            RESULTS[f"frame_{tag}_parity"] = d_max
            print(f"  frame parity: max_abs {d_max:.2e}", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
