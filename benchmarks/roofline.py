"""VPU roofline + MXU/VPU overlap probes (TPU, one process).

Earns (or re-scopes) the config-1 ceiling claim with two measurements the
round-3 analysis lacked (VERDICT r3 #2):

  A. EMPIRICAL VPU issue-rate peak, measured with the megakernel's own
     operand shapes ([8 x 1024] f32 vregs):
       - fma-peak: 8 independent FMA chains, 16x unrolled per loop
         iteration (a tight fori body measured 0.22 T — pure loop/carry
         overhead, not issue rate)
       - pair-mix: the 9-sweep pair test's instruction mix (19 FMA + ~10
         compare/min/select mask-merge ops per step)
     The megakernel's measured 1.8 T vec-ops/s is then a FRACTION OF
     ACHIEVABLE PEAK, not of a paper number.

  B. MXU/VPU OVERLAP: the same [4C,16]@[16,R] HIGHEST term-group matmul
     that measured 2.2x slower ALONE (ops/fused_sample_pallas.py
     USE_MXU_TERMS note), issued CONCURRENTLY with an independent VPU FMA
     loop in one kernel. If t(both) ~= max(t_mxu, t_vpu) the units overlap
     and occlusion-on-MXU is additive throughput; if ~= sum they serialize
     and the idea is dead (recorded either way in RESULTS.md).
     NB Mosaic cannot broadcast [1,1] into both sublanes and lanes — the
     loop-dependency injection uses a [1, LANES] row (sublane-only).

Reference anchor: the fallback layer's "same performance as native" claim
(/root/reference/README.md:23-29) is the capability being out-engineered.

Usage: python benchmarks/roofline.py [--interpret]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = "--interpret" in sys.argv

LANES = 1024
SUB = 8
CHAINS = 8   # independent FMA accumulator chains (hide 2-4 cycle latency)
UNROLL = 16  # steps per fori iteration (amortize loop/carry overhead)
C_TRIS = 256  # matmul rows = 4*C = 1024 (the 256-tri cornell-pad shape)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    for _ in range(3):
        fence(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048)))
    print("[warm]", flush=True)

    iters = 2 if SMOKE else 512
    grid = 2 if SMOKE else 64

    # ---- A1: pure-FMA issue peak ---------------------------------------- #
    def fma_kernel(a_ref, b_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]

        def body(_, accs):
            for _u in range(UNROLL):
                accs = tuple(acc * a + b for acc in accs)
            return accs

        accs = jax.lax.fori_loop(
            0, iters, body, tuple(a + float(k) for k in range(CHAINS))
        )
        o_ref[:, :] = functools.reduce(lambda x, y: x + y, accs)

    # ---- A2: the pair-test mix ------------------------------------------ #
    # Per step, per lane: the _pair_terms sweep mix — 19 FMAs (3 cross +
    # 16 term-group dots) + the mask tail (sign flips, 2 min folds, 2
    # compares, and-merge, best-t select) ~ 10 cmp/min/sel ops.
    MIX_UNROLL = 4

    def mix_kernel(a_ref, b_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]

        def step(carry):
            det, u, v, t, best = carry
            m0 = u * a + b
            m1 = v * a - b
            m2 = t * a + b
            det = det * a + m0
            det = det * a + m1
            det = det * a + m2
            u = u * a + m0
            u = u * a + m1
            u = u * a + m2
            u = u * a + b
            v = v * a + m0
            v = v * a + m1
            v = v * a + m2
            v = v * a + b
            t = t * a + m0
            t = t * a + m1
            t = t * a + m2
            t = t * a + b
            det = det * a + b
            s = jnp.sign(det)
            da = det * s
            us = u * s
            vs = v * s
            soft = jnp.minimum(jnp.minimum(us, vs), da - (us + vs))
            strict = t * s - da
            ok = (soft >= 0.0) & (strict > 0.0)
            best = jnp.where(ok & (t < best), t, best)
            return det, u, v, t, best

        def body(_, carry):
            for _u in range(MIX_UNROLL):
                carry = step(carry)
            return carry

        det, u, v, t, best = jax.lax.fori_loop(
            0, iters, body, (a, a + 1.0, a + 2.0, a + 3.0, b + 30.0)
        )
        o_ref[:, :] = det + u + v + t + best

    # ---- B: MXU/VPU overlap --------------------------------------------- #
    # mt block [4C, 16] (HIGHEST f32 term-group shape), rays [16, LANES].
    m_iters = 2 if SMOKE else 128
    V_UNROLL = 8

    def make_ov_kernel(do_vpu: bool, do_mxu: bool, vpu_scale: int):
        # Loop runs m_iters * vpu_scale iterations; the VPU FMA block fires
        # every iteration, the MXU matmul only every vpu_scale-th — so MXU
        # work stays FIXED at m_iters matmuls while VPU work scales.
        def kern(a_ref, b_ref, mt_ref, rays_ref, o_ref, t_ref):
            a = a_ref[:, :]
            b = b_ref[:, :]

            def do_dot(tacc):
                # loop-dependency injection via a [1, LANES] row (Mosaic
                # can't broadcast [1,1] across sublanes AND lanes)
                terms = jax.lax.dot_general(
                    mt_ref[:, :],
                    rays_ref[:, :] * (1.0 + tacc[0:1, :] * 1e-30),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return tacc + terms[0:SUB, :] * 1e-30

            def body(i, carry):
                accs, tacc = carry
                if do_vpu:
                    for _u in range(V_UNROLL):
                        accs = tuple(acc * a + b for acc in accs)
                if do_mxu:
                    if vpu_scale > 1:
                        tacc = jax.lax.cond(
                            i % vpu_scale == 0, do_dot, lambda t: t, tacc
                        )
                    else:
                        tacc = do_dot(tacc)
                return accs, tacc

            accs, tacc = jax.lax.fori_loop(
                0, m_iters * max(vpu_scale, 1), body,
                (tuple(a + float(k) for k in range(CHAINS)), b),
            )
            o_ref[:, :] = functools.reduce(lambda x, y: x + y, accs)
            t_ref[:, :] = tacc

        return kern

    def run(kern, n_out=1, interpret=SMOKE):
        a = jnp.full((SUB, LANES), 1.000001, jnp.float32)
        b = jnp.full((SUB, LANES), 1e-7, jnp.float32)
        mt = jnp.ones((4 * C_TRIS, 16), jnp.float32) * 1e-3
        rays = jnp.ones((16, LANES), jnp.float32)
        outs = [
            pl.BlockSpec((SUB, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ]
        shapes = [
            jax.ShapeDtypeStruct((SUB, LANES * grid), jnp.float32)
            for _ in range(n_out)
        ]
        fn = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((SUB, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + (
                [
                    pl.BlockSpec((4 * C_TRIS, 16), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ]
                if n_out == 2
                else []
            ),
            out_specs=outs if n_out > 1 else outs[0],
            out_shape=shapes if n_out > 1 else shapes[0],
            interpret=interpret,
        )
        args = (a, b, mt, rays) if n_out == 2 else (a, b)
        f = jax.jit(lambda *xs: fn(*xs))
        fence(f(*args))
        fence(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        return best

    els = SUB * LANES * grid

    t = run(fma_kernel)
    fma_rate = els * iters * UNROLL * CHAINS / t
    print(
        f"[A1 fma-peak ] {t*1e3:8.2f} ms  {fma_rate/1e12:6.2f} T FMA/s",
        flush=True,
    )

    t = run(mix_kernel)
    # 19 FMA + 10 mask ops per step per lane
    mix_rate = els * iters * MIX_UNROLL * 29 / t
    mix_fma = els * iters * MIX_UNROLL * 19 / t
    print(
        f"[A2 pair-mix ] {t*1e3:8.2f} ms  {mix_rate/1e12:6.2f} T ops/s "
        f"({mix_fma/1e12:5.2f} T FMA/s + masks)",
        flush=True,
    )

    # B: scale VPU work against a fixed MXU matmul stream, check additivity.
    t_m = run(make_ov_kernel(False, True, 1), n_out=2)
    # one HIGHEST [4C,16]x[16,R] per iteration
    mm_flops = 4 * C_TRIS * 16 * LANES * 2 * grid * m_iters
    print(
        f"[B  mxu-alone] {t_m*1e3:8.2f} ms  "
        f"{mm_flops/t_m/1e12:6.2f} TFLOP/s f32-HIGHEST",
        flush=True,
    )
    for scale in (1, 2, 4):
        t_v = run(make_ov_kernel(True, False, scale), n_out=2)
        t_b = run(make_ov_kernel(True, True, scale), n_out=2)
        lo = max(t_v, t_m)
        hi = t_v + t_m
        frac = (hi - t_b) / max(hi - lo, 1e-12)
        print(
            f"[B  vpu x{scale}] vpu {t_v*1e3:7.2f}  both {t_b*1e3:7.2f} "
            f"ms  (max {lo*1e3:7.2f} / sum {hi*1e3:7.2f})  "
            f"overlap {frac*100:5.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
