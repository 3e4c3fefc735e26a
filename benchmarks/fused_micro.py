"""Microbenchmark for the fused progressive megakernel (TPU).

Times fused_progressive_sum in isolation with the honest tunnel protocol,
to attribute the per-sample cost (pair sweeps vs attr matmuls vs epilogue).

Usage: python benchmarks/fused_micro.py [S] [WIDTH]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cornell_setup
    from dxrexperiments_tpu.ops import fused_sample_pallas as fsp

    s_count = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    width = height = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    scene, options, cams, _ = _cornell_setup(width, height, s_count)
    scene = jax.device_put(scene)
    stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *cams))

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    def dispatch():
        return fsp.fused_progressive_sum(
            scene, options, stacked, width, height, 0
        )

    float(jnp.sum(dispatch()))  # compile
    float(jnp.sum(dispatch()))  # settle

    best = float("inf")
    reps = 12
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = dispatch()  # async queue; one fence at the end
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)

    n = width * height
    per_sample_ms = best / s_count * 1e3
    mrays = n * s_count / best / 1e6
    print(
        f"S={s_count} {width}x{height}: {best*1e3:.2f} ms/dispatch, "
        f"{per_sample_ms:.3f} ms/sample, {mrays:.1f} Mrays/s primary "
        f"(fenced per dispatch; pipelined number will be higher)"
    )


if __name__ == "__main__":
    main()
