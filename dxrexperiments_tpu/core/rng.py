"""Counter-based per-pixel RNG, bit-exact with the reference shaders.

The reference seeds a TEA-style hash per pixel per frame and advances an LCG
for every random draw (``initRand``/``nextRand``,
/root/reference/assets/shaders/RaytracingUtils.hlsli:26-45). We reproduce the
exact uint32 sequences so Monte-Carlo decisions (hemisphere samples, light
selection, Phong lobes) are statistically identical — and, because our trace
tree is unrolled in the same order as the reference's recursion, renders can
be compared sample-for-sample.

All state lives in vectorized uint32 arrays (one lane per pixel/ray): a
functional, stateless analogue of HLSL's ``inout uint randSeed``.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def init_rand(val0: jnp.ndarray, val1: jnp.ndarray, backoff: int = 16) -> jnp.ndarray:
    """TEA-hash seed from two values, parity with initRand
    (RaytracingUtils.hlsli:26-38). Inputs broadcast; returns uint32 seeds."""
    v0 = jnp.asarray(val0).astype(_U32)
    v1 = jnp.asarray(val1).astype(_U32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.zeros_like(v0)
    # Static 16-iteration unroll (the HLSL is [unroll] too).
    for _ in range(backoff):
        s0 = s0 + _U32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + _U32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + _U32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + _U32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + _U32(0x7E95761E))
        )
    return v0


def next_rand(seed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LCG step, parity with nextRand (RaytracingUtils.hlsli:41-45).

    Returns (new_seed, uniform float32 in [0, 1))."""
    seed = seed * _U32(1664525) + _U32(1013904223)
    u = (seed & _U32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(0x01000000)
    return seed, u


def next_rand2(seed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two consecutive draws (the samplers always consume pairs)."""
    seed, r0 = next_rand(seed)
    seed, r1 = next_rand(seed)
    return seed, r0, r1


def pixel_seeds(width: int, height: int, frame_count, row0=None) -> jnp.ndarray:
    """Per-pixel seeds for a [H, W] launch.

    Parity with the shade() seeding
    (/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:87-89):
    ``initRand(px + py * width, frameCount)``.

    row0: seeds for rows [row0, row0+height) of a taller image — pixel ids
    stay GLOBAL so row-sharded renders match the single-chip image.
    """
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.uint32),
        jnp.arange(width, dtype=jnp.uint32),
        indexing="ij",
    )
    if row0 is not None:
        py = py + jnp.asarray(row0, jnp.int32).astype(_U32)
    linear = px + py * _U32(width)
    return init_rand(linear, jnp.asarray(frame_count).astype(_U32))
