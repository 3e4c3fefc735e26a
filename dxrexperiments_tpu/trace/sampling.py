"""Monte-Carlo direction sampling, parity with RaytracingUtils.hlsli.

Every sampler threads the vectorized LCG seed exactly as the HLSL does via
``inout uint randSeed`` so sample sequences match the reference draw-for-draw
(the frame construction, draw order, and math mirror
/root/reference/assets/shaders/RaytracingUtils.hlsli:59-123).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core import vecmath as vm

TWO_PI = 2.0 * jnp.pi


def cos_hemisphere_sample(seed, normal):
    """Cosine-weighted hemisphere around `normal`
    (getCosHemisphereSample, RaytracingUtils.hlsli:59-79).

    Returns (seed, dir [N,3])."""
    seed, r0, r1 = rng.next_rand2(seed)
    tangent, bitangent = vm.orthonormal_basis(normal)
    r = jnp.sqrt(r0)
    phi = TWO_PI * r1
    x = r * jnp.cos(phi)
    z = r * jnp.sin(phi)
    y = jnp.sqrt(jnp.maximum(1.0 - r0, 0.0))
    d = x[..., None] * tangent + y[..., None] * normal + z[..., None] * bitangent
    return seed, d


def uniform_hemisphere_sample(seed, normal):
    """Uniform hemisphere (getUniformHemisphereSample,
    RaytracingUtils.hlsli:82-98). Returns (seed, dir)."""
    seed, r0, r1 = rng.next_rand2(seed)
    tangent, bitangent = vm.orthonormal_basis(normal)
    cos_t = r0
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * r1
    x = sin_t * jnp.cos(phi)
    z = sin_t * jnp.sin(phi)
    y = cos_t
    d = x[..., None] * tangent + y[..., None] * normal + z[..., None] * bitangent
    return seed, d


def phong_lobe_sample(seed, mirror_dir, exponent):
    """Phong-lobe importance sample around the mirror direction
    (samplePhongLobe, RaytracingUtils.hlsli:101-123).

    Returns (seed, dir, pdf, brdf)."""
    seed, r0, r1 = rng.next_rand2(seed)
    tangent, bitangent = vm.orthonormal_basis(mirror_dir)
    cos_t = jnp.power(r0, 1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * r1
    powered_cos = jnp.power(cos_t, exponent)
    pdf = (exponent + 1.0) / TWO_PI * powered_cos
    brdf = (exponent + 2.0) / TWO_PI * powered_cos
    x = sin_t * jnp.cos(phi)
    z = sin_t * jnp.sin(phi)
    y = cos_t
    d = (
        x[..., None] * tangent
        + y[..., None] * mirror_dir
        + z[..., None] * bitangent
    )
    return seed, d, pdf, brdf


def fresnel_schlick(i, n, f0):
    """Schlick Fresnel (FresnelReflectanceSchlick,
    RaytracingUtils.hlsli:126-130); i is the incident (toward-surface) dir."""
    cosi = vm.saturate(vm.dot(-i, n))
    return f0 + (1.0 - f0) * jnp.power(1.0 - cosi, 5.0)[..., None]
