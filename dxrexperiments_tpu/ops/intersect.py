"""Ray-triangle intersection over SoA batches.

TPU-native replacement for the Fallback Layer's compute-shader BVH traversal
+ intersection (the closed-source heart of the reference,
/root/reference/README.md:23-29) and the per-ray ``TraceRay`` HLSL intrinsic.

Formulation
-----------
Möller–Trumbore re-written with scalar triple products (Plücker form) so the
[R rays] x [T triangles] test is a chain of ``[R,3] @ [3,T]`` contractions —
exactly the shape XLA tiles well on TPU (lane dim = triangles, sublane = rays)
— instead of per-pair cross products:

    det   = -(D . pn)              pn = e1 x e2
    u*det =  (OxD) . e2 + D . c1   c1 = v0 x e2
    v*det = -(OxD) . e1 - D . c2   c2 = v0 x e1
    t*det =   O . pn - d0          d0 = v0 . pn

pn/c1/c2/d0 are precomputed per triangle at scene build
(scene/scene.py). Validity is decided with sign-multiplied comparisons (no
per-pair divide); the winning triangle's exact (t, u, v) is recomputed per
ray after the argmin. Padding triangles are all-zero => det == 0 => miss.

Two entry points mirror the two DXR ray types:
  * ``intersect_closest``  — closest-hit (TraceRay with a closest-hit shader)
  * ``intersect_any``      — boolean occlusion (RAY_FLAG_ACCEPT_FIRST_HIT_AND
    _END_SEARCH | SKIP_CLOSEST_HIT, RaytracingCommon.hlsli:94)

Both scan over triangle chunks with a running best-hit state, which bounds
the [R, chunk] intermediate and is the same loop structure the Pallas kernel
uses (ops/intersect_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import vecmath as vm

RAY_MAX_T = 1.0e38  # RaytracingCommon.hlsli:8
RAY_EPSILON = 1.0e-4  # RaytracingCommon.hlsli:9

DEFAULT_CHUNK = 512


def _dot3t(a, b):
    """[R,3] x [T,3] -> [R,T] at full f32 precision.

    TPU matmuls default to bf16 MXU passes for f32 inputs; geometric
    predicates (hit/miss decisions) need exact f32, so force HIGHEST
    (3-pass bf16 accumulation == f32-accurate on MXU).
    """
    return jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)


def _pair_terms(origins, directions, moments, tri):
    """Raw [R, C] intersection terms for one triangle chunk."""
    # [R, C] contractions (lane dim = triangles).
    det = -_dot3t(directions, tri["pn"])
    u_d = _dot3t(moments, tri["e2"]) + _dot3t(directions, tri["c1"])
    v_d = -_dot3t(moments, tri["e1"]) - _dot3t(directions, tri["c2"])
    t_d = _dot3t(origins, tri["pn"]) - tri["d0"][None, :]
    return det, u_d, v_d, t_d


def _valid_mask(det, u_d, v_d, t_d, t_min, t_max, cull_backface: bool):
    s = jnp.sign(det)
    det_abs = det * s  # |det|
    eps = 1e-12
    if cull_backface:
        # Front face (CCW winding seen by the ray) has det > 0; culling
        # backfaces = requiring positive det, parity with
        # RAY_FLAG_CULL_BACK_FACING_TRIANGLES on primary rays
        # (ProgressiveRaytracing.hlsl:34).
        alive = det > eps
    else:
        alive = det_abs > eps
    us = u_d * s
    vs = v_d * s
    ts = t_d * s
    return (
        alive
        & (us >= 0.0)
        & (vs >= 0.0)
        & (us + vs <= det_abs)
        & (ts > t_min[:, None] * det_abs)
        & (ts < t_max[:, None] * det_abs)
    )


def _fit_chunk(t_total: int, desired: int = DEFAULT_CHUNK) -> int:
    """Largest chunk <= desired that divides the padded triangle count."""
    c = min(desired, t_total)
    while c > 1 and t_total % c != 0:
        c -= 1
    return max(c, 1)


def _slice_tris(scene: dict, start: int, size: int) -> dict:
    return {
        k: jax.lax.dynamic_slice_in_dim(scene[k], start, size, axis=0)
        for k in ("pn", "c1", "c2", "e1", "e2", "d0")
    }


@functools.partial(
    jax.jit, static_argnames=("cull_backface", "chunk")
)
def intersect_closest(
    scene: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: jnp.ndarray | float = RAY_EPSILON,
    t_max: jnp.ndarray | float = RAY_MAX_T,
    cull_backface: bool = False,
    chunk: int = DEFAULT_CHUNK,
) -> dict:
    """Closest hit for rays [R,3]x[R,3] against every scene triangle.

    Returns {"hit" [R] bool, "t" [R], "tri" [R] int32, "u","v" [R]}.
    """
    R = origins.shape[0]
    T = scene["v0"].shape[0]
    chunk = _fit_chunk(T, chunk)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    moments = vm.cross(origins, directions)

    def body(carry, start):
        best_t, best_tri = carry
        tri = _slice_tris(scene, start, chunk)
        det, u_d, v_d, t_d = _pair_terms(origins, directions, moments, tri)
        valid = _valid_mask(det, u_d, v_d, t_d, t_min, t_max, cull_backface)
        # Approximate t for selection only; exact recompute after argmin.
        t_pair = t_d / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        t_pair = jnp.where(valid, t_pair, jnp.float32(jnp.inf))
        c_best = jnp.min(t_pair, axis=1)
        c_idx = jnp.argmin(t_pair, axis=1).astype(jnp.int32) + start
        better = c_best < best_t
        return (
            (jnp.where(better, c_best, best_t), jnp.where(better, c_idx, best_tri)),
            None,
        )

    init = (jnp.full((R,), jnp.inf, jnp.float32), jnp.zeros((R,), jnp.int32))
    starts = jnp.arange(0, T, chunk, dtype=jnp.int32)
    (best_t, best_tri), _ = jax.lax.scan(body, init, starts)

    hit = jnp.isfinite(best_t)
    tri_safe = jnp.where(hit, best_tri, 0)

    # Exact per-ray recompute on the winning triangle (classic MT).
    v0 = scene["v0"][tri_safe]
    e1 = scene["e1"][tri_safe]
    e2 = scene["e2"][tri_safe]
    p = vm.cross(directions, e2)
    det = vm.dot(e1, p)
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = origins - v0
    u = vm.dot(tv, p) * inv
    q = vm.cross(tv, e1)
    v = vm.dot(directions, q) * inv
    t = vm.dot(e2, q) * inv

    return {
        "hit": hit,
        "t": jnp.where(hit, t, -1.0),
        "tri": jnp.where(hit, best_tri, -1),
        "u": jnp.where(hit, u, 0.0),
        "v": jnp.where(hit, v, 0.0),
    }


@functools.partial(jax.jit, static_argnames=("chunk",))
def intersect_any(
    scene: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: jnp.ndarray | float = RAY_EPSILON,
    t_max: jnp.ndarray | float = RAY_MAX_T,
    chunk: int = DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Occlusion query: True where ANY triangle blocks the segment.

    The TPU analogue of the shadow ray type
    (shootShadowRay, RaytracingCommon.hlsli:84-96): no closest-hit resolution,
    no backface culling.
    """
    R = origins.shape[0]
    T = scene["v0"].shape[0]
    chunk = _fit_chunk(T, chunk)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    moments = vm.cross(origins, directions)

    def body(occluded, start):
        tri = _slice_tris(scene, start, chunk)
        det, u_d, v_d, t_d = _pair_terms(origins, directions, moments, tri)
        valid = _valid_mask(det, u_d, v_d, t_d, t_min, t_max, cull_backface=False)
        return occluded | jnp.any(valid, axis=1), None

    starts = jnp.arange(0, T, chunk, dtype=jnp.int32)
    occluded, _ = jax.lax.scan(body, jnp.zeros((R,), bool), starts)
    return occluded
