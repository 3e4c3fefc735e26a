"""Fully-fused progressive-sample megakernel.

One Pallas kernel renders an ENTIRE progressive path-tracing sample — the
reference's whole DispatchRays tree (RayGen + primary closest-hit + 2 shadow
rays + indirect-diffuse and Phong-specular bounces + 4 secondary shadow rays,
/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:11-145) — per ray
tile, entirely in VMEM. Compared to the 4-launch wavefront path
(trace/integrator.py + ops/intersect_pallas.py) this removes:

  * every [N,3] HBM round-trip between trace and shade stages,
  * 3 of 4 kernel launches per sample (and their grid setup),
  * the XLA shading epilogue's HBM traffic (all epilogue math runs on
    in-register rows here),

leaving the 9 ray-triangle pair sweeps (the irreducible work) plus a small
per-ray epilogue. Samples are a grid dimension: the output block stays
resident while S jittered samples accumulate into it, so per-sample dispatch
cost is amortized to zero (the in-kernel form of SPP batching).

Scope (falls back to the wavefront path otherwise — chosen statically at
step-build time, the analogue of compiling a specialized RTPSO):
  * progressive mode, no ao_only, brute-force scenes (t_padded <= MAX_TRIS,
    no BVH),
  * env kinds constant/gradient (texture env maps need gathers that belong
    in the wavefront path).

RNG: the reference's TEA/LCG draws (RaytracingUtils.hlsli:26-45) are
precomputed OUTSIDE the kernel. Because the trace tree is static, each
sample consumes at most 5 LCG draws from the per-pixel chain; which draw
feeds which decision depends only on two traced flags (debug==2 light
picking, noIndirectDiffuse), so the kernel selects among the precomputed
draw rows u1..u5 — bit-identical sequences to the wavefront path, with no
integer ops in the kernel at all.

Layouts follow ops/intersect_pallas.py (measured on v5e): rays ride lanes,
triangles ride sublanes, per-ray state is 1-D [TILE_R] rows, hit attributes
come from a one-hot MXU matmul.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng

BIG = 3.0e38
RAY_EPSILON = 1.0e-4  # RaytracingCommon.hlsli:9
RAY_MAX_T = 1.0e38  # RaytracingCommon.hlsli:8
M_PI = 3.14159265358979323846
TWO_PI = 2.0 * M_PI
MAX_TRIS = 256  # one chunk. The sweep helpers below are chunk-looped and
# CPU-verified to CHUNK_T-multiples, but raising this cap to mid-size
# scenes OOMs VMEM on real hardware (measured: 4000 tris / 16 unrolled
# chunks -> Mosaic holds 208 MB of chunk intermediates live vs the 128 MB
# budget), and the projected win over the wavefront path at 4k tris is
# small (~178 vs 228 ms/sample: both are brute-force-bound). Mid-size
# scenes want the fused TRAVERSAL megakernel (ROADMAP), not bigger brute
# sweeps; a lax.fori_loop chunk body (one live chunk) is the stepping
# stone if that path needs >256 tris before the BVH lands.
N_DRAWS = 5  # max LCG draws any sample consumes (see module docstring)

# const_pack row 0 (lights + env colors)
C_DLDIR, C_DLCI, C_PLPOS, C_PLCI, C_ENV0, C_STRENGTH = 0, 3, 6, 9, 12, 15
# const_pack row 1 (flags + env color 1)
(
    F_COSINE,
    F_NO_IND,
    F_IS_MC,
    F_SHOW_DIRECT,
    F_SHOW_ALBEDO,
    F_SHOW_FRESNEL,
    F_SHOW_IND_SPEC,
    F_SHOW_IND_DIFF,
    F_ENV1,
) = 0, 1, 2, 3, 4, 5, 6, 7, 8

# attr_pack rows (scene/scene.py build())
A_N0, A_N1, A_N2 = 0, 3, 6
A_ALBEDO, A_SPECULAR, A_EMISSIVE = 10, 13, 16
A_ESTR, A_REFL, A_ROUGH, A_TYPE = 19, 20, 21, 23


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _normalize3(v, eps=1e-8):
    """vecmath.normalize parity: zero vectors map to zero."""
    n2 = _dot3(v, v)
    inv = jnp.where(n2 > eps, jax.lax.rsqrt(jnp.maximum(n2, eps)), 0.0)
    return (v[0] * inv, v[1] * inv, v[2] * inv), n2


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _perpendicular(u):
    """Branchless smallest-axis perpendicular (vecmath.get_perpendicular,
    parity with RaytracingUtils.hlsli:49-56)."""
    ax, ay, az = jnp.abs(u[0]), jnp.abs(u[1]), jnp.abs(u[2])
    xm = ((ax - ay) < 0) & ((ax - az) < 0)
    ym = ((ay - az) < 0) & ~xm
    zm = ~(xm | ym)
    axis = (
        xm.astype(jnp.float32),
        ym.astype(jnp.float32),
        zm.astype(jnp.float32),
    )
    return _cross3(u, axis)


def _onb(n):
    """(tangent, bitangent) frame (vecmath.orthonormal_basis)."""
    bit = _perpendicular(n)
    tan = _cross3(bit, n)
    return tan, bit


def _hemisphere_dir(n, r0, r1, cosine_flag):
    """Both hemisphere samplers from the same two draws, traced select
    (integrator parity: cos/uniform rebuilt from identical r0/r1)."""
    tan, bit = _onb(n)
    rr = jnp.sqrt(r0)
    phi = TWO_PI * r1
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    cy = jnp.sqrt(jnp.maximum(1.0 - r0, 0.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - r0 * r0, 0.0))
    cos_dir = tuple(
        (rr * cphi) * tan[k] + cy * n[k] + (rr * sphi) * bit[k] for k in range(3)
    )
    uni_dir = tuple(
        (sin_t * cphi) * tan[k] + r0 * n[k] + (sin_t * sphi) * bit[k]
        for k in range(3)
    )
    return tuple(
        jnp.where(cosine_flag > 0.5, cos_dir[k], uni_dir[k]) for k in range(3)
    )


USE_MXU_TERMS = False  # measured 2.2x SLOWER on v5e (65.5 vs 29.2 ms/dispatch): HIGHEST
# f32-emulation at K=16 cannot beat the 19 VPU FMA sweeps even at R=4096.


def _t_rows(mt_ref, o, o_scalar: bool = False):
    """Origin-only Möller–Trumbore t-numerator rows [C, TILE_R] (or [C, 1]
    for a lane-constant origin).

    t_d depends ONLY on the ray origin, so every sweep that shoots from the
    same origin set (the 2 shadow sweeps + both secondary closest sweeps all
    originate at the primary hit points) shares ONE evaluation — 4 of the
    34 per-pair term ops, paid once instead of per sweep."""
    c = mt_ref.shape[0] // 4

    def col(k):
        return mt_ref[3 * c : 4 * c, k][:, None]

    ob = list(o) if o_scalar else [o[k][None, :] for k in range(3)]
    return ob[0] * col(6) + ob[1] * col(7) + ob[2] * col(8) + col(9)


def _pair_terms(mt_ref, o, d, tmin, tmax, cull: bool, need_t: bool,
                r0: int = 0, rn: int | None = None, t_d=None,
                d_scalar: bool = False, o_scalar: bool = False,
                use_mxu: bool = False):
    """Möller–Trumbore validity/t for (tri, ray) pairs.

    o, d: 3-tuples of [TILE_R]; tmin/tmax [TILE_R] or scalar. r0/rn select
    a static row window of triangles (the cluster path) — default all.
    Same math as intersect_pallas._pair_block (which this kernel must agree
    with hit-for-hit up to fp reassociation). Returns (valid, t_pair, us,
    vs, det_abs), each [rn, TILE_R]; t_pair None when need_t=False.

    Operand-shape specializations (identical arithmetic, fewer VPU lanes):
      * d_scalar — d is a 3-tuple of rank-0 scalars (a lane-constant
        direction, e.g. the DIRECTIONAL-light shadow rays): det and the
        db-halves of u_d/v_d collapse to [rn, 1] per-triangle columns.
      * o_scalar — o is rank-0 scalars (the pinhole camera origin of the
        primary sweep): t_d collapses to [rn, 1].
      * t_d — precomputed _t_rows(...) for this origin set, sliced here.

    With USE_MXU_TERMS the four term groups are ONE [4C,16]@[16,R] matmul
    at HIGHEST precision: the MXU computes the 19 FMA sweeps while the VPU
    handles the sign/window mask — the units overlap, and at R=4096 the
    matmul is throughput- (not latency-) bound, unlike the per-chunk shapes
    in intersect_pallas where HIGHEST small-K dots measured 18x slow.
    """
    ob = list(o) if o_scalar else [o[k][None, :] for k in range(3)]
    db = list(d) if d_scalar else [d[k][None, :] for k in range(3)]
    m = [
        ob[1] * db[2] - ob[2] * db[1],
        ob[2] * db[0] - ob[0] * db[2],
        ob[0] * db[1] - ob[1] * db[0],
    ]

    c = mt_ref.shape[0] // 4
    if rn is None:
        rn = c
    if (use_mxu or USE_MXU_TERMS) and not d_scalar:
        # MXU form over the [r0, r0+rn) row window: the 19 term FMAs become
        # per-group [rn,16]@[16,R] dots at HIGHEST f32 (full precision; the
        # mask tail below stays VPU). Used by the DXR_MXU_SPLIT hybrid —
        # a tail of each sweep's rows rides the otherwise-idle MXU while
        # the VPU computes the leading rows (roofline.py measures whether
        # the units overlap; benchmarks record the A/B either way).
        ones = jnp.full_like(db[0], 1.0)
        ob_rows = (
            [ones * ob[k] for k in range(3)] if o_scalar else ob
        )
        lhs = jnp.concatenate(
            db + m + ob_rows + [ones] + [jnp.zeros_like(ones)] * 6,
            axis=0,
        )  # [16, R] rows: D, M, O, 1, pad

        def grp(g):
            return jax.lax.dot_general(
                mt_ref[g * c + r0 : g * c + r0 + rn, :],
                lhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        det = grp(0)
        u_d = grp(1)
        v_d = grp(2)
        t_d = t_d[r0 : r0 + rn] if t_d is not None else grp(3)
    else:
        def col(g, k):
            return mt_ref[g * c + r0 : g * c + r0 + rn, k][:, None]

        det = db[0] * col(0, 0) + db[1] * col(0, 1) + db[2] * col(0, 2)
        u_d = (
            db[0] * col(1, 0)
            + db[1] * col(1, 1)
            + db[2] * col(1, 2)
            + m[0] * col(1, 3)
            + m[1] * col(1, 4)
            + m[2] * col(1, 5)
        )
        v_d = (
            db[0] * col(2, 0)
            + db[1] * col(2, 1)
            + db[2] * col(2, 2)
            + m[0] * col(2, 3)
            + m[1] * col(2, 4)
            + m[2] * col(2, 5)
        )
        if t_d is None:
            t_d = (
                ob[0] * col(3, 6) + ob[1] * col(3, 7) + ob[2] * col(3, 8)
                + col(3, 9)
            )
        else:
            t_d = t_d[r0 : r0 + rn]

    s = jnp.sign(det)
    det_abs = det * s
    us = u_d * s
    vs = v_d * s
    ts = t_d * s
    eps = jnp.float32(1e-12)
    alive = (det > eps) if cull else (det_abs > eps)
    tmin_b = (tmin[None, :] if getattr(tmin, "ndim", 0) else tmin) * det_abs
    # Folded mask chain: the three non-strict window terms reduce through
    # ONE min + compare, the strict t terms through another — same boundary
    # semantics as the expanded chain (us>=0 & vs>=0 & us+vs<=det_abs;
    # ts>tmin_b [& ts<tmax_b]) with ~3 fewer VPU ops per pair across all 9
    # sweeps.
    m_soft = jnp.minimum(jnp.minimum(us, vs), det_abs - (us + vs))
    m_strict = ts - tmin_b
    # tmax=None means RAY_MAX_T: ts < 1e38*det_abs is always true for finite
    # scene coordinates, so 8 of the 9 sweeps skip the mul+sub+min entirely.
    if tmax is not None:
        tmax_b = (tmax[None, :] if getattr(tmax, "ndim", 0) else tmax) * det_abs
        m_strict = jnp.minimum(m_strict, tmax_b - ts)
    valid = alive & (m_soft >= 0.0) & (m_strict > 0.0)
    if not need_t:
        return valid, None, us, vs, det_abs
    t_pair = jnp.where(valid, ts / jnp.maximum(det_abs, eps), BIG)
    return valid, t_pair, us, vs, det_abs


# Cluster-gated sweeps (8-tri AABB clusters, pl.when per cluster — the
# in-kernel form of "BVH culling even on small scenes") measured 2.7x
# SLOWER than flat sweeps on the Cornell bench (54.7 vs 149.6 Mrays/s):
# the ~45 scalar branches per sample-tile and the VMEM scratch
# accumulation they force (merged best-hit state cannot live in vregs
# across pl.when bodies) cost far more than the ~30-40% pair-sweep savings.
# The sweeps below instead CHUNK the triangle list in an unconditional
# static loop with register-resident merges — identical codegen to the
# flat sweep for C <= CHUNK_T (one iteration), and the doorway to
# mid-size meshes (susanne-class) without [C, R] intermediates blowing
# VMEM. _pair_terms's r0/rn row window feeds each chunk.

CHUNK_T = 256  # triangles per in-kernel chunk ([CHUNK_T, TILE_R] fits VMEM)


def _mxu_split_rows() -> int:
    """DXR_MXU_SPLIT=<rows>: route the LAST <rows> triangle rows of every
    eligible sweep (not d_scalar — the per-triangle-column form is far
    cheaper on the VPU) through the MXU dot form of _pair_terms, so the
    matrix unit adds throughput in parallel with the VPU's leading rows.
    Trace-time knob (clear jit caches to retoggle); default 0 (off) until
    the hardware A/B says otherwise. Rounded down to a multiple of 8."""
    return int(os.environ.get("DXR_MXU_SPLIT", "0")) & ~7


def _sweep_spans(c: int, d_scalar: bool) -> list:
    """(r0, rn, use_mxu) chunk spans for one sweep: VPU chunks first, then
    the MXU tail span. Ascending row order keeps the lowest-row tie-break
    exact in _closest_hit (the MXU span owns the HIGHEST rows and merges
    last with a strict '<')."""
    k = 0 if d_scalar else min(_mxu_split_rows(), c - 8 if c > 8 else 0)
    cv = c - k
    spans = [
        (r0, min(CHUNK_T, cv - r0), False) for r0 in range(0, cv, CHUNK_T)
    ]
    if k:
        spans.append((cv, k, True))
    return spans


def _any_hit(mt_ref, o, d, tmin, tmax, t_d=None, d_scalar: bool = False):
    """Occlusion sweep: True rows where any triangle blocks. [TILE_R]."""
    c = mt_ref.shape[0] // 4
    occ = None
    for r0, rn, mx in _sweep_spans(c, d_scalar):
        valid, _, _, _, _ = _pair_terms(
            mt_ref, o, d, tmin, tmax, False, False, r0=r0, rn=rn,
            t_d=t_d, d_scalar=d_scalar, use_mxu=mx,
        )
        part = jnp.max(valid.astype(jnp.float32), axis=0)
        occ = part if occ is None else jnp.maximum(occ, part)
    return occ > 0.5


def _safe_inv(x):
    """1/x with zeros nudged off the singularity (slab-test convention)."""
    tiny = jnp.float32(1e-12)
    return 1.0 / jnp.where(jnp.abs(x) < tiny, tiny, x)


def _any_hit_clustered(
    mt_ref, cl_ref, occ_ref, o, d, tmin, tmax, clusters,
    t_d=None, d_scalar: bool = False,
):
    """Cluster-gated occlusion sweep (the FUSED_CLUSTERS experiment).

    MEASURED NEGATIVE on v5e (Cornell 512x512, 16-sample dispatches):
    FUSED_CLUSTERS=8/16/24 -> 63.8 / 69.7 / 74.2 Mrays/s vs 165.1 flat —
    2.2-2.6x SLOWER at every granularity, same failure mode as the round-2
    8-tri-cluster gating (RESULTS.md): ~18-45 pl.when branches per sample
    force the occlusion accumulator into VMEM and flush vreg state, costing
    far more than the 20-40%% of pair rows the gates skip. Together with
    the earlier dead ends (per-8-tri gating 2.7x slower, blocked pixel
    order 6%% slower) the conclusion is that BRANCH-BASED hierarchical
    culling loses at brute-force scene sizes on this VPU — config-1 gains
    past the ~165 Mrays/s sweep-op bound require fewer per-pair ops (done:
    _t_rows sharing + d_scalar/o_scalar collapsing, 149.6 -> 165-167), not
    skipped sweeps. Kept as an opt-in knob for re-testing on future
    hardware/compilers.

    clusters: static list of (r0, rn, k) row windows; cl_ref [K, 8] SMEM
    carries each cluster's AABB (lo xyz, hi xyz). Per cluster: a per-lane
    slab test against the ray's [tmin, tmax] window, reduced tile-wide —
    pl.when skips the whole [rn, TILE_R] pair sweep when NO live lane can
    reach the cluster. Occlusion state accumulates in the occ_ref scratch
    row (pl.when bodies cannot carry vreg state); lanes already occluded
    drop out of later gates. Conservative: gating never changes the result,
    only skips work (cluster AABBs get a 1e-4 margin for grazing rays)."""
    occ_ref[0, :] = jnp.zeros_like(occ_ref[0, :])
    inv = tuple(_safe_inv(d[k]) for k in range(3))
    hi_t = BIG if tmax is None else tmax
    for r0, rn, k in clusters:
        tn = tmin
        tf = hi_t
        for j in range(3):
            lo_j = (cl_ref[k, j] - o[j]) * inv[j]
            hi_j = (cl_ref[k, 3 + j] - o[j]) * inv[j]
            tn = jnp.maximum(tn, jnp.minimum(lo_j, hi_j))
            tf = jnp.minimum(tf, jnp.maximum(lo_j, hi_j))
        live = (tn <= tf) & (occ_ref[0, :] < 0.5)

        @pl.when(jnp.any(live))
        def _sweep(r0=r0, rn=rn):
            valid, _, _, _, _ = _pair_terms(
                mt_ref, o, d, tmin, tmax, False, False, r0=r0, rn=rn,
                t_d=t_d, d_scalar=d_scalar,
            )
            part = jnp.max(valid.astype(jnp.float32), axis=0)
            occ_ref[0, :] = jnp.maximum(occ_ref[0, :], part)

    return occ_ref[0, :] > 0.5


def _closest_hit(mt_ref, attr_ref, o, d, tmin, tmax, cull: bool,
                 t_d=None, o_terms=None):
    """Closest hit + fused attributes for one ray row set.

    Returns dict of [TILE_R] rows: hit (bool), t (miss -> -1), pos (3-tuple),
    normal (unit 3-tuple), and material rows via the one-hot MXU gather.
    Chunked version of intersect_pallas._closest_kernel: ascending-chunk
    merge with a strict '<' keeps the flat sweep's lowest-row tie-breaking.

    o_terms: rank-0 scalar origin (the pinhole camera) used for the term
    sweeps; `o` still supplies the [TILE_R] rows for the hit positions.
    """
    c = mt_ref.shape[0] // 4
    best_t = None
    for r0, rn, mx in _sweep_spans(c, False):
        _, t_pair, us, vs, det_abs = _pair_terms(
            mt_ref, o_terms if o_terms is not None else o, d,
            tmin, tmax, cull, True, r0=r0, rn=rn,
            t_d=t_d, o_scalar=o_terms is not None, use_mxu=mx,
        )
        k_t = jnp.min(t_pair, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 0)
        big_i = jnp.int32(2**30)
        k_local = jnp.min(
            jnp.where(t_pair == k_t[None, :], rows, big_i), axis=0
        )
        sel = (rows == k_local[None, :]).astype(jnp.float32)

        def pick(x, sel=sel):
            return jnp.sum(x * sel, axis=0)

        inv_det = 1.0 / jnp.maximum(pick(det_abs), 1e-12)
        k_u = pick(us) * inv_det
        k_v = pick(vs) * inv_det
        k_row = (k_local + r0).astype(jnp.float32)
        if best_t is None:
            best_t, best_row, c_u, c_v = k_t, k_row, k_u, k_v
        else:
            better = k_t < best_t
            best_t = jnp.where(better, k_t, best_t)
            best_row = jnp.where(better, k_row, best_row)
            c_u = jnp.where(better, k_u, c_u)
            c_v = jnp.where(better, k_v, c_v)
    c_t = best_t

    # one-hot attribute gather, chunked so sel stays [CHUNK_T, R]
    at = None
    rowf = best_row
    for r0 in range(0, c, CHUNK_T):
        rn = min(CHUNK_T, c - r0)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (rn, c_t.shape[0]), 0
        ) + r0
        sel = (rows == rowf.astype(jnp.int32)[None, :]).astype(jnp.float32)
        part = jax.lax.dot_general(
            attr_ref[:, r0 : r0 + rn],
            sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        at = part if at is None else at + part

    hit = c_t < BIG
    t = jnp.where(hit, c_t, -1.0)
    w = 1.0 - c_u - c_v
    nx = w * at[A_N0] + c_u * at[A_N1] + c_v * at[A_N2]
    ny = w * at[A_N0 + 1] + c_u * at[A_N1 + 1] + c_v * at[A_N2 + 1]
    nz = w * at[A_N0 + 2] + c_u * at[A_N1 + 2] + c_v * at[A_N2 + 2]
    n2 = nx * nx + ny * ny + nz * nz
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    normal = (nx * inv, ny * inv, nz * inv)
    pos = tuple(o[k] + t * d[k] for k in range(3))
    return {"hit": hit, "t": t, "pos": pos, "normal": normal, "at": at}


def _env_color(d, const_ref, env_kind: int):
    """Constant/gradient environment radiance (envmap.sample_environment
    parity for the in-kernel kinds). Returns 3-tuple of [TILE_R]."""
    strength = const_ref[0, C_STRENGTH]
    if env_kind == 0:
        return tuple(
            jnp.full_like(d[0], 1.0) * const_ref[0, C_ENV0 + k] * strength
            for k in range(3)
        )
    # gradient: horizon*(1-t) + zenith*t, t = clip(y*0.5+0.5)
    t = jnp.clip(d[1] * 0.5 + 0.5, 0.0, 1.0)
    return tuple(
        (const_ref[0, C_ENV0 + k] * (1.0 - t) + const_ref[1, F_ENV1 + k] * t)
        * strength
        for k in range(3)
    )


def _direct_lighting(mt_ref, const_ref, pos, normal, pick_draw, active,
                     t_d=None, clusters=None, cl_ref=None, occ_ref=None,
                     mc_static: bool = False):
    """Direct term for both lights with shadow any-hit sweeps + the debug==2
    one-of-two MC estimator (integrator._direct_lighting parity).

    t_d: shared _t_rows(mt_ref, pos) from the caller (both shadow sweeps
    originate at `pos`; the caller's secondary closest sweeps share it too).
    The directional-light sweep keeps its direction as rank-0 SMEM scalars,
    collapsing its det and the db-halves of u_d/v_d to per-triangle columns.

    mc_static: compile the debug==2 MC estimator ONLY (caller must run with
    options["debug"]==2): the two per-light sweeps merge into ONE sweep
    whose per-lane direction/t_max are where-selected by the pick draw —
    each lane needs only its picked light's visibility
    (/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:91-104 picks
    1 of the 2 lights), so one vector sweep replaces the point sweep + the
    d_scalar directional sweep. The per-lane math matches the traced mc
    branch exactly (selection before the dot/occlusion changes no values).

    Returns 3-tuple of [TILE_R]."""
    dl = tuple(const_ref[0, C_DLDIR + k] for k in range(3))  # rank-0
    # point light
    path = tuple(const_ref[0, C_PLPOS + k] - pos[k] for k in range(3))
    d2 = jnp.maximum(_dot3(path, path), 0.0)
    dist = jnp.sqrt(d2)
    lp, _ = _normalize3(path)
    if t_d is None:
        t_d = _t_rows(mt_ref, pos)
    tmax_p = jnp.maximum(dist - RAY_EPSILON, RAY_EPSILON)
    if mc_static:
        pick_p = pick_draw >= 0.5
        dm = tuple(jnp.where(pick_p, lp[k], dl[k]) for k in range(3))
        # Directional lanes get the no-clamp window: BIG*det_abs saturates
        # to +inf for large dets, and inf - ts > 0 for every finite ts, so
        # the merged sweep's validity matches the tmax=None sweep exactly.
        tmax_m = jnp.where(pick_p, tmax_p, BIG)
        if clusters:
            occ_m = _any_hit_clustered(
                mt_ref, cl_ref, occ_ref, pos, dm, RAY_EPSILON, tmax_m,
                clusters, t_d=t_d,
            )
        else:
            occ_m = _any_hit(mt_ref, pos, dm, RAY_EPSILON, tmax_m, t_d=t_d)
        vis = jnp.where(active & ~occ_m, 1.0, 0.0)
        nol = _saturate(_dot3(normal, dm))
        # Same expression order as the two-sweep path below, so the mc
        # branch is bit-identical lane-for-lane.
        falloff = 1.0 / (TWO_PI * jnp.maximum(dist * dist, 1e-12))
        dterm = nol * vis
        pterm = nol * vis * falloff
        return tuple(
            jnp.where(
                pick_p,
                (const_ref[0, C_PLCI + k] * pterm) * 2.0,
                (const_ref[0, C_DLCI + k] * dterm) * 2.0,
            )
            for k in range(3)
        )
    if clusters:
        occ_d = _any_hit_clustered(
            mt_ref, cl_ref, occ_ref, pos, dl, RAY_EPSILON, None, clusters,
            t_d=t_d, d_scalar=True,
        )
        occ_p = _any_hit_clustered(
            mt_ref, cl_ref, occ_ref, pos, lp, RAY_EPSILON, tmax_p, clusters,
            t_d=t_d,
        )
    else:
        occ_d = _any_hit(mt_ref, pos, dl, RAY_EPSILON, None, t_d=t_d,
                         d_scalar=True)
        occ_p = _any_hit(mt_ref, pos, lp, RAY_EPSILON, tmax_p, t_d=t_d)
    d_vis = jnp.where(active & ~occ_d, 1.0, 0.0)
    p_vis = jnp.where(active & ~occ_p, 1.0, 0.0)
    nol_d = _saturate(_dot3(normal, dl))
    nol_p = _saturate(_dot3(normal, lp))
    falloff = 1.0 / (TWO_PI * jnp.maximum(dist * dist, 1e-12))
    dterm = nol_d * d_vis
    pterm = nol_p * p_vis * falloff
    d_c = tuple(const_ref[0, C_DLCI + k] * dterm for k in range(3))
    p_c = tuple(const_ref[0, C_PLCI + k] * pterm for k in range(3))
    full = tuple(d_c[k] + p_c[k] for k in range(3))
    mc = tuple(
        jnp.where(pick_draw < 0.5, d_c[k] * 2.0, p_c[k] * 2.0) for k in range(3)
    )
    is_mc = const_ref[1, F_IS_MC] > 0.5
    return tuple(jnp.where(is_mc, mc[k], full[k]) for k in range(3))


def _secondary_radiance(
    mt_ref, attr_ref, const_ref, o, d, pick_draw, active, env_kind: int,
    realtime: bool = False, t_d=None, clusters=None, cl_ref=None,
    occ_ref=None, defer_env: bool = False, mc_static: bool = False,
):
    """Depth-1 radiance: closest hit, direct lighting, emissive — specular
    and indirect cut by MAX_RADIANCE_RAY_DEPTH (integrator._secondary_radiance
    parity; realtime mode omits the emissive term,
    RealtimeRaytracing.hlsl:102). t_d: shared _t_rows for origin set `o`.

    defer_env (texture env kinds): miss lanes contribute 0 in-kernel; the
    returned env mask (active & miss) marks where the host must add
    env(d) — resolved OUTSIDE the kernel with miss-compacted XLA gathers
    (the same deferred pattern as fused_traverse_pallas).
    Returns (3-tuple [TILE_R], env mask or None)."""
    h = _closest_hit(
        mt_ref, attr_ref, o, d, RAY_EPSILON, None, cull=False, t_d=t_d
    )
    hit = h["hit"] & active
    env = None if defer_env else _env_color(d, const_ref, env_kind)
    direct = _direct_lighting(
        mt_ref, const_ref, h["pos"], h["normal"], pick_draw, hit,
        clusters=clusters, cl_ref=cl_ref, occ_ref=occ_ref,
        mc_static=mc_static,
    )
    at = h["at"]
    out = []
    for k in range(3):
        shade = at[A_ALBEDO + k] * direct[k] / M_PI
        if not realtime:
            shade = at[A_EMISSIVE + k] * at[A_ESTR] + shade
        if defer_env:
            out.append(jnp.where(hit, shade, 0.0))
        else:
            out.append(
                jnp.where(hit, shade, jnp.where(active, env[k], 0.0))
            )
    return tuple(out), (active & ~hit if defer_env else None)


def _sanitize(x):
    return jnp.where(jnp.isnan(x), 0.0, jnp.maximum(x, 0.0))


def _fused_kernel(
    cam_ref,  # SMEM [S, 16]
    const_ref,  # SMEM [2, 16]
    cl_ref,  # SMEM [K, 8] cluster AABBs (FUSED_CLUSTERS; [1, 8] dummy when off)
    mt_ref,  # VMEM [4*C, 16] (term-group-major Möller–Trumbore coefficients)
    attr_ref,  # VMEM [32, C]
    seed_ref,  # VMEM [1, 1, TILE_R] uint32 (TEA pixel seeds for this sample)
    out_ref,  # VMEM [8, TILE_R] (rows 0..2 = summed color)
    sec_ref,  # VMEM scratch [8, TILE_R]: rows 0-2 diffuse-, 3-5 spec-secondary
    occ_ref,  # VMEM scratch [1, TILE_R]: cluster-gated occlusion accumulator
    *,
    width: int,
    height: int,
    tile_r: int,
    env_kind: int,
    block_w: int = 0,
    realtime: bool = False,
    full_height: int = 0,
    cluster_rows: int = 0,
    env_deferred: bool = False,
    light_mc: bool = False,
):
    i = pl.program_id(0)
    s = pl.program_id(1)
    c_tris = mt_ref.shape[0] // 4
    clusters = (
        [
            (r0, min(cluster_rows, c_tris - r0), k)
            for k, r0 in enumerate(range(0, c_tris, cluster_rows))
        ]
        if cluster_rows and c_tris > cluster_rows
        else None
    )

    # ---- RayGen (primary_ray_grid parity) --------------------------------
    lane = jnp.max(
        jax.lax.broadcasted_iota(jnp.int32, (1, tile_r), 1), axis=0
    )
    if block_w:
        # Blocked pixel order: each tile is one block_w x (tile_r/block_w)
        # pixel block, so tile-wide sweep skips (spec_any) key on a compact
        # screen region instead of an 8-row slab across the whole image.
        # Seeds arrive pre-permuted; the host unpermutes the output.
        block_h = tile_r // block_w
        wb = width // block_w
        by = i // wb
        bx = i % wb
        px = bx * block_w + lane % block_w
        py = by * block_h + lane // block_w
    else:
        lin = i * tile_r + lane
        px = lin % width
        py = lin // width
    ndcx = (px.astype(jnp.float32) + 0.5) / jnp.float32(width) * 2.0 - 1.0
    # Row-sharded launches (multi-chip "tile" axis) render a row block of a
    # taller image: cam lane 12 carries the global row offset, full_height
    # the global height, so NDC matches the single-chip render exactly.
    pyf = py.astype(jnp.float32) + cam_ref[s, 12]
    ndcy = (pyf + 0.5) / jnp.float32(full_height or height) * 2.0 - 1.0
    du = tuple(cam_ref[s, 3 + k] for k in range(3))
    dv = tuple(cam_ref[s, 6 + k] for k in range(3))
    dw = tuple(cam_ref[s, 9 + k] for k in range(3))
    dun = tuple(ndcx * du[k] + (-ndcy) * dv[k] + dw[k] for k in range(3))
    norm = jnp.sqrt(_dot3(dun, dun))
    d = tuple(dun[k] / norm for k in range(3))
    o = tuple(cam_ref[s, 0 + k] + 0.0 * d[0] for k in range(3))

    # LCG draws u1..u5 from the TEA pixel seed (nextRand parity,
    # RaytracingUtils.hlsli:41-45) — integer ops on lanes, 3 per draw.
    seed = seed_ref[0, 0, :]
    us_draws = []
    for _ in range(N_DRAWS):
        seed = seed * jnp.uint32(1664525) + jnp.uint32(1013904223)
        # Mosaic has no uint32->f32 cast; the masked value fits in 24 bits,
        # so the int32 route is exact.
        masked = (seed & jnp.uint32(0x00FFFFFF)).astype(jnp.int32)
        us_draws.append(masked.astype(jnp.float32) / jnp.float32(0x01000000))
    u1, u2, u3, u4, u5 = us_draws
    is_mc = const_ref[1, F_IS_MC] > 0.5
    no_ind = const_ref[1, F_NO_IND] > 0.5
    cosine = const_ref[1, F_COSINE]

    # ---- primary closest hit (cull backfaces, ProgressiveRaytracing.hlsl:34)
    # o_terms: the pinhole origin is lane-constant, so the primary sweep's
    # t_d and moments collapse to per-triangle columns.
    h = _closest_hit(
        mt_ref, attr_ref, o, d, 0.0, None, cull=True,
        o_terms=tuple(cam_ref[s, k] for k in range(3)),
    )
    hit = h["hit"]
    pos, normal, at = h["pos"], h["normal"], h["at"]
    # deferred env: the host recomputes the primary directions with
    # primary_ray_grid (bit-identical raygen) and substitutes env on miss
    # lanes itself — no in-kernel primary env at all.
    env_primary = None if env_deferred else _env_color(d, const_ref, env_kind)

    # Shared origin-only t rows for EVERY sweep shooting from the primary
    # hit points: both direct-shadow sweeps + both secondary closest sweeps.
    t_d_pos = _t_rows(mt_ref, pos)

    # ---- direct lighting (draw u1 = MC light pick) ------------------------
    direct = _direct_lighting(
        mt_ref, const_ref, pos, normal, u1, hit, t_d=t_d_pos,
        clusters=clusters, cl_ref=cl_ref, occ_ref=occ_ref,
        mc_static=light_mc,
    )

    # ---- indirect diffuse bounce direction (draws u1/u2 or u2/u3) ---------
    # (realtime mode traces no indirect diffuse, RealtimeRaytracing.hlsl —
    # its phong draws therefore always use the no-diffuse slots)
    if not realtime:
        r0_dif = jnp.where(is_mc, u2, u1)
        r1_dif = jnp.where(is_mc, u3, u2)
        diff_dir = _hemisphere_dir(normal, r0_dif, r1_dif, cosine)

    # ---- Phong specular lobe (samplePhongLobe parity) ----------------------
    if realtime:
        r0_ph = jnp.where(is_mc, u2, u1)
        r1_ph = jnp.where(is_mc, u3, u2)
    else:
        r0_ph = jnp.where(
            no_ind, jnp.where(is_mc, u2, u1), jnp.where(is_mc, u4, u3)
        )
        r1_ph = jnp.where(
            no_ind, jnp.where(is_mc, u3, u2), jnp.where(is_mc, u5, u4)
        )
    mtype = at[A_TYPE]
    refl = at[A_REFL]
    spec_active = (
        hit & ((jnp.abs(mtype - 1.0) < 0.5) | (jnp.abs(mtype - 2.0) < 0.5))
        & (refl > 0.001)
    )
    exponent = jnp.exp((1.0 - at[A_ROUGH]) * 12.0)
    don = _dot3(d, normal)
    mirror_un = tuple(d[k] - 2.0 * don * normal[k] for k in range(3))
    mirror, _ = _normalize3(mirror_un)
    tan, bit = _onb(mirror)
    cos_t = jnp.power(r0_ph, 1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * r1_ph
    powered_cos = jnp.power(cos_t, exponent)
    pdf = (exponent + 1.0) / TWO_PI * powered_cos
    brdf = (exponent + 2.0) / TWO_PI * powered_cos
    xs = sin_t * jnp.cos(phi)
    zs = sin_t * jnp.sin(phi)
    phong_dir = tuple(
        xs * tan[k] + cos_t * mirror[k] + zs * bit[k] for k in range(3)
    )

    # ---- secondary bounces (each: closest + 2 shadow sweeps) --------------
    # Tile-level sweep skips: each secondary costs 3 of the sample's 9 pair
    # sweeps, and its result is exactly zero when no lane needs it (the
    # epilogue masks by no_ind / spec_active), so gate the whole evaluation
    # on a tile-wide reduction — tiles with no glossy lane (most of the
    # Cornell walls) skip a third of their work.
    spec_any = jnp.any(spec_active)

    if not realtime:
        @pl.when(~no_ind)
        def _sec_diffuse():
            s3, emask = _secondary_radiance(
                mt_ref, attr_ref, const_ref, pos, diff_dir, u1, hit, env_kind,
                t_d=t_d_pos, clusters=clusters, cl_ref=cl_ref,
                occ_ref=occ_ref, defer_env=env_deferred, mc_static=light_mc,
            )
            for k in range(3):
                sec_ref[k, :] = s3[k]
            if env_deferred:
                sec_ref[6, :] = emask.astype(jnp.float32)

        @pl.when(no_ind)
        def _sec_diffuse_zero():
            for k in range(3):
                sec_ref[k, :] = jnp.zeros_like(sec_ref[k, :])
            if env_deferred:
                sec_ref[6, :] = jnp.zeros_like(sec_ref[6, :])

    @pl.when(spec_any)
    def _sec_spec():
        s3, emask = _secondary_radiance(
            mt_ref, attr_ref, const_ref, pos, phong_dir, u1, spec_active,
            env_kind, realtime=realtime, t_d=t_d_pos, clusters=clusters,
            cl_ref=cl_ref, occ_ref=occ_ref, defer_env=env_deferred,
            mc_static=light_mc,
        )
        for k in range(3):
            sec_ref[3 + k, :] = s3[k]
        if env_deferred:
            sec_ref[7, :] = emask.astype(jnp.float32)

    @pl.when(~spec_any)
    def _sec_spec_zero():
        for k in range(3):
            sec_ref[3 + k, :] = jnp.zeros_like(sec_ref[3 + k, :])
        if env_deferred:
            sec_ref[7, :] = jnp.zeros_like(sec_ref[7, :])

    spec_rad = tuple(sec_ref[3 + k, :] for k in range(3))

    if not realtime:
        sec = tuple(sec_ref[k, :] for k in range(3))
        # ---- combine (integrator.trace_rays epilogue parity) ---------------
        nol = _saturate(_dot3(normal, diff_dir))
        indirect = tuple(
            jnp.where(
                no_ind,
                0.0,
                jnp.where(
                    cosine > 0.5, sec[k] * M_PI, sec[k] * (nol * TWO_PI)
                ),
            )
            for k in range(3)
        )
    ratio = jnp.where(
        pdf > 1e-30,
        brdf / jnp.maximum(pdf, 1e-30),
        (exponent + 2.0) / (exponent + 1.0),
    )
    cosi = _saturate(-_dot3(d, normal))
    pw5 = jnp.power(1.0 - cosi, 5.0)

    if realtime:
        # Realtime epilogue (trace_rays mode="realtime" parity): two AOVs +
        # gbuffer rows, miss routes env into the direct AOV
        # (RealtimeRaytracing.hlsl:119-126). Rows: 0-2 direct, 3-5 indirect
        # specular, 6-8 albedo, 9 roughness. Rows 10-15 stay unwritten —
        # the composite color (direct + indirect specular, exactly the
        # kernel's old rows 10-12) is summed on the host, and nothing
        # reads past row 9, so the old 16-row zero-init + combined-row
        # writes were pure epilogue overhead (rt_anatomy's 1.23x per-sweep
        # realtime tree factor). DXR_RT_WIDE=1 (trace-time knob, A/B
        # benchmark only) restores the old wide epilogue.
        #
        # env_deferred (texture env kinds): same layout as the FT realtime
        # deferred epilogue — rows 0-2 carry the HIT-only direct term (the
        # host substitutes env(primary) on miss lanes itself), 10 the hit
        # mask, 11-13 the specular bounce dir, 14-16 its per-channel env
        # weight; the host resolves env with miss-compacted XLA gathers
        # (_fused_realtime_outputs_impl).
        wide = (not env_deferred) and (
            os.environ.get("DXR_RT_WIDE", "0") == "1"
        )
        if wide:
            out_ref[:, :] = jnp.zeros_like(out_ref)
        if env_deferred:
            smask = sec_ref[7, :]
        for k in range(3):
            specular = jnp.where(spec_active, spec_rad[k] * ratio, 0.0)
            f0 = at[A_SPECULAR + k]
            fresnel = jnp.where(spec_active, f0 + (1.0 - f0) * pw5, 0.0)
            albedo = at[A_ALBEDO + k]
            da = albedo * direct[k] / M_PI
            sa = refl * specular * fresnel
            if env_deferred:
                ws = refl * ratio * fresnel * smask
                out_ref[k, :] = _sanitize(jnp.where(hit, da, 0.0))
                out_ref[11 + k, :] = phong_dir[k]
                out_ref[14 + k, :] = _sanitize(jnp.where(hit, ws, 0.0))
            else:
                out_ref[k, :] = _sanitize(
                    jnp.where(hit, da, env_primary[k])
                )
            out_ref[3 + k, :] = _sanitize(jnp.where(hit, sa, 0.0))
            out_ref[6 + k, :] = jnp.where(hit, albedo, 0.0)
            if wide:
                out_ref[10 + k, :] = _sanitize(
                    jnp.where(hit, da + sa, env_primary[k])
                )
        out_ref[9, :] = jnp.where(hit, at[A_ROUGH], 0.0)
        if env_deferred:
            out_ref[10, :] = hit.astype(jnp.float32)
        return

    color = []
    show_direct = const_ref[1, F_SHOW_DIRECT] > 0.5
    show_albedo = const_ref[1, F_SHOW_ALBEDO] > 0.5
    show_fresnel = const_ref[1, F_SHOW_FRESNEL] > 0.5
    show_ispec = const_ref[1, F_SHOW_IND_SPEC] > 0.5
    show_idiff = const_ref[1, F_SHOW_IND_DIFF] > 0.5
    wd = []
    ws = []
    for k in range(3):
        specular = jnp.where(spec_active, spec_rad[k] * ratio, 0.0)
        f0 = at[A_SPECULAR + k]
        fresnel = jnp.where(spec_active, f0 + (1.0 - f0) * pw5, 0.0)
        albedo = at[A_ALBEDO + k]
        diffuse_comp = (direct[k] + indirect[k]) / M_PI
        emissive = at[A_EMISSIVE + k] * at[A_ESTR]
        full = emissive + albedo * diffuse_comp + refl * specular * fresnel
        c = full
        c = jnp.where(show_direct, albedo * direct[k] / M_PI, c)
        c = jnp.where(show_albedo, albedo, c)
        c = jnp.where(show_fresnel, fresnel, c)
        c = jnp.where(show_ispec, refl * specular * fresnel, c)
        c = jnp.where(show_idiff, albedo * indirect[k] / M_PI, c)
        if env_deferred:
            # env-dependent terms resolve OUTSIDE the kernel; per-lane env
            # weights follow the same mode selection as the color (exactly
            # fused_traverse_pallas's env_deferred epilogue):
            #   diffuse env: color += albedo * (sec_env * factor) / pi
            #   specular env: color += refl * (sec_env * ratio) * fresnel
            dmask = sec_ref[6, :]
            smask = sec_ref[7, :]
            ind_factor = jnp.where(cosine > 0.5, M_PI, nol * TWO_PI)
            wd_on = ~(show_direct | show_albedo | show_fresnel | show_ispec)
            ws_on = ~(show_direct | show_albedo | show_fresnel | show_idiff)
            wd.append(_sanitize(jnp.where(
                wd_on & ~no_ind,
                albedo * ind_factor / M_PI * dmask, 0.0,
            )))
            ws.append(_sanitize(jnp.where(
                ws_on, refl * ratio * fresnel * smask, 0.0
            )))
            c = jnp.where(hit, c, 0.0)
        else:
            c = jnp.where(hit, c, env_primary[k])
        color.append(_sanitize(c))

    if env_deferred:
        # Each sample s owns its own 16-row out block (out_specs maps s to
        # block row s). Layout matches the fused-traversal deferred kernel:
        # 0-2 color (env-free), 3 hit, 4-6 diffuse bounce dir, 7-9 its
        # per-channel env weight, 10-12 specular bounce dir, 13-15 its
        # weight. Host adds weight * env(dir) + primary env.
        for k in range(3):
            out_ref[k, :] = color[k]
            out_ref[4 + k, :] = diff_dir[k]
            out_ref[7 + k, :] = wd[k]
            out_ref[10 + k, :] = phong_dir[k]
            out_ref[13 + k, :] = ws[k]
        out_ref[3, :] = hit.astype(jnp.float32)
        return

    @pl.when(s == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    for k in range(3):
        out_ref[k, :] = out_ref[k, :] + color[k]


def supports_fused(scene: dict, mode: str, ao_only: bool) -> bool:
    """Static eligibility for the megakernel path."""
    if mode not in ("progressive", "realtime") or ao_only:
        return False
    if "tlas" in scene:
        return False
    if "bvh" in scene:
        # A BVH auto-attached ONLY for texture-env routing (scene.py
        # tex_autoroute tag) doesn't disqualify the brute megakernel:
        # tiny scenes are ~2-5x faster brute than via traversal, so BOTH
        # pipelines keep them here (env-deferred).
        if "tex_autoroute" not in scene["bvh"]:
            return False
    if int(scene["mt_pack"].shape[1]) > MAX_TRIS:
        return False
    from ..scene.lights import light_counts

    if "textures" in scene:
        # Textured albedo needs per-hit UV gathers into an arbitrarily
        # large table; textured scenes take the wavefront path.
        return False
    if light_counts(scene["lights"]) != (1, 1, 0):
        # The megakernel bakes the reference's fixed 1 dir + 1 point rig;
        # arbitrary rigs take the wavefront path (integrator._direct_lighting).
        return False
    kind = int(scene["env"]["kind"])
    if kind in (2, 3):
        # Texture env (latlong/cubemap): both modes run ENV-DEFERRED —
        # bounce dirs + env weights out, env resolved with miss-compacted
        # XLA gathers outside (progressive round 4; realtime rides the same
        # pattern with the FT realtime-deferred row layout — tiny scenes
        # measured ~5x faster brute than via the FT traversal walk).
        return True
    return kind in (0, 1)


def pack_cameras(cameras: dict, realtime: bool, py0=None) -> jnp.ndarray:
    """Camera pack [S, 16]: origin(0:3) u(3:6) v(6:9) w(9:12); jitter folded
    into the origin at the mode's scale (ProgressiveRaytracing.hlsl:28-30).
    Lane 12 carries the global row offset for row-sharded launches (exact in
    f32 for any realistic image height)."""
    s_count = int(cameras["frame_count"].shape[0])
    jit = cameras["jitter"] * (10.0 if realtime else 30.0)
    origin = cameras["eye"] + jnp.concatenate(
        [jit, jnp.zeros((s_count, 1), jnp.float32)], axis=1
    )
    if py0 is None:
        tail = jnp.zeros((s_count, 4), jnp.float32)
    else:
        tail = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.asarray(py0, jnp.float32).reshape(1, 1), (s_count, 1)
                ),
                jnp.zeros((s_count, 3), jnp.float32),
            ],
            axis=1,
        )
    return jnp.concatenate(
        [origin, cameras["u"], cameras["v"], cameras["w"], tail], axis=1
    )


def pack_consts(scene: dict, options: dict, env_kind: int) -> jnp.ndarray:
    """Lights / env / flags pack [2, 16] (row layout: C_* / F_* constants).

    normalize_lights canonicalizes every rig form supports_fused accepts
    (single dicts, one-light lists, stacked [1, ...] arrays) so the row
    unpack below never sees a list."""
    from ..scene.lights import normalize_lights

    lights_n = normalize_lights(scene["lights"])

    def first(group):
        # First light of the group, or zeros when the group is empty (the
        # fused kernels build their direction sets from STATIC rig counts,
        # so an absent group's const lanes are never read).
        out = {}
        for k, v in group.items():
            if int(v.shape[0]) == 0:
                out[k] = (jnp.zeros(3, jnp.float32) if k != "intensity"
                          else jnp.float32(0.0))
            else:
                out[k] = (v.reshape(-1)[:3] if k != "intensity"
                          else v.reshape(-1)[0])
        return out

    dl = first(lights_n["dir"])
    pt = first(lights_n["point"])
    fwd = dl["forward"]
    n2 = jnp.sum(fwd * fwd)
    inv = jnp.where(n2 > 1e-8, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-8)), 0.0)
    dl_dir = -fwd * inv
    env = scene["env"]
    if env_kind == 0:
        env0, env1 = env["const_color"], jnp.zeros(3, jnp.float32)
    elif env_kind == 1:
        env0, env1 = env["grad_horizon"], env["grad_zenith"]
    else:  # texture env kinds sample outside the kernel (hybrid path)
        env0 = env1 = jnp.zeros(3, jnp.float32)
    row0 = jnp.concatenate(
        [
            dl_dir,
            dl["color"] * dl["intensity"],
            pt["position"],
            pt["color"] * pt["intensity"],
            env0,
            env["strength"][None],
        ]
    )
    opts = options
    flags = jnp.stack(
        [
            opts["cosine_hemisphere_sampling"].astype(jnp.float32),
            opts["no_indirect_diffuse"].astype(jnp.float32),
            (opts["debug"] == 2).astype(jnp.float32),
            opts["show_direct_lighting_only"].astype(jnp.float32),
            opts["show_gbuffer_albedo_only"].astype(jnp.float32),
            opts["show_fresnel_term"].astype(jnp.float32),
            opts["show_indirect_specular_only"].astype(jnp.float32),
            opts["show_indirect_diffuse_only"].astype(jnp.float32),
        ]
    )
    row1 = jnp.concatenate([flags, env1, jnp.zeros(5, jnp.float32)])
    return jnp.stack([row0, row1])


# area const pack lanes (pack_area_consts row 0)
AC_CORNER, AC_EU, AC_EV, AC_CI, AC_NL, AC_AREA = 0, 3, 6, 9, 12, 15


def pack_area_consts(scene: dict) -> jnp.ndarray:
    """Area-light pack [1, 16]: corner(0:3) eu(3:6) ev(6:9)
    color*intensity(9:12) unit normal(12:15) quad area(15) — the SMEM
    constants the fused traversal kernel's in-kernel soft-shadow walk needs
    (scene/lights.area_light; geometry terms match
    trace/integrator._direct_lighting)."""
    from ..scene.lights import normalize_lights

    al = normalize_lights(scene["lights"])["area"]
    corner = al["corner"].reshape(-1)[:3]
    eu = al["eu"].reshape(-1)[:3]
    ev = al["ev"].reshape(-1)[:3]
    ci = (al["color"] * al["intensity"][:, None]).reshape(-1)[:3]
    cross = jnp.cross(eu, ev)
    area = jnp.sqrt(jnp.maximum(jnp.sum(cross * cross), 1e-24))
    n_l = cross / jnp.maximum(area, 1e-12)
    return jnp.concatenate([corner, eu, ev, ci, n_l, area[None]])[None]


def _pick_tile(c: int) -> int:
    return 4096 if c <= 64 else 1024


def _env_knobs(c: int) -> tuple[int, int, int]:
    """Read the FUSED_TILE / FUSED_BLOCK_W / FUSED_CLUSTERS sweep knobs from
    the environment.

    FUSED_CLUSTERS=N gates each N-triangle-row window of the occlusion
    sweeps behind a tile-wide AABB slab test (_any_hit_clustered); 0 = off.

    Called from the UNJITTED wrappers only, so changes between calls reach
    the jit cache as static-arg changes instead of being silently ignored."""
    import os

    tile_r = int(os.environ.get("FUSED_TILE", "0")) or _pick_tile(c)
    block_w = int(os.environ.get("FUSED_BLOCK_W", "0"))
    cluster_rows = int(os.environ.get("FUSED_CLUSTERS", "0"))
    return tile_r, block_w, cluster_rows


def _cluster_aabbs(scene: dict, cluster_rows: int) -> jnp.ndarray:
    """Per-cluster AABBs [K, 8] (lo xyz, hi xyz, pad) over the padded
    triangle rows, degenerate padding rows excluded, 1e-4 margin for
    grazing rays. Constant-folds when the scene is baked as jit constants."""
    v0, e1, e2 = scene["v0"], scene["e1"], scene["e2"]
    c = v0.shape[0]
    k_count = -(-c // cluster_rows)
    pad = k_count * cluster_rows - c
    deg = (jnp.sum(jnp.abs(e1), 1) + jnp.sum(jnp.abs(e2), 1)) == 0.0
    p1, p2 = v0 + e1, v0 + e2
    lo = jnp.minimum(jnp.minimum(v0, p1), p2)
    hi = jnp.maximum(jnp.maximum(v0, p1), p2)
    lo = jnp.where(deg[:, None], BIG, lo)
    hi = jnp.where(deg[:, None], -BIG, hi)
    if pad:
        lo = jnp.concatenate([lo, jnp.full((pad, 3), BIG, jnp.float32)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -BIG, jnp.float32)])
    lo = lo.reshape(k_count, cluster_rows, 3).min(axis=1) - 1e-4
    hi = hi.reshape(k_count, cluster_rows, 3).max(axis=1) + 1e-4
    return jnp.concatenate(
        [lo, hi, jnp.zeros((k_count, 2), jnp.float32)], axis=1
    )


def _fused_dispatch(
    scene: dict,
    options: dict,
    cameras: dict,
    width: int,
    height: int,
    env_kind: int,
    interpret: bool = False,
    realtime: bool = False,
    tile_r: int = 0,
    block_w: int = 0,
    py0=None,
    full_height: int = 0,
    cluster_rows: int = 0,
    env_deferred: bool = False,
    light_mc: bool = False,
):
    """Shared host side of the megakernel: packs constants/cameras/seeds and
    launches _fused_kernel. Returns (out [rows, n], inv_perm or None).

    light_mc: compile the debug==2 MC one-of-two light estimator statically
    (merged single shadow sweep per direct-lighting call — 9 sweeps become
    7); the caller must run with options["debug"]==2.

    Progressive: sum of S samples accumulated in the out block.

    cameras: CameraParams pytree stacked on a leading [S] axis (jitter
    already drawn per sample; origin offset applied here at jitter_scale=30,
    ProgressiveRaytracing.hlsl:28-30 / integrator.primary_ray_grid).
    Returns [H, W, 3] float32 (divide by S for the mean).

    py0/full_height: row-sharded launches (multi-chip "tile" axis) render
    rows [py0, py0+height) of a full_height-tall image — NDC and the TEA
    pixel seeds use GLOBAL coordinates so shards reproduce the single-chip
    image bit-for-bit.
    """
    s_count = int(cameras["frame_count"].shape[0])
    n = width * height
    c = int(scene["mt_pack"].shape[1])
    tile_r = tile_r or _pick_tile(c)
    r_pad = -(-n // tile_r) * tile_r

    # Blocked pixel order (square-ish blocks of tile_r pixels) when the
    # image tiles evenly — concentrates material variation so the in-kernel
    # spec_any skip fires on most tiles.
    # Blocked pixel order measured ~6% SLOWER than raster slabs on the
    # Cornell bench (141 vs 149.6 Mrays/s at block_w 64/128/256) even though
    # compact blocks skip the spec secondary on more tiles — the raster
    # slabs' skips plus cheaper raygen win. Kept as an env opt-in for
    # scenes whose glossy coverage is genuinely block-local.
    # block_w must divide tile_r exactly — a truncated block_h would make
    # the in-kernel px/py mapping disagree with the host permutation.
    block_h = tile_r // block_w if block_w else 1
    if (not block_w or tile_r % block_w or width % block_w
            or height % block_h):
        block_w = 0  # raster fallback
        perm = None
    else:
        pys, pxs = np.meshgrid(
            np.arange(height, dtype=np.int64),
            np.arange(width, dtype=np.int64),
            indexing="ij",
        )
        lin2d = pys * width + pxs
        perm = (
            lin2d.reshape(height // block_h, block_h,
                          width // block_w, block_w)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )  # blocked position j -> raster pixel id

    s_rows = 24 if (realtime and env_deferred) else 16
    cam_pack = pack_cameras(cameras, realtime, py0=py0)
    const_pack = pack_consts(scene, options, env_kind)
    if cluster_rows and c > cluster_rows:
        cl_pack = _cluster_aabbs(scene, cluster_rows)
    else:
        cluster_rows = 0
        cl_pack = jnp.zeros((1, 8), jnp.float32)

    # --- TEA pixel seeds per sample (outside; LCG draws run in-kernel) ------
    if perm is not None:
        lin = jnp.asarray(perm.astype(np.uint32))
    else:
        lin = jnp.arange(r_pad, dtype=jnp.uint32)
    if py0 is not None:
        lin = lin + jnp.asarray(py0, jnp.int32).astype(jnp.uint32) * jnp.uint32(width)
    seeds = jax.vmap(
        lambda fc: rng.init_rand(lin, fc.astype(jnp.uint32))
    )(cameras["frame_count"])[:, None, :]  # [S, 1, r_pad] uint32

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            width=width,
            height=height,
            tile_r=tile_r,
            env_kind=env_kind,
            block_w=block_w,
            realtime=realtime,
            full_height=full_height,
            cluster_rows=cluster_rows,
            env_deferred=env_deferred,
            light_mc=light_mc,
        ),
        grid=(r_pad // tile_r, s_count),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (4 * c, 16), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((32, c), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, tile_r), lambda i, s: (s, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        # Progressive: one 8-row out block revisited across s (accumulator).
        # Realtime: each sample s (= one FRAME of a frames-in-flight batch)
        # owns its own 16-row block, so one launch renders S frames.
        # Progressive env-deferred (texture env kinds): each sample owns a
        # 16-row block too — the host resolves env per sample and sums.
        # Realtime env-deferred: 24-row blocks (AOV rows 0-9 + hit 10 +
        # spec dir 11-13 + ws 14-16, FT layout parity).
        out_specs=pl.BlockSpec(
            (s_rows, tile_r), lambda i, s: (s, i), memory_space=pltpu.VMEM
        )
        if (realtime or env_deferred)
        else pl.BlockSpec(
            (8, tile_r), lambda i, s: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (s_rows * s_count if (realtime or env_deferred) else 8, r_pad),
            jnp.float32,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, tile_r), jnp.float32),
            pltpu.VMEM((1, tile_r), jnp.float32),
        ],
        interpret=interpret,
    )(
        cam_pack,
        const_pack,
        cl_pack,
        scene["mt_pack"].reshape(4 * c, 16),
        scene["attr_pack"],
        seeds,
    )

    inv = None
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n, dtype=np.int64)
    return out[:, :n], inv


def _unperm(rows: jnp.ndarray, inv) -> jnp.ndarray:
    """[k, n] rows -> [H*W, k] raster order."""
    t = rows.T
    return t if inv is None else t[jnp.asarray(inv)]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "env_kind", "interpret", "tile_r", "block_w",
        "full_height", "cluster_rows", "light_mc",
    ),
)
def _fused_progressive_sum_impl(
    scene, options, cameras, width, height, env_kind, interpret,
    tile_r, block_w, py0=None, full_height=0, cluster_rows=0,
    light_mc=False,
):
    out, inv = _fused_dispatch(
        scene, options, cameras, width, height, env_kind, interpret,
        tile_r=tile_r, block_w=block_w, py0=py0, full_height=full_height,
        cluster_rows=cluster_rows, light_mc=light_mc,
    )
    return _unperm(out[:3], inv).reshape(height, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "env_kind", "interpret", "tile_r", "block_w",
        "full_height", "cluster_rows",
    ),
)
def _fused_progressive_deferred_impl(
    scene, options, cameras, width, height, env_kind, interpret,
    tile_r, block_w, py0=None, full_height=0, cluster_rows=0,
):
    """Deferred sample sum for texture env kinds (latlong/cubemap): ONE
    kernel launch renders all S samples (each sample owns its 16-row out
    block), then miss-compacted XLA gathers (ops/deferred_resolve) resolve
    the env terms and combine per sample — the brute-megakernel twin of
    fused_traverse_pallas._ft_progressive_deferred_impl (same row layout,
    same combine). Env is sampled only in the miss shader
    (/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:160-164).
    Returns the [H, W, 3] SUM over samples."""
    from ..core.camera import primary_ray_grid
    from . import deferred_resolve as dr

    out, inv = _fused_dispatch(
        scene, options, cameras, width, height, env_kind, interpret,
        tile_r=tile_r, block_w=block_w, py0=py0, full_height=full_height,
        cluster_rows=cluster_rows, env_deferred=True,
    )
    s_count = int(cameras["frame_count"].shape[0])
    env = scene["env"]

    # Wide unperm (round 5): ONE [16S, n] -> [n, 16S] unperm for the whole
    # out block instead of ~6 small [3, n] transposes per sample, and the
    # weighted_env inputs become CONTIGUOUS column slices (dirs rows 4-6 /
    # 10-12 sit right before their weight rows 7-9 / 13-15), skipping the
    # concatenate copy too. Values are bit-identical (same gathered rows,
    # same arithmetic order); DXR_WIDE_UNPERM=0 restores the per-row path
    # for A/B.
    wide_unperm = os.environ.get("DXR_WIDE_UNPERM", "1") != "0"
    if wide_unperm:
        wideT = _unperm(out[: 16 * s_count], inv)  # [n, 16S]

        def rows3(si, r0):
            return wideT[:, 16 * si + r0 : 16 * si + r0 + 3]

        def row1(si, r0):
            return wideT[:, 16 * si + r0]

        def packed6(si, r0):
            return wideT[:, 16 * si + r0 : 16 * si + r0 + 6]
    else:
        def rows3(si, r0):
            return _unperm(out[16 * si + r0 : 16 * si + r0 + 3], inv)

        def row1(si, r0):
            return _unperm(out[16 * si + r0 : 16 * si + r0 + 1], inv)[:, 0]

        def packed6(si, r0):
            return jnp.concatenate(
                [rows3(si, r0), rows3(si, r0 + 3)], axis=1
            )

    # Primary dirs via primary_ray_grid — bit-identical to the kernel's
    # raygen. Jitter only shifts the ray ORIGIN (pack_cameras), so the
    # directions — and this env image — are shared by all S samples of one
    # camera pose; gather it only where at least one sample missed.
    cam0 = jax.tree.map(lambda x: x[0], cameras)
    _, d_prim = primary_ray_grid(
        cam0, width, height, 30.0, row0=py0, full_height=full_height
    )
    hits = [row1(si, 3) > 0.5 for si in range(s_count)]
    any_miss = ~functools.reduce(jnp.logical_and, hits)
    # Block-granular compaction by default at >=1M rows (round 5: the
    # resolve, not the kernel, is 90% of the 1080p HDR frame and sits on
    # the ~25 ns/row gather wall; block mode skips no-need BLOCKS with
    # wide-row gathers, no scatter — 117.4 -> 102.4 ms/sample at B=1024
    # pre-tuning, parity exact). DXR_COMPACT still overrides.
    blk = dr.default_resolve_kwargs(width * height)
    e_p = dr.masked_env(env, d_prim.reshape(-1, 3), any_miss, env_kind, **blk)

    total = None
    for si in range(s_count):
        part = (
            rows3(si, 0)
            + jnp.where(hits[si][:, None], 0.0, e_p)
            + dr.weighted_env_packed(env, packed6(si, 4), env_kind, **blk)
            + dr.weighted_env_packed(env, packed6(si, 10), env_kind, **blk)
        )
        total = part if total is None else total + part
    return total.reshape(height, width, 3)


def fused_progressive_sum(
    scene: dict,
    options: dict,
    cameras: dict,
    width: int,
    height: int,
    env_kind: int,
    interpret: bool = False,
    py0=None,
    full_height: int = 0,
    light_mc: bool = False,
) -> jnp.ndarray:
    """Sum of S progressive samples, one kernel launch. [H, W, 3].

    Texture env kinds (2/3) run ENV-DEFERRED: the kernel emits bounce dirs
    + per-channel env weights per sample and the host resolves env with
    miss-compacted XLA gathers outside (gathers don't lower in Mosaic).

    py0/full_height: render rows [py0, py0+height) of a full_height-tall
    image (multi-chip row sharding, parallel/render.py).

    light_mc: static debug==2 MC light-pick variant (one merged shadow
    sweep per direct-lighting call, 9 sweeps -> 7); requires
    options["debug"]==2 at runtime. Analytic env kinds only."""
    tile_r, block_w, cluster_rows = _env_knobs(int(scene["mt_pack"].shape[1]))
    if env_kind in (2, 3):
        return _fused_progressive_deferred_impl(
            scene, options, cameras, width, height, env_kind, interpret,
            tile_r, block_w, py0, full_height, cluster_rows,
        )
    return _fused_progressive_sum_impl(
        scene, options, cameras, width, height, env_kind, interpret,
        tile_r, block_w, py0, full_height, cluster_rows, light_mc,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "env_kind", "interpret", "tile_r", "block_w",
        "full_height", "cluster_rows",
    ),
)
def _fused_realtime_outputs_impl(
    scene, options, cameras, width, height, env_kind, interpret,
    tile_r, block_w, py0=None, full_height=0, cluster_rows=0,
):
    """cameras: CameraParams stacked on a leading [S] FRAME axis. Returns
    the AOV dict with a leading [S] axis (one entry per frame — the
    frames-in-flight batch; DeviceResources runs 3 frames in flight,
    /root/reference/include/DXRExperimentsApp.h:27)."""
    s = int(cameras["frame_count"].shape[0])
    n = width * height
    deferred = env_kind in (2, 3)  # texture env: resolve gathers host-side
    out, inv = _fused_dispatch(
        scene, options, cameras, width, height, env_kind, interpret,
        realtime=True, tile_r=tile_r, block_w=block_w,
        py0=py0, full_height=full_height, cluster_rows=cluster_rows,
        env_deferred=deferred,
    )
    rows = out.reshape(s, 24 if deferred else 16, n)

    # ONE wide unperm for all AOV rows (round 5, see the progressive
    # deferred impls): the per-group path pays a static-index gather per
    # AOV group when the block permutation is active. DXR_WIDE_UNPERM=0
    # restores the per-group path for A/B; bit-identical either way.
    if os.environ.get("DXR_WIDE_UNPERM", "1") != "0":
        wavT = jnp.swapaxes(rows, 1, 2)  # [s, n, R]
        if inv is not None:
            wavT = wavT[:, jnp.asarray(inv)]

        def unperm_s(r0, k):
            return wavT[:, :, r0 : r0 + k]
    else:
        def unperm_s(r0, k):
            t = jnp.swapaxes(rows[:, r0 : r0 + k, :], 1, 2)  # [s, n, k]
            return t if inv is None else t[:, jnp.asarray(inv)]

    def img3(r0):
        return unperm_s(r0, 3).reshape(s, height, width, 3)

    rough = unperm_s(9, 1).reshape(s, height, width)
    if not deferred:
        direct = img3(0)
        ispec = img3(3)
        wide = os.environ.get("DXR_RT_WIDE", "0") == "1"
        return {
            "direct": direct,
            "indirect_specular": ispec,
            "albedo": img3(6),
            "roughness": rough,
            # bit-identical to the kernel's old combined rows: both AOVs
            # hold the already-rounded f32 da / sa terms, and on miss ispec
            # is 0 so direct + ispec = env there too
            # (RealtimeRaytracing.hlsl:119-126)
            "color": img3(10) if wide else direct + ispec,
        }

    # env-deferred combine (RealtimeRaytracing.hlsl miss->direct routing,
    # the brute-megakernel twin of _ft_realtime_outputs_impl): direct gets
    # env(primary) on miss lanes, indirect_specular gets ws * env(spec_dir),
    # color = direct + indirect_specular. Both env resolves are
    # miss-compacted (ops/deferred_resolve). Jitter only shifts ray ORIGINS
    # (pack_cameras), but frames of a frames-in-flight batch may carry
    # different poses, so the primary dirs are rebuilt per frame.
    from ..core.camera import primary_ray_grid
    from . import deferred_resolve as dr

    env = scene["env"]
    hit_rows = unperm_s(10, 1)[..., 0] > 0.5  # [s, n]
    hit = hit_rows.reshape(s, height, width, 1)

    # Primary dirs are rebuilt per frame (poses may differ across the
    # batch) but resolved in ONE stacked [s*n] masked_env call — one
    # gather/compact tree instead of S, matching es_term below.
    pdirs_s = []
    for si in range(s):
        cam_si = jax.tree.map(lambda x, _si=si: x[_si], cameras)
        _, pdirs = primary_ray_grid(
            cam_si, width, height, 10.0, row0=py0, full_height=full_height
        )
        pdirs_s.append(pdirs.reshape(-1, 3))
    e_p = dr.masked_env(
        env,
        jnp.concatenate(pdirs_s, axis=0),
        ~hit_rows.reshape(s * n),
        env_kind,
    ).reshape(s, height, width, 3)
    # spec dirs (rows 11-13) and weights (14-16) are adjacent -> one
    # packed [s*n, 6] slice, no concat copy
    es_term = dr.weighted_env_packed(
        env,
        unperm_s(11, 6).reshape(s * n, 6),
        env_kind,
    ).reshape(s, height, width, 3)
    direct = jnp.where(hit, img3(0), e_p)
    ispec = img3(3) + es_term
    return {
        "direct": direct,
        "indirect_specular": ispec,
        "albedo": img3(6),
        "roughness": rough,
        "color": jnp.where(hit, img3(0) + ispec, e_p),
    }


def fused_realtime_outputs(
    scene: dict,
    options: dict,
    camera: dict,
    width: int,
    height: int,
    env_kind: int,
    interpret: bool = False,
    py0=None,
    full_height: int = 0,
) -> dict:
    """One fused realtime sample (RealtimeRaytracing.hlsl tree: primary +
    2 shadow sweeps + Phong-specular bounce with its 3 sweeps — 6 sweeps
    total, no indirect diffuse) returning the pipeline's AOV dict."""
    cameras = jax.tree.map(lambda x: x[None], camera)
    out = fused_realtime_outputs_batch(
        scene, options, cameras, width, height, env_kind,
        interpret=interpret, py0=py0, full_height=full_height,
    )
    return jax.tree.map(lambda x: x[0], out)


def fused_realtime_outputs_batch(
    scene: dict,
    options: dict,
    cameras: dict,
    width: int,
    height: int,
    env_kind: int,
    interpret: bool = False,
    py0=None,
    full_height: int = 0,
) -> dict:
    """S fused realtime FRAMES in one kernel launch — the TPU-native
    frames-in-flight analogue (the reference keeps 3 frames in flight,
    /root/reference/include/DXRExperimentsApp.h:27 /
    src/utils/DeviceResources.cpp:580-598): per-frame cameras ride the
    sample grid axis, each frame writing its own AOV block (16 rows; 24
    for texture-env kinds, where rows 10-16 carry hit mask / spec dir /
    env weight for the host-side deferred resolve — see
    _fused_realtime_outputs_impl), so the ~5 ms per-dispatch cost is
    amortized across the batch. cameras is the CameraParams pytree stacked
    on a leading [S] frame axis; returns the AOV dict with a leading [S]
    axis."""
    tile_r, block_w, cluster_rows = _env_knobs(int(scene["mt_pack"].shape[1]))
    return _fused_realtime_outputs_impl(
        scene, options, cameras, width, height, env_kind, interpret,
        tile_r, block_w, py0, full_height, cluster_rows,
    )
