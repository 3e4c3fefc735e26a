"""Wavefront integrator: the TPU re-expression of the reference's device code.

Replaces the DXR shader stack — RayGen/ClosestHit/Miss/shadow shaders plus
``TraceRay`` recursion (/root/reference/assets/shaders/ProgressiveRaytracing.hlsl,
RealtimeRaytracing.hlsl, RaytracingCommon.hlsli) — with a statically-unrolled
trace tree inside one jitted function. The reference's recursion is bounded
(MAX_RADIANCE_RAY_DEPTH=1, MAX_SHADOW_RAY_DEPTH=2,
RaytracingCommon.hlsli:11-12), so the whole per-sample ray tree is fixed:

    primary closest-hit
      +- directional-light shadow ray      (any-hit)
      +- point-light shadow ray            (any-hit)
      +- indirect-diffuse secondary ray    (closest, progressive only)
      |    +- 2 shadow rays at depth 1
      +- Phong-lobe specular secondary ray (closest)
           +- 2 shadow rays at depth 1

i.e. 3 closest + 6 any-hit traces per progressive sample (2+4 realtime) over
dense [N]-ray batches — no dynamic control flow, no compaction needed at this
depth, everything fuses under jit.

RNG parity: each shade invocation re-seeds from the pixel hash exactly like
the HLSL (shade() calls initRand every invocation —
ProgressiveRaytracing.hlsl:87-89 — so depth-1 draws alias depth-0 draws; we
reproduce that faithfully), and seeds advance conditionally where the HLSL
consumes draws inside branches (debug==2 light picking, noIndirectDiffuse).

Material/AOV debug selection is traced (cheap selects); ambient-occlusion-only
mode is a static variant (it changes the ray tree), the analogue of compiling
a different RTPSO.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core import vecmath as vm
from ..ops import intersect, intersect_pallas
from ..scene.envmap import sample_environment
from . import sampling

RAY_EPSILON = intersect.RAY_EPSILON
RAY_MAX_T = intersect.RAY_MAX_T
M_PI = jnp.pi


# --------------------------------------------------------------------------- #
# Per-frame options (traced) — parity with DebugOptions
# (/root/reference/assets/shaders/RaytracingHlslCompat.h:64-77). Defaults match
# the pipeline ctor (/root/reference/src/ProgressiveRaytracingPipeline.cpp:74-84).
# --------------------------------------------------------------------------- #
def default_options(**overrides) -> dict:
    opts = {
        "max_iterations": jnp.asarray(1024, jnp.int32),
        "cosine_hemisphere_sampling": jnp.asarray(True),
        "show_indirect_diffuse_only": jnp.asarray(False),
        "show_indirect_specular_only": jnp.asarray(False),
        "show_gbuffer_albedo_only": jnp.asarray(False),
        "show_direct_lighting_only": jnp.asarray(False),
        "show_fresnel_term": jnp.asarray(False),
        "no_indirect_diffuse": jnp.asarray(False),
        "debug": jnp.asarray(0, jnp.int32),
    }
    for k, v in overrides.items():
        opts[k] = jnp.asarray(v, opts[k].dtype) if k in opts else jnp.asarray(v)
    return opts


def resolve_impl(impl: str) -> str:
    """'auto' -> fused Pallas kernels on TPU, jnp reference elsewhere."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    return impl


def _ray_sort_order(scene: dict, origins, directions):
    """Packet-coherence sort key for BVH traversal: 3-bit direction OCTANT
    major, 12-bit origin Morton cell (within the root AABB) minor. Stable
    argsort keeps the primary block order within each cell, so sorted
    packets share both direction octant and origin locality — the wavefront
    ray-reordering step (SURVEY §7: "ray sorting/compaction between
    bounces").

    Octant-major measured 393 ms vs morton-major 466 ms vs unsorted 2246 ms
    (262k INCOHERENT rays / 200k-tri soup, argsort+gather+scatter included;
    round 3): slab-test unions key on direction sign agreement first. For
    coherent camera blocks the sort stays measured-NEGATIVE (round 2) —
    callers opt in per trace via sort_rays."""
    bvhn = scene["bvh"]["bvh_nodes"]
    lo = bvhn[0:3, 0]
    hi = bvhn[3:6, 0]
    q = jnp.clip((origins - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    cell = jnp.minimum((q * 16.0).astype(jnp.int32), 15)

    def part(x):
        x = (x | (x << 4)) & 0x0F0F
        x = (x | (x << 2)) & 0x3333
        x = (x | (x << 1)) & 0x5555
        return x

    morton = (
        (part(cell[:, 0]) << 2) | (part(cell[:, 1]) << 1) | part(cell[:, 2])
    )
    octant = (
        (directions[:, 0] < 0).astype(jnp.int32) * 4
        + (directions[:, 1] < 0).astype(jnp.int32) * 2
        + (directions[:, 2] < 0).astype(jnp.int32)
    )
    return jnp.argsort((octant << 12) | morton, stable=True)


def _trace_closest(
    scene, origins, directions, t_min, t_max, cull, impl: str,
    sort_rays: bool = False, tile: int | None = None,
):
    """Closest hit + hit attributes, dispatched to the chosen backend.

    Returns (hit, position, normal, mat) where mat is the per-ray material
    field dict — the Pallas kernel returns attributes fused (no gathers), the
    jnp path interpolates/gathers after the hit.

    sort_rays: re-tile incoherent rays by (origin cell, octant) before
    packet traversal (BVH path only); results are scattered back.

    tile: packet size override for the fat-node kernels (None = FAT_TILE;
    the secondary bounce stage passes SEC_TILE — see its definition).
    """
    impl = resolve_impl(impl)
    tile = tile or FAT_TILE
    if "tlas" in scene:
        # Two-level TLAS/BLAS scene (accel/tlas.py): shared per-mesh BLAS +
        # instance transforms — the true RtScene analogue
        # (/root/reference/libs/DXRFramework/RtScene.cpp:27-51).
        if impl in ("pallas", "pallas_interpret"):
            from ..ops import traverse2_pallas
            from ..scene.scene import BVH_LEAF_SIZE

            if "tlasf_nodes" in scene["tlas"]:
                hits = traverse2_pallas.traverse2_fat_closest(
                    scene["tlas"], origins, directions, t_min, t_max,
                    leaf_size=BVH_LEAF_SIZE, cull_backface=cull,
                    interpret=(impl == "pallas_interpret"), tile=tile,
                )
            else:
                hits = traverse2_pallas.traverse2_closest(
                    scene["tlas"], origins, directions, t_min, t_max,
                    leaf_size=BVH_LEAF_SIZE, cull_backface=cull,
                    interpret=(impl == "pallas_interpret"),
                )
        else:
            from ..accel import tlas as tlas_mod

            hits = tlas_mod.two_level_closest_jnp(
                scene, origins, directions, t_min, t_max, cull
            )
        position, normal, mat = _interpolate_hit_two_level(
            scene, hits, origins, directions
        )
        return hits["hit"], position, normal, mat
    if impl in ("pallas", "pallas_interpret") and "bvh" in scene:
        # Large scene: packet BVH traversal + gather-based attribute fetch.
        # Fat-node front-to-back kernel when the scene pack carries the
        # collapsed children-boxes tree (strictly faster than the binary
        # kernel: fewer visits + near-first descent; the 8-wide kernel's
        # per-child scalar extracts outweigh its visit reduction).
        from ..ops import traverse_pallas
        from ..scene.scene import BVH_LEAF_SIZE

        order = _ray_sort_order(scene, origins, directions) if sort_rays else None
        if order is not None:
            origins = origins[order]
            directions = directions[order]
            if getattr(t_max, "ndim", 0):
                t_max = t_max[order]
        if "bvhf_nodes" in scene["bvh"]:
            hits = traverse_pallas.traverse_fat_closest(
                scene["bvh"],
                origins,
                directions,
                t_min,
                t_max,
                leaf_size=BVH_LEAF_SIZE,
                cull_backface=cull,
                interpret=(impl == "pallas_interpret"),
                tile=tile,
            )
        else:
            hits = traverse_pallas.traverse_closest(
                scene["bvh"],
                origins,
                directions,
                t_min,
                t_max,
                leaf_size=BVH_LEAF_SIZE,
                cull_backface=cull,
                interpret=(impl == "pallas_interpret"),
            )
        if order is not None:
            hits = {
                k: jnp.zeros_like(v).at[order].set(v) for k, v in hits.items()
            }
            origins = jnp.zeros_like(origins).at[order].set(origins)
            directions = jnp.zeros_like(directions).at[order].set(directions)
        position, normal, mat = _interpolate_hit(scene, hits, origins, directions)
        return hits["hit"], position, normal, mat
    if impl in ("pallas", "pallas_interpret"):
        h = intersect_pallas.trace_closest(
            scene,
            origins,
            directions,
            t_min,
            t_max,
            cull_backface=cull,
            interpret=(impl == "pallas_interpret"),
        )
        mat = {
            "albedo": h["albedo"],
            "specular": h["specular"],
            "emissive": h["emissive"],
            "emissive_strength": h["emissive_strength"],
            "reflectivity": h["reflectivity"],
            "roughness": h["roughness"],
            "ior": h["ior"],
            "type": h["type"],
        }
        if "textures" in scene:
            # The in-kernel attr fetch returns constant material rows; the
            # texture multiplier is an XLA epilogue over the hit UVs.
            from ..scene.textures import sample_albedo

            tri = jnp.maximum(h["tri"], 0)
            u, v = h["u"], h["v"]
            w = 1.0 - u - v
            uv = (
                w[..., None] * scene["uv0"][tri]
                + u[..., None] * scene["uv1"][tri]
                + v[..., None] * scene["uv2"][tri]
            )
            mat["albedo"] = mat["albedo"] * sample_albedo(
                scene["textures"], scene["mat_id"][tri], uv
            )
        return h["hit"], h["position"], h["normal"], mat
    hits = intersect.intersect_closest(
        scene, origins, directions, t_min, t_max, cull_backface=cull
    )
    position, normal, mat = _interpolate_hit(scene, hits, origins, directions)
    return hits["hit"], position, normal, mat


def _trace_any(
    scene, origins, directions, t_min, t_max, impl: str,
    sort_rays: bool = False,
):
    impl = resolve_impl(impl)
    if "tlas" in scene:
        if impl in ("pallas", "pallas_interpret"):
            from ..ops import traverse2_pallas
            from ..scene.scene import BVH_LEAF_SIZE

            if "tlasf_nodes" in scene["tlas"]:
                return traverse2_pallas.traverse2_fat_any(
                    scene["tlas"], origins, directions, t_min, t_max,
                    leaf_size=BVH_LEAF_SIZE,
                    interpret=(impl == "pallas_interpret"), tile=FAT_TILE,
                )
            return traverse2_pallas.traverse2_any(
                scene["tlas"], origins, directions, t_min, t_max,
                leaf_size=BVH_LEAF_SIZE,
                interpret=(impl == "pallas_interpret"),
            )
        from ..accel import tlas as tlas_mod

        return tlas_mod.two_level_any_jnp(scene, origins, directions, t_min, t_max)
    if impl in ("pallas", "pallas_interpret") and "bvh" in scene:
        from ..ops import traverse_pallas
        from ..scene.scene import BVH_LEAF_SIZE

        order = _ray_sort_order(scene, origins, directions) if sort_rays else None
        if order is not None:
            origins = origins[order]
            directions = directions[order]
            if getattr(t_max, "ndim", 0):
                t_max = t_max[order]
        if "bvhf_nodes" in scene["bvh"]:
            occ = traverse_pallas.traverse_fat_any(
                scene["bvh"],
                origins,
                directions,
                t_min,
                t_max,
                leaf_size=BVH_LEAF_SIZE,
                interpret=(impl == "pallas_interpret"),
                tile=FAT_TILE,
            )
        else:
            occ = traverse_pallas.traverse_any(
                scene["bvh"],
                origins,
                directions,
                t_min,
                t_max,
                leaf_size=BVH_LEAF_SIZE,
                interpret=(impl == "pallas_interpret"),
            )
        if order is not None:
            occ = jnp.zeros_like(occ).at[order].set(occ)
        return occ
    if impl in ("pallas", "pallas_interpret"):
        return intersect_pallas.trace_any(
            scene,
            origins,
            directions,
            t_min,
            t_max,
            interpret=(impl == "pallas_interpret"),
        )
    return intersect.intersect_any(scene, origins, directions, t_min, t_max)


def _gather_material(materials: dict, mat_id: jnp.ndarray) -> dict:
    return {k: v[mat_id] for k, v in materials.items()}


def _interpolate_hit_two_level(scene: dict, hits: dict, origins, directions):
    """Attribute interpolation for two-level hits: barycentrics over the
    OBJECT-space vertex normals, then the per-instance normal matrix
    (inv(R)^T, accel/tlas.py) back to world; material id comes from the mesh
    unless the instance carries an override — the SBT-hit-record analogue
    (/root/reference/src/ProgressiveRaytracingPipeline.cpp:220-226)."""
    tri = jnp.maximum(hits["tri"], 0)
    inst = jnp.maximum(hits["inst"], 0)
    u, v = hits["u"], hits["v"]
    w = 1.0 - u - v
    n_obj = (
        w[..., None] * scene["n0_obj"][tri]
        + u[..., None] * scene["n1_obj"][tri]
        + v[..., None] * scene["n2_obj"][tri]
    )
    nm = scene["tlas"]["inst_nm"][inst]  # [N, 3, 3]
    # HIGHEST: default-precision einsum is bf16 on the MXU; normals feed
    # shading directly, and the Pallas paths compute them at full f32.
    normal = vm.normalize(jnp.einsum(
        "nij,nj->ni", nm, n_obj, precision=jax.lax.Precision.HIGHEST))
    position = origins + hits["t"][..., None] * directions
    override = scene["tlas"]["inst_mat_override"][inst]
    mid = jnp.where(override >= 0, override, scene["mat_id_obj"][tri])
    mat = _gather_material(scene["materials"], mid)
    if "textures" in scene:
        from ..scene.textures import sample_albedo

        uv = (
            w[..., None] * scene["uv0_obj"][tri]
            + u[..., None] * scene["uv1_obj"][tri]
            + v[..., None] * scene["uv2_obj"][tri]
        )
        mat["albedo"] = mat["albedo"] * sample_albedo(
            scene["textures"], mid, uv
        )
    return position, normal, mat


def _interpolate_hit(scene: dict, hits: dict, origins, directions):
    """Barycentric position/normal + material fetch — the TPU analogue of
    interpolateVertexAttributes + HitWorldPosition
    (RaytracingCommon.hlsli:53-82, RaytracingUtils.hlsli:209-212)."""
    tri = jnp.maximum(hits["tri"], 0)
    u, v = hits["u"], hits["v"]
    w = 1.0 - u - v
    n = (
        w[..., None] * scene["n0"][tri]
        + u[..., None] * scene["n1"][tri]
        + v[..., None] * scene["n2"][tri]
    )
    normal = vm.normalize(n)
    position = origins + hits["t"][..., None] * directions
    mid = scene["mat_id"][tri]
    mat = _gather_material(scene["materials"], mid)
    if "textures" in scene:
        # Albedo texture modulation (scene/textures.py): one quad-packed
        # gather per hit; BEYOND-reference (DXR materials are constants).
        from ..scene.textures import sample_albedo

        uv = (
            w[..., None] * scene["uv0"][tri]
            + u[..., None] * scene["uv1"][tri]
            + v[..., None] * scene["uv2"][tri]
        )
        mat["albedo"] = mat["albedo"] * sample_albedo(
            scene["textures"], mid, uv
        )
    return position, normal, mat


# --------------------------------------------------------------------------- #
# Lights (RaytracingCommon.hlsli:126-147)
# --------------------------------------------------------------------------- #
# Stratified area-light sample count — shared with the fused traversal
# megakernel so both paths agree draw-for-draw (scene/lights.py).
from ..scene.lights import AREA_LIGHT_SAMPLES  # noqa: E402  (re-export)


def _direct_lighting(
    scene, options, position, normal, seed, active, impl,
    sort_shadows: bool = False,
):
    """Direct term over an ARBITRARY light rig (D directional + P point +
    A area, stacked arrays — see scene.lights.normalize_lights; the
    reference's fixed 1+1 rig is the D=P=1, A=0 case and reproduces it
    lane-for-lane), including the debug==2 one-of-L-lights MC estimator
    (ProgressiveRaytracing.hlsl:92-104 generalised: pick uniformly, scale by
    L; at L=2 the selection and weights match the HLSL bit-exactly).
    Returns (seed, direct [N,3]).

    Area lights (BEYOND-reference, BASELINE config 2) draw
    AREA_LIGHT_SAMPLES stratified points on the emitting quad from a
    DECOUPLED TEA seed (so adding an area light leaves the reference-parity
    draw sequence untouched) and estimate soft-shadowed irradiance
    L * mean_j(NoL * cos_l * area / dist_j^2 * vis_j).

    ALL lights' shadow rays — including every area sample — are batched into
    ONE any-hit launch (the DXR version issues one TraceRay per light; on
    TPU a single big kernel keeps launch count constant in L and S)."""
    from ..scene.lights import normalize_lights

    lights = normalize_lights(scene["lights"])
    dl, pl_, al = lights["dir"], lights["point"], lights["area"]
    d_count = int(dl["forward"].shape[0])
    p_count = int(pl_["position"].shape[0])
    a_count = int(al["corner"].shape[0])
    l_count = d_count + p_count + a_count
    n = position.shape[0]

    if l_count == 0:
        return seed, jnp.zeros_like(position)

    seed_mc, pick = rng.next_rand(seed)
    is_mc = options["debug"] == 2
    # HLSL consumes the picking draw only when debug==2.
    seed_out = jnp.where(is_mc, seed_mc, seed)

    dirs = []
    t_maxs = []
    if d_count:
        # identical op order to the 1-light path: normalize(-forward)
        l_dir = jnp.broadcast_to(
            vm.normalize(-dl["forward"])[:, None, :], (d_count, n, 3)
        )
        dirs.append(l_dir)
        t_maxs.append(jnp.full((d_count, n), RAY_MAX_T, jnp.float32))
    if p_count:
        path = pl_["position"][:, None, :] - position[None]  # [P, N, 3]
        dist = vm.length(path)
        dirs.append(vm.normalize(path))
        t_maxs.append(jnp.maximum(dist - RAY_EPSILON, RAY_EPSILON))
    if a_count:
        from ..scene.lights import area_light_draws

        a_dist2 = []
        for r0, r1 in area_light_draws(seed):
            # [A, N, 3] sample points on each quad
            p_l = (
                al["corner"][:, None, :]
                + r0[None, :, None] * al["eu"][:, None, :]
                + r1[None, :, None] * al["ev"][:, None, :]
            )
            apath = p_l - position[None]
            adist = vm.length(apath)
            dirs.append(vm.normalize(apath))
            t_maxs.append(jnp.maximum(adist - RAY_EPSILON, RAY_EPSILON))
            a_dist2.append(jnp.maximum(adist * adist, 1e-12))

    # One shadow ray per dir/point light, AREA_LIGHT_SAMPLES per area light.
    r_count = d_count + p_count + a_count * AREA_LIGHT_SAMPLES
    all_dirs = jnp.concatenate(dirs).reshape(r_count * n, 3)
    all_tmax = jnp.concatenate(t_maxs).reshape(r_count * n)
    # Zero the direction of inactive lanes (their `vis` is masked below):
    # the occlusion kernels pre-mark |d|≈0 lanes as occluded, so garbage
    # origins stop traversing AND stop blocking the all-occluded early exit.
    act = jnp.broadcast_to(active[None], (r_count, n)).reshape(-1, 1)
    all_dirs = jnp.where(act, all_dirs, 0.0)
    occ = _trace_any(
        scene,
        jnp.broadcast_to(position[None], (r_count, n, 3)).reshape(-1, 3),
        all_dirs,
        RAY_EPSILON,
        all_tmax,
        impl,
        sort_rays=sort_shadows,
    ).reshape(r_count, n)
    vis = jnp.where(active[None] & ~occ, 1.0, 0.0)

    contribs = []
    if d_count:
        l_dir = dirs[0]
        nol = vm.saturate(vm.dot(normal[None], l_dir))
        contribs.append(
            (dl["color"] * dl["intensity"][:, None])[:, None, :]
            * (nol * vis[:d_count])[..., None]
        )
    if p_count:
        l_pnt = dirs[1 if d_count else 0]
        nol = vm.saturate(vm.dot(normal[None], l_pnt))
        falloff = 1.0 / (2.0 * M_PI * jnp.maximum(dist * dist, 1e-12))
        contribs.append(
            (pl_["color"] * pl_["intensity"][:, None])[:, None, :]
            * (nol * vis[d_count : d_count + p_count] * falloff)[..., None]
        )
    if a_count:
        s_total = AREA_LIGHT_SAMPLES
        cross = jnp.cross(al["eu"], al["ev"])  # [A, 3]
        quad_area = vm.length(cross)  # [A]
        n_l = cross / jnp.maximum(quad_area, 1e-12)[:, None]
        base = d_count + p_count
        geo = jnp.zeros((a_count, n), jnp.float32)
        for j in range(s_total):
            wi = dirs[(1 if d_count else 0) + (1 if p_count else 0) + j]
            nol = vm.saturate(vm.dot(normal[None], wi))
            # emits from BOTH faces of the quad (|cos| at the light)
            cos_l = jnp.abs(vm.dot(n_l[:, None, :], wi))
            geo = geo + (
                nol * cos_l / a_dist2[j]
                * vis[base + j * a_count : base + (j + 1) * a_count]
            )
        geo = geo * (quad_area / s_total)[:, None]
        contribs.append(
            (al["color"] * al["intensity"][:, None])[:, None, :]
            * geo[..., None]
        )
    per_light = jnp.concatenate(contribs)  # [L, N, 3]

    full = jnp.sum(per_light, axis=0)
    idx = jnp.minimum((pick * l_count).astype(jnp.int32), l_count - 1)
    sel = (jnp.arange(l_count)[:, None] == idx[None]).astype(jnp.float32)
    mc = jnp.sum(per_light * sel[..., None], axis=0) * float(l_count)
    return seed_out, jnp.where(is_mc, mc, full)


def _ambient_occlusion(scene, options, position, normal, seed, active, impl):
    """4-ray AO (evaluateAO, RaytracingCommon.hlsli:98-124)."""
    visibility = jnp.zeros(position.shape[:-1], jnp.float32)
    cosine = options["cosine_hemisphere_sampling"]
    for _ in range(4):
        seed, r0, r1 = rng.next_rand2(seed)
        # Rebuild both sampler outputs from the same draws, select traced.
        tangent, bitangent = vm.orthonormal_basis(normal)
        r = jnp.sqrt(r0)
        phi = 2.0 * M_PI * r1
        cos_dir = (
            (r * jnp.cos(phi))[..., None] * tangent
            + jnp.sqrt(jnp.maximum(1.0 - r0, 0.0))[..., None] * normal
            + (r * jnp.sin(phi))[..., None] * bitangent
        )
        sin_t = jnp.sqrt(jnp.maximum(1.0 - r0 * r0, 0.0))
        uni_dir = (
            (sin_t * jnp.cos(phi))[..., None] * tangent
            + r0[..., None] * normal
            + (sin_t * jnp.sin(phi))[..., None] * bitangent
        )
        sample_dir = jnp.where(cosine, cos_dir, uni_dir)
        nol = vm.saturate(vm.dot(normal, sample_dir))
        pdf = jnp.where(cosine, nol / M_PI, 1.0 / (2.0 * M_PI))
        traced_dir = jnp.where(active[..., None], sample_dir, 0.0)
        occluded = _trace_any(scene, position, traced_dir, RAY_EPSILON, 10.0, impl)
        vis = jnp.where(active & ~occluded, 1.0, 0.0)
        visibility += vis * nol / jnp.maximum(pdf, 1e-8)
    return visibility / 4.0


# --------------------------------------------------------------------------- #
# Depth-1 (secondary) radiance: direct lighting + emissive only — specular
# and indirect cut off by MAX_RADIANCE_RAY_DEPTH
# (ProgressiveRaytracing.hlsl:41-55 via shade() at depth 1).
# --------------------------------------------------------------------------- #
def _prime_seed_tmax(scene, origins, directions, t_max):
    """Clamp per-ray t_max by a conservative pre-test against the scene's
    PRIME triangles (the few scene-dominating floors/walls selected by
    scene.select_prime_triangles).

    Mechanism: incoherent bounce packets drag every instance between the
    origin cell and the far clamp into the TLAS slab union, and each
    instance in the union re-enters a whole-packet BLAS walk (the
    instance-union multiplier, RESULTS.md round-4 stage-cut). A downward
    bounce ray's nearest big occluder is almost always the floor — testing
    the <=PRIME_MAX big triangles up front (cheap XLA elementwise math,
    no kernel change) hands the traversal a far clamp of "distance to the
    floor" instead of RAY_MAX_T, so the walk's tf = min(t_max, best_t)
    prunes far instances from the first TLAS visit on.

    Correctness: the clamp only ever TIGHTENS t_max to the distance of an
    actual hit the main traversal will also find, with margins that make
    the pre-test strictly conservative against f32 evaluation-order
    differences: hits are accepted only with barycentrics >= PRIME_DELTA
    inside the triangle and t >= 2x the trace's own t_min, and the clamp
    is inflated by a relative+absolute margin before use. Borderline rays
    simply get no seed. Two-level hit parity is gated by
    tests/test_prime_seed.py. The hierarchy being clamped is the
    reference's native shape (TopLevelASGenerator.cpp:64-83); the pre-pass
    has no reference counterpart — it exists to make the two-level walk
    competitive with flattening on TPU packet kernels."""
    pv0 = scene["prime_v0"][None, :, :]  # [1, m, 3]
    pe1 = scene["prime_e1"][None, :, :]
    pe2 = scene["prime_e2"][None, :, :]
    o = origins[:, None, :]  # [n, 1, 3]
    d = directions[:, None, :]
    pvec = jnp.cross(d, pe2)
    det = jnp.sum(pe1 * pvec, axis=-1)  # [n, m]
    safe = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(safe, det, 1.0)
    tvec = o - pv0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, pe1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(pe2 * qvec, axis=-1) * inv_det
    delta = 1e-3  # interior margin: accept only robustly-inside hits
    valid = (
        safe
        & (u >= delta)
        & (v >= delta)
        & (u + v <= 1.0 - delta)
        & (t >= 2.0 * RAY_EPSILON)
        & jnp.isfinite(t)
    )
    t_seed = jnp.min(jnp.where(valid, t, jnp.inf), axis=-1)  # [n]
    clamp = t_seed * 1.001 + 1e-4  # conservative inflation
    return jnp.where(jnp.isfinite(t_seed), jnp.minimum(t_max, clamp), t_max)


def _secondary_radiance(
    scene, options, origins, directions, seeds, active, mode: str, impl: str,
    env_kind: int | None = None,
):
    # Inactive lanes (primary misses, non-specular materials) carry garbage
    # origins — often (0,0,0), INSIDE the scene — and every return field is
    # masked below, so collapse their ray interval to empty (t_max = 0 <
    # t_min): the packet kernels' slab tests then fail on those lanes
    # immediately and they stop dragging real nodes into the packet union.
    # Measured on the 983k-tri instanced scene: a large slice of the
    # secondary dispatch was garbage-lane traversal.
    t_max_eff = jnp.where(active, RAY_MAX_T, 0.0)

    # PRIME t_max seeding (round 5): pre-test the packet against the scene's
    # few dominating triangles and clamp the far interval to that hit (see
    # _prime_seed_tmax). Measured FLAT on the 983k instanced scene at BOTH
    # the isolated secondary stage (141.8 vs 141.8 ms flat / 241.5 vs 242.1
    # two-level) and the full frame (589.3 vs 590.4 / 705.5 vs 706.3), with
    # bit-exact parity (round5_prime_ab): the fat kernels' far-first pushes
    # + in-walk best-t clamp already learn the floor distance within a few
    # visits, so a pre-seeded clamp prunes nothing extra. Default OFF
    # (opt-in DXR_PRIME=1, zero measured cost) — kept for scenes whose
    # dominating occluder sits deep in the tree where far-first ordering
    # finds it late.
    if "prime_v0" in scene and os.environ.get("DXR_PRIME", "0") == "1":
        t_max_eff = _prime_seed_tmax(scene, origins, directions, t_max_eff)

    # Active-lane compaction (stable partition of actives to the front so
    # trailing all-dead packets die in one iteration) measured NEGATIVE on
    # top of the masking above (627 -> 670 ms on the 983k instanced frame):
    # once dead lanes have empty ray intervals they already contribute
    # nothing to any packet's node union, so compaction only merges the
    # actives' unions while paying argsort + three gathers + a scatter.
    is_hit, position, normal, mat = _trace_closest(
        scene, origins, directions, RAY_EPSILON, t_max_eff, cull=False,
        impl=impl, tile=SEC_TILE,
        # NOTE: sort_rays measured NEGATIVE here on the 983k-tri instanced
        # scene (68 s vs 46 s / 16 spp): argsort+scatter overhead exceeded
        # the union reduction. A GLOBAL octant+morton sort re-measured
        # 2.6x negative on the two-level secondary (round 4: 256 -> 657 ms)
        # and block-local octant binning (group G, key (lane//G)<<3|octant,
        # preserving origin-cell locality) re-measured with recorded
        # numbers in round 5 (benchmarks/round5_prime_ab): flat 141.8 ->
        # 235.4 (G=1024) / 274.0 (G=2048); two-level 241.5 -> 326.4 /
        # 353.5 — bounce rays inherit block-origin locality that any
        # reorder destroys, and the direction-coherence gain never covers
        # the sort+gather+scatter. The lever that DID pay is the smaller
        # SEC_TILE packet (see its definition). Kept available as an
        # opt-in for scenes where bounce-ray unions actually shrink (see
        # test_ray_sorting).
    )
    hit = is_hit & active
    # Env contributes only where an ACTIVE lane MISSED
    # (ProgressiveRaytracing.hlsl:160-164): for texture env kinds the
    # ~25 ns/row XLA gather is paid only on those rows (miss-compacted,
    # ops/deferred_resolve); analytic kinds are elementwise math and stay
    # full-width.
    if env_kind in (2, 3):
        from ..ops import deferred_resolve as _dr

        env_term = _dr.masked_env(
            scene["env"], directions, active & ~is_hit, env_kind
        )
    else:
        env_col = sample_environment(scene["env"], directions, env_kind)
        env_term = jnp.where(active[..., None], env_col, 0.0)

    seed = seeds  # shade() re-seeds identically per invocation
    seed, direct = _direct_lighting(
        scene, options, position, normal, seed, hit, impl,
        sort_shadows=False,  # measured negative (see note above)
    )

    if mode == "progressive":
        # emissive + albedo * direct / pi  (ProgressiveRaytracing.hlsl:112,147)
        shade_col = (
            mat["emissive"] * mat["emissive_strength"][..., None]
            + mat["albedo"] * direct / M_PI
        )
    else:
        # realtime: albedo * direct / pi (RealtimeRaytracing.hlsl:102)
        shade_col = mat["albedo"] * direct / M_PI

    return jnp.where(hit[..., None], shade_col, env_term)


# --------------------------------------------------------------------------- #
# Primary shade (depth 0)
# --------------------------------------------------------------------------- #
def trace_rays(
    scene: dict,
    options: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seeds: jnp.ndarray,
    mode: str = "progressive",
    ao_only: bool = False,
    impl: str = "auto",
    env_kind: int | None = None,
    refraction: bool = False,
) -> dict:
    """Trace one sample for a dense batch of primary rays.

    origins/directions: [N, 3]; seeds: [N] uint32 (pixel hash for this frame).
    mode: 'progressive' (ProgressiveRaytracing.hlsl) or 'realtime'
    (RealtimeRaytracing.hlsl). ao_only statically switches to the AO view
    (showAmbientOcclusionOnly, ProgressiveRaytracing.hlsl:82-84).

    refraction (progressive; BEYOND-reference, opt-in): glass materials
    (type 2) additionally trace a TRANSMISSION bounce through vm.refract —
    the utility the reference ships but never calls
    (/root/reference/assets/shaders/RaytracingUtils.hlsli:141-165; its glass
    only reflects) — weighted reflectivity * (1 - fresnel); total internal
    reflection lanes contribute nothing (the reflect branch already carries
    them). Default off = exact reference parity.

    Returns {"color" [N,3]} plus, for realtime mode, "direct" and
    "indirect_specular" AOVs (the two UAV outputs,
    RealtimeRaytracing.hlsl:44-45).
    """
    # Primary rays cull backfaces (ProgressiveRaytracing.hlsl:34).
    hit, position, normal, mat = _trace_closest(
        scene, origins, directions, 0.0, RAY_MAX_T, cull=True, impl=impl
    )
    # env_col is consumed only under ~hit (miss shader semantics), so for
    # texture env kinds gather only the miss rows (zeros on hit rows are
    # never selected); analytic kinds stay full-width elementwise.
    if env_kind in (2, 3):
        from ..ops import deferred_resolve as _dr

        env_col = _dr.masked_env(scene["env"], directions, ~hit, env_kind)
    else:
        env_col = sample_environment(scene["env"], directions, env_kind)

    if ao_only:
        ao = _ambient_occlusion(scene, options, position, normal, seeds, hit, impl)
        color = jnp.where(hit[..., None], ao[..., None], env_col)
        return {"color": _sanitize(color)}

    seed = seeds  # initRand restart per shade invocation
    seed, direct = _direct_lighting(scene, options, position, normal, seed, hit, impl)

    # ---- indirect diffuse direction (progressive only; depth 0 only) ------
    indirect = jnp.zeros_like(direct)
    sample_dir = None
    if mode == "progressive":
        seed_drawn, r0, r1 = rng.next_rand2(seed)
        cosine = options["cosine_hemisphere_sampling"]
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
        no_ind = options["no_indirect_diffuse"]
        # HLSL consumes the 2 draws only when indirect diffuse runs.
        seed = jnp.where(no_ind, seed, seed_drawn)

    # ---- indirect specular direction (Phong lobe) ---------------------------
    # (ProgressiveRaytracing.hlsl:114-130 / RealtimeRaytracing.hlsl:77-93)
    is_spec_mat = (mat["type"] == 1) | (mat["type"] == 2)
    spec_active = hit & is_spec_mat & (mat["reflectivity"] > 0.001)
    exponent = jnp.exp((1.0 - mat["roughness"]) * 12.0)
    mirror = vm.normalize(vm.reflect(directions, normal))
    seed, phong_dir, pdf, brdf = sampling.phong_lobe_sample(seed, mirror, exponent)

    # ---- ONE batched secondary trace for diffuse + specular bounce rays ----
    # (the DXR version recurses twice; batching halves launch count and
    # doubles lane occupancy with lane-identical results)
    trans_active = None
    if mode == "progressive":
        n = position.shape[0]
        dirs_list = [sample_dir, phong_dir]
        act_list = [hit, spec_active]
        if refraction:
            trans_dir, trans_ok = vm.refract(directions, normal, mat["ior"])
            trans_active = (
                hit & (mat["type"] == 2) & (mat["reflectivity"] > 0.001)
                & trans_ok
            )
            dirs_list.append(trans_dir)
            act_list.append(trans_active)
        reps = len(dirs_list)
        sec_both = _secondary_radiance(
            scene,
            options,
            jnp.concatenate([position] * reps),
            jnp.concatenate(dirs_list),
            jnp.concatenate([seeds] * reps),
            jnp.concatenate(act_list),
            mode,
            impl,
            env_kind,
        )
        sec = sec_both[:n]
        spec_rad = sec_both[n : 2 * n]
        trans_rad = sec_both[2 * n :] if refraction else None
        nol = vm.saturate(vm.dot(normal, sample_dir))
        # cosine: pdf term cancels -> L * pi; uniform: L * NoL * 2pi
        # (evaluateIndirectDiffuse, ProgressiveRaytracing.hlsl:57-78).
        contrib = jnp.where(cosine, sec * M_PI, sec * (nol * 2.0 * M_PI)[..., None])
        indirect = jnp.where(options["no_indirect_diffuse"], 0.0, contrib)
    else:
        spec_rad = _secondary_radiance(
            scene, options, position, phong_dir, seeds, spec_active, mode, impl,
            env_kind,
        )
    # brdf/pdf = (e+2)/(e+1) analytically; guard the 0/0 underflow that the
    # HLSL lets become NaN (then kills via max()).
    ratio = jnp.where(pdf > 1e-30, brdf / jnp.maximum(pdf, 1e-30), (exponent + 2.0) / (exponent + 1.0))
    specular = spec_rad * ratio[..., None]
    specular = jnp.where(spec_active[..., None], specular, 0.0)
    fresnel = sampling.fresnel_schlick(directions, normal, mat["specular"])
    fresnel = jnp.where(spec_active[..., None], fresnel, 0.0)

    diffuse_comp = (direct + indirect) / M_PI
    refl = mat["reflectivity"][..., None]
    emissive = mat["emissive"] * mat["emissive_strength"][..., None]
    full = emissive + mat["albedo"] * diffuse_comp + refl * specular * fresnel
    if refraction and trans_active is not None:
        # transmission: deterministic refraction ray (pdf = brdf = 1),
        # energy split against the reflect branch by the same Schlick term
        transmitted = jnp.where(trans_active[..., None], trans_rad, 0.0)
        full = full + refl * (1.0 - fresnel) * transmitted

    if mode == "realtime":
        direct_aov = mat["albedo"] * direct / M_PI
        spec_aov = refl * specular * fresnel
        color = mat["albedo"] * direct / M_PI + refl * specular * fresnel
        color = jnp.where(hit[..., None], color, env_col)
        # Miss routes env into the direct AOV (RealtimeRaytracing.hlsl:119-126).
        direct_aov = jnp.where(hit[..., None], direct_aov, env_col)
        spec_aov = jnp.where(hit[..., None], spec_aov, 0.0)
        return {
            "color": _sanitize(color),
            "direct": _sanitize(direct_aov),
            "indirect_specular": _sanitize(spec_aov),
            "albedo": jnp.where(hit[..., None], mat["albedo"], 0.0),
            "roughness": jnp.where(hit, mat["roughness"], 0.0),
        }

    # ---- debug AOV selection at depth 0 (ProgressiveRaytracing.hlsl:132-145)
    color = full
    color = jnp.where(
        options["show_direct_lighting_only"], mat["albedo"] * direct / M_PI, color
    )
    color = jnp.where(
        options["show_gbuffer_albedo_only"], mat["albedo"], color
    )
    color = jnp.where(options["show_fresnel_term"], fresnel, color)
    color = jnp.where(
        options["show_indirect_specular_only"], refl * specular * fresnel, color
    )
    color = jnp.where(
        options["show_indirect_diffuse_only"],
        mat["albedo"] * indirect / M_PI,
        color,
    )
    color = jnp.where(hit[..., None], color, env_col)
    return {"color": _sanitize(color)}


def _sanitize(color: jnp.ndarray) -> jnp.ndarray:
    """max(c, 0) with HLSL NaN semantics (max returns the non-NaN operand),
    parity with the accumulation clamp (ProgressiveRaytracing.hlsl:37)."""
    return jnp.where(jnp.isnan(color), 0.0, jnp.maximum(color, 0.0))


GEO_CONST_LIMIT_BYTES = 8 * 1024 * 1024

# Packet-locality blocking: the traversal kernels share one stack per
# packet, so a packet's cost is the UNION of the nodes its rays visit.
# Raster-order packets are 4-row slabs across the whole image (huge
# unions); re-tiling the grid into pixel blocks makes each packet a
# compact frustum — measured 17x on 200k-tri closest-hit (713 -> 42.6 ms,
# benchmarks/traversal_micro.py). The permutation is a compile-time
# constant; secondary/shadow rays inherit the blocked order for free and
# only the final images un-permute. The fat-node kernel runs 1024-ray
# packets (32x32 blocks): the tile sweep (benchmarks/tlas_micro.py sweep)
# put 1024 at/near the optimum on both the 983k-tri instanced scene and
# the 200k soup — smaller packets shrink the union faster than the extra
# scalar iterations cost, now that fat visits are half as many.
FAT_TILE = 1024
# Secondary (bounce) closest traces run SMALLER packets: hemisphere draws
# make every packet's direction union near-isotropic, so shrinking the
# packet shrinks its node/instance union faster than the extra per-packet
# scalar iterations cost. Measured on the 983k-tri instanced scene
# (524k-ray diffuse+spec secondary, 42% active, /tmp sweep 2026-08-20):
# flat 138.7 ms @512 vs 164.6 @1024 (-16%); two-level 242.3 vs 258.6 (-6%);
# 384/640/768 all worse than 512 on both builds. Camera-coherent stages
# keep FAT_TILE=1024 (round-3 sweeps). DXR_SEC_TILE overrides for sweeps.
SEC_TILE = int(os.environ.get("DXR_SEC_TILE", "512"))
BLOCK_H, BLOCK_W = 32, 32


@functools.lru_cache(maxsize=16)
def _block_perm(height: int, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(perm, inv_perm) mapping raster order -> BLOCK_HxBLOCK_W-block order."""
    lin = np.arange(height * width, dtype=np.int32).reshape(height, width)
    blocked = (
        lin.reshape(height // BLOCK_H, BLOCK_H, width // BLOCK_W, BLOCK_W)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    inv = np.empty_like(blocked)
    inv[blocked] = np.arange(height * width, dtype=np.int32)
    return blocked, inv


def _geo_bytes(geo: dict) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(geo))


def make_render_step(
    scene: dict,
    width: int,
    height: int,
    mode: str = "progressive",
    ao_only: bool = False,
    jitter_scale: float = 30.0,
    impl: str = "auto",
    dynamic: bool = False,
    frames_per_step: int = 1,
):
    """Compile a per-frame render step with the scene GEOMETRY baked in as
    constants — the analogue of compiling an RTPSO for a scene
    (/root/reference/libs/DXRFramework/RtState.cpp:18-65).

    Why: passing the ~36-leaf scene pytree as jit arguments costs ~16 ms per
    dispatch on the axon tunnel (measured), while camera/options/lights/env
    arguments are free. Lights and env stay arguments so per-frame light
    animation and UI edits don't recompile.

    Returns jitted ``step(options, camera, lights, env) -> dict of images``.

    frames_per_step (realtime only): batch K FRAMES into one dispatch — the
    TPU-native expression of the reference's frames-in-flight pipelining
    (3 deep: /root/reference/include/DXRExperimentsApp.h:27,
    src/utils/DeviceResources.cpp:580-598). The axon tunnel charges ~5 ms
    per host dispatch that back-to-back async dispatches do NOT hide
    (benchmarks/rt_anatomy.py); K frames per dispatch amortize it at the
    cost of K-frame input latency, exactly like the reference's in-flight
    ring. The returned step takes CameraParams stacked on a leading [K]
    frame axis and returns AOVs with a leading [K] axis. Batched output is
    bit-identical to K sequential single-frame steps (tested).
    """
    geo = {k: v for k, v in scene.items() if k not in ("lights", "env")}
    env_kind = int(scene["env"]["kind"])

    # Realtime megakernel fast path: the whole RealtimeRaytracing.hlsl tree
    # (primary + 2 shadows + Phong bounce with closest + 2 shadows) as ONE
    # Pallas launch with all five AOVs written from registers.
    from ..ops import fused_sample_pallas, fused_traverse_pallas

    resolved = resolve_impl(impl)
    rt_eligible = (
        mode == "realtime"
        and not dynamic
        and jitter_scale == 10.0
        and resolved in ("pallas", "pallas_interpret")
    )
    use_fused_rt = rt_eligible and fused_sample_pallas.supports_fused(
        scene, "realtime", ao_only
    )
    # BVH scenes: fused TRAVERSAL realtime megakernel (round 3)
    use_ft_rt = (
        rt_eligible
        and not use_fused_rt
        and fused_traverse_pallas.supports_fused_traverse(
            scene, "realtime", ao_only
        )
    )
    if frames_per_step > 1:
        if mode != "realtime" or dynamic:
            raise ValueError(
                "frames_per_step > 1 is the realtime frames-in-flight batch"
            )
        bake = _geo_bytes(geo) <= GEO_CONST_LIMIT_BYTES

        def frames_inner(options, cameras, lights, env, geo_arg):
            full = dict(geo_arg, lights=lights, env=env)
            if use_fused_rt:
                # One kernel launch for all K frames: per-frame cameras ride
                # the sample-grid axis, each frame writes its own AOV block.
                return fused_sample_pallas.fused_realtime_outputs_batch(
                    full, options, cameras, width, height, env_kind,
                    interpret=(resolved == "pallas_interpret"),
                )

            # Generic: K single-frame renders inside ONE dispatch (lax.map
            # compiles the body once and runs the launches back-to-back on
            # device — one host round-trip total).
            def body(cam):
                if use_ft_rt:
                    return fused_traverse_pallas.fused_traverse_realtime_outputs(
                        full, options, cam, width, height, env_kind,
                        interpret=(resolved == "pallas_interpret"),
                    )
                return render_sample(
                    full, options, cam, width, height,
                    mode="realtime", ao_only=ao_only,
                    jitter_scale=jitter_scale, impl=impl, env_kind=env_kind,
                )

            return jax.lax.map(body, cameras)

        if bake:
            @jax.jit
            def step_frames(options, cameras, lights, env):
                return frames_inner(options, cameras, lights, env, geo)

            return step_frames

        frames_inner_jit = jax.jit(frames_inner)

        def step_frames_arg(options, cameras, lights, env, geo_arg=None):
            return frames_inner_jit(
                options, cameras, lights, env,
                geo if geo_arg is None else geo_arg,
            )

        return step_frames_arg

    if use_fused_rt or use_ft_rt:
        rt_fn = (
            fused_sample_pallas.fused_realtime_outputs
            if use_fused_rt
            else fused_traverse_pallas.fused_traverse_realtime_outputs
        )
        if _geo_bytes(geo) <= GEO_CONST_LIMIT_BYTES:
            @jax.jit
            def step_rt(options: dict, camera: dict, lights: dict,
                        env: dict) -> dict:
                full = dict(geo, lights=lights, env=env)
                return rt_fn(
                    full, options, camera, width, height, env_kind,
                    interpret=(resolved == "pallas_interpret"),
                )

            return step_rt

        @jax.jit
        def rt_inner(options, camera, lights, env, geo_arg):
            full = dict(geo_arg, lights=lights, env=env)
            return rt_fn(
                full, options, camera, width, height, env_kind,
                interpret=(resolved == "pallas_interpret"),
            )

        def step_rt_arg(options, camera, lights, env, geo_arg=None):
            return rt_inner(
                options, camera, lights, env,
                geo if geo_arg is None else geo_arg,
            )

        return step_rt_arg

    if not dynamic and _geo_bytes(geo) <= GEO_CONST_LIMIT_BYTES:
        @jax.jit
        def step(options: dict, camera: dict, lights: dict, env: dict) -> dict:
            full = dict(geo, lights=lights, env=env)
            return render_sample(
                full, options, camera, width, height,
                mode=mode, ao_only=ao_only, jitter_scale=jitter_scale,
                impl=impl, env_kind=env_kind,
            )

        return step

    # Large scene OR dynamic instancing: geometry as runtime arguments
    # (baking it as constants blows up the compile payload / would recompile
    # per TLAS refit; the per-dispatch argument overhead is negligible
    # against big-scene frame times). `geo_arg` lets animated two-level
    # scenes pass each frame's refitted arrays without recompiling.
    @jax.jit
    def inner(options, camera, lights, env, geo_arg):
        full = dict(geo_arg, lights=lights, env=env)
        return render_sample(
            full, options, camera, width, height,
            mode=mode, ao_only=ao_only, jitter_scale=jitter_scale,
            impl=impl, env_kind=env_kind,
        )

    def step(options, camera, lights, env, geo_arg=None):
        return inner(options, camera, lights, env, geo if geo_arg is None else geo_arg)

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "ao_only", "width", "height", "jitter_scale", "impl", "env_kind",
        "full_height", "refraction",
    ),
)
def render_sample(
    scene: dict,
    options: dict,
    camera: dict,
    width: int,
    height: int,
    mode: str = "progressive",
    ao_only: bool = False,
    jitter_scale: float = 30.0,
    impl: str = "auto",
    env_kind: int | None = None,
    row0=None,
    full_height: int = 0,
    refraction: bool = False,
) -> dict:
    """Render one sample for the full [H, W] grid; the jitted per-frame kernel.

    The TPU analogue of one DispatchRays(w, h)
    (/root/reference/libs/DXRFramework/RtContext.cpp:192-222).
    Returns dict of [H, W, ...] images.

    row0/full_height: render rows [row0, row0+height) of a full_height-tall
    image with global NDC + pixel seeds (multi-chip row sharding).
    """
    from ..core.camera import primary_ray_grid  # local import to avoid cycle

    origins, directions = primary_ray_grid(
        camera, width, height, jitter_scale, row0=row0, full_height=full_height
    )
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    seeds = rng.pixel_seeds(
        width, height, camera["frame_count"], row0=row0
    ).reshape(-1)

    blocked = (
        ("bvh" in scene or "tlas" in scene)
        and resolve_impl(impl) in ("pallas", "pallas_interpret")
        and height % BLOCK_H == 0
        and width % BLOCK_W == 0
    )
    if blocked:
        perm, inv_perm = _block_perm(height, width)
        o, d, seeds = o[perm], d[perm], seeds[perm]

    out = trace_rays(
        scene, options, o, d, seeds,
        mode=mode, ao_only=ao_only, impl=impl, env_kind=env_kind,
        refraction=refraction,
    )
    reshaped = {}
    for k, v in out.items():
        if blocked:
            v = v[inv_perm]
        if v.ndim == 2:
            reshaped[k] = v.reshape(height, width, v.shape[-1])
        else:
            reshaped[k] = v.reshape(height, width)
    return reshaped
