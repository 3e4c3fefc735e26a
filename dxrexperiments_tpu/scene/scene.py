"""Scene assembly: instances -> flattened device SoA + intersection precomputes.

TPU-native replacement for ``RtScene``/``RtModel`` + BLAS/TLAS build
(/root/reference/libs/DXRFramework/RtScene.cpp:18-52, RtModel.cpp:86-118).
Where D3D12 builds opaque driver acceleration structures, we lower the scene
to explicit arrays:

  * world-space triangle SoA (v0/e1/e2 + per-vertex normals) padded to a
    lane-aligned triangle count,
  * precomputed Plücker-form Möller–Trumbore terms so the intersector is a
    chain of [R,3]x[3,T] contractions (MXU/VPU-friendly; see ops/intersect.py),
  * a stacked material table and per-triangle material ids (replacing
    per-instance SBT hit records),
  * lights + environment.

Padding triangles are fully degenerate (all zeros) which self-mask in the
intersector (det == 0 -> miss), the SoA analogue of inactive SBT entries.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from .lights import default_lights
from .materials import Material, stack_materials
from .mesh import Mesh
from . import envmap as envmap_mod

TRI_ALIGN = 8  # pad triangle count to the sublane tile (triangles ride sublanes in the kernels)


@dataclasses.dataclass
class Instance:
    """One placed model: mesh + 3x4/4x4 transform + optional material override.

    Mirrors RtScene::Node (model + transform,
    /root/reference/libs/DXRFramework/RtScene.h:17-32) with the per-instance
    material assignment the pipelines do via SBT hit records
    (/root/reference/src/ProgressiveRaytracingPipeline.cpp:220-226).
    """

    mesh: Mesh
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    material_override: int | None = None  # global material index for all faces


BVH_THRESHOLD = 4096  # above this triangle count, build + attach a BVH
BVH_LEAF_SIZE = 32  # fixed leaf size consumed by the traversal kernel (swept on v5e)

# PRIME triangles: the few scene-dominating triangles (floors, walls) kept
# as a world-space side table so incoherent bounce traces can pre-seed
# their t_max against them (trace/integrator._prime_seed_tmax) — a tight
# far clamp makes the packet kernels' slab unions collapse to the origin
# cell instead of spanning the whole instance grid. Selection is a
# heuristic (correctness never depends on which triangles are chosen, only
# on their world-space coordinates being current — see refit).
PRIME_MAX = 8
PRIME_AREA_FRAC = 0.02  # keep triangles with area >= frac * max_extent^2


def select_prime_triangles(v0, e1, e2) -> np.ndarray:
    """Indices of up to PRIME_MAX triangles whose world area is at least
    PRIME_AREA_FRAC x (scene max extent)^2 — typically floors/walls. Returns
    an empty index array when nothing qualifies (e.g. triangle soups), which
    callers treat as "no prime table" (zero overhead)."""
    if len(v0) == 0:
        return np.zeros((0,), np.int64)
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    p1, p2 = v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(v0.min(0), p1.min(0)), p2.min(0))
    hi = np.maximum(np.maximum(v0.max(0), p1.max(0)), p2.max(0))
    ext = float(np.max(hi - lo))
    if not np.isfinite(ext) or ext <= 0.0:
        return np.zeros((0,), np.int64)
    idx = np.argsort(-area, kind="stable")[:PRIME_MAX]
    return idx[area[idx] >= PRIME_AREA_FRAC * ext * ext]


class Scene:
    """Host-side scene graph; ``build()`` lowers to the device pytree."""

    def __init__(self):
        self.instances: list[Instance] = []
        self.materials: list[Material] = []
        self.lights: dict | None = None
        self.environment: dict | None = None

    # -- assembly -------------------------------------------------------- #
    def add_material(self, material: Material) -> int:
        self.materials.append(material)
        return len(self.materials) - 1

    def add_model(
        self,
        mesh: Mesh,
        transform: np.ndarray | None = None,
        material: int | Material | None = None,
    ) -> int:
        """Add an instance. `material` may be a global material index or a
        Material (auto-registered); None uses the mesh's own materials."""
        t = np.eye(4, dtype=np.float32) if transform is None else np.asarray(
            transform, np.float32
        )
        if t.shape == (3, 4):
            t = np.concatenate([t, [[0, 0, 0, 1]]], axis=0).astype(np.float32)
        override: int | None
        if isinstance(material, Material):
            override = self.add_material(material)
        else:
            override = material
        self.instances.append(Instance(mesh, t, override))
        return len(self.instances) - 1

    @property
    def num_instances(self) -> int:
        return len(self.instances)

    # -- lowering ---------------------------------------------------------- #
    def build(self, accel: str = "auto") -> dict[str, Any]:
        """Flatten all instances into world space and precompute intersection
        terms. Returns the SceneData pytree (all jnp arrays).

        accel: 'auto' attaches a BVH (native SAH if available, else the
        Morton build) when the scene exceeds BVH_THRESHOLD triangles — the
        analogue of the reference's BLAS/TLAS build step
        (/root/reference/libs/DXRFramework/RtScene.cpp:18-52); 'bvh' forces
        it; 'none' keeps the brute-force-only scene."""
        v0s, e1s, e2s = [], [], []
        n0s, n1s, n2s = [], [], []
        uvcs = []
        mat_ids = []
        inst_ids = []
        mat_offset_for_mesh: dict[int, int] = {}

        materials = list(self.materials)

        for inst_idx, inst in enumerate(self.instances):
            mesh = inst.mesh
            m = inst.transform
            rot = m[:3, :3]
            trans = m[:3, 3]
            # normal matrix = inverse-transpose of rotation part
            nrm_m = np.linalg.inv(rot).T if abs(np.linalg.det(rot)) > 1e-12 else rot

            pos = mesh.positions @ rot.T + trans
            nrm = mesh.normals @ nrm_m.T
            nl = np.linalg.norm(nrm, axis=-1, keepdims=True)
            nrm = nrm / np.where(nl > 1e-12, nl, 1.0)

            tri = mesh.indices
            p0, p1, p2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
            v0s.append(p0)
            e1s.append(p1 - p0)
            e2s.append(p2 - p0)
            n0s.append(nrm[tri[:, 0]])
            n1s.append(nrm[tri[:, 1]])
            n2s.append(nrm[tri[:, 2]])
            uvcs.append(
                mesh.uv_corners
                if mesh.uv_corners is not None
                else np.zeros((len(tri), 3, 2), np.float32)
            )

            if inst.material_override is not None:
                ids = np.full(len(tri), inst.material_override, np.int32)
            elif mesh.materials:
                key = id(mesh)
                if key not in mat_offset_for_mesh:
                    mat_offset_for_mesh[key] = len(materials)
                    materials.extend(mesh.materials)
                ids = mesh.material_ids + mat_offset_for_mesh[key]
            else:
                # Mesh faces index the scene-global material table directly
                # (e.g. procedural scenes registering materials up front).
                ids = np.clip(mesh.material_ids, 0, max(len(materials) - 1, 0))
            mat_ids.append(ids)
            inst_ids.append(np.full(len(tri), inst_idx, np.int32))

        if not materials:
            materials = [Material()]

        if v0s:
            v0 = np.concatenate(v0s).astype(np.float32)
            e1 = np.concatenate(e1s).astype(np.float32)
            e2 = np.concatenate(e2s).astype(np.float32)
            n0 = np.concatenate(n0s).astype(np.float32)
            n1 = np.concatenate(n1s).astype(np.float32)
            n2 = np.concatenate(n2s).astype(np.float32)
            mid = np.concatenate(mat_ids).astype(np.int32)
            iid = np.concatenate(inst_ids).astype(np.int32)
        else:
            v0 = e1 = e2 = n0 = n1 = n2 = np.zeros((0, 3), np.float32)
            mid = iid = np.zeros((0,), np.int32)

        num_tris = len(v0)
        # Pad to the sublane tile when a single kernel chunk covers the whole
        # scene; above one chunk (512) the attribute blocks ride the lane
        # dimension per chunk, which Mosaic requires to be 128-aligned — so
        # pad to a full chunk multiple instead.
        if num_tris <= 512:
            padded = max(TRI_ALIGN, -(-num_tris // TRI_ALIGN) * TRI_ALIGN)
        else:
            padded = -(-num_tris // 512) * 512

        def pad3(a):
            out = np.zeros((padded, 3), np.float32)
            out[: len(a)] = a
            return out

        def pad1(a, fill=0):
            out = np.full((padded,), fill, a.dtype if len(a) else np.int32)
            out[: len(a)] = a
            return out

        v0, e1, e2 = pad3(v0), pad3(e1), pad3(e2)
        n0, n1, n2 = pad3(n0), pad3(n1), pad3(n2)
        mid, iid = pad1(mid), pad1(iid)

        # Plücker / scalar-triple-product precomputes (see ops/intersect.py):
        #   det = -(D . pn)            pn = e1 x e2  (unnormalized face normal)
        #   u*det =  M . e2 + D . c1   M  = O x D,  c1 = v0 x e2
        #   v*det = -M . e1 - D . c2   c2 = v0 x e1
        #   t*det =  O . pn - d0       d0 = v0 . pn
        pn = np.cross(e1, e2)
        c1 = np.cross(v0, e2)
        c2 = np.cross(v0, e1)
        d0 = np.sum(v0 * pn, axis=-1)

        lights = self.lights if self.lights is not None else default_lights()
        env = (
            self.environment
            if self.environment is not None
            else envmap_mod.constant_env((0.0, 0.0, 0.0))
        )

        # ---- Pallas kernel packings (see ops/intersect_pallas.py) ---------
        # Triangle-on-sublanes layout (rays ride the lane dimension in the
        # kernels). mt_pack [4, T, 16]: coefficient rows per term group g so
        # term[c, r] = sum_k mt_pack[g, c, k] * lhs_k[r], lhs = [D, M, O, 1].
        mt_pack = np.zeros((4, padded, 16), np.float32)
        mt_pack[0, :, 0:3] = -pn  # det  = -(D . pn)
        mt_pack[1, :, 0:3] = c1  # u*det =  D . c1 + M . e2
        mt_pack[1, :, 3:6] = e2
        mt_pack[2, :, 0:3] = -c2  # v*det = -D . c2 - M . e1
        mt_pack[2, :, 3:6] = -e1
        mt_pack[3, :, 6:9] = pn  # t*det =  O . pn - d0
        mt_pack[3, :, 9] = -d0

        # attr_pack [32, T]: per-triangle hit attributes fetched via a
        # one-hot matmul attr[32,C] @ sel[C,R] (MXU as gather engine):
        # vertex normals, material id and the full material row so shading
        # needs no gathers at all.
        mats = stack_materials(materials)
        mat_np = {k: np.asarray(v) for k, v in mats.items()}
        attr = np.zeros((32, padded), np.float32)
        attr[0:3] = n0.T
        attr[3:6] = n1.T
        attr[6:9] = n2.T
        attr[9] = mid.astype(np.float32)
        attr[10:13] = mat_np["albedo"][mid].T
        attr[13:16] = mat_np["specular"][mid].T
        attr[16:19] = mat_np["emissive"][mid].T
        attr[19] = mat_np["emissive_strength"][mid]
        attr[20] = mat_np["reflectivity"][mid]
        attr[21] = mat_np["roughness"][mid]
        attr[22] = mat_np["ior"][mid]
        attr[23] = mat_np["type"][mid].astype(np.float32)

        scene_dict = {
            "mt_pack": jnp.asarray(mt_pack),
            "attr_pack": jnp.asarray(attr),
            "v0": jnp.asarray(v0),
            "e1": jnp.asarray(e1),
            "e2": jnp.asarray(e2),
            "n0": jnp.asarray(n0),
            "n1": jnp.asarray(n1),
            "n2": jnp.asarray(n2),
            "pn": jnp.asarray(pn.astype(np.float32)),
            "c1": jnp.asarray(c1.astype(np.float32)),
            "c2": jnp.asarray(c2.astype(np.float32)),
            "d0": jnp.asarray(d0.astype(np.float32)),
            "mat_id": jnp.asarray(mid),
            "inst_id": jnp.asarray(iid),
            "num_tris": jnp.asarray(num_tris, jnp.int32),
            "materials": mats,
            "lights": lights,
            "env": env,
        }

        # Albedo textures (scene.textures): only attach the table + per-
        # corner UVs when some material is textured — untextured scenes keep
        # the round-2 pytree (and the fused megakernel gates key off the
        # "textures" key's absence).
        from .textures import pack_texture_table

        textures = pack_texture_table(materials)
        if textures is not None:
            uvc = (
                np.concatenate(uvcs).astype(np.float32)
                if uvcs
                else np.zeros((0, 3, 2), np.float32)
            )
            uv_pad = np.zeros((padded, 3, 2), np.float32)
            uv_pad[: len(uvc)] = uvc
            scene_dict["textures"] = textures
            scene_dict["uv0"] = jnp.asarray(uv_pad[:, 0])
            scene_dict["uv1"] = jnp.asarray(uv_pad[:, 1])
            scene_dict["uv2"] = jnp.asarray(uv_pad[:, 2])

        want_bvh = accel == "bvh" or (accel == "auto" and num_tris > BVH_THRESHOLD)
        tex_autoroute = False
        if accel == "auto" and not want_bvh and num_tris > 0:
            # Texture-env (latlong/cubemap) and textured-albedo scenes:
            # the brute megakernel can't resolve texture gathers in-kernel
            # (fused_sample_pallas.supports_fused rejects them), so without
            # a BVH these scenes fall to the 9-launch wavefront path. The
            # fused-TRAVERSAL megakernel runs them DEFERRED (bounce dirs +
            # weights out, miss-compacted XLA gathers outside) — attach a
            # BVH so small scenes ride it (round 4; eligibility mirrors
            # supports_fused_traverse's rig/material gates).
            from .lights import light_counts
            from ..ops.fused_traverse_pallas import MP_MAX_MATERIALS

            d_n, p_n, a_n = light_counts(lights)
            rig_ok = (
                d_n <= 1 and p_n <= 1 and a_n <= 1 and d_n + p_n + a_n >= 1
            )
            deferred_texloads = (
                int(env["kind"]) in (2, 3) or textures is not None
            )
            if (rig_ok and deferred_texloads
                    and len(materials) <= MP_MAX_MATERIALS):
                want_bvh = True
                # The BVH below exists only for texture ROUTING, not size:
                # tag it so fused_sample_pallas.supports_fused can keep
                # brute-eligible tiny scenes on the (2-5x faster there)
                # brute megakernel in BOTH pipelines (env-deferred);
                # textured-ALBEDO scenes still ride the FT deferred path
                # through this BVH.
                tex_autoroute = True
        # World-space PRIME table for bounce-trace t_max seeding (only
        # meaningful when a packet-traversal accel is attached below; the
        # brute megakernel paths ignore it).
        pidx = select_prime_triangles(v0, e1, e2)
        if len(pidx) and (want_bvh or accel == "bvh"):
            scene_dict["prime_v0"] = jnp.asarray(v0[pidx])
            scene_dict["prime_e1"] = jnp.asarray(e1[pidx])
            scene_dict["prime_e2"] = jnp.asarray(e2[pidx])

        if want_bvh and num_tris > 0:
            from ..accel import bvh as bvh_mod
            from ..ops.traverse_pallas import pack_for_traversal

            nodes = bvh_mod.build_bvh_sah(v0, e1, e2, num_tris, BVH_LEAF_SIZE)
            if nodes is None:  # no native toolchain -> Morton build
                nodes = bvh_mod.to_node_arrays(
                    bvh_mod.build_bvh(v0, e1, e2, num_tris, BVH_LEAF_SIZE)
                )
            packed = pack_for_traversal(nodes, scene_dict, BVH_LEAF_SIZE)
            packed.pop("leaf_size")  # fixed BVH_LEAF_SIZE; pytree stays arrays
            if tex_autoroute:
                packed["tex_autoroute"] = jnp.asarray(1, jnp.int32)
            scene_dict["bvh"] = packed

        return scene_dict


    # -- two-level lowering ------------------------------------------------ #
    def build_two_level(self) -> dict[str, Any]:
        """Lower to the two-level TLAS/BLAS pytree (accel/tlas.py): one
        object-space BLAS per UNIQUE mesh (shared by all its instances), a
        refittable TLAS over instance AABBs, per-instance inverse transforms.

        The analogue of the reference's real TLAS build
        (/root/reference/libs/DXRFramework/RtScene.cpp:27-51) — unlike
        ``build()``, geometry is NOT flattened per instance, so memory is
        O(unique geometry) and animating transforms is a pure TLAS refit
        (scene/dynamic.py:refit_scene_instances).
        """
        from ..accel import tlas as tlas_mod

        materials = list(self.materials)
        mat_offset_for_mesh: dict[int, int] = {}
        mesh_index: dict[int, int] = {}
        meshes_geo = []  # (v0, e1, e2) per unique mesh
        mesh_attr = []  # (n0, n1, n2, mat_id, uv_corners) per unique mesh
        inst_mesh = np.zeros((len(self.instances),), np.int64)
        transforms = np.zeros((len(self.instances), 4, 4), np.float32)
        overrides = np.full((len(self.instances),), -1, np.int64)

        for inst_idx, inst in enumerate(self.instances):
            mesh = inst.mesh
            key = id(mesh)
            if key not in mesh_index:
                mesh_index[key] = len(meshes_geo)
                tri = mesh.indices
                p0 = mesh.positions[tri[:, 0]]
                p1 = mesh.positions[tri[:, 1]]
                p2 = mesh.positions[tri[:, 2]]
                if mesh.materials:
                    if key not in mat_offset_for_mesh:
                        mat_offset_for_mesh[key] = len(materials)
                        materials.extend(mesh.materials)
                    mid = mesh.material_ids + mat_offset_for_mesh[key]
                else:
                    mid = np.clip(
                        mesh.material_ids, 0, max(len(materials) - 1, 0)
                    )
                meshes_geo.append(
                    (
                        p0.astype(np.float32),
                        (p1 - p0).astype(np.float32),
                        (p2 - p0).astype(np.float32),
                    )
                )
                mesh_attr.append(
                    (
                        mesh.normals[tri[:, 0]].astype(np.float32),
                        mesh.normals[tri[:, 1]].astype(np.float32),
                        mesh.normals[tri[:, 2]].astype(np.float32),
                        mid.astype(np.int32),
                        mesh.uv_corners
                        if mesh.uv_corners is not None
                        else np.zeros((len(tri), 3, 2), np.float32),
                    )
                )
            inst_mesh[inst_idx] = mesh_index[key]
            transforms[inst_idx] = inst.transform
            if inst.material_override is not None:
                overrides[inst_idx] = inst.material_override

        if not materials:
            materials = [Material()]
        if not meshes_geo:
            raise ValueError("two-level build requires at least one instance")

        tl, ctx = tlas_mod.build_two_level(
            meshes_geo, inst_mesh, transforms, overrides,
            leaf_size=BVH_LEAF_SIZE,
        )

        # Concatenated object-space attribute / oracle arrays.
        v0 = np.concatenate([g[0] for g in meshes_geo])
        e1 = np.concatenate([g[1] for g in meshes_geo])
        e2 = np.concatenate([g[2] for g in meshes_geo])
        pn = np.cross(e1, e2)
        c1 = np.cross(v0, e2)
        c2 = np.cross(v0, e1)
        d0 = np.sum(v0 * pn, axis=-1)
        n0 = np.concatenate([a[0] for a in mesh_attr])
        n1 = np.concatenate([a[1] for a in mesh_attr])
        n2 = np.concatenate([a[2] for a in mesh_attr])
        mid = np.concatenate([a[3] for a in mesh_attr])

        ranges = []
        base = 0
        for g in meshes_geo:
            ranges.append((base, base + len(g[0])))
            base += len(g[0])

        num_tris = int(
            sum(len(meshes_geo[int(m)][0]) for m in inst_mesh)
        )
        lights = self.lights if self.lights is not None else default_lights()
        env = (
            self.environment
            if self.environment is not None
            else envmap_mod.constant_env((0.0, 0.0, 0.0))
        )
        out = {
            "tlas": tl,
            "tlas_meta": tlas_mod.HostStatic({
                "num_instances": ctx.num_instances,
                "slot_mesh": inst_mesh[ctx.inst_order].astype(np.int32),
                "mesh_tri_ranges": ranges,
                "refit_ctx": ctx,
            }),
            "v0_obj": jnp.asarray(v0.astype(np.float32)),
            "e1_obj": jnp.asarray(e1.astype(np.float32)),
            "e2_obj": jnp.asarray(e2.astype(np.float32)),
            "pn_obj": jnp.asarray(pn.astype(np.float32)),
            "c1_obj": jnp.asarray(c1.astype(np.float32)),
            "c2_obj": jnp.asarray(c2.astype(np.float32)),
            "d0_obj": jnp.asarray(d0.astype(np.float32)),
            "n0_obj": jnp.asarray(n0),
            "n1_obj": jnp.asarray(n1),
            "n2_obj": jnp.asarray(n2),
            "mat_id_obj": jnp.asarray(mid),
            "materials": stack_materials(materials),
            "lights": lights,
            "env": env,
            "num_tris": jnp.asarray(num_tris, jnp.int32),
        }
        # World-space PRIME table (bounce-trace t_max seeding). Candidates =
        # each mesh's top-PRIME_MAX object-space-area triangles, expanded
        # through every instance transform (exact areas for the candidates
        # only — no full world flatten); selection then runs on the world
        # candidates. The object-space sources + owning instance ids ride
        # tlas_meta so refit_scene_instances can re-derive current world
        # coordinates under animation.
        cand_obj, cand_inst = [], []
        for mi, (gv0, ge1, ge2) in enumerate(meshes_geo):
            top = select_prime_triangles(gv0, ge1, ge2)
            top = (
                np.argsort(
                    -0.5 * np.linalg.norm(np.cross(ge1, ge2), axis=-1),
                    kind="stable",
                )[:PRIME_MAX]
                if len(top) == 0 else top
            )
            for ii in np.nonzero(inst_mesh == mi)[0]:
                cand_obj.append((gv0[top], ge1[top], ge2[top]))
                cand_inst.append(np.full((len(top),), ii, np.int64))
        cv0 = np.concatenate([c[0] for c in cand_obj])
        ce1 = np.concatenate([c[1] for c in cand_obj])
        ce2 = np.concatenate([c[2] for c in cand_obj])
        cinst = np.concatenate(cand_inst)
        rot = transforms[cinst, :3, :3]
        trn = transforms[cinst, :3, 3]
        wv0 = np.einsum("nij,nj->ni", rot, cv0) + trn
        we1 = np.einsum("nij,nj->ni", rot, ce1)
        we2 = np.einsum("nij,nj->ni", rot, ce2)
        pidx = select_prime_triangles(wv0, we1, we2)
        if len(pidx):
            out["prime_v0"] = jnp.asarray(wv0[pidx].astype(np.float32))
            out["prime_e1"] = jnp.asarray(we1[pidx].astype(np.float32))
            out["prime_e2"] = jnp.asarray(we2[pidx].astype(np.float32))
            out["tlas_meta"].value["prime_src"] = {
                "v0": cv0[pidx].astype(np.float32),
                "e1": ce1[pidx].astype(np.float32),
                "e2": ce2[pidx].astype(np.float32),
                "inst": cinst[pidx].astype(np.int32),
            }

        from .textures import pack_texture_table

        textures = pack_texture_table(materials)
        if textures is not None:
            uvc = np.concatenate([a[4] for a in mesh_attr]).astype(np.float32)
            out["textures"] = textures
            out["uv0_obj"] = jnp.asarray(uvc[:, 0])
            out["uv1_obj"] = jnp.asarray(uvc[:, 1])
            out["uv2_obj"] = jnp.asarray(uvc[:, 2])
        return out


def rebake_material(scene: dict, index: int, material: Material) -> dict:
    """Return a scene pytree with material `index` replaced.

    The live material-editing path (parity with the reference's imgui
    material sliders + frameDirty accumulation restart,
    /root/reference/src/ProgressiveRaytracingPipeline.cpp:253-267,309-311):
    updates the stacked material table AND re-derives the fused attr_pack
    rows (and the traversal attr_sorted mirror when present) from the
    unchanged per-triangle mat_id. Pipelines whose compiled steps bake
    geometry as constants recompile on the new identity — the analogue of
    the SBT rewrite the reference performs each frame.
    """
    m = stack_materials([material])
    mats = {k: scene["materials"][k].at[index].set(m[k][0]) for k in m}
    mid = scene["mat_id"]
    attr = scene["attr_pack"]
    attr = attr.at[10:13].set(mats["albedo"][mid].T)
    attr = attr.at[13:16].set(mats["specular"][mid].T)
    attr = attr.at[16:19].set(mats["emissive"][mid].T)
    attr = attr.at[19].set(mats["emissive_strength"][mid])
    attr = attr.at[20].set(mats["reflectivity"][mid])
    attr = attr.at[21].set(mats["roughness"][mid])
    attr = attr.at[22].set(mats["ior"][mid])
    attr = attr.at[23].set(mats["type"][mid].astype(jnp.float32))
    out = dict(scene, materials=mats, attr_pack=attr)
    if "bvh" in scene and "attr_sorted" in scene["bvh"]:
        slot = scene["bvh"]["slot_tri"]
        src = jnp.maximum(slot, 0)
        out["bvh"] = dict(
            scene["bvh"],
            attr_sorted=jnp.where(slot[None, :] >= 0, attr[:, src], 0.0),
        )
    return out
