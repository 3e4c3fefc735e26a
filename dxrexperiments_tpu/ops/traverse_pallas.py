"""Pallas BVH packet traversal — scalable ray tracing for large scenes.

The TPU re-expression of the Fallback Layer's BVH traversal compute shaders
(the closed-source core of /root/reference/externals/D3D12RaytracingFallback).
Where GPUs traverse per-thread with divergent stacks, the TPU-native shape is
PACKET traversal: one shared stack per tile of rays (scalar control flow in
SMEM), vectorized ray-AABB slab tests across the tile's lanes, and fixed-size
leaf batches tested with the same Plücker pair math as ops/intersect_pallas.

Memory plan:
  * node arrays [8, M] (lo3/hi3/left/right as f32) live in VMEM — ~4 MB for
    a million triangles at leaf_size 16,
  * triangle data (mt_pack/attr rows, Morton- or SAH-sorted so leaves are
    contiguous) stays in HBM; each visited leaf DMAs a [4, K, 16] slice into
    VMEM scratch,
  * the running best hit lives in the output block.

The kernel returns (t, slot, u, v, hit); attribute interpolation happens
outside (slot -> original triangle via the `order` permutation). Leaves are
regularized to a fixed K slots by ``pack_for_traversal`` so the DMA shape is
static — SAH trees with variable leaf sizes get padded slots (degenerate
triangles self-mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 2048  # packet size; larger wins (scalar loop overhead >> union growth)
BIG = 3.0e38
MAX_STACK = 96  # depth bound: 2*levels+2; 96 covers trees to ~2^47 leaves


def pack_for_traversal(
    nodes: dict, scene: dict, leaf_size: int = 16, include_attrs: bool = False
) -> dict:
    """Regularize a node-array BVH (accel/bvh.py format) + scene packs into
    kernel-ready arrays:

      bvh_nodes [8, M_pad] f32: rows lo_xyz, hi_xyz, left, right
        internal: left/right = child node ids (as exact floats)
        leaf:     left = -(slot_start+1), right = count
      mt_sorted [4, S, 16], attr_sorted [32, S]: triangle packs re-ordered
        into fixed-K leaf slots (S = n_leaves * K, padded slots degenerate)
      slot_tri [S] i32: slot -> original triangle index (-1 for padding)
    """
    child = np.asarray(nodes["child"], np.int64)
    order = np.asarray(nodes["order"], np.int64)
    m = len(child)
    leaf_mask = child[:, 0] < 0
    leaf_ids = np.nonzero(leaf_mask)[0]
    n_leaves = len(leaf_ids)

    # Vectorized leaf regularization (the per-leaf Python loop cost minutes
    # at a million triangles).
    starts = -child[leaf_ids, 0] - 1
    counts = np.clip(child[leaf_ids, 1], 0, leaf_size)
    lane = np.arange(leaf_size)[None, :]
    src = np.clip(starts[:, None] + lane, 0, max(len(order) - 1, 0))
    vals = order[src] if len(order) else np.full_like(src, -1)
    in_count = lane < counts[:, None]
    slots2d = np.where(in_count & (vals >= 0), vals, -1)
    # compact valid tris to the front of each leaf (order[start:] may carry
    # -1 padding slots from the Morton builder)
    key = np.where(slots2d >= 0, 0, 1)
    sort_idx = np.argsort(key, axis=1, kind="stable")
    slots2d = np.take_along_axis(slots2d, sort_idx, axis=1)
    slot_tri = slots2d.reshape(-1) if n_leaves else np.full((leaf_size,), -1, np.int64)

    new_child = child.copy()
    new_child[leaf_ids, 0] = -(np.arange(n_leaves) * leaf_size + 1)
    new_child[leaf_ids, 1] = (slots2d >= 0).sum(axis=1)

    s = len(slot_tri)
    s_pad = max(-(-s // 128) * 128, 128)
    mt = np.asarray(scene["mt_pack"])  # [4, T, 16]
    mt_sorted = np.zeros((4, s_pad, 16), np.float32)
    valid = slot_tri >= 0
    src = np.where(valid, slot_tri, 0)
    mt_sorted[:, :s][:, valid] = mt[:, src][:, valid]
    attr_sorted = None
    if include_attrs:
        attr = np.asarray(scene["attr_pack"])  # [32, T]
        attr_sorted = np.zeros((32, s_pad), np.float32)
        attr_sorted[:, :s][:, valid] = attr[:, src][:, valid]
    # Kernel layout [S, 128]: slot-major rows with the 64 coefficients
    # (4 groups x 16) on lanes (padded to 128). A leaf's [K, 128] DMA slice
    # is sublane-aligned (K and slot starts are multiples of 8) and the
    # kernel reads coefficient columns at static lane indices.
    # Lanes 64..73 carry the per-slot hit attributes (n0/n1/n2 vertex
    # normals + material id = attr_pack rows 0..9) so the fused traversal
    # megakernel (ops/fused_traverse_pallas.py) can merge closest-hit
    # attributes per leaf visit without any post-hoc gather.
    mt_rows = np.zeros((s_pad, 128), np.float32)
    mt_rows[:, :64] = np.transpose(mt_sorted, (1, 0, 2)).reshape(s_pad, 64)
    attr_all = np.asarray(scene["attr_pack"])  # [32, T]
    mt_rows[:s, 64:74] = np.where(
        valid[:, None], attr_all[0:10, src].T, 0.0
    )
    # Textured scenes: lanes 74..79 carry the corner UVs (uv0/uv1/uv2 x
    # (u,v)) so the fused traversal megakernel's TEX-deferred mode can
    # interpolate hit UVs in-kernel (ops/fused_traverse_pallas.py).
    attr_lanes = 1
    if "uv0" in scene:
        uvs = np.concatenate(
            [np.asarray(scene[k], np.float32) for k in ("uv0", "uv1", "uv2")],
            axis=1,
        )  # [T, 6]
        mt_rows[:s, 74:80] = np.where(valid[:, None], uvs[src], 0.0)
        attr_lanes = 2

    m_pad = max(-(-m // 128) * 128, 128)
    bvh_nodes = np.zeros((8, m_pad), np.float32)
    bvh_nodes[0:3, :m] = np.asarray(nodes["nodes_lo"], np.float32).T
    bvh_nodes[3:6, :m] = np.asarray(nodes["nodes_hi"], np.float32).T
    bvh_nodes[6, :m] = new_child[:, 0].astype(np.float32)
    bvh_nodes[7, :m] = new_child[:, 1].astype(np.float32)

    slot_tri_pad = np.full((s_pad,), -1, np.int32)
    slot_tri_pad[:s] = slot_tri.astype(np.int32)

    bvhf = fat_nodes(
        np.asarray(nodes["nodes_lo"], np.float32),
        np.asarray(nodes["nodes_hi"], np.float32),
        new_child,
    )

    # 8-wide collapse of the same tree (same regularized leaf ranges):
    # kernel layout [W*8, 8] — per wide node an [8 children, 8 fields] tile
    # (lo3, hi3, child, count) loaded with one 8-aligned sublane slice.
    from ..accel.bvh import collapse_wide

    wide = collapse_wide(
        np.asarray(nodes["nodes_lo"], np.float32),
        np.asarray(nodes["nodes_hi"], np.float32),
        new_child.astype(np.int64),
        width=8,
    )
    w = wide["w_lo"].shape[0]
    bvh8 = np.zeros((w * 8, 8), np.float32)
    bvh8[:, 0:3] = wide["w_lo"].reshape(w * 8, 3)
    bvh8[:, 3:6] = wide["w_hi"].reshape(w * 8, 3)
    bvh8[:, 6] = wide["w_child"].reshape(w * 8)
    bvh8[:, 7] = wide["w_count"].reshape(w * 8)

    out = {
        "bvh_nodes": jnp.asarray(bvh_nodes),
        "bvhf_nodes": jnp.asarray(bvhf),
        "bvh8_nodes": jnp.asarray(bvh8),
        "mt_rows": jnp.asarray(mt_rows),
        "slot_tri": jnp.asarray(slot_tri_pad),
        # version marker: mt_rows lanes 64..73 carry per-slot attributes
        # (consumed by ops/fused_traverse_pallas; absent in pre-round-3
        # cached scene packs, which the supports gate rejects); 2 = the
        # corner-UV lanes 74..79 are also present (textured scenes)
        "mt_attr_lanes": jnp.asarray(attr_lanes, jnp.int32),
        "leaf_size": leaf_size,
    }
    if attr_sorted is not None:
        out["attr_sorted"] = jnp.asarray(attr_sorted)
    return out


def fat_nodes(nodes_lo, nodes_hi, child) -> "np.ndarray":
    """Collapse a regularized binary node array (leaf child[:,0] =
    -(slot_start+1), child[:,1] = count) into FAT nodes: each row stores its
    two children's AABBs, so a visit tests both subtrees and can descend
    near-child-first (front-to-back with best-t pruning — the ordered
    traversal the reference's Fallback Layer does per GPU thread, expressed
    packet-wide).

    Layout [16, F_pad] f32 per fat node (internal nodes only, remapped ids):
      rows 0-5  c0 lo/hi      rows 6-11 c1 lo/hi
      row 12/14 c0/c1 ptr: leaf -> slot_start, internal -> fat node id
      row 13/15 c0/c1 meta: leaf -> count (>0), internal -> -1, empty -> 0
    Empty children get a point box at +BIG (genuinely misses; see the refit
    note in accel/tlas.py on why inverted boxes pass slab tests).
    """
    child = np.asarray(child, np.int64)
    m = len(child)
    is_leaf = child[:, 0] < 0
    internal = np.nonzero(~is_leaf)[0]
    f = len(internal)
    f_used = max(f, 1)
    f_pad = max(-(-f_used // 128) * 128, 128)
    fat = np.zeros((16, f_pad), np.float32)
    fat[0:3] = BIG
    fat[3:6] = BIG
    fat[6:9] = BIG
    fat[9:12] = BIG
    if f == 0:
        # root is a single leaf: one fat node, c0 = that leaf, c1 empty
        fat[0:3, 0] = nodes_lo[0]
        fat[3:6, 0] = nodes_hi[0]
        fat[12, 0] = float(-child[0, 0] - 1)
        fat[13, 0] = float(child[0, 1])
        return fat
    remap = np.zeros((m,), np.int64)
    remap[internal] = np.arange(f)
    for side in range(2):
        ids = child[internal, side]
        side_leaf = is_leaf[ids]
        ptr = np.where(side_leaf, -child[ids, 0] - 1, remap[ids])
        meta = np.where(side_leaf, child[ids, 1], -1)
        meta = np.where(side_leaf & (child[ids, 1] <= 0), 0, meta)
        base = 6 * side
        fat[base : base + 3, :f] = nodes_lo[ids].T
        fat[base + 3 : base + 6, :f] = nodes_hi[ids].T
        fat[12 + 2 * side, :f] = ptr.astype(np.float32)
        fat[13 + 2 * side, :f] = meta.astype(np.float32)
        # empty leaves: point box at +BIG
        empty = meta == 0
        fat[base : base + 6, :f][:, empty] = BIG
    return fat


def _leaf_pair_test(mt_scratch, o, d, m, tmin, tmax, cull: bool, count, K: int):
    """Plücker pair test of a [K, TILE] block from a DMA'd leaf slice.

    mt_scratch: [K, 128] VMEM scratch ref (slot-major rows, coefficient
    c of group g at lane g*16+c); o/d/m: 3 rows each [1, TILE]. Returns
    (valid, ts, det_abs, us, vs) with rows >= count masked off.

    Shape-polymorphic in o: passing rank-0 scalars (a packet-constant
    origin — e.g. primary rays from the pinhole camera) collapses the t
    numerator from a [K, TILE] row to a [K, 1] per-triangle column — o
    only feeds t_d here; the per-lane moments m carry the origin for
    u_d/v_d."""

    def col(g, k):
        return mt_scratch[:, g * 16 + k][:, None]  # [K, 1]

    det = d[0] * col(0, 0) + d[1] * col(0, 1) + d[2] * col(0, 2)
    u_d = (
        d[0] * col(1, 0) + d[1] * col(1, 1) + d[2] * col(1, 2)
        + m[0] * col(1, 3) + m[1] * col(1, 4) + m[2] * col(1, 5)
    )
    v_d = (
        d[0] * col(2, 0) + d[1] * col(2, 1) + d[2] * col(2, 2)
        + m[0] * col(2, 3) + m[1] * col(2, 4) + m[2] * col(2, 5)
    )
    t_d = o[0] * col(3, 6) + o[1] * col(3, 7) + o[2] * col(3, 8) + col(3, 9)

    s = jnp.sign(det)
    det_abs = det * s
    us = u_d * s
    vs = v_d * s
    ts = t_d * s
    eps = jnp.float32(1e-12)
    alive = (det > eps) if cull else (det_abs > eps)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0)
    valid = (
        alive
        & (us >= 0.0)
        & (vs >= 0.0)
        & (us + vs <= det_abs)
        & (ts > tmin[None, :] * det_abs)
        & (ts < tmax[None, :] * det_abs)
        & (row_ids < count)
    )
    return valid, ts, det_abs, us, vs


def _node_fields(nodes_ref, node, rows: int = 8):
    """Extract the node fields at a dynamic index from the [rows, M] VMEM
    array. Mosaic requires lane-aligned vector loads, so load the 128-wide
    block containing the node and reduce out the wanted lane."""
    blk = pl.multiple_of((node // 128) * 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sel = lane == (node - blk)
    block = nodes_ref[:, pl.ds(blk, 128)]  # [rows, 128]
    vals = jnp.sum(jnp.where(sel, block, 0.0), axis=1)  # [rows]
    return [vals[k] for k in range(rows)]


def _make_traverse_kernel(K: int, cull: bool, occlusion: bool):
    def kernel(rays_ref, nodes_ref, mt_hbm, out_ref, stack_ref, pend_ref,
               mt_scratch, sem):
        o = [rays_ref[k, :][None, :] for k in range(3)]
        d = [rays_ref[3 + k, :][None, :] for k in range(3)]
        mom = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
        tmin = rays_ref[6, :]
        tmax = rays_ref[7, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), BIG, jnp.float32)
        stack_ref[0] = 0

        def process_slot(slot):
            """Test the DMA'd leaf in scratch[slot] and merge its best hit.
            Leaf metadata (slot start, count) comes from pend_ref."""
            start = pend_ref[2 * slot]
            count = pend_ref[2 * slot + 1]
            valid, ts, det_abs, us, vs = _leaf_pair_test(
                mt_scratch.at[slot], o, d, mom, tmin, tmax, cull, count, K
            )
            if occlusion:
                occ = jnp.max(valid.astype(jnp.float32), axis=0)
                out_ref[4, :] = jnp.maximum(out_ref[4, :], occ)
            else:
                eps = jnp.float32(1e-12)
                t_pair = jnp.where(valid, ts / jnp.maximum(det_abs, eps), BIG)
                c_t = jnp.min(t_pair, axis=0)
                rows = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 0)
                c_row = jnp.min(
                    jnp.where(t_pair == c_t[None, :], rows, jnp.int32(2**30)),
                    axis=0,
                )
                sel = (rows == c_row[None, :]).astype(jnp.float32)
                inv_det = 1.0 / jnp.maximum(jnp.sum(det_abs * sel, axis=0), 1e-12)
                c_u = jnp.sum(us * sel, axis=0) * inv_det
                c_v = jnp.sum(vs * sel, axis=0) * inv_det
                c_slot = (c_row + start).astype(jnp.float32)
                better = c_t < out_ref[0, :]
                out_ref[0, :] = jnp.where(better, c_t, out_ref[0, :])
                out_ref[1, :] = jnp.where(better, c_slot, out_ref[1, :])
                out_ref[2, :] = jnp.where(better, c_u, out_ref[2, :])
                out_ref[3, :] = jnp.where(better, c_v, out_ref[3, :])

        def cond(carry):
            sp, done, _q = carry
            return (sp > 0) & ~done

        def body(carry):
            sp, _, q = carry
            node = stack_ref[sp - 1]
            fields = _node_fields(nodes_ref, node)
            lo = fields[0:3]
            hi = fields[3:6]
            left = fields[6]
            right = fields[7]

            best_t = out_ref[0, :]
            t0s = [(lo[k] - o[k]) * inv[k] for k in range(3)]
            t1s = [(hi[k] - o[k]) * inv[k] for k in range(3)]
            tn = tmin[None, :]
            tf = jnp.minimum(tmax, best_t)[None, :]
            for k in range(3):
                tn = jnp.maximum(tn, jnp.minimum(t0s[k], t1s[k]))
                tf = jnp.minimum(tf, jnp.maximum(t0s[k], t1s[k]))
            if occlusion:
                # prune rays already occluded (their work is done)
                tf = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf)
            node_hit = jnp.any(tn <= tf)
            is_leaf = left < 0.0

            sp = sp - 1
            new_leaf = node_hit & is_leaf

            # Double-buffered leaf pipeline: start the new leaf's DMA, then
            # (while it flies) test the PREVIOUS leaf from the other slot.
            @pl.when(new_leaf)
            def _enqueue():
                start = (-left - 1.0).astype(jnp.int32)
                count = right.astype(jnp.int32)
                slot = q % 2
                pend_ref[2 * slot] = start
                pend_ref[2 * slot + 1] = count
                row_start = pl.multiple_of(start, 8)
                pltpu.make_async_copy(
                    mt_hbm.at[pl.ds(row_start, K), :],
                    mt_scratch.at[slot],
                    sem.at[slot],
                ).start()

                @pl.when(q >= 1)
                def _process_prev():
                    prev = (q - 1) % 2
                    pltpu.make_async_copy(
                        mt_hbm.at[pl.ds(0, K), :],  # shape-only descriptor
                        mt_scratch.at[prev],
                        sem.at[prev],
                    ).wait()
                    process_slot(prev)

            push = node_hit & ~is_leaf

            @pl.when(push)
            def _push():
                stack_ref[sp] = left.astype(jnp.int32)
                stack_ref[sp + 1] = right.astype(jnp.int32)

            new_sp = sp + jnp.where(push, 2, 0)
            new_q = q + jnp.where(new_leaf, 1, 0)
            if occlusion:
                # early exit once every real ray is occluded (padding rays
                # are marked occluded up-front so they don't block this);
                # the pending leaf may still flip lanes, so only exit when
                # nothing is pending.
                done = (jnp.min(out_ref[4, :]) > 0.5) & (new_q == q)
            else:
                done = jnp.bool_(False)
            return new_sp, done, new_q

        if occlusion:
            # pre-mark padded dead rays (d == 0) as occluded for early exit
            dead = (
                (jnp.abs(rays_ref[3, :]) + jnp.abs(rays_ref[4, :]) + jnp.abs(rays_ref[5, :]))
                < 1e-30
            )
            out_ref[4, :] = jnp.where(dead, 2.0, out_ref[4, :])

        _, _, q_final = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
        )

        # Drain the last pending leaf.
        @pl.when(q_final >= 1)
        def _drain():
            prev = (q_final - 1) % 2
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(0, K), :],
                mt_scratch.at[prev],
                sem.at[prev],
            ).wait()
            process_slot(prev)

        if occlusion:
            # strip the padding marker
            out_ref[4, :] = jnp.where(out_ref[4, :] > 1.5, 0.0, out_ref[4, :])

        # finalize hit flag for closest mode
        if not occlusion:
            t = out_ref[0, :]
            hit = t < BIG
            out_ref[0, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :] = hit.astype(jnp.float32)

    return kernel


def _make_traverse_fat_kernel(K: int, cull: bool, occlusion: bool,
                              leaf_bestt: bool = False, half_gate: int = 0,
                              common_origin: bool = False):
    """Fat-node packet traversal: each visit tests BOTH children's AABBs
    (their boxes live in the parent row, see fat_nodes), enqueues leaf
    children into the double-buffered DMA pipeline, and pushes internal
    children far-first so the NEAR child pops first. With the best-t clamp
    in the slab test, near-first descent turns the clamp into real pruning:
    once close hits land, far subtrees fail `tn <= tf` wholesale. Halves
    scalar while-loop trips vs the binary kernel (one visit per pair) on
    top of the ordering win.

    leaf_bestt (closest only): clamp each leaf pair test's t window by the
    RUNNING best t and gate the whole winner-selection epilogue (divide +
    row-select, ~1/3 of per-pair ops) behind `any(valid)` — with
    front-to-back descent most later leaves improve nothing, so the
    epilogue amortizes away. Bit-identical results (strict '<' everywhere).

    half_gate (0/2/4): re-test the leaf's AABB per lane at PROCESS time
    (box stashed in SMEM at enqueue) and skip each TILE/half_gate lane
    sub-block whose lanes all miss the leaf (or are already resolved) —
    packet-union waste recovered at sub-tile granularity. For occlusion the
    live test also drops lanes already occluded.

    common_origin: all rays in the batch share one origin (primary pinhole
    rays) — the origin rides SMEM as 3 scalars, the leaf t numerator
    collapses to a per-triangle [K, 1] column (see _leaf_pair_test) and
    node slab tests lose their per-lane origin subtraction."""

    def kernel(rays_ref, orig_ref, nodes_ref, mt_hbm, out_ref, stack_ref,
               pend_ref, box_ref, mt_scratch, sem):
        if common_origin:
            o = [orig_ref[0, k] for k in range(3)]
        else:
            o = [rays_ref[k, :][None, :] for k in range(3)]
        d = [rays_ref[3 + k, :][None, :] for k in range(3)]
        mom = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
        tmin = rays_ref[6, :]
        tmax = rays_ref[7, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), BIG, jnp.float32)
        stack_ref[0] = 0

        def run_lanes(slot, start, count, sub):
            """Pair-test + merge for one static lane slice of the tile."""
            osub = o if common_origin else [x[:, sub] for x in o]
            dsub = [x[:, sub] for x in d]
            msub = [x[:, sub] for x in mom]
            if occlusion:
                valid, _, _, _, _ = _leaf_pair_test(
                    mt_scratch.at[slot], osub, dsub, msub,
                    tmin[sub], tmax[sub], cull, count, K
                )
                occ = jnp.max(valid.astype(jnp.float32), axis=0)
                out_ref[4, sub] = jnp.maximum(out_ref[4, sub], occ)
                return
            best = out_ref[0, sub]
            tx = jnp.minimum(tmax[sub], best) if leaf_bestt else tmax[sub]
            valid, ts, det_abs, us, vs = _leaf_pair_test(
                mt_scratch.at[slot], osub, dsub, msub,
                tmin[sub], tx, cull, count, K
            )

            def merge():
                eps = jnp.float32(1e-12)
                t_pair = jnp.where(valid, ts / jnp.maximum(det_abs, eps), BIG)
                c_t = jnp.min(t_pair, axis=0)
                rows = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 0)
                c_row = jnp.min(
                    jnp.where(t_pair == c_t[None, :], rows, jnp.int32(2**30)),
                    axis=0,
                )
                sel = (rows == c_row[None, :]).astype(jnp.float32)
                inv_det = 1.0 / jnp.maximum(jnp.sum(det_abs * sel, axis=0), 1e-12)
                c_u = jnp.sum(us * sel, axis=0) * inv_det
                c_v = jnp.sum(vs * sel, axis=0) * inv_det
                c_slot = (c_row + start).astype(jnp.float32)
                better = c_t < out_ref[0, sub]
                out_ref[0, sub] = jnp.where(better, c_t, out_ref[0, sub])
                out_ref[1, sub] = jnp.where(better, c_slot, out_ref[1, sub])
                out_ref[2, sub] = jnp.where(better, c_u, out_ref[2, sub])
                out_ref[3, sub] = jnp.where(better, c_v, out_ref[3, sub])

            if leaf_bestt:
                @pl.when(jnp.any(valid))
                def _merge():
                    merge()
            else:
                merge()

        def process_slot(slot):
            start = pend_ref[2 * slot]
            count = pend_ref[2 * slot + 1]
            if half_gate <= 1:
                run_lanes(slot, start, count, slice(None))
                return
            # leaf slab re-test at process time: lanes that miss the box
            # (or whose best t / occlusion state already resolves them)
            # are dead for this leaf; skip whole lane sub-blocks of dead.
            tn = tmin[None, :]
            if occlusion:
                tf = jnp.where(out_ref[4, :] > 0.5, -BIG, tmax)[None, :]
            else:
                tf = jnp.minimum(tmax, out_ref[0, :])[None, :]
            for k in range(3):
                t0 = (box_ref[slot, k] - o[k]) * inv[k]
                t1 = (box_ref[slot, 3 + k] - o[k]) * inv[k]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            live = (tn <= tf)[0]
            w = live.shape[0] // half_gate
            for h in range(half_gate):
                sub = slice(h * w, (h + 1) * w)

                @pl.when(jnp.any(live[sub]))
                def _run(sub=sub):
                    run_lanes(slot, start, count, sub)

        def enqueue(ptr, meta, q, box):
            start = ptr.astype(jnp.int32)
            count = meta.astype(jnp.int32)
            slot = q % 2
            pend_ref[2 * slot] = start
            pend_ref[2 * slot + 1] = count
            if half_gate > 1:
                for k in range(6):
                    box_ref[slot, k] = box[k]
            row_start = pl.multiple_of(start, 8)
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(row_start, K), :],
                mt_scratch.at[slot],
                sem.at[slot],
            ).start()

            @pl.when(q >= 1)
            def _process_prev():
                prev = (q - 1) % 2
                pltpu.make_async_copy(
                    mt_hbm.at[pl.ds(0, K), :],  # shape-only descriptor
                    mt_scratch.at[prev],
                    sem.at[prev],
                ).wait()
                process_slot(prev)

        def cond(carry):
            sp, done, _q = carry
            return (sp > 0) & ~done

        def body(carry):
            sp, _, q0 = carry
            node = stack_ref[sp - 1]
            sp = sp - 1
            f = _node_fields(nodes_ref, node, rows=16)

            best_t = out_ref[0, :]
            tf_base = jnp.minimum(tmax, best_t)[None, :]
            if occlusion:
                tf_base = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf_base)

            hits = []
            enters = []
            for s in range(2):
                lo = f[6 * s : 6 * s + 3]
                hi = f[6 * s + 3 : 6 * s + 6]
                t0s = [(lo[k] - o[k]) * inv[k] for k in range(3)]
                t1s = [(hi[k] - o[k]) * inv[k] for k in range(3)]
                tn = tmin[None, :]
                tf = tf_base
                for k in range(3):
                    tn = jnp.maximum(tn, jnp.minimum(t0s[k], t1s[k]))
                    tf = jnp.minimum(tf, jnp.maximum(t0s[k], t1s[k]))
                lane_hit = tn <= tf
                hits.append(jnp.any(lane_hit))
                enters.append(jnp.min(jnp.where(lane_hit, tn, BIG)))

            ptr0, m0, ptr1, m1 = f[12], f[13], f[14], f[15]
            leaf0 = hits[0] & (m0 > 0.5)
            int0 = hits[0] & (m0 < -0.5)
            leaf1 = hits[1] & (m1 > 0.5)
            int1 = hits[1] & (m1 < -0.5)

            q = q0

            @pl.when(leaf0)
            def _leaf0():
                enqueue(ptr0, m0, q, [f[k] for k in range(6)])

            q = q + jnp.where(leaf0, 1, 0)

            @pl.when(leaf1)
            def _leaf1():
                enqueue(ptr1, m1, q, [f[6 + k] for k in range(6)])

            q = q + jnp.where(leaf1, 1, 0)

            both = int0 & int1
            c0_near = enters[0] <= enters[1]
            first = jnp.where(c0_near, ptr1, ptr0)  # far pushed first
            second = jnp.where(c0_near, ptr0, ptr1)  # near pops first

            @pl.when(both)
            def _push_both():
                stack_ref[sp] = first.astype(jnp.int32)
                stack_ref[sp + 1] = second.astype(jnp.int32)

            only0 = int0 & ~int1
            only1 = int1 & ~int0

            @pl.when(only0)
            def _push0():
                stack_ref[sp] = ptr0.astype(jnp.int32)

            @pl.when(only1)
            def _push1():
                stack_ref[sp] = ptr1.astype(jnp.int32)

            new_sp = sp + jnp.where(both, 2, jnp.where(only0 | only1, 1, 0))
            if occlusion:
                done = (jnp.min(out_ref[4, :]) > 0.5) & (q == q0)
            else:
                done = jnp.bool_(False)
            return new_sp, done, q

        if occlusion:
            dead = (
                (jnp.abs(rays_ref[3, :]) + jnp.abs(rays_ref[4, :]) + jnp.abs(rays_ref[5, :]))
                < 1e-30
            )
            out_ref[4, :] = jnp.where(dead, 2.0, out_ref[4, :])

        _, _, q_final = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
        )

        @pl.when(q_final >= 1)
        def _drain():
            prev = (q_final - 1) % 2
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(0, K), :],
                mt_scratch.at[prev],
                sem.at[prev],
            ).wait()
            process_slot(prev)

        if occlusion:
            out_ref[4, :] = jnp.where(out_ref[4, :] > 1.5, 0.0, out_ref[4, :])

        if not occlusion:
            t = out_ref[0, :]
            hit = t < BIG
            out_ref[0, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :] = hit.astype(jnp.float32)

    return kernel


def _make_traverse8_kernel(K: int, cull: bool, occlusion: bool):
    """8-wide packet traversal: child AABBs ride SUBLANES, so one [8, TILE]
    slab test covers 8 subtrees in the same VPU cycles the binary kernel
    spends on one — cutting scalar while-loop trips by the collapse factor
    (SURVEY §7 hard part 1; ROADMAP perf lever 1)."""

    def kernel(rays_ref, nodes_ref, mt_hbm, out_ref, stack_ref, pend_ref,
               mt_scratch, sem):
        o = [rays_ref[k, :][None, :] for k in range(3)]
        d = [rays_ref[3 + k, :][None, :] for k in range(3)]
        mom = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
        tmin = rays_ref[6, :]
        tmax = rays_ref[7, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), BIG, jnp.float32)
        stack_ref[0] = 0

        def process_slot(slot):
            start = pend_ref[2 * slot]
            count = pend_ref[2 * slot + 1]
            valid, ts, det_abs, us, vs = _leaf_pair_test(
                mt_scratch.at[slot], o, d, mom, tmin, tmax, cull, count, K
            )
            if occlusion:
                occ = jnp.max(valid.astype(jnp.float32), axis=0)
                out_ref[4, :] = jnp.maximum(out_ref[4, :], occ)
            else:
                eps = jnp.float32(1e-12)
                t_pair = jnp.where(valid, ts / jnp.maximum(det_abs, eps), BIG)
                c_t = jnp.min(t_pair, axis=0)
                rows = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 0)
                c_row = jnp.min(
                    jnp.where(t_pair == c_t[None, :], rows, jnp.int32(2**30)),
                    axis=0,
                )
                sel = (rows == c_row[None, :]).astype(jnp.float32)
                inv_det = 1.0 / jnp.maximum(jnp.sum(det_abs * sel, axis=0), 1e-12)
                c_u = jnp.sum(us * sel, axis=0) * inv_det
                c_v = jnp.sum(vs * sel, axis=0) * inv_det
                c_slot = (c_row + start).astype(jnp.float32)
                better = c_t < out_ref[0, :]
                out_ref[0, :] = jnp.where(better, c_t, out_ref[0, :])
                out_ref[1, :] = jnp.where(better, c_slot, out_ref[1, :])
                out_ref[2, :] = jnp.where(better, c_u, out_ref[2, :])
                out_ref[3, :] = jnp.where(better, c_v, out_ref[3, :])

        def cond(carry):
            sp, done, _q = carry
            return (sp > 0) & ~done

        def body(carry):
            sp, _, q0 = carry
            node = stack_ref[sp - 1]
            sp = sp - 1
            base = pl.multiple_of(node * 8, 8)
            blk = nodes_ref[pl.ds(base, 8), :]  # [8 children, 8 fields]

            t0s = [(blk[:, k : k + 1] - o[k]) * inv[k] for k in range(3)]
            t1s = [(blk[:, 3 + k : 4 + k] - o[k]) * inv[k] for k in range(3)]
            tn = jnp.broadcast_to(tmin[None, :], t0s[0].shape)
            if occlusion:
                tf = jnp.broadcast_to(tmax[None, :], t0s[0].shape)
                tf = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf)
            else:
                tf = jnp.broadcast_to(
                    jnp.minimum(tmax, out_ref[0, :])[None, :], t0s[0].shape
                )
            for k in range(3):
                tn = jnp.maximum(tn, jnp.minimum(t0s[k], t1s[k]))
                tf = jnp.minimum(tf, jnp.maximum(t0s[k], t1s[k]))
            hits = jnp.max((tn <= tf).astype(jnp.float32), axis=1)  # [8]

            def do_child(c, sp_in, q_in):
                cv = blk[c, 6]
                cn = blk[c, 7]
                h = hits[c] > 0.5
                push = h & (cn < -0.5)

                @pl.when(push)
                def _push():
                    stack_ref[sp_in] = cv.astype(jnp.int32)

                do_leaf = h & (cn > 0.5)

                @pl.when(do_leaf)
                def _enqueue():
                    start = (-cv - 1.0).astype(jnp.int32)
                    count = cn.astype(jnp.int32)
                    slot = q_in % 2
                    pend_ref[2 * slot] = start
                    pend_ref[2 * slot + 1] = count
                    row_start = pl.multiple_of(start, 8)
                    pltpu.make_async_copy(
                        mt_hbm.at[pl.ds(row_start, K), :],
                        mt_scratch.at[slot],
                        sem.at[slot],
                    ).start()

                    @pl.when(q_in >= 1)
                    def _process_prev():
                        prev = (q_in - 1) % 2
                        pltpu.make_async_copy(
                            mt_hbm.at[pl.ds(0, K), :],
                            mt_scratch.at[prev],
                            sem.at[prev],
                        ).wait()
                        process_slot(prev)

                return (
                    sp_in + jnp.where(push, 1, 0),
                    q_in + jnp.where(do_leaf, 1, 0),
                )

            q = q0
            for c in range(8):
                sp, q = do_child(c, sp, q)

            if occlusion:
                done = (jnp.min(out_ref[4, :]) > 0.5) & (q == q0)
            else:
                done = jnp.bool_(False)
            return sp, done, q

        if occlusion:
            dead = (
                (jnp.abs(rays_ref[3, :]) + jnp.abs(rays_ref[4, :]) + jnp.abs(rays_ref[5, :]))
                < 1e-30
            )
            out_ref[4, :] = jnp.where(dead, 2.0, out_ref[4, :])

        _, _, q_final = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
        )

        @pl.when(q_final >= 1)
        def _drain():
            prev = (q_final - 1) % 2
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(0, K), :],
                mt_scratch.at[prev],
                sem.at[prev],
            ).wait()
            process_slot(prev)

        if occlusion:
            out_ref[4, :] = jnp.where(out_ref[4, :] > 1.5, 0.0, out_ref[4, :])

        if not occlusion:
            t = out_ref[0, :]
            hit = t < BIG
            out_ref[0, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :] = hit.astype(jnp.float32)

    return kernel


def _make_traverse_fat_grouped_kernel(K: int, cull: bool, occlusion: bool,
                                      G: int, common_origin: bool = False):
    """Fat-node packet traversal with the SUB-PACKET ray layout
    [8, G, R] (component c of sub-packet g at rays_ref[c, g, :], tile =
    G*R rays): full-tile math (node slab tests, leaf-box liveness) runs on
    [G, R] blocks — the same vreg area as the flat [1, tile] layout — while
    each leaf's pair test runs PER SUB-PACKET behind `any(live[g])`, so the
    gating granularity is R lanes instead of the 1024-lane Mosaic
    broadcast floor that caps half_gate in _make_traverse_fat_kernel
    (sub-packet rows sit at offset-0 lane slices, no sub-tile broadcast
    needed). Recovers packet-union waste at ~12-15% per-leaf lane
    utilization (the 200k-soup regime) IF the [K, R] pl.when bodies stay
    above the profitable branch size — measured per G on hardware."""

    def kernel(rays_ref, orig_ref, nodes_ref, mt_hbm, out_ref, stack_ref,
               pend_ref, box_ref, mt_scratch, sem):
        # Blocks arrive as [1, 8, G, R] (tile on a leading axis so the last
        # two block dims are full-size — Mosaic requires second-minor
        # divisible by 8 or full; G=2/4 isn't). View off the unit axis.
        rays_ref = rays_ref.at[0]
        out_ref = out_ref.at[0]
        R = rays_ref.shape[2]
        if common_origin:
            o = [orig_ref[0, k] for k in range(3)]
        else:
            o = [rays_ref[k, :, :] for k in range(3)]  # [G, R]
        d = [rays_ref[3 + k, :, :] for k in range(3)]
        mom = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
        tmin = rays_ref[6, :, :]
        tmax = rays_ref[7, :, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :, :] = jnp.zeros_like(out_ref)
        out_ref[0, :, :] = jnp.full((G, R), BIG, jnp.float32)
        stack_ref[0] = 0

        def run_lanes(slot, start, count, g):
            """Pair-test + merge for sub-packet g ([1, R] ray rows)."""
            og = o if common_origin else [rays_ref[k, g, :][None, :]
                                          for k in range(3)]
            dg = [rays_ref[3 + k, g, :][None, :] for k in range(3)]
            mg = [x[g, :][None, :] for x in mom]
            tn_g = rays_ref[6, g, :]
            if occlusion:
                valid, _, _, _, _ = _leaf_pair_test(
                    mt_scratch.at[slot], og, dg, mg,
                    tn_g, rays_ref[7, g, :], cull, count, K
                )
                occ = jnp.max(valid.astype(jnp.float32), axis=0)
                out_ref[4, g, :] = jnp.maximum(out_ref[4, g, :], occ)
                return
            best = out_ref[0, g, :]
            tx = jnp.minimum(rays_ref[7, g, :], best)
            valid, ts, det_abs, us, vs = _leaf_pair_test(
                mt_scratch.at[slot], og, dg, mg, tn_g, tx, cull, count, K
            )
            eps = jnp.float32(1e-12)
            t_pair = jnp.where(valid, ts / jnp.maximum(det_abs, eps), BIG)
            c_t = jnp.min(t_pair, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, t_pair.shape, 0)
            c_row = jnp.min(
                jnp.where(t_pair == c_t[None, :], rows, jnp.int32(2**30)),
                axis=0,
            )
            sel = (rows == c_row[None, :]).astype(jnp.float32)
            inv_det = 1.0 / jnp.maximum(jnp.sum(det_abs * sel, axis=0), 1e-12)
            c_u = jnp.sum(us * sel, axis=0) * inv_det
            c_v = jnp.sum(vs * sel, axis=0) * inv_det
            c_slot = (c_row + start).astype(jnp.float32)
            better = c_t < best
            out_ref[0, g, :] = jnp.where(better, c_t, best)
            out_ref[1, g, :] = jnp.where(better, c_slot, out_ref[1, g, :])
            out_ref[2, g, :] = jnp.where(better, c_u, out_ref[2, g, :])
            out_ref[3, g, :] = jnp.where(better, c_v, out_ref[3, g, :])

        def process_slot(slot):
            start = pend_ref[2 * slot]
            count = pend_ref[2 * slot + 1]
            # leaf slab re-test at process time ([G, R] math, amortized
            # across sub-packets); each sub-packet runs only if any lane
            # is live for THIS leaf
            tn = tmin
            if occlusion:
                tf = jnp.where(out_ref[4, :, :] > 0.5, -BIG, tmax)
            else:
                tf = jnp.minimum(tmax, out_ref[0, :, :])
            for k in range(3):
                t0 = (box_ref[slot, k] - o[k]) * inv[k]
                t1 = (box_ref[slot, 3 + k] - o[k]) * inv[k]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            live = tn <= tf  # [G, R]
            for g in range(G):
                @pl.when(jnp.any(live[g, :]))
                def _run(g=g):
                    run_lanes(slot, start, count, g)

        def enqueue(ptr, meta, q, box):
            start = ptr.astype(jnp.int32)
            count = meta.astype(jnp.int32)
            slot = q % 2
            pend_ref[2 * slot] = start
            pend_ref[2 * slot + 1] = count
            for k in range(6):
                box_ref[slot, k] = box[k]
            row_start = pl.multiple_of(start, 8)
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(row_start, K), :],
                mt_scratch.at[slot],
                sem.at[slot],
            ).start()

            @pl.when(q >= 1)
            def _process_prev():
                prev = (q - 1) % 2
                pltpu.make_async_copy(
                    mt_hbm.at[pl.ds(0, K), :],
                    mt_scratch.at[prev],
                    sem.at[prev],
                ).wait()
                process_slot(prev)

        def cond(carry):
            sp, done, _q = carry
            return (sp > 0) & ~done

        def body(carry):
            sp, _, q0 = carry
            node = stack_ref[sp - 1]
            sp = sp - 1
            f = _node_fields(nodes_ref, node, rows=16)

            best_t = out_ref[0, :, :]
            tf_base = jnp.minimum(tmax, best_t)
            if occlusion:
                tf_base = jnp.where(out_ref[4, :, :] > 0.5, -BIG, tf_base)

            hits = []
            enters = []
            for s in range(2):
                lo = f[6 * s : 6 * s + 3]
                hi = f[6 * s + 3 : 6 * s + 6]
                tn = tmin
                tf = tf_base
                for k in range(3):
                    t0 = (lo[k] - o[k]) * inv[k]
                    t1 = (hi[k] - o[k]) * inv[k]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                lane_hit = tn <= tf
                hits.append(jnp.any(lane_hit))
                enters.append(jnp.min(jnp.where(lane_hit, tn, BIG)))

            ptr0, m0, ptr1, m1 = f[12], f[13], f[14], f[15]
            leaf0 = hits[0] & (m0 > 0.5)
            int0 = hits[0] & (m0 < -0.5)
            leaf1 = hits[1] & (m1 > 0.5)
            int1 = hits[1] & (m1 < -0.5)

            q = q0

            @pl.when(leaf0)
            def _leaf0():
                enqueue(ptr0, m0, q, [f[k] for k in range(6)])

            q = q + jnp.where(leaf0, 1, 0)

            @pl.when(leaf1)
            def _leaf1():
                enqueue(ptr1, m1, q, [f[6 + k] for k in range(6)])

            q = q + jnp.where(leaf1, 1, 0)

            both = int0 & int1
            c0_near = enters[0] <= enters[1]
            first = jnp.where(c0_near, ptr1, ptr0)
            second = jnp.where(c0_near, ptr0, ptr1)

            @pl.when(both)
            def _push_both():
                stack_ref[sp] = first.astype(jnp.int32)
                stack_ref[sp + 1] = second.astype(jnp.int32)

            only0 = int0 & ~int1
            only1 = int1 & ~int0

            @pl.when(only0)
            def _push0():
                stack_ref[sp] = ptr0.astype(jnp.int32)

            @pl.when(only1)
            def _push1():
                stack_ref[sp] = ptr1.astype(jnp.int32)

            new_sp = sp + jnp.where(both, 2, jnp.where(only0 | only1, 1, 0))
            if occlusion:
                done = (jnp.min(out_ref[4, :, :]) > 0.5) & (q == q0)
            else:
                done = jnp.bool_(False)
            return new_sp, done, q

        if occlusion:
            dead = (
                jnp.abs(rays_ref[3, :, :]) + jnp.abs(rays_ref[4, :, :])
                + jnp.abs(rays_ref[5, :, :])
            ) < 1e-30
            out_ref[4, :, :] = jnp.where(dead, 2.0, out_ref[4, :, :])

        _, _, q_final = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
        )

        @pl.when(q_final >= 1)
        def _drain():
            prev = (q_final - 1) % 2
            pltpu.make_async_copy(
                mt_hbm.at[pl.ds(0, K), :],
                mt_scratch.at[prev],
                sem.at[prev],
            ).wait()
            process_slot(prev)

        if occlusion:
            out_ref[4, :, :] = jnp.where(
                out_ref[4, :, :] > 1.5, 0.0, out_ref[4, :, :]
            )
        else:
            t = out_ref[0, :, :]
            hit = t < BIG
            out_ref[0, :, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :, :] = hit.astype(jnp.float32)

    return kernel


def _call_fat_grouped(bvh, rays, r_pad, leaf_size, cull, occlusion,
                      interpret, tile, group, origin=None):
    """Dispatch the grouped-layout fat kernel: rays [8, r_pad] reshaped to
    [8, r_pad//R, R] (R = tile//group); tile i's sub-packet g covers rays
    [i*tile + g*R, i*tile + (g+1)*R)."""
    R = tile // group
    if origin is None:
        orig = jnp.zeros((1, 8), jnp.float32)
    else:
        orig = jnp.concatenate(
            [jnp.asarray(origin, jnp.float32).reshape(3),
             jnp.zeros((5,), jnp.float32)]
        )[None, :]
    n_tiles = r_pad // tile
    # Tile index on a LEADING axis: last two block dims must be full-size
    # (G, R) for Mosaic (second-minor blocks of 2/4 don't lower).
    rays4 = rays.reshape(8, n_tiles, group, R).swapaxes(0, 1)
    out = pl.pallas_call(
        _make_traverse_fat_grouped_kernel(
            leaf_size, cull, occlusion, group,
            common_origin=origin is not None,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, group, R), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shared origin scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fat nodes, whole array
            pl.BlockSpec(memory_space=pl.ANY),  # mt_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 8, group, R), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, group, R), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((2, 8), jnp.float32),  # pending-leaf AABBs
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays4, orig, bvh["bvhf_nodes"], bvh["mt_rows"])
    return out.swapaxes(0, 1).reshape(8, r_pad)


def _pack_rays(origins, directions, t_min, t_max, tile: int = TILE_R):
    r = origins.shape[0]
    r_pad = -(-r // tile) * tile
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    rays = jnp.concatenate(
        [origins.T, directions.T, t_min[None], t_max[None]], axis=0
    )
    return jnp.pad(rays, ((0, 0), (0, r_pad - r))), r_pad


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "cull_backface", "interpret")
)
def traverse_closest(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    cull_backface: bool = False,
    interpret: bool = False,
) -> dict:
    """Closest hit via packet BVH traversal.

    Returns {"hit" [R], "t" [R], "tri" [R] (original indices), "u", "v"}.
    """
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = pl.pallas_call(
        _make_traverse_kernel(leaf_size, cull_backface, occlusion=False),
        grid=(r_pad // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes, whole array
            pl.BlockSpec(memory_space=pl.ANY),  # mt_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, bvh["bvh_nodes"], bvh["mt_rows"])

    out = out[:, :r]
    hit = out[4] > 0.5
    slot = jnp.clip(out[1].astype(jnp.int32), 0, bvh["slot_tri"].shape[0] - 1)
    tri = jnp.where(hit, bvh["slot_tri"][slot], -1)
    return {
        "hit": hit,
        "t": out[0],
        "tri": tri,
        "slot": jnp.where(hit, slot, -1),
        "u": jnp.where(hit, out[2], 0.0),
        "v": jnp.where(hit, out[3], 0.0),
    }


def _call_fat(bvh, rays, r_pad, leaf_size, cull, occlusion, interpret,
              tile: int = TILE_R, leaf_bestt: bool = False,
              half_gate: int = 0, origin=None):
    if half_gate > 1 and not interpret and (tile // half_gate) % 1024:
        # Mosaic cannot sublane-broadcast [1, W] lane slices whose offset
        # is not a multiple of 1024 ("Invalid input layout" on the
        # vector.broadcast) — sub-blocks must be 1024-lane aligned, so
        # gating only engages when tile/half_gate is a multiple of 1024.
        half_gate = 0
    if origin is None:
        orig = jnp.zeros((1, 8), jnp.float32)
    else:
        orig = jnp.concatenate(
            [jnp.asarray(origin, jnp.float32).reshape(3),
             jnp.zeros((5,), jnp.float32)]
        )[None, :]
    return pl.pallas_call(
        _make_traverse_fat_kernel(leaf_size, cull, occlusion,
                                  leaf_bestt=leaf_bestt, half_gate=half_gate,
                                  common_origin=origin is not None),
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shared origin scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fat nodes, whole array
            pl.BlockSpec(memory_space=pl.ANY),  # mt_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((2, 8), jnp.float32),  # pending-leaf AABBs (half_gate)
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, orig, bvh["bvhf_nodes"], bvh["mt_rows"])


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "cull_backface", "interpret", "tile",
                     "leaf_bestt", "half_gate", "common_origin", "group"),
)
def traverse_fat_closest(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    cull_backface: bool = False,
    interpret: bool = False,
    tile: int = TILE_R,
    leaf_bestt: bool = False,
    half_gate: int = 2,
    common_origin: bool = False,
    group: int = 0,
) -> dict:
    """Closest hit via fat-node front-to-back packet traversal.

    Same contract as traverse_closest. common_origin: caller asserts ALL
    origins are identical (primary pinhole rays) — the shared origin rides
    SMEM and per-pair/per-node origin work collapses to per-triangle
    columns. group > 1 selects the SUB-PACKET layout kernel
    (_make_traverse_fat_grouped_kernel): per-leaf liveness gating at
    tile/group lanes instead of half_gate's 1024-lane floor (half_gate /
    leaf_bestt are ignored in that mode)."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max, tile)
    if group > 1:
        out = _call_fat_grouped(
            bvh, rays, r_pad, leaf_size, cull_backface, False, interpret,
            tile, group, origin=origins[0] if common_origin else None,
        )
    else:
        out = _call_fat(bvh, rays, r_pad, leaf_size, cull_backface, False,
                        interpret, tile, leaf_bestt=leaf_bestt,
                        half_gate=half_gate,
                        origin=origins[0] if common_origin else None)
    out = out[:, :r]
    hit = out[4] > 0.5
    slot = jnp.clip(out[1].astype(jnp.int32), 0, bvh["slot_tri"].shape[0] - 1)
    tri = jnp.where(hit, bvh["slot_tri"][slot], -1)
    return {
        "hit": hit,
        "t": out[0],
        "tri": tri,
        "slot": jnp.where(hit, slot, -1),
        "u": jnp.where(hit, out[2], 0.0),
        "v": jnp.where(hit, out[3], 0.0),
    }


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "interpret", "tile", "half_gate", "group"),
)
def traverse_fat_any(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    interpret: bool = False,
    tile: int = TILE_R,
    half_gate: int = 2,
    group: int = 0,
) -> jnp.ndarray:
    """Occlusion via fat-node packet traversal with all-occluded early exit.

    half_gate defaults to 2 (measured: occlusion 28.5 -> 26.4 ms, closest
    37.4 -> 30.7 ms on the 200k micro at the default 2048 tile); it
    auto-disables at tiles whose halves aren't 1024-lane multiples.
    group > 1 selects the sub-packet layout kernel instead (see
    traverse_fat_closest)."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max, tile)
    if group > 1:
        out = _call_fat_grouped(bvh, rays, r_pad, leaf_size, False, True,
                                interpret, tile, group)
    else:
        out = _call_fat(bvh, rays, r_pad, leaf_size, False, True, interpret,
                        tile, half_gate=half_gate)
    return out[4, :r] > 0.5


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "cull_backface", "interpret")
)
def traverse8_closest(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    cull_backface: bool = False,
    interpret: bool = False,
) -> dict:
    """Closest hit via 8-wide packet BVH traversal (see _make_traverse8_kernel).

    Same contract as traverse_closest."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = pl.pallas_call(
        _make_traverse8_kernel(leaf_size, cull_backface, occlusion=False),
        grid=(r_pad // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wide nodes, whole array
            pl.BlockSpec(memory_space=pl.ANY),  # mt_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, bvh["bvh8_nodes"], bvh["mt_rows"])

    out = out[:, :r]
    hit = out[4] > 0.5
    slot = jnp.clip(out[1].astype(jnp.int32), 0, bvh["slot_tri"].shape[0] - 1)
    tri = jnp.where(hit, bvh["slot_tri"][slot], -1)
    return {
        "hit": hit,
        "t": out[0],
        "tri": tri,
        "slot": jnp.where(hit, slot, -1),
        "u": jnp.where(hit, out[2], 0.0),
        "v": jnp.where(hit, out[3], 0.0),
    }


@functools.partial(jax.jit, static_argnames=("leaf_size", "interpret"))
def traverse8_any(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Occlusion via 8-wide packet BVH traversal with all-occluded early exit."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = pl.pallas_call(
        _make_traverse8_kernel(leaf_size, False, occlusion=True),
        grid=(r_pad // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, bvh["bvh8_nodes"], bvh["mt_rows"])
    return out[4, :r] > 0.5


@functools.partial(jax.jit, static_argnames=("leaf_size", "interpret"))
def traverse_any(
    bvh: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Occlusion via packet BVH traversal with all-occluded early exit."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = pl.pallas_call(
        _make_traverse_kernel(leaf_size, False, occlusion=True),
        grid=(r_pad // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, leaf_size, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, bvh["bvh_nodes"], bvh["mt_rows"])
    return out[4, :r] > 0.5
