"""Pallas two-level (TLAS/BLAS) packet traversal.

The TPU re-expression of DXR's two-level acceleration dispatch: the fallback
layer traverses a TLAS whose leaves point at per-mesh BLASes with instance
transforms (/root/reference/Helpers/TopLevelASGenerator.cpp:64-83,
/root/reference/libs/DXRFramework/RtScene.cpp:27-51). Packet shape: one
shared scalar TLAS stack in SMEM; on an instance leaf the WHOLE packet is
transformed into object space (9 FMAs + 3 adds on [1, TILE] rows — the
transform is uniform across the packet, so it vectorizes perfectly) and an
inner BLAS loop runs with a second SMEM stack and the same double-buffered
HBM leaf-DMA pipeline as ops/traverse_pallas. Because instance transforms
are affine, the object-space ray parameter t equals the world-space one, so
best-hit bookkeeping never rescales and TLAS slab tests can clamp by the
global best t directly.

Inputs come from accel/tlas.py (tlas_nodes / inst_rows / blas_nodes /
mt_rows / slot_tri). Caveat (parity with default DXR instance flags): a
negative-determinant (mirroring) instance transform flips triangle winding,
so backface culling culls the opposite side for that instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse_pallas import (
    BIG,
    MAX_STACK,
    TILE_R,
    _leaf_pair_test,
    _node_fields,
    _pack_rays,
)

TLAS_STACK = 64  # 2*levels+2; covers 2^31 instances


def _inst_fields(inst_ref, idx):
    """All 32 per-instance fields at a dynamic column of the [32, Ipad] VMEM
    table (lane-aligned block load + masked reduce; see _node_fields)."""
    blk = pl.multiple_of((idx // 128) * 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sel = lane == (idx - blk)
    block = inst_ref[:, pl.ds(blk, 128)]  # [32, 128]
    return jnp.sum(jnp.where(sel, block, 0.0), axis=1)  # [32]


def _make_traverse2_kernel(K: int, cull: bool, occlusion: bool):
    def kernel(rays_ref, tlas_ref, inst_ref, blas_ref, mt_hbm, out_ref,
               tstack_ref, bstack_ref, pend_ref, mt_scratch, sem):
        o = [rays_ref[k, :][None, :] for k in range(3)]
        d = [rays_ref[3 + k, :][None, :] for k in range(3)]
        tmin = rays_ref[6, :]
        tmax = rays_ref[7, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), BIG, jnp.float32)
        tstack_ref[0] = 0

        if occlusion:
            dead = (
                (jnp.abs(rays_ref[3, :]) + jnp.abs(rays_ref[4, :]) + jnp.abs(rays_ref[5, :]))
                < 1e-30
            )
            out_ref[4, :] = jnp.where(dead, 2.0, out_ref[4, :])

        def blas_traverse(iv, slot_i, live):
            """Inner BLAS loop for one instance (packet pre-transformed).

            live: [1, TILE] per-lane mask — lanes whose slab test hit this
            instance's world AABB in the TLAS walk. Dead lanes get their far
            clamp collapsed to -BIG inside this walk (the dead-lane data
            mask, not pl.when), so they stop feeding the BLAS node-visit
            unions — without it every instance in a packet's TLAS union
            re-enters a full whole-packet BLAS walk."""
            a = [[iv[3 * r + c] for c in range(3)] for r in range(3)]
            b = [iv[9 + k] for k in range(3)]
            o2 = [
                a[k][0] * o[0] + a[k][1] * o[1] + a[k][2] * o[2] + b[k]
                for k in range(3)
            ]
            d2 = [
                a[k][0] * d[0] + a[k][1] * d[1] + a[k][2] * d[2]
                for k in range(3)
            ]
            mom2 = [
                o2[1] * d2[2] - o2[2] * d2[1],
                o2[2] * d2[0] - o2[0] * d2[2],
                o2[0] * d2[1] - o2[1] * d2[0],
            ]
            inv2 = [
                1.0 / jnp.where(jnp.abs(d2[k]) > 1e-12, d2[k], 1e-12)
                for k in range(3)
            ]
            inst_f = slot_i.astype(jnp.float32)
            bstack_ref[0] = iv[12].astype(jnp.int32)

            def process_slot(slot):
                start = pend_ref[2 * slot]
                count = pend_ref[2 * slot + 1]
                valid, ts, det_abs, us, vs = _leaf_pair_test(
                    mt_scratch.at[slot], o2, d2, mom2, tmin, tmax, cull,
                    count, K,
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
                    inv_det = 1.0 / jnp.maximum(
                        jnp.sum(det_abs * sel, axis=0), 1e-12
                    )
                    c_u = jnp.sum(us * sel, axis=0) * inv_det
                    c_v = jnp.sum(vs * sel, axis=0) * inv_det
                    c_slot = (c_row + start).astype(jnp.float32)
                    better = c_t < out_ref[0, :]
                    out_ref[0, :] = jnp.where(better, c_t, out_ref[0, :])
                    out_ref[1, :] = jnp.where(better, c_slot, out_ref[1, :])
                    out_ref[2, :] = jnp.where(better, c_u, out_ref[2, :])
                    out_ref[3, :] = jnp.where(better, c_v, out_ref[3, :])
                    out_ref[5, :] = jnp.where(better, inst_f, out_ref[5, :])

            def bcond(carry):
                sp, done, _q = carry
                return (sp > 0) & ~done

            def bbody(carry):
                sp, _, q = carry
                node = bstack_ref[sp - 1]
                fields = _node_fields(blas_ref, node)
                lo = fields[0:3]
                hi = fields[3:6]
                left = fields[6]
                right = fields[7]

                best_t = out_ref[0, :]
                t0s = [(lo[k] - o2[k]) * inv2[k] for k in range(3)]
                t1s = [(hi[k] - o2[k]) * inv2[k] for k in range(3)]
                tn = tmin[None, :]
                tf = jnp.where(live, jnp.minimum(tmax, best_t)[None, :], -BIG)
                for k in range(3):
                    tn = jnp.maximum(tn, jnp.minimum(t0s[k], t1s[k]))
                    tf = jnp.minimum(tf, jnp.maximum(t0s[k], t1s[k]))
                if occlusion:
                    tf = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf)
                node_hit = jnp.any(tn <= tf)
                is_leaf = left < 0.0

                sp = sp - 1
                new_leaf = node_hit & is_leaf

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
                            mt_hbm.at[pl.ds(0, K), :],
                            mt_scratch.at[prev],
                            sem.at[prev],
                        ).wait()
                        process_slot(prev)

                push = node_hit & ~is_leaf

                @pl.when(push)
                def _push():
                    bstack_ref[sp] = left.astype(jnp.int32)
                    bstack_ref[sp + 1] = right.astype(jnp.int32)

                new_sp = sp + jnp.where(push, 2, 0)
                new_q = q + jnp.where(new_leaf, 1, 0)
                if occlusion:
                    done = (jnp.min(out_ref[4, :]) > 0.5) & (new_q == q)
                else:
                    done = jnp.bool_(False)
                return new_sp, done, new_q

            _, _, q_final = jax.lax.while_loop(
                bcond, bbody, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
            )

            # Drain the last pending leaf BEFORE leaving the instance (its
            # pair test needs this instance's transformed rays).
            @pl.when(q_final >= 1)
            def _drain():
                prev = (q_final - 1) % 2
                pltpu.make_async_copy(
                    mt_hbm.at[pl.ds(0, K), :],
                    mt_scratch.at[prev],
                    sem.at[prev],
                ).wait()
                process_slot(prev)

        def tcond(carry):
            sp, done = carry
            return (sp > 0) & ~done

        def tbody(carry):
            sp, _ = carry
            node = tstack_ref[sp - 1]
            fields = _node_fields(tlas_ref, node)
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
                tf = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf)
            lane_hit = tn <= tf
            node_hit = jnp.any(lane_hit)
            is_leaf = left < 0.0

            sp = sp - 1

            @pl.when(node_hit & is_leaf)
            def _instance():
                slot_i = (-left - 1.0).astype(jnp.int32)
                iv = _inst_fields(inst_ref, slot_i)
                blas_traverse(iv, slot_i, lane_hit)

            push = node_hit & ~is_leaf

            @pl.when(push)
            def _push():
                tstack_ref[sp] = left.astype(jnp.int32)
                tstack_ref[sp + 1] = right.astype(jnp.int32)

            new_sp = sp + jnp.where(push, 2, 0)
            if occlusion:
                done = jnp.min(out_ref[4, :]) > 0.5
            else:
                done = jnp.bool_(False)
            return new_sp, done

        jax.lax.while_loop(tcond, tbody, (jnp.int32(1), jnp.bool_(False)))

        if occlusion:
            out_ref[4, :] = jnp.where(out_ref[4, :] > 1.5, 0.0, out_ref[4, :])
        else:
            t = out_ref[0, :]
            hit = t < BIG
            out_ref[0, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :] = hit.astype(jnp.float32)

    return kernel


def _make_traverse2_fat_kernel(K: int, cull: bool, occlusion: bool):
    """Fat-node two-level packet traversal: both the TLAS and each BLAS use
    children-boxes-at-the-parent nodes (ops/traverse_pallas.fat_nodes), so
    every visit tests two subtrees and internal children are pushed
    far-first — near instances and near BLAS subtrees process first, and
    the best-t clamp prunes the far ones wholesale. Same instance-leaf
    machinery as _make_traverse2_kernel (whole-packet affine transform,
    per-instance DMA drain)."""

    def kernel(rays_ref, tlas_ref, inst_ref, blas_ref, mt_hbm, out_ref,
               tstack_ref, bstack_ref, pend_ref, mt_scratch, sem):
        o = [rays_ref[k, :][None, :] for k in range(3)]
        d = [rays_ref[3 + k, :][None, :] for k in range(3)]
        tmin = rays_ref[6, :]
        tmax = rays_ref[7, :]
        inv = [
            1.0 / jnp.where(jnp.abs(d[k]) > 1e-12, d[k], 1e-12) for k in range(3)
        ]

        out_ref[:, :] = jnp.zeros_like(out_ref)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), BIG, jnp.float32)
        tstack_ref[0] = 0

        if occlusion:
            dead = (
                (jnp.abs(rays_ref[3, :]) + jnp.abs(rays_ref[4, :]) + jnp.abs(rays_ref[5, :]))
                < 1e-30
            )
            out_ref[4, :] = jnp.where(dead, 2.0, out_ref[4, :])

        def blas_traverse(iv, slot_i, live):
            # live: [1, TILE] per-instance slab mask from the TLAS walk —
            # see the binary kernel's blas_traverse docstring.
            a = [[iv[3 * r + c] for c in range(3)] for r in range(3)]
            b = [iv[9 + k] for k in range(3)]
            o2 = [
                a[k][0] * o[0] + a[k][1] * o[1] + a[k][2] * o[2] + b[k]
                for k in range(3)
            ]
            d2 = [
                a[k][0] * d[0] + a[k][1] * d[1] + a[k][2] * d[2]
                for k in range(3)
            ]
            mom2 = [
                o2[1] * d2[2] - o2[2] * d2[1],
                o2[2] * d2[0] - o2[0] * d2[2],
                o2[0] * d2[1] - o2[1] * d2[0],
            ]
            inv2 = [
                1.0 / jnp.where(jnp.abs(d2[k]) > 1e-12, d2[k], 1e-12)
                for k in range(3)
            ]
            inst_f = slot_i.astype(jnp.float32)
            bstack_ref[0] = iv[15].astype(jnp.int32)  # fat BLAS root

            def process_slot(slot):
                start = pend_ref[2 * slot]
                count = pend_ref[2 * slot + 1]
                valid, ts, det_abs, us, vs = _leaf_pair_test(
                    mt_scratch.at[slot], o2, d2, mom2, tmin, tmax, cull,
                    count, K,
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
                    inv_det = 1.0 / jnp.maximum(
                        jnp.sum(det_abs * sel, axis=0), 1e-12
                    )
                    c_u = jnp.sum(us * sel, axis=0) * inv_det
                    c_v = jnp.sum(vs * sel, axis=0) * inv_det
                    c_slot = (c_row + start).astype(jnp.float32)
                    better = c_t < out_ref[0, :]
                    out_ref[0, :] = jnp.where(better, c_t, out_ref[0, :])
                    out_ref[1, :] = jnp.where(better, c_slot, out_ref[1, :])
                    out_ref[2, :] = jnp.where(better, c_u, out_ref[2, :])
                    out_ref[3, :] = jnp.where(better, c_v, out_ref[3, :])
                    out_ref[5, :] = jnp.where(better, inst_f, out_ref[5, :])

            def enqueue(ptr, meta, q):
                start = ptr.astype(jnp.int32)
                count = meta.astype(jnp.int32)
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
                        mt_hbm.at[pl.ds(0, K), :],
                        mt_scratch.at[prev],
                        sem.at[prev],
                    ).wait()
                    process_slot(prev)

            def bcond(carry):
                sp, done, _q = carry
                return (sp > 0) & ~done

            def bbody(carry):
                sp, _, q0 = carry
                node = bstack_ref[sp - 1]
                sp = sp - 1
                f = _node_fields16(blas_ref, node)

                best_t = out_ref[0, :]
                tf_base = jnp.where(
                    live, jnp.minimum(tmax, best_t)[None, :], -BIG
                )
                if occlusion:
                    tf_base = jnp.where(
                        out_ref[4, :][None, :] > 0.5, -BIG, tf_base
                    )
                hits = []
                enters = []
                for s in range(2):
                    lo = f[6 * s : 6 * s + 3]
                    hi = f[6 * s + 3 : 6 * s + 6]
                    t0s = [(lo[k] - o2[k]) * inv2[k] for k in range(3)]
                    t1s = [(hi[k] - o2[k]) * inv2[k] for k in range(3)]
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
                    enqueue(ptr0, m0, q)

                q = q + jnp.where(leaf0, 1, 0)

                @pl.when(leaf1)
                def _leaf1():
                    enqueue(ptr1, m1, q)

                q = q + jnp.where(leaf1, 1, 0)

                both = int0 & int1
                c0_near = enters[0] <= enters[1]
                first = jnp.where(c0_near, ptr1, ptr0)
                second = jnp.where(c0_near, ptr0, ptr1)

                @pl.when(both)
                def _push_both():
                    bstack_ref[sp] = first.astype(jnp.int32)
                    bstack_ref[sp + 1] = second.astype(jnp.int32)

                only0 = int0 & ~int1
                only1 = int1 & ~int0

                @pl.when(only0)
                def _push0():
                    bstack_ref[sp] = ptr0.astype(jnp.int32)

                @pl.when(only1)
                def _push1():
                    bstack_ref[sp] = ptr1.astype(jnp.int32)

                new_sp = sp + jnp.where(both, 2, jnp.where(only0 | only1, 1, 0))
                if occlusion:
                    done = (jnp.min(out_ref[4, :]) > 0.5) & (q == q0)
                else:
                    done = jnp.bool_(False)
                return new_sp, done, q

            _, _, q_final = jax.lax.while_loop(
                bcond, bbody, (jnp.int32(1), jnp.bool_(False), jnp.int32(0))
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

        def tcond(carry):
            sp, done = carry
            return (sp > 0) & ~done

        def tbody(carry):
            sp, _ = carry
            node = tstack_ref[sp - 1]
            sp = sp - 1
            f = _node_fields16(tlas_ref, node)

            best_t = out_ref[0, :]
            tf_base = jnp.minimum(tmax, best_t)[None, :]
            if occlusion:
                tf_base = jnp.where(out_ref[4, :][None, :] > 0.5, -BIG, tf_base)
            hits = []
            enters = []
            lanes = []
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
                lanes.append(lane_hit)
                hits.append(jnp.any(lane_hit))
                enters.append(jnp.min(jnp.where(lane_hit, tn, BIG)))

            ptr0, m0, ptr1, m1 = f[12], f[13], f[14], f[15]
            leaf0 = hits[0] & (m0 > 0.5)
            int0 = hits[0] & (m0 < -0.5)
            leaf1 = hits[1] & (m1 > 0.5)
            int1 = hits[1] & (m1 < -0.5)

            @pl.when(leaf0)
            def _inst0():
                slot_i = ptr0.astype(jnp.int32)
                iv = _inst_fields(inst_ref, slot_i)
                blas_traverse(iv, slot_i, lanes[0])

            @pl.when(leaf1)
            def _inst1():
                slot_i = ptr1.astype(jnp.int32)
                iv = _inst_fields(inst_ref, slot_i)
                blas_traverse(iv, slot_i, lanes[1])

            both = int0 & int1
            c0_near = enters[0] <= enters[1]
            first = jnp.where(c0_near, ptr1, ptr0)
            second = jnp.where(c0_near, ptr0, ptr1)

            @pl.when(both)
            def _push_both():
                tstack_ref[sp] = first.astype(jnp.int32)
                tstack_ref[sp + 1] = second.astype(jnp.int32)

            only0 = int0 & ~int1
            only1 = int1 & ~int0

            @pl.when(only0)
            def _push0():
                tstack_ref[sp] = ptr0.astype(jnp.int32)

            @pl.when(only1)
            def _push1():
                tstack_ref[sp] = ptr1.astype(jnp.int32)

            new_sp = sp + jnp.where(both, 2, jnp.where(only0 | only1, 1, 0))
            if occlusion:
                done = jnp.min(out_ref[4, :]) > 0.5
            else:
                done = jnp.bool_(False)
            return new_sp, done

        jax.lax.while_loop(tcond, tbody, (jnp.int32(1), jnp.bool_(False)))

        if occlusion:
            out_ref[4, :] = jnp.where(out_ref[4, :] > 1.5, 0.0, out_ref[4, :])
        else:
            t = out_ref[0, :]
            hit = t < BIG
            out_ref[0, :] = jnp.where(hit, t, -1.0)
            out_ref[4, :] = hit.astype(jnp.float32)

    return kernel


def _node_fields16(nodes_ref, node):
    from .traverse_pallas import _node_fields

    return _node_fields(nodes_ref, node, rows=16)


def _call_fat(tl: dict, rays, r_pad, K: int, cull: bool, occlusion: bool,
              interpret: bool, tile: int):
    return pl.pallas_call(
        _make_traverse2_fat_kernel(K, cull, occlusion),
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fat tlas nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # instance table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fat blas nodes
            pl.BlockSpec(memory_space=pl.ANY),  # mt rows stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((TLAS_STACK,), jnp.int32),
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, tl["tlasf_nodes"], tl["inst_rows"], tl["blasf_nodes"],
      tl["mt_rows"])


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "cull_backface", "interpret", "tile"),
)
def traverse2_fat_closest(
    tl: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    cull_backface: bool = False,
    interpret: bool = False,
    tile: int = TILE_R,
) -> dict:
    """Two-level closest hit via fat-node front-to-back traversal.

    Same contract as traverse2_closest."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max, tile)
    out = _call_fat(tl, rays, r_pad, leaf_size, cull_backface, False,
                    interpret, tile)
    out = out[:, :r]
    hit = out[4] > 0.5
    slot = jnp.clip(out[1].astype(jnp.int32), 0, tl["slot_tri"].shape[0] - 1)
    tri = jnp.where(hit, tl["slot_tri"][slot], -1)
    return {
        "hit": hit,
        "t": out[0],
        "tri": tri,
        "slot": jnp.where(hit, slot, -1),
        "u": jnp.where(hit, out[2], 0.0),
        "v": jnp.where(hit, out[3], 0.0),
        "inst": jnp.where(hit, out[5].astype(jnp.int32), -1),
    }


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "interpret", "tile")
)
def traverse2_fat_any(
    tl: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    interpret: bool = False,
    tile: int = TILE_R,
) -> jnp.ndarray:
    """Two-level occlusion via fat-node traversal with all-occluded early exit."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max, tile)
    out = _call_fat(tl, rays, r_pad, leaf_size, False, True, interpret, tile)
    return out[4, :r] > 0.5


def _call(tl: dict, rays, r_pad, K: int, cull: bool, occlusion: bool,
          interpret: bool):
    return pl.pallas_call(
        _make_traverse2_kernel(K, cull, occlusion),
        grid=(r_pad // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tlas nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # instance table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blas nodes
            pl.BlockSpec(memory_space=pl.ANY),  # mt rows stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((TLAS_STACK,), jnp.int32),
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2, K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, tl["tlas_nodes"], tl["inst_rows"], tl["blas_nodes"], tl["mt_rows"])


@functools.partial(
    jax.jit, static_argnames=("leaf_size", "cull_backface", "interpret")
)
def traverse2_closest(
    tl: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    cull_backface: bool = False,
    interpret: bool = False,
) -> dict:
    """Two-level closest hit. Returns {"hit", "t", "tri" (concatenated
    object-space triangle index), "slot", "u", "v", "inst" (sorted-table
    slot; map through tl["inst_orig"] for the user-visible instance id)}.
    """
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = _call(tl, rays, r_pad, leaf_size, cull_backface, False, interpret)
    out = out[:, :r]
    hit = out[4] > 0.5
    slot = jnp.clip(out[1].astype(jnp.int32), 0, tl["slot_tri"].shape[0] - 1)
    tri = jnp.where(hit, tl["slot_tri"][slot], -1)
    return {
        "hit": hit,
        "t": out[0],
        "tri": tri,
        "slot": jnp.where(hit, slot, -1),
        "u": jnp.where(hit, out[2], 0.0),
        "v": jnp.where(hit, out[3], 0.0),
        "inst": jnp.where(hit, out[5].astype(jnp.int32), -1),
    }


@functools.partial(jax.jit, static_argnames=("leaf_size", "interpret"))
def traverse2_any(
    tl: dict,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min=1e-4,
    t_max=3.0e37,
    leaf_size: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two-level occlusion query with all-occluded early exit."""
    r = origins.shape[0]
    rays, r_pad = _pack_rays(origins, directions, t_min, t_max)
    out = _call(tl, rays, r_pad, leaf_size, False, True, interpret)
    return out[4, :r] > 0.5
