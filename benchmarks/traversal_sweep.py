"""Fat-kernel traversal variant sweep (TPU, one process).

Sweeps the round-3 closest-hit variants on the 262k-ray / 200k-tri soup
(the BASELINE config-5 micro): leaf best-t clamp + gated epilogue
(leaf_bestt) and sub-tile lane gating (half_gate), across packet tiles —
for both blocked-camera and incoherent ray sets. All configs run in ONE
process (back-to-back short TPU processes wedge the tunnel; CLAUDE.md).

Usage: python benchmarks/traversal_sweep.py [n_tris] [leaf]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.accel import bvh as bvh_mod
    from dxrexperiments_tpu.ops import traverse_pallas
    from dxrexperiments_tpu.scene import Scene
    from dxrexperiments_tpu.scene.procedural import random_triangle_soup

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_rays = 512 * 512

    mesh = random_triangle_soup(n_tris, seed=2, extent=10.0)
    sc = Scene()
    sc.add_model(mesh)
    data = sc.build(accel="none")
    v0, e1, e2 = (np.asarray(data[k]) for k in ("v0", "e1", "e2"))
    nodes = bvh_mod.build_bvh_sah(v0, e1, e2, int(data["num_tris"]), leaf)
    if nodes is None:
        nodes = bvh_mod.to_node_arrays(
            bvh_mod.build_bvh(v0, e1, e2, int(data["num_tris"]), leaf)
        )
    packed = jax.device_put(traverse_pallas.pack_for_traversal(nodes, data, leaf))

    # leaf occupancy (count-gating value gauge)
    slot_tri = np.asarray(packed["slot_tri"])
    n_slots = (slot_tri >= 0).sum()
    n_leaves = len(slot_tri) // leaf
    counts = (slot_tri.reshape(-1, leaf) >= 0).sum(axis=1)
    counts = counts[counts > 0]
    print(
        f"{n_tris} tris leaf {leaf}: {len(counts)} leaves, occupancy "
        f"mean {counts.mean():.1f}/{leaf} p50 {np.median(counts):.0f} "
        f"({n_slots} filled slots)", flush=True,
    )

    def camera_blocked():
        eye = np.array([0.0, 0.0, 28.0], np.float32)
        side = int(np.sqrt(n_rays))
        ys, xs = np.meshgrid(
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            indexing="ij",
        )
        d = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = (
            d.reshape(side // 32, 32, side // 32, 32, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 3)
        )
        o = np.broadcast_to(eye, (n_rays, 3)).copy()
        return o, d

    def incoherent():
        rs = np.random.default_rng(0)
        o = rs.uniform(-14, 14, size=(n_rays, 3)).astype(np.float32)
        d = (-o + rs.normal(scale=2.0, size=(n_rays, 3))).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return o, d

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    ray_sets = {"camera32": camera_blocked(), "incoher": incoherent()}

    def bench(kind, tile, lb, hg, occl=False, co=False):
        o, d = ray_sets[kind]
        o = jnp.asarray(o)
        d = jnp.asarray(d.astype(np.float32))

        def run():
            if occl:
                return {"t": traverse_pallas.traverse_fat_any(
                    packed, o, d, t_min=1e-4, leaf_size=leaf, tile=tile,
                    half_gate=hg,
                ).astype(jnp.float32)}
            return traverse_pallas.traverse_fat_closest(
                packed, o, d, t_min=1e-4, leaf_size=leaf, tile=tile,
                leaf_bestt=lb, half_gate=hg, common_origin=co,
            )

        r = run()
        chk = float(jnp.sum(jnp.where(jnp.isfinite(r["t"]), r["t"], 0.0)))
        float(jnp.sum(run()["t"]))  # settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(4):
                out = run()
            float(jnp.sum(out["t"]))
            best = min(best, (time.perf_counter() - t0) / 4)
        tag = "any" if occl else "closest"
        print(
            f"{kind:8s} {tag:7s} tile {tile:4d} lb={int(lb)} hg={hg} co={int(co)}: "
            f"{best*1e3:7.2f} ms ({n_rays/best/1e6:6.1f} Mrays/s) "
            f"chk {chk:.6g}", flush=True,
        )
        return best

    # Measured rounds A/B (camera32 closest, ms): 2048/lb0/hg0 37.4 (the
    # r2 baseline), lb alone NEGATIVE (39.1 — any(valid) over 2048 lanes
    # is almost always true), 2048/lb1/hg2 32.7, 2048/lb0/hg2 30.7 (best),
    # 4096/hg4 31.5, 8192/hg8 36.3, plain 1024 30.8. Occlusion: hg2 28.5
    # -> 26.4. Incoherent rays: 2.1-2.4 s at every config (the packet
    # union IS the tree; gating recovers <15%).
    # Round C: common-origin (pinhole) specialization on the winners.
    for co in (False, True):
        for tile, lb, hg in ((2048, False, 2), (1024, False, 0),
                             (4096, False, 4)):
            bench("camera32", tile, lb, hg, co=co)
    bench("camera32", 2048, False, 0, co=True)


if __name__ == "__main__":
    main()
