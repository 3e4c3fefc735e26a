"""Packet-traversal microbenchmark (TPU): binary vs 8-wide kernel.

Closest-hit of 262k camera-style rays against a random triangle soup
(BASELINE config 5 spirit). Honest tunnel protocol: warm-up matmuls,
compile, settle, best-of-3 with a scalar-readback fence per batch.

Usage: python benchmarks/traversal_micro.py [n_tris] [ray_kind] [leaf] [kernels]
  kernels: comma list of binary | wide | fat | fatg<G> (sub-packet layout,
  e.g. fatg4 = tile/4-lane gating granularity). SBVH_SPATIAL=0 disables
  the builder's spatial splits for A/B.
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
    which = sys.argv[4].split(",") if len(sys.argv) > 4 else ["binary", "fat"]
    leaf = int(sys.argv[3]) if len(sys.argv) > 3 else 32
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
    w = int(packed["bvh8_nodes"].shape[0]) // 8
    m = int(packed["bvh_nodes"].shape[1])
    print(f"{n_tris} tris, leaf {leaf}: {m} binary nodes, {w} wide nodes")

    ray_kind = sys.argv[2] if len(sys.argv) > 2 else "camera"
    rs = np.random.default_rng(0)
    if ray_kind == "camera":
        # coherent pinhole camera outside the soup; consecutive rays are
        # image-order so packets are 4-row frustum slabs
        eye = np.array([0.0, 0.0, 28.0], np.float32)
        side = int(np.sqrt(n_rays))
        ys, xs = np.meshgrid(
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            indexing="ij",
        )
        d = np.stack([xs, ys, -np.ones_like(xs)], axis=-1).reshape(-1, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(eye, (n_rays, 3)).copy()
    elif ray_kind == "blocked":
        # same camera, but rays permuted into 64x32-pixel blocks so each
        # 2048-ray packet is a compact frustum instead of a 4-row slab
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
            d.reshape(side // 32, 32, side // 64, 64, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 3)
        )
        o = np.broadcast_to(eye, (n_rays, 3)).copy()
    else:
        # incoherent: random origins inside, directions toward center + noise
        o = rs.uniform(-14, 14, size=(n_rays, 3)).astype(np.float32)
        d = (-o + rs.normal(scale=2.0, size=(n_rays, 3))).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d.astype(np.float32))

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    import functools

    fns = {
        "binary": traverse_pallas.traverse_closest,
        "wide": traverse_pallas.traverse8_closest,
        "fat": traverse_pallas.traverse_fat_closest,
    }
    for name in which:
        if name.startswith("fatg"):
            fn = functools.partial(
                traverse_pallas.traverse_fat_closest, group=int(name[4:])
            )
        else:
            fn = fns[name]

        def run():
            return fn(packed, o, d, t_min=1e-4, leaf_size=leaf)

        r = run()
        hits = float(jnp.mean(r["hit"].astype(jnp.float32)))  # compile+fence
        float(jnp.sum(run()["t"]))  # settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(4):
                out = run()
            float(jnp.sum(out["t"]))
            best = min(best, (time.perf_counter() - t0) / 4)
        print(
            f"{name:7s}: {best*1e3:7.2f} ms for {n_rays} closest rays "
            f"({n_rays/best/1e6:6.1f} Mrays/s, hit rate {hits:.3f})"
        )


if __name__ == "__main__":
    main()
