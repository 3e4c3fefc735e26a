"""Two-level (TLAS/BLAS) traversal microbenchmark (TPU).

Closest-hit on the instanced:K sphere-grid scene (BASELINE config 5) through
the two-level kernel (ops/traverse2_pallas) vs the flattened single-level
kernel (ops/traverse_pallas) on identical rays. Three ray kinds isolate the
packet-union pathology:
  blocked    — coherent 32x64-pixel camera blocks (primary rays)
  incoherent — origins on the scene's surface shell, random directions
               (bounce/shadow-like)
  sorted     — the incoherent set re-tiled by (origin Morton cell, octant)

Honest tunnel protocol: warm-up matmuls, compile, settle, best-of-3.

Usage: python benchmarks/tlas_micro.py [K=32] [kinds...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _rays(kind: str, n_rays: int, extent: float, block=(32, 64)):
    import numpy as np

    side = int(np.sqrt(n_rays))
    if kind == "blocked":
        bh, bw = block
        eye = np.array([extent * 0.9, extent * 0.7, extent * 0.9], np.float32)
        ys, xs = np.meshgrid(
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            np.linspace(-0.45, 0.45, side, dtype=np.float32),
            indexing="ij",
        )
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        upv = np.cross(right, fwd)
        d = (
            fwd[None, None]
            + xs[..., None] * right[None, None]
            + ys[..., None] * upv[None, None]
        )
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = (
            d.reshape(side // bh, bh, side // bw, bw, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 3)
        )
        o = np.broadcast_to(eye, (n_rays, 3)).copy()
        return o, d.astype(np.float32)
    # incoherent: origins near the sphere shells, random directions
    rs = np.random.default_rng(7)
    gx = rs.integers(0, int(extent / 1.25), size=n_rays) * 2.5 - extent
    gz = rs.integers(0, int(extent / 1.25), size=n_rays) * 2.5 - extent
    phi = rs.uniform(0, 2 * np.pi, n_rays)
    ct = rs.uniform(-1, 1, n_rays)
    st = np.sqrt(1 - ct * ct)
    sph = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], -1)
    o = np.stack([gx, np.ones(n_rays), gz], -1) + 1.05 * sph
    d = rs.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dxrexperiments_tpu.app.headless import build_scene
    from dxrexperiments_tpu.ops import traverse2_pallas, traverse_pallas
    from dxrexperiments_tpu.scene.scene import BVH_LEAF_SIZE

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    kinds = sys.argv[2:] or ["blocked", "incoherent", "sorted"]
    n_rays = 512 * 512
    extent = k * 2.5 / 2

    sc, _cam = build_scene(f"instanced:{k}")
    t0 = time.time()
    tl_scene = sc.build_two_level()
    tl = jax.device_put(tl_scene["tlas"])
    print(f"two-level build: {time.time()-t0:.1f}s")

    # The flattened SAH build on ~1M tris costs minutes; cache the packed
    # arrays on disk so kernel iterations don't pay it every run.
    import os

    cache = f"/tmp/tlas_micro_flat_{k}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        bvh = jax.device_put({key: jnp.asarray(z[key]) for key in z.files})
        print(f"flattened pack: {time.time()-t0:.1f}s (cached)")
    else:
        flat = sc.build(accel="bvh")
        bvh_host = {
            key: np.asarray(v)
            for key, v in flat["bvh"].items()
            if key != "leaf_size"
        }
        np.savez(cache, **bvh_host)
        bvh = jax.device_put(flat["bvh"])
        print(f"flattened build: {time.time()-t0:.1f}s "
              f"({int(flat['num_tris'])} tris)")

    for _ in range(3):
        float(jnp.sum(jnp.ones((2048, 2048)) @ jnp.ones((2048, 2048))))

    if kinds == ["sweep"]:
        # flat-fat tile sweep: packet size vs union locality
        for tile, block in ((128, (8, 16)), (256, (16, 16)), (512, (16, 32)),
                            (1024, (32, 32)), (2048, (32, 64))):
            o, d = _rays("blocked", n_rays, extent, block)
            o, d = jnp.asarray(o), jnp.asarray(d)

            def run():
                return traverse_pallas.traverse_fat_closest(
                    bvh, o, d, t_min=1e-4, leaf_size=BVH_LEAF_SIZE, tile=tile
                )

            float(jnp.sum(run()["t"]))
            float(jnp.sum(run()["t"]))
            best = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                out = run()
                float(jnp.sum(out["t"]))
                best = min(best, time.perf_counter() - t1)
            print(f"tile {tile:5d} block {block}: {best*1e3:8.2f} ms "
                  f"({n_rays/best/1e6:6.1f} Mrays/s)")
        return

    for kind in kinds:
        o, d = _rays("blocked" if kind == "blocked" else "incoherent",
                     n_rays, extent)
        if kind == "sorted":
            from dxrexperiments_tpu.trace.integrator import _ray_sort_order

            order = np.asarray(
                _ray_sort_order({"bvh": {"bvh_nodes": bvh["bvh_nodes"]}},
                                jnp.asarray(o), jnp.asarray(d)))
            o, d = o[order], d[order]
        o, d = jnp.asarray(o), jnp.asarray(d)

        for name, fn, acc in (
            ("two-level", traverse2_pallas.traverse2_closest, tl),
            ("2lvl-fat", traverse2_pallas.traverse2_fat_closest, tl),
            ("flattened", traverse_pallas.traverse_closest, bvh),
            ("flat-fat", traverse_pallas.traverse_fat_closest, bvh),
        ):
            leaf = BVH_LEAF_SIZE
            kw = {"tile": 1024} if "fat" in name else {}

            def run():
                return fn(acc, o, d, t_min=1e-4, leaf_size=leaf, **kw)

            r = run()
            hits = float(jnp.mean(r["hit"].astype(jnp.float32)))
            float(jnp.sum(run()["t"]))
            best = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                out = run()
                float(jnp.sum(out["t"]))
                best = min(best, time.perf_counter() - t1)
            print(
                f"{kind:10s} {name:9s}: {best*1e3:8.2f} ms "
                f"({n_rays/best/1e6:6.1f} Mrays/s, hit {hits:.3f})"
            )


if __name__ == "__main__":
    main()
