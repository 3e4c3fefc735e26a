"""Multi-chip rendering: pixel-tile + sample (SPP) sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2.8); its scaling axes re-imagined for
a TPU pod are:

  * tile parallelism — shard image rows across the "tile" mesh axis (zero
    collectives until composite/blit),
  * sample parallelism — shard samples-per-pixel across the "spp" axis, with
    one mean-reduction per frame riding ICI,
  * scene replication — triangles/BVH/materials are read-only and replicated.

Implementation is GSPMD-style: we annotate shardings on the stacked-sample
render and let XLA partition the whole traced computation and insert the
collectives — no hand-written NCCL analogues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..trace.integrator import render_sample


def make_render_mesh(
    n_tile: int | None = None, n_spp: int | None = None, devices=None
) -> Mesh:
    """Create a ("tile", "spp") mesh. Defaults: all devices on "tile"."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_tile is None and n_spp is None:
        n_tile, n_spp = n, 1
    elif n_tile is None:
        n_tile = n // n_spp
    elif n_spp is None:
        n_spp = n // n_tile
    assert n_tile * n_spp == n, (n_tile, n_spp, n)
    dev_array = np.asarray(devices).reshape(n_tile, n_spp)
    return Mesh(dev_array, ("tile", "spp"))


def stack_cameras(camera_params_list: list[dict]) -> dict:
    """Stack per-sample camera pytrees along a leading [S] axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *camera_params_list)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "mode", "mesh", "ao_only")
)
def render_samples_sharded(
    scene: dict,
    options: dict,
    cameras: dict,
    width: int,
    height: int,
    mesh: Mesh,
    mode: str = "progressive",
    ao_only: bool = False,
) -> jnp.ndarray:
    """Render S decorrelated samples (vmapped over stacked cameras) with the
    [S, H, W, 3] output sharded P("spp", "tile") and return the sample mean
    — one psum-mean over the "spp" axis, image rows staying sharded.
    """
    color_sharding = NamedSharding(mesh, P("spp", "tile", None, None))

    def one(cam):
        return render_sample(
            scene, options, cam, width, height, mode=mode, ao_only=ao_only
        )["color"]

    colors = jax.vmap(one)(cameras)
    colors = jax.lax.with_sharding_constraint(colors, color_sharding)
    mean = jnp.mean(colors, axis=0)
    return jax.lax.with_sharding_constraint(
        mean, NamedSharding(mesh, P("tile", None, None))
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "mesh"),
    donate_argnames=("accum",),
)
def progressive_step_sharded(
    scene: dict,
    options: dict,
    cameras: dict,
    accum: jnp.ndarray,
    width: int,
    height: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """Multi-chip progressive accumulation step: S samples/frame folded into
    the row-sharded accumulator (accum stays resident and sharded; donated).

    accumCount semantics match the single-chip step but advance by S per
    frame: accum' = (count*accum + S*mean)/(count + S).
    """
    s = jax.tree.leaves(cameras)[0].shape[0]
    mean = render_samples_sharded(
        scene, options, cameras, width, height, mesh, mode="progressive"
    )
    count = cameras["accum_count"][0]
    new = (count * accum + s * mean) / (count + s)
    return jax.lax.with_sharding_constraint(
        new, NamedSharding(mesh, P("tile", None, None))
    )


def replicate_scene(scene: dict, mesh: Mesh) -> dict:
    """Place the read-only scene pytree replicated on every device."""
    return jax.device_put(scene, NamedSharding(mesh, P()))
