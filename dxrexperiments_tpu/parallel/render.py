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


# --------------------------------------------------------------------------
# shard_map paths: row-sharded FUSED megakernels + halo-exchange denoiser.
#
# The GSPMD functions above let XLA partition the wavefront render; the
# megakernels (ops/fused_sample_pallas.py, ops/fused_traverse_pallas.py) are
# single Pallas launches XLA cannot split, so the multi-chip form runs one
# launch per device over explicit shard_map: each device renders its row
# block of the global image (py0/full_height keep NDC and the TEA pixel
# seeds GLOBAL, so the sharded image equals the single-chip image), sample
# batches shard over "spp" with one psum riding ICI.
# --------------------------------------------------------------------------


def _route_fused(scene: dict, mode: str, ao_only: bool, impl: str):
    """(kind, interpret) routing mirror of make_progressive_step /
    make_render_step: 'brute' | 'traverse' | 'wavefront'."""
    from ..ops import fused_sample_pallas as fsp
    from ..ops import fused_traverse_pallas as ftp
    from ..trace.integrator import resolve_impl

    resolved = resolve_impl(impl)
    pallas = resolved in ("pallas", "pallas_interpret")
    interpret = resolved == "pallas_interpret"
    if pallas and fsp.supports_fused(scene, mode, ao_only):
        return "brute", interpret
    if pallas and ftp.supports_fused_traverse(scene, mode, ao_only):
        return "traverse", interpret
    return "wavefront", interpret


def make_sharded_progressive_step(
    scene: dict,
    width: int,
    height: int,
    mesh: Mesh,
    samples_per_step: int = 1,
    impl: str = "auto",
    ao_only: bool = False,
):
    """Compile the multi-chip progressive accumulation step.

    Image rows shard over the "tile" mesh axis, the per-frame sample batch
    over "spp" (one psum-mean per step). Per shard the render routes exactly
    like the single-chip make_progressive_step: fused brute megakernel →
    fused traversal megakernel → wavefront render_sample, all row-offset via
    py0/full_height so the result matches the single-chip image.

    Returns jitted ``step(accum, options, cameras, lights, env,
    max_iterations)`` with accum row-sharded P("tile") and cameras stacked
    [S] (sharded over "spp"); accumCount advances by S like the single-chip
    samples_per_step path.
    """
    from ..ops import fused_sample_pallas as fsp
    from ..ops import fused_traverse_pallas as ftp
    from ..trace.integrator import render_sample

    n_tile, n_spp = mesh.shape["tile"], mesh.shape["spp"]
    if height % n_tile:
        raise ValueError(f"height {height} % tile axis {n_tile} != 0")
    if samples_per_step % n_spp:
        raise ValueError(
            f"samples_per_step {samples_per_step} % spp axis {n_spp} != 0"
        )
    h_local = height // n_tile
    env_kind = int(scene["env"]["kind"])
    kind, interpret = _route_fused(scene, "progressive", ao_only, impl)
    geo = {k: v for k, v in scene.items() if k not in ("lights", "env")}
    s = samples_per_step

    def shard_body(accum, options, cameras, lights, env, max_iterations):
        full = dict(geo, lights=lights, env=env)
        py0 = (jax.lax.axis_index("tile") * h_local).astype(jnp.float32)
        if kind == "brute":
            local_sum = fsp.fused_progressive_sum(
                full, options, cameras, width, h_local, env_kind,
                interpret=interpret, py0=py0, full_height=height,
            )
        elif kind == "traverse":
            local_sum = ftp.fused_traverse_progressive_sum(
                full, options, cameras, width, h_local, env_kind,
                interpret=interpret, py0=py0, full_height=height,
            )
        else:
            def one(cam):
                return render_sample(
                    full, options, cam, width, h_local, mode="progressive",
                    ao_only=ao_only, impl=impl, env_kind=env_kind,
                    row0=py0, full_height=height,
                )["color"]

            local_sum = jnp.sum(jax.vmap(one)(cameras), axis=0)

        mean = jax.lax.psum(local_sum, "spp") / s
        count = cameras["accum_count"][0]
        new = (count * accum + s * mean) / (count + s)
        return jnp.where(
            count >= max_iterations.astype(jnp.float32), accum, new
        )

    row = P("tile", None, None)
    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(row, P(), P("spp"), P(), P(), P()),
        out_specs=row,
        check_vma=False,
    )
    return jax.jit(smap, donate_argnums=(0,))


def _halo_rows(x: jnp.ndarray, r: int, n_tile: int) -> jnp.ndarray:
    """Pad a row shard with r rows from each "tile" neighbour via ppermute.

    Edge shards receive zeros (ppermute's missing-pair semantics) — exactly
    the D3D out-of-bounds-reads-return-0 convention the unsharded shift
    chain reproduces with zero padding, so halo'd vertical filtering is
    bit-identical to the single-chip pass."""
    from_above = jax.lax.ppermute(
        x[-r:], "tile", [(i, i + 1) for i in range(n_tile - 1)]
    )
    from_below = jax.lax.ppermute(
        x[:r], "tile", [(i, i - 1) for i in range(1, n_tile)]
    )
    return jnp.concatenate([from_above, x, from_below], axis=0)


def _denoise_local(
    direct: jnp.ndarray,
    indirect: jnp.ndarray,
    params: dict,
    n_tile: int,
    h_local: int,
) -> jnp.ndarray:
    """DenoiseCompositor on row shards (inside shard_map over "tile").

    The horizontal pass is row-local; the vertical pass reads ±MAX_EXTENT
    rows across shard borders — exchanged with one ppermute halo when the
    shard is tall enough, via an all_gather fallback otherwise (tiny
    shards). Composite/tonemap parity via models.denoise.composite_tail."""
    from ..models.denoise import (
        MAX_EXTENT,
        _bilateral_pass,
        composite_tail,
    )

    radius = params["max_kernel_size"].astype(jnp.float32)
    dbg = params["debug_visualize"]

    pass0 = _bilateral_pass(indirect, direct, radius, axis=1)
    pass0 = jnp.where(dbg == 2, indirect, pass0)

    if n_tile == 1:
        pass1 = _bilateral_pass(pass0, direct, radius, axis=0)
    elif h_local >= MAX_EXTENT:
        r = MAX_EXTENT
        pass1 = _bilateral_pass(
            _halo_rows(pass0, r, n_tile),
            _halo_rows(direct, r, n_tile),
            radius,
            axis=0,
        )[r:-r]
    else:
        # Shard shorter than the filter support: gather full columns once.
        full_p0 = jax.lax.all_gather(pass0, "tile", axis=0, tiled=True)
        full_d = jax.lax.all_gather(direct, "tile", axis=0, tiled=True)
        full_p1 = _bilateral_pass(full_p0, full_d, radius, axis=0)
        t = jax.lax.axis_index("tile")
        pass1 = jax.lax.dynamic_slice_in_dim(
            full_p1, t * h_local, h_local, axis=0
        )
    pass1 = jnp.where(dbg == 2, pass0, pass1)
    return composite_tail(direct, pass1, params)


def make_sharded_realtime_step(
    scene: dict,
    width: int,
    height: int,
    mesh: Mesh,
    impl: str = "auto",
    denoise: bool = True,
):
    """Compile the multi-chip realtime frame: row-sharded raytrace (fused
    realtime megakernel per shard when eligible, wavefront otherwise) plus
    the row-sharded DenoiseCompositor whose vertical bilateral pass
    exchanges a ±MAX_EXTENT row halo over ICI — rows never leave their
    device between raygen and tonemap.

    Requires a tile-only mesh (spp axis of size 1; realtime is 1 spp by
    construction). Returns jitted ``step(options, camera, lights, env,
    denoise_params) -> dict`` of row-sharded AOVs plus "display" (the
    denoised composite) when denoise=True.
    """
    from ..ops import fused_sample_pallas as fsp
    from ..ops import fused_traverse_pallas as ftp
    from ..trace.integrator import render_sample

    n_tile, n_spp = mesh.shape["tile"], mesh.shape["spp"]
    if n_spp != 1:
        raise ValueError("realtime sharding uses a tile-only mesh (n_spp=1)")
    if height % n_tile:
        raise ValueError(f"height {height} % tile axis {n_tile} != 0")
    h_local = height // n_tile
    env_kind = int(scene["env"]["kind"])
    kind, interpret = _route_fused(scene, "realtime", False, impl)
    geo = {k: v for k, v in scene.items() if k not in ("lights", "env")}

    def shard_body(options, camera, lights, env, dparams):
        full = dict(geo, lights=lights, env=env)
        py0 = (jax.lax.axis_index("tile") * h_local).astype(jnp.float32)
        if kind == "brute":
            out = fsp.fused_realtime_outputs(
                full, options, camera, width, h_local, env_kind,
                interpret=interpret, py0=py0, full_height=height,
            )
        elif kind == "traverse":
            out = ftp.fused_traverse_realtime_outputs(
                full, options, camera, width, h_local, env_kind,
                interpret=interpret, py0=py0, full_height=height,
            )
        else:
            out = render_sample(
                full, options, camera, width, h_local, mode="realtime",
                jitter_scale=10.0, impl=impl, env_kind=env_kind,
                row0=py0, full_height=height,
            )
        if denoise:
            out = dict(
                out,
                display=_denoise_local(
                    out["direct"], out["indirect_specular"], dparams,
                    n_tile, h_local,
                ),
            )
        return out

    img = P("tile", None, None)
    out_specs = {
        "direct": img,
        "indirect_specular": img,
        "albedo": img,
        "roughness": P("tile", None),
        "color": img,
    }
    if denoise:
        out_specs["display"] = img

    smap = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(smap)
