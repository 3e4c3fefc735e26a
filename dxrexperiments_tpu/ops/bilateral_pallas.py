"""Fused Pallas joint-bilateral filter passes.

The TPU re-expression of the reference's groupshared-cached compute denoiser
(/root/reference/assets/shaders/BilateralFilter.hlsli:40-73): each block of
rows/columns is resident in VMEM and all 51 taps are computed in-register, so
input and guide are read from HBM exactly once per pass — the XLA shift-chain
fallback in models/denoise.py re-reads per tap (~10x the traffic at 1080p).

Layout: channels are separate [H, W] planes (lane dim = x). The horizontal
pass blocks rows [8, Wpad] and shifts along lanes; the vertical pass blocks
column strips [Hpad, 128] and shifts along sublanes. Out-of-image taps get
zero weight (D3D OOB-read semantics); the runtime kernel radius (slider
1..25) arrives as a scalar and feeds the same disk weight table as the
reference, evaluated per tap in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_EXTENT = 25
KERNEL_TAPS = 6
ROWS = 8  # rows per horizontal block
COLS = 128  # columns per vertical block


def _tap_weight(i: int, radius):
    """Disk weight table (BilateralFilter.hlsli:81-91), scalar per tap."""
    idx = jnp.clip(
        (jnp.abs(float(i)) * (KERNEL_TAPS - 1) / (0.001 + jnp.abs(radius * 0.8)))
        .astype(jnp.int32),
        0,
        KERNEL_TAPS,
    )
    # branchless table lookup (scalar)
    w = jnp.where(
        idx < 2,
        1.0,
        jnp.where(
            idx < 3,
            0.9,
            jnp.where(idx < 4, 0.75, jnp.where(idx < 5, 0.6, jnp.where(idx < 6, 0.5, 0.0))),
        ),
    )
    return w.astype(jnp.float32)


def _make_pass_kernel(axis: int, extent_px: int):
    """axis: 1 = horizontal (shift lanes), 0 = vertical (shift sublanes)."""

    def kernel(radius_ref, in_r, in_g, in_b, g_r, g_g, g_b, size_ref,
               out_r, out_g, out_b):
        radius = radius_ref[0]
        limit = size_ref[0]  # valid extent along the filtered axis
        shape = in_r.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        cr, cg, cb = in_r[:, :], in_g[:, :], in_b[:, :]
        gr, gg, gb = g_r[:, :], g_g[:, :], g_b[:, :]

        acc_r = jnp.zeros(shape, jnp.float32)
        acc_g = jnp.zeros(shape, jnp.float32)
        acc_b = jnp.zeros(shape, jnp.float32)
        acc_w = jnp.zeros(shape, jnp.float32)

        n_axis = shape[axis]
        for i in range(-extent_px, extent_px + 1):
            sw = _tap_weight(i, radius)
            # shifted sample: value at pos+i (zero weight when OOB);
            # pltpu.roll requires non-negative shifts (circular).
            sh = (-i) % n_axis
            sr = pltpu.roll(cr, sh, axis)
            sg = pltpu.roll(cg, sh, axis)
            sb = pltpu.roll(cb, sh, axis)
            jr = pltpu.roll(gr, sh, axis)
            jg = pltpu.roll(gg, sh, axis)
            jb = pltpu.roll(gb, sh, axis)
            src = pos + i
            # D3D OOB semantics (and the XLA reference): out-of-image reads
            # return 0 for BOTH sample and guide, but the tap still carries
            # its table weight x the color weight against a zero guide.
            inb = (src >= 0) & (src < limit)
            sr = jnp.where(inb, sr, 0.0)
            sg = jnp.where(inb, sg, 0.0)
            sb = jnp.where(inb, sb, 0.0)
            jr = jnp.where(inb, jr, 0.0)
            jg = jnp.where(inb, jg, 0.0)
            jb = jnp.where(inb, jb, 0.0)
            cdist = (jnp.abs(jr - gr) + jnp.abs(jg - gg) + jnp.abs(jb - gb)) * 10.0
            cw = 1.0 - jnp.clip(cdist, 0.0, 1.0)
            w = sw * cw
            acc_r += sr * w
            acc_g += sg * w
            acc_b += sb * w
            acc_w += w

        inv = 1.0 / jnp.maximum(acc_w, 1e-8)
        out_r[:, :] = acc_r * inv
        out_g[:, :] = acc_g * inv
        out_b[:, :] = acc_b * inv

    return kernel


def _pad_to(x, m, axis):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    cfg = [(0, 0), (0, 0)]
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("axis", "interpret"))
def bilateral_pass(
    inp: jnp.ndarray,
    joint: jnp.ndarray,
    radius: jnp.ndarray,
    axis: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One separable joint-bilateral pass along `axis` on [H, W, 3]."""
    h, w, _ = inp.shape
    if axis == 0:
        # Vertical = transpose -> horizontal kernel -> transpose. A full-
        # height column block (1080x128 x ~19 live buffers under the 51-tap
        # unroll) blows the 16MB VMEM budget; two cheap XLA transposes keep
        # the kernel row-shaped.
        out = bilateral_pass(
            jnp.swapaxes(inp, 0, 1),
            jnp.swapaxes(joint, 0, 1),
            radius,
            axis=1,
            interpret=interpret,
        )
        return jnp.swapaxes(out, 0, 1)

    planes = [inp[:, :, c] for c in range(3)] + [joint[:, :, c] for c in range(3)]
    planes = [_pad_to(_pad_to(p, ROWS, 0), 128, 1) for p in planes]
    hp, wp = planes[0].shape
    block = (ROWS, wp)
    grid = (hp // ROWS,)
    index = lambda i: (i, 0)
    limit = w

    spec = pl.BlockSpec(block, index, memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(planes[0].shape, jnp.float32) for _ in range(3)
    ]
    outs = pl.pallas_call(
        _make_pass_kernel(1, MAX_EXTENT),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(
        radius.astype(jnp.float32).reshape(1),
        *planes,
        jnp.asarray([limit], jnp.int32),
    )
    return jnp.stack([o[:h, :w] for o in outs], axis=-1)
