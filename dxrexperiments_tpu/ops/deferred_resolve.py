"""Miss-compacted deferred gathers (round 4).

The deferred env/albedo modes (ops/fused_sample_pallas.py,
ops/fused_traverse_pallas.py) resolve texture lookups OUTSIDE the
megakernel with XLA gathers, because gathers don't lower in Mosaic. On
this hardware an XLA gather costs ~25 ns per gathered ROW regardless of
index locality (RESULTS.md "Environment sampling"), so resolving over all
N ray rows pays full price for every row whose contribution weight is
ZERO — and env only contributes where a ray MISSED
(/root/reference/assets/shaders/ProgressiveRaytracing.hlsl:160-164,
RealtimeRaytracing.hlsl:119-126), albedo textures only where a ray HIT a
textured material. In closed scenes (Cornell + HDR env) the needed
fraction is a few percent; in open scenes it's the hit fraction.

``compact_apply`` evaluates ``where(need, fn(packed), 0)`` by compacting
the needed rows to a STATIC capacity (XLA needs static shapes), applying
``fn`` to K ≪ N rows, and scattering the results back. A tiered
``lax.cond`` picks the smallest capacity that fits the runtime count and
falls back to the full-width resolve when none does — correct for every
scene, fast where sparsity exists. The traversal-compaction negative
(trace/integrator.py dead-lane notes) does NOT transfer here: dead lanes
are free inside the sweep kernels but cost full price in XLA gathers.

Index construction methods (both static-shape, knob-selected so the chip
decides): ``nonzero`` = jnp.nonzero(size=K) (cumsum + bincount scatter),
``sort`` = one stable sort_key_val on the need mask.

``block`` mode (round 5) is the one that actually wins on v5e: the
per-ROW compaction above measured NEGATIVE at every scored config because
the cumsum index build runs over all N rows and the ``.at[idx].add``
scatter-back costs more per row than the gathers it saves. Block mode
moves every per-row cost to per-BLOCK (B=1024 rows): the need mask is
reduced to ``any`` per block, the index build runs over N/B entries, the
input compaction is a gather of cap_b WIDE rows ([nb, B*pd] — gather time
is sub-linear in row width, so block rows are ~free), and the
re-expansion is another wide-row gather by each block's cumsum position —
no scatter anywhere. The only full-price gathers left are fn's own table
lookups on the cap*N compacted rows, so the win is ~linear in the
block-level sparsity of ``need``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _knobs() -> tuple[bool, tuple[float, ...], str]:
    """DXR_COMPACT in {0, 1, block} enables (1 = per-row, block =
    block-granular); DXR_COMPACT_CAPS="0.125,0.5" sets the capacity tiers
    (fractions of N, ascending); DXR_COMPACT_METHOD in {nonzero, sort}
    picks the per-row index build; DXR_COMPACT_B the block size. Read at
    trace time (outside jit) like _ft_knobs.

    Per-row mode is DEFAULT OFF: measured NEGATIVE on v5e at every scored
    config (benchmarks/round4_batch.py — susanne+cubemap FT-deferred
    31.4 -> 42.1 ms/sample, cornell+HDR-latlong 1080p brute-deferred
    116 -> 145): the nonzero index build (cumsum over N) + the
    .at[idx].add scatter-back cost more than the skipped gather rows save
    at ~25 ns/row. ``block`` mode (see module docstring) pays neither."""
    mode = os.environ.get("DXR_COMPACT", "0")
    caps = tuple(
        float(x)
        for x in os.environ.get("DXR_COMPACT_CAPS", "0.125,0.5").split(",")
        if x
    )
    method = os.environ.get("DXR_COMPACT_METHOD", "nonzero")
    block = int(os.environ.get("DXR_COMPACT_B", "1024"))
    return mode, caps, method, block


BLOCK_DEFAULT_MIN_ROWS = 1_000_000
# B=32 vs 16 production A/B: 62.52 vs 63.48 ms/sample on config 3, parity
# 0.0 (round5_batch8, one process) — matches the batch-5 resolve micro
# (49.45 vs 50.79: half the re-expansion/index rows at the same block need)
BLOCK_DEFAULT_B = 32
BLOCK_DEFAULT_CAPS = (0.05, 0.6)


def default_resolve_kwargs(n_rows: int) -> dict:
    """Call-site production default for the deferred impls: block-granular
    compaction pays only at ~1080p row counts (round 5, one process:
    config-3 production frame 119.0 -> 63.7 ms/sample at 2.07M rows;
    NEGATIVE at 262k even with tiny tiers — config-2 98 -> 121,
    susanne+cubemap 33 -> 34 ms/sample, round5_batch5). Tier sizing
    (batch-4/5 sweeps): the top tier must admit the DIFFUSE block-need
    (~0.53, plateaus below B=32 — scattered bounce misses) with margin
    (a 0.55 top tier measured 67 vs 51 ms when per-sample masks crossed
    it); the LOWER tier is for the sparse terms (spec ~0.03, prim-miss
    ~0) — 0.05 keeps 1.5x margin, and a missed tier only falls through
    to the next, never breaks parity. An explicit DXR_COMPACT env var
    always wins (the A/B knob)."""
    if "DXR_COMPACT" in os.environ or n_rows < BLOCK_DEFAULT_MIN_ROWS:
        return {}
    return {
        "enabled": "block",
        "caps": BLOCK_DEFAULT_CAPS,
        "block": BLOCK_DEFAULT_B,
    }


def _round_cap(n: int, frac: float) -> int:
    """Capacity tier: ceil(n*frac) rounded up to a sublane multiple, <= n
    (no floor beyond that — small test images must exercise the compact
    branches too)."""
    cap = -(-int(n * frac) // 8) * 8
    return max(8, min(cap, n))


def _compact_indices(need: jnp.ndarray, cap: int, method: str) -> jnp.ndarray:
    """First-`count` slots hold the indices of needed rows (ascending);
    the rest point at row 0 (their contributions are masked to zero)."""
    n = need.shape[0]
    if method == "sort":
        key = jnp.where(need, 0, 1).astype(jnp.int32)
        _, idx = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
        return idx[:cap]
    (idx,) = jnp.nonzero(need, size=cap, fill_value=0)
    return idx.astype(jnp.int32)


def compact_apply(
    fn,
    need: jnp.ndarray,
    packed: jnp.ndarray,
    out_dim: int = 3,
    caps: tuple[float, ...] | None = None,
    method: str | None = None,
    enabled: bool | str | None = None,
    block: int | None = None,
) -> jnp.ndarray:
    """[n, out_dim] result of ``where(need[:, None], fn(packed), 0)``,
    gathering/evaluating only ~count rows when the runtime count fits a
    capacity tier.

    fn: [k, packed_dim] -> [k, out_dim], shape-polymorphic (applied at
    each capacity AND full width). packed: [n, packed_dim] row inputs
    (directions+weights / uv+mid packed into ONE array so the compaction
    gather is a single wide-row gather — gather time is sub-linear in row
    width). need: [n] bool.

    enabled: False / True (per-row) / "block" (block-granular; see module
    docstring). Block mode counts a block as needed when ANY of its rows
    is, so its effective sparsity is the block-level one.
    """
    k_mode, k_caps, k_method, k_block = _knobs()
    if enabled is None:
        enabled = {"0": False, "1": True}.get(k_mode, k_mode)
    caps = k_caps if caps is None else caps
    method = k_method if method is None else method
    block = k_block if block is None else block

    n = need.shape[0]
    count = jnp.sum(need.astype(jnp.int32))

    def full(_):
        return jnp.where(need[:, None], fn(packed), 0.0)

    if enabled == "block":
        return _block_compact_apply(
            fn, need, packed, out_dim, caps, block, full
        )

    cap_sizes = sorted({_round_cap(n, f) for f in caps if 0 < f < 1})
    if not enabled or not cap_sizes or cap_sizes[0] >= n:
        return full(None)

    def make_compact(cap):
        def go(_):
            idx = _compact_indices(need, cap, method)
            valid = (jnp.arange(cap, dtype=jnp.int32) < count)[:, None]
            vals = fn(packed[idx]) * valid
            return jnp.zeros((n, out_dim), vals.dtype).at[idx].add(vals)

        return go

    def build(tiers):
        if not tiers:
            return full
        rest = build(tiers[1:])

        def go(_):
            return jax.lax.cond(count <= tiers[0], make_compact(tiers[0]), rest, None)

        return go

    return build(cap_sizes)(None)


def _block_compact_apply(fn, need, packed, out_dim, caps, block, full):
    """Block-granular compaction: every per-row cost of the per-row path
    becomes per-block. Index build over nb = ceil(n/B) entries; input
    compaction = ONE gather of cap_b wide rows ([nb, B*pd]); re-expansion
    = ONE gather of nb wide rows by each block's cumsum position (clip(
    inclusive_cumsum - 1) points not-needed blocks at an arbitrary
    compacted slot — their rows are zeroed by the final per-row need
    mask). No scatter, no full-width cumsum; fn's own table gathers run
    on cap_b*B rows only."""
    n, pd = packed.shape
    nb = -(-n // block)
    pad = nb * block - n
    need_p = jnp.pad(need, (0, pad))
    packed_p = jnp.pad(packed, ((0, pad), (0, 0)))
    blk_need = jnp.any(need_p.reshape(nb, block), axis=1)
    count_b = jnp.sum(blk_need.astype(jnp.int32))

    cap_sizes = sorted(
        {max(1, min(int(nb * f) + 1, nb)) for f in caps if 0 < f < 1}
    )
    if not cap_sizes or cap_sizes[0] >= nb:
        return full(None)

    packed_wide = packed_p.reshape(nb, block * pd)
    pos = jnp.clip(jnp.cumsum(blk_need.astype(jnp.int32)) - 1, 0, None)

    def make_compact(cap_b):
        def go(_):
            (idx_b,) = jnp.nonzero(blk_need, size=cap_b, fill_value=0)
            rows = packed_wide[idx_b].reshape(cap_b * block, pd)
            vals = fn(rows)  # [cap_b*B, out_dim]
            wide = vals.reshape(cap_b, block * out_dim)
            out = wide[jnp.clip(pos, 0, cap_b - 1)].reshape(
                nb * block, out_dim
            )
            return jnp.where(need_p[:, None], out, 0.0)[:n]

        return go

    def build(tiers):
        if not tiers:
            return full
        rest = build(tiers[1:])

        def go(_):
            return jax.lax.cond(
                count_b <= tiers[0], make_compact(tiers[0]), rest, None
            )

        return go

    return build(cap_sizes)(None)


def weighted_env_packed(
    env: dict,
    packed: jnp.ndarray,
    env_kind: int,
    **kwargs,
) -> jnp.ndarray:
    """weighted_env on pre-packed [n, 6] rows (dirs cols 0:3, weights cols
    3:6). The deferred kernels emit dirs and weights on ADJACENT out rows,
    so a wide-unpermuted out block hands this a contiguous column slice —
    no concatenate copy (the concat costs a full [n, 6] HBM round trip at
    2M rows; round-5 wide-unperm refactor)."""
    from ..scene.envmap import sample_environment
    from .fused_traverse_pallas import _safe_dirs

    def fn(rows):
        return rows[:, 3:6] * sample_environment(
            env, _safe_dirs(rows[:, 0:3]), static_kind=env_kind
        )

    need = jnp.any(packed[:, 3:6] != 0.0, axis=-1)
    return compact_apply(fn, need, packed, **kwargs)


def weighted_env(
    env: dict,
    dirs: jnp.ndarray,
    weights: jnp.ndarray,
    env_kind: int,
    **kwargs,
) -> jnp.ndarray:
    """[n, 3] = weights * sample_environment(env, safe(dirs)), resolved
    compacted over the rows where any weight channel is nonzero — the
    deferred-env combine term (env contributes only on miss; the kernel
    writes zero weights everywhere else)."""
    return weighted_env_packed(
        env, jnp.concatenate([dirs, weights], axis=1), env_kind, **kwargs
    )


def masked_env(
    env: dict,
    dirs: jnp.ndarray,
    need: jnp.ndarray,
    env_kind: int,
    **kwargs,
) -> jnp.ndarray:
    """[n, 3] env radiance where ``need`` (zeros elsewhere) — the
    primary-miss env term, compacted to the rows any sample shows.

    Directions are safe-guarded inside fn: capacity fill slots all point at
    row 0, which may be a dead lane carrying a zero direction (wavefront
    secondary batches); un-guarded that row would produce NaN radiance that
    the ``* valid`` zero-mask cannot cancel (NaN * 0 = NaN) and the scatter
    would poison row 0."""
    from ..scene.envmap import sample_environment
    from .fused_traverse_pallas import _safe_dirs

    def fn(rows):
        return sample_environment(env, _safe_dirs(rows), static_kind=env_kind)

    return compact_apply(fn, need, dirs, **kwargs)


def masked_albedo_packed(
    textures: dict,
    packed: jnp.ndarray,
    need: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """masked_albedo on pre-packed [n, 3] rows (uv cols 0:2, material id
    col 2 as float) — the TEX kernels emit uv and mid on adjacent out
    rows, so a wide-unpermuted out block slices straight into this."""
    from ..scene.textures import sample_albedo

    def fn(rows):
        return sample_albedo(
            textures, rows[:, 2].astype(jnp.int32), rows[:, 0:2]
        )

    return compact_apply(fn, need, packed, **kwargs)


def masked_albedo(
    textures: dict,
    uv: jnp.ndarray,
    mid: jnp.ndarray,
    need: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """[n, 3] albedo-texture sample where ``need`` (zeros elsewhere; the
    combine coefficients are zero there too, so the zero never shows).
    sample_albedo returns 1.0 for untextured materials — preserved on
    needed rows; non-needed rows become 0 instead of 1, which is
    equivalent under the zero coefficients."""
    packed = jnp.concatenate([uv, mid.astype(jnp.float32)[:, None]], axis=1)
    return masked_albedo_packed(textures, packed, need, **kwargs)
