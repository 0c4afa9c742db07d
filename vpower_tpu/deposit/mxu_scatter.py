"""MXU sorted-segment deposit: the TPU scatter-add, as matmuls.

Replaces ``jax.ops.segment_sum`` on the deposition hot path.  XLA
lowers segment_sum to a scatter-add, which TPUs serialize row by row
(~0.94 s for 10M 4-channel updates into a 512^3 grid, measured on
v5e).  This kernel instead expresses the histogram as matrix products
on the MXU — the same idea as the shell-binning one-hot histogram
(``spectrum/power.py``), taken two-level so the one-hot never
materializes at grid width:

* The grid is split into blocks of ``CB = CBH * CBL`` consecutive flat
  cell ids.  A cell's in-block id decomposes as ``local = hi * CBL +
  lo``; its one-hot factorizes into ``oh_hi (K, CBH)`` x ``oh_lo
  (K, CBL)``, and the block histogram is the outer-product contraction
  ``out[c, hi, lo] = sum_k oh_hi[k,hi] * oh_lo[k,lo] * v[c,k]`` — one
  (CBH, K) @ (K, CBL) matmul per channel, entirely on the MXU.
* Particles arrive sorted by cell id in aligned windows of ``K``.  The
  grid enumerates (window, block) PAIRS — every block a window's ids
  touch, plus gap/empty blocks for coverage — with a static bound
  ``n_windows + n_blocks``.  In-kernel range masking (``0 <= local <
  CB``) does all boundary work, so a window split across blocks or a
  block split across windows both fall out for free.
* Exactness: f32 values are split into three bf16 terms (v = v1 + v2 +
  v3, each term exactly representable); each term is folded into the
  hi one-hot and multiplied against the 0/1 lo one-hot, so every
  matmul is a single exact bf16 MXU pass and the f32 accumulation
  reproduces the segment_sum result to f32 rounding (measured <= 7e-8
  relative at 10M particles).  Deterministic: grid order is fixed.

Measured on one v5e chip, 10M particles -> 512^3, 4 channels:
0.097 s vs 0.94 s for sorted ``segment_sum`` (9.7x).

Reference capability replaced: the ``np.add.at`` deposition scatter
(``vpower/interp.py:996-1015``) and Voxelize's C++ scatter loop
(``interp.py:313-320``), re-designed for the MXU rather than ported.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "mxu_supported",
    "mxu_supported_cells",
    "make_deposit_plan",
    "deposit_planned",
    "mxu_deposit_sorted",
    "deposit_offsets_rolled",
    "snake_offsets",
    "DepositPlan",
]

_CBL = 128         # lo one-hot width (lane dim)
_K = 512           # particles per window
# SMEM holds the two scalar-prefetch pair tables (win, blk — 4 B each
# per grid step) and is ~1 MB: keep G_max = n_windows + n_blocks under
# this budget by widening blocks for large id spaces.
_G_BUDGET = 80_000
# Hard per-call ceiling on grid steps: 2 x s32[_G_SEG] prefetch tables
# = 480 KB of the ~1 MB SMEM.  _choose_cbh only bounds the BLOCK count;
# when the WINDOW count dominates (many rows per cell space — e.g. all
# 8 CIC corners of 10M particles in one fused 512^3 plan, w ~ 157k),
# the pair tables are split into segments of _G_SEG steps chained
# in-place through the carry alias (same total work, same result:
# same-block runs split across a segment boundary re-seed from the
# carry, which already holds the earlier segments' partial sums).
_G_SEG = 60_000


def _choose_cbh(n_cells: int):
    """Smallest hi-width in {64,128,256,512} whose block count keeps
    the pair tables inside SMEM; None if none tiles ``n_cells``."""
    for cbh in (64, 128, 256, 512):
        cb = cbh * _CBL
        if n_cells % cb == 0 and n_cells // cb <= _G_BUDGET:
            return cbh
    return None


def mxu_supported_cells(n_cells: int) -> bool:
    """Whether the kernel covers a flat id space: ids must fit int32 and
    the cell count must tile into (CBH, CBL) blocks with SMEM-sized
    pair tables."""
    return _choose_cbh(n_cells) is not None and n_cells + 2**16 < 2**31


def mxu_supported(n_grid: int) -> bool:
    return mxu_supported_cells(n_grid**3)


class DepositPlan(NamedTuple):
    """Sorted-id pair tables, reusable across any number of value
    channels/weightings over the SAME sorted ids (CIC corners, SPH
    offsets, fold phase sweeps)."""

    ids2: jax.Array   # (W, 1, K) i32 sorted ids, sentinel-padded
    win: jax.Array    # (G,) i32 window id per grid step
    blk: jax.Array    # (G,) i32 block id per grid step


def make_deposit_plan(sids: jax.Array, n_cells: int) -> DepositPlan:
    """Build the (window, block) pair tables for ``sids`` (sorted flat
    cell ids over ``n_cells`` cells — any shape's flat id space, cubes
    and sharded slabs alike).  Pure XLA, O(N + n_blocks) work."""
    cbh = _choose_cbh(n_cells)
    cb = cbh * _CBL
    nblk = n_cells // cb
    n = sids.shape[0]
    w = -(-n // _K) + 1          # + one all-sentinel window (pad steps)
    pad = w * _K - n
    ids2 = jnp.pad(sids, (0, pad), constant_values=n_cells).reshape(w, 1, _K)

    fb = jnp.minimum(ids2[:, 0, 0] // cb, nblk - 1)
    lb = jnp.minimum(ids2[:, 0, -1] // cb, nblk - 1)
    lb = lb.at[-1].set(nblk - 1)          # cover trailing blocks
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(fb[1:], lb[:-1] + 1)]
    )
    # start_w covers gap blocks (lb_{w-1}+1 .. fb_w-1) and block-
    # boundary revisits (start_w == lb_{w-1}); both keep the block
    # sequence non-decreasing with same-block steps consecutive.
    nb = lb - start + 1
    cum = jnp.cumsum(nb)
    g_real = cum[-1]
    g_max = w + nblk                       # static bound on pair count
    g = jnp.arange(g_max, dtype=jnp.int32)
    w_g = jnp.minimum(
        jnp.searchsorted(cum, g, side="right").astype(jnp.int32), w - 1
    )
    prev = jnp.where(w_g > 0, cum[jnp.maximum(w_g - 1, 0)], 0)
    b_g = start[w_g] + (g - prev)
    pad_step = g >= g_real                 # -> all-sentinel window
    win = jnp.where(pad_step, w - 1, w_g).astype(jnp.int32)
    blk = jnp.where(
        pad_step, nblk - 1, jnp.clip(b_g, 0, nblk - 1)
    ).astype(jnp.int32)
    return DepositPlan(ids2=ids2, win=win, blk=blk)


def _kernel(win_ref, blk_ref, ids_ref, vals_ref, *rest, n_chan,
            accumulate, cbh):
    if accumulate:
        carry_ref, out_ref = rest
    else:
        (out_ref,) = rest
    g = pl.program_id(0)
    b = blk_ref[g]
    is_first = jnp.logical_or(
        g == 0, b != blk_ref[jnp.maximum(g - 1, 0)]
    )

    cb = cbh * _CBL
    ids = ids_ref[0]                           # (1, K) i32
    local = ids - b * cb
    valid = (local >= 0) & (local < cb)        # masks window/block edges
    localc = jnp.where(valid, local, 0)
    hi = localc // _CBL                        # (1, K)
    lo = localc - hi * _CBL

    hi_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (cbh, _K), 0) == hi
    )                                          # (CBH, K) bool
    lo_col = lo.reshape(_K, 1)
    valid_col = jnp.where(valid, 1, 0).reshape(_K, 1)
    # 0/1 lo one-hot, exact in bf16.  Select in f32 then cast: Mosaic
    # cannot relayout an i1 mask from f32 (8,128) to bf16 (16,128)
    # tiling.
    rhs0 = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (_K, _CBL), 1) == lo_col)
        & (valid_col > 0),
        jnp.float32(1.0), jnp.float32(0.0),
    ).astype(jnp.bfloat16)

    @pl.when(is_first)
    def _():
        # Accumulate mode seeds each block window from the aliased
        # carry (in-place +=); plain mode zero-inits.  Same-block grid
        # steps are consecutive, so the window is live across a run and
        # the carry is read exactly once per block.
        if accumulate:
            out_ref[...] = carry_ref[...]
        else:
            out_ref[...] = jnp.zeros_like(out_ref)

    for c in range(n_chan):
        val = vals_ref[c, 0]                   # (1, K) f32
        # Exact 3-term bf16 split (v = v1+v2+v3, each term bf16-exact);
        # folded into the hi one-hot so every matmul is ONE bf16 MXU
        # pass with exact products and f32 accumulation.
        v1 = val.astype(jnp.bfloat16).astype(jnp.float32)
        r = val - v1
        v2 = r.astype(jnp.bfloat16).astype(jnp.float32)
        v3 = r - v2
        acc = out_ref[c, 0]
        for term in (v1, v2, v3):
            lhs = jnp.where(
                hi_mask, term, jnp.float32(0.0)
            ).astype(jnp.bfloat16)             # (CBH, K)
            acc = acc + jnp.dot(
                lhs, rhs0, preferred_element_type=jnp.float32
            )
        out_ref[c, 0] = acc


def deposit_planned(
    plan: DepositPlan,
    svals: jax.Array,
    n_cells: int,
    interpret: bool = False,
    carry: Optional[jax.Array] = None,
) -> jax.Array:
    """Deposit ``svals`` (N, C) — sorted in the SAME order as the
    plan's ids — into a CHANNELS-FIRST (C, n_cells) flat grid.

    With ``carry`` (same shape as the output), the kernel ACCUMULATES
    in place: the carry buffer is aliased to the output and each block
    window is seeded from it instead of zeros.  Chains of deposits
    (CIC corners, SPH offsets) then keep exactly ONE grid live instead
    of materializing a grid per call."""
    cbh = _choose_cbh(n_cells)
    nblk = n_cells // (cbh * _CBL)
    svals = svals.astype(jnp.float32)   # kernel math is f32/bf16-split
    n_chan = svals.shape[1]
    w = plan.ids2.shape[0]
    pad = w * _K - svals.shape[0]
    vals_t = jnp.pad(svals.T, ((0, 0), (0, pad))).reshape(n_chan, w, 1, _K)
    g_max = int(plan.win.shape[0])
    n_seg = max(1, -(-g_max // _G_SEG))
    if n_seg > 1 and carry is None:
        # multi-segment calls must all accumulate in place (a zero-init
        # second segment would wipe the first's partial sums)
        carry = jnp.zeros((n_chan, n_cells), jnp.float32)
    accumulate = carry is not None

    out_spec = pl.BlockSpec((n_chan, 1, cbh, _CBL),
                            lambda g, win, blk: (0, blk[g], 0, 0))
    in_specs = [
        pl.BlockSpec((1, 1, _K), lambda g, win, blk: (win[g], 0, 0)),
        pl.BlockSpec((n_chan, 1, 1, _K),
                     lambda g, win, blk: (0, win[g], 0, 0)),
    ]
    if accumulate:
        in_specs = in_specs + [out_spec]
        out = carry.astype(jnp.float32).reshape(n_chan, nblk, cbh, _CBL)
    else:
        out = None

    for s in range(n_seg):
        win_s = plan.win[s * _G_SEG:(s + 1) * _G_SEG]
        blk_s = plan.blk[s * _G_SEG:(s + 1) * _G_SEG]
        g_seg = int(win_s.shape[0])
        operands = [win_s, blk_s, plan.ids2, vals_t]
        kwargs = {}
        if accumulate:
            operands.append(out)
            # operand index counts the scalar-prefetch args (win, blk)
            kwargs["input_output_aliases"] = {4: 0}
        out = pl.pallas_call(
            partial(_kernel, n_chan=n_chan, accumulate=accumulate,
                    cbh=cbh),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(g_seg,),
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chan, nblk, cbh, _CBL), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 3 * g_seg * n_chan * cbh * _CBL * _K,
                bytes_accessed=n_cells * n_chan * 4
                + g_seg * _K * (n_chan + 1) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
            **kwargs,
        )(*operands)
    # (C, nblk, CBH, CBL) -> (C, n_cells): flat id = blk*CB + hi*CBL + lo
    return out.reshape(n_chan, n_cells)


def mxu_deposit_sorted(
    sids: jax.Array,
    svals: jax.Array,
    n_grid: int,
    interpret: bool = False,
) -> jax.Array:
    """One-shot cube wrapper: plan + deposit into (C, n, n, n).
    ``sids`` must be sorted."""
    n_cells = n_grid**3
    plan = make_deposit_plan(sids, n_cells)
    out = deposit_planned(plan, svals, n_cells, interpret=interpret)
    return out.reshape(out.shape[0], n_grid, n_grid, n_grid)


def snake_offsets(axis_vals):
    """All 3-D offsets over ``axis_vals`` ordered so consecutive
    entries differ by +-1 on exactly one axis (boustrophedon)."""
    vals = list(axis_vals)
    seq = []
    flip_y = False
    flip_z = False
    for dx in vals:
        for dy in (vals[::-1] if flip_y else vals):
            for dz in (vals[::-1] if flip_z else vals):
                seq.append((dx, dy, dz))
            flip_z = not flip_z
        flip_y = not flip_y
    return seq


def deposit_offsets_rolled(
    plan: DepositPlan,
    svals: jax.Array,
    weight_fn,
    axis_vals,
    n_grid: int,
    interpret: bool = False,
) -> jax.Array:
    """``sum_d roll(deposit(weight_fn(d) * svals), d)`` over the 3-D
    offset lattice ``axis_vals^3`` — the shared shape of CIC corners
    and SPH footprints — with exactly ONE grid live.

    Offsets are visited in snake order in a ROTATING FRAME: with
    ``B_k = roll(T_k, -d_k)`` (T_k the physical partial sum), the
    update is ``B_k = roll(B_{k-1}, d_{k-1} - d_k) + G_k`` — a single
    one-axis +-1 roll per offset — and each ``G_k`` accumulates
    IN PLACE via the kernel's aliased carry.  A naive
    ``sum(roll(...))`` materializes a grid per offset; XLA schedules
    them concurrently and OOMs at 512^3 (observed 23 GB for 27
    offsets)."""
    acc = None
    prev = None
    for d in snake_offsets(axis_vals):
        if prev is not None:
            shift = tuple(p - c for p, c in zip(prev, d))
            for ax, s in enumerate(shift):
                if s:
                    acc = jnp.roll(acc, s, axis=1 + ax)
        w = weight_fn(d)
        acc = deposit_planned(
            plan, svals * w[:, None], n_grid**3,
            interpret=interpret, carry=acc,
        ).reshape(svals.shape[1], n_grid, n_grid, n_grid)
        prev = d
    for ax, s in enumerate(prev):
        if s:
            acc = jnp.roll(acc, s, axis=1 + ax)
    return acc
