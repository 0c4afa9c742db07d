"""Nearest-neighbor (Voronoi) interpolation onto a regular grid.

TPU-native replacement for the reference's ANN/Annoy kd-tree path —
the dominant hot loop of the whole reference pipeline (hours at N=1000,
``scripts/ann_benchmark.py``; ~1-2 M queries/s/core with Annoy,
BASELINE.md).  Instead of N^3 pointer-chasing tree queries
(``vpower/interp.py:1018-1049``, ``parallel_optimized.py:348``), we
compute the discrete Voronoi diagram of the particle set on the grid
with dense, statically-shaped ops:

1. **Seed sort** — one ``lax.sort`` by (cell id, distance-to-center)
   yields the rank-k nearest-to-center particle of every cell; rank-k
   winners land in seed grids via conflict-free scatters.
2. **Multigrid descent** — seeds are min-pooled up a 2x coarsening
   pyramid; the coarsest level is solved exactly by a dense all-pairs
   distance; each finer level upsamples the candidate field, merges
   that level's seeds, and runs stride-2 + stride-1 neighborhood
   sweeps.  On TPU the sweep is a fused Pallas kernel (one HBM pass,
   halo tiles in VMEM — :mod:`vpower_tpu.deposit.nn_pallas`); elsewhere
   a ``lax.scan`` of rolls.
3. **Exact ring refinement** (``exact=True``) — a particle-major
   scatter-min over all cells within ``refine_radius`` rings of each
   particle's cell.  Occupancy-independent: it repairs the residual
   error class of any seed-based scheme (the true NN of a *neighboring*
   cell out-ranked inside its own crowded cell).  Costs XLA scatters,
   so it is the opt-in exactness mode, not the default.

Positions are carried CHANNELS-FIRST ((3, N, N, N), and (k, 3, N, N, N)
for seeds): a trailing length-3 axis forced into materialized layouts
costs up to 40x its logical HBM size under the TPU (8, 128) tile.

Accuracy (measured against brute force, ``tests/test_nn.py``): fast
mode ~0-1e-2 cell misassignments, each bounded by ~a cell diagonal;
exact mode is ZERO-error on uniform occupancies up to 20k
particles/16^3.  On adversarially CLUSTERED configurations (thousands
of particles per cell) a distant void query's true NN can be buried
below every seed rank of its crowded cell — unrecoverable by any
sweep — and the rank-0 seed of the right cell wins instead, so exact
mode's residual error is <= one cell diagonal at a measured <= 5e-3
rate (64^3 stress test).  The reference's production path (Annoy with
a single tree, ``parallel_optimized.py:310``) is far more approximate
than even fast mode; its library path is exact ANN (eps=0,
``interp.py:1027-1034``) — for bit-exact parity in the pathological
clustered regime use the native host kd-tree
(:func:`vpower_tpu.io.native.nn_exact_host`).
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import os
import numpy as np

import jax
import jax.numpy as jnp

from ..core.field import BoxField
from ..core.particles import Particles
from . import mxu_scatter

__all__ = [
    "nn_assign", "nn_brute_force", "nn_gather_grid", "nn_interp_to_field",
]

_COARSEST = 8  # grid size solved by dense all-pairs distance


# ---------------------------------------------------------------------- #
# seeds                                                                  #
# ---------------------------------------------------------------------- #
def _seed_grids(pos: jax.Array, n_grid: int, box_size: float, n_seeds: int,
                valid=None, engine: str = "auto"):
    """Rank-k nearest-to-own-cell-center particle per cell, k < n_seeds.

    Returns ``(seed_idx (k,n,n,n) i32, seed_pos (k,3,n,n,n))`` with
    ``seed_idx == -1`` marking cells holding fewer than k+1 particles.
    ``valid`` masks padding rows out of every seed grid (block-streamed
    callers pad particle sets to a fixed shape).

    On TPU the 4 * n_seeds per-rank XLA scatters (1.16 s at 512^3/10M)
    collapse into ONE MXU deposit (:mod:`.mxu_scatter`): each rank
    contributes masked channels [idx_hi, idx_lo, x, y, z] at its cell —
    at most one winner per (cell, rank), so add == set, and losers add
    exact zeros.  The particle index rides as two small-integer f32
    channels (hi = (i+1) >> 11, lo = (i+1) & 2047 — both exact in f32)
    recombined in int32; (0, 0) decodes to the empty marker -1.
    """
    from .scatter import resolve_engine

    n_cells = n_grid**3
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    ids = (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]
    if valid is not None:
        ids = jnp.where(valid, ids, n_cells)  # sorts last, scatter-dropped
    centers = (ijk.astype(pos.dtype) + 0.5) * cell
    d2 = jnp.sum((pos - centers) ** 2, axis=1)

    pidx = jnp.arange(pos.shape[0], dtype=jnp.int32)
    engine = resolve_engine(engine, n_grid)

    if engine in ("mxu", "mxu_interpret") and pos.dtype == jnp.float32:
        # positions ride as sort payloads: no post-sort gathers at all
        ids_s, _, pidx_s, px, py, pz = jax.lax.sort(
            (ids, d2, pidx, pos[:, 0], pos[:, 1], pos[:, 2]), num_keys=2
        )
        new_seg = ids_s[1:] != ids_s[:-1]
        rank_mask = jnp.concatenate([jnp.array([True]), new_seg])  # k = 0
        enc = pidx_s + 1
        hi = (enc >> 11).astype(jnp.float32)
        lo = (enc & 2047).astype(jnp.float32)
        chans = []
        for k in range(n_seeds):
            m = rank_mask.astype(jnp.float32)
            chans.extend([hi * m, lo * m, px * m, py * m, pz * m])
            if k + 1 < n_seeds:
                rank_mask = jnp.concatenate(
                    [jnp.array([False]), rank_mask[:-1] & ~new_seg]
                )
        plan = mxu_scatter.make_deposit_plan(ids_s, n_cells)
        grid = mxu_scatter.deposit_planned(
            plan, jnp.stack(chans, axis=1), n_cells,
            interpret=engine == "mxu_interpret",
        ).reshape(5 * n_seeds, n_grid, n_grid, n_grid)
        idx_list, pos_list = [], []
        for k in range(n_seeds):
            g = grid[5 * k:5 * k + 5]
            enc_k = (jnp.round(g[0]).astype(jnp.int32) << 11) + \
                jnp.round(g[1]).astype(jnp.int32)
            idx_list.append(enc_k - 1)
            pos_list.append(g[2:5])
        return jnp.stack(idx_list), jnp.stack(pos_list)

    ids_s, _, pidx_s = jax.lax.sort((ids, d2, pidx), num_keys=2)

    new_seg = ids_s[1:] != ids_s[:-1]
    rank_mask = jnp.concatenate([jnp.array([True]), new_seg])  # k = 0
    idx_list, pos_list = [], []
    for k in range(n_seeds):
        target = jnp.where(rank_mask, ids_s, n_cells)  # losers dropped
        seed_idx = jnp.full((n_cells,), -1, jnp.int32).at[target].set(
            pidx_s, mode="drop"
        )
        idx_list.append(seed_idx.reshape((n_grid,) * 3))
        chan = []
        for c in range(3):
            ch = jnp.zeros((n_cells,), pos.dtype).at[target].set(
                pos[pidx_s, c], mode="drop"
            )
            chan.append(ch.reshape((n_grid,) * 3))
        pos_list.append(jnp.stack(chan))
        if k + 1 < n_seeds:
            rank_mask = jnp.concatenate(
                [jnp.array([False]), rank_mask[:-1] & ~new_seg]
            )
    return jnp.stack(idx_list), jnp.stack(pos_list)


def _centers_1d(n_grid: int, box_size: float, dtype) -> jax.Array:
    return (jnp.arange(n_grid, dtype=dtype) + 0.5) * (box_size / n_grid)


def _make_dist2(n_grid: int, box_size: float, periodic: bool, dtype):
    """Distance^2 from each cell center to a channels-first (3, n, n, n)
    candidate position field."""
    axis = _centers_1d(n_grid, box_size, dtype)
    cx = axis[:, None, None]
    cy = axis[None, :, None]
    cz = axis[None, None, :]

    def dist2(p):
        dx = cx - p[0]
        dy = cy - p[1]
        dz = cz - p[2]
        if periodic:
            dx = dx - box_size * jnp.round(dx / box_size)
            dy = dy - box_size * jnp.round(dy / box_size)
            dz = dz - box_size * jnp.round(dz / box_size)
        return dx * dx + dy * dy + dz * dz

    return dist2


def _merge(state, cand_idx, cand_pos, cand_d2):
    bi, bp, bd = state
    take = cand_d2 < bd
    return (
        jnp.where(take, cand_idx, bi),
        jnp.where(take[None], cand_pos, bp),
        jnp.where(take, cand_d2, bd),
    )


# ---------------------------------------------------------------------- #
# sweeps (XLA fallback; the TPU path is the Pallas kernel)               #
# ---------------------------------------------------------------------- #
def _level_shifts(rounds: int) -> List[Tuple[int, int, int]]:
    """Stride-2 then stride-1 26-neighborhoods, ``rounds`` times (a
    coarse-level +-1 error is a fine-level +-2 displacement)."""
    base = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    shifts = []
    for _ in range(rounds):
        shifts.extend([(2 * dx, 2 * dy, 2 * dz) for dx, dy, dz in base])
        shifts.extend(base)
    return shifts


def _sweep(state, dist2, big, shifts, extra_fields=None):
    """Neighbor compares over offset vectors (sequential, so information
    chains across offsets).  ``extra_fields``: pre-stacked per-rank seed
    grids ``(idx (k,n,n,n), pos (k,3,n,n,n))`` compared at every offset
    — the eviction repair (a neighboring query may prefer a candidate
    that lost inside its own cell)."""
    xi, xp = extra_fields if extra_fields is not None else (None, None)

    def body(st, sv):
        shift = (sv[0], sv[1], sv[2])
        ci = jnp.roll(st[0], shift, axis=(0, 1, 2))
        cp = jnp.roll(st[1], shift, axis=(1, 2, 3))
        cd = jnp.where(ci >= 0, dist2(cp), big)
        st = _merge(st, ci, cp, cd)
        if xi is not None:
            for k in range(xi.shape[0]):
                ri = jnp.roll(xi[k], shift, axis=(0, 1, 2))
                rp = jnp.roll(xp[k], shift, axis=(1, 2, 3))
                cd = jnp.where(ri >= 0, dist2(rp), big)
                st = _merge(st, ri, rp, cd)
        return st, None

    state, _ = jax.lax.scan(body, state, jnp.asarray(shifts, jnp.int32))
    return state


def _coarsest_exact(seed_idx, seed_pos, n_grid, box_size, periodic, big):
    """Exact NN at the coarsest level by dense all-pairs distance:
    every cell against every coarsest-level seed particle (<= k * 8^3
    candidates — one small matmul-shaped op)."""
    dtype = seed_pos.dtype
    k = seed_idx.shape[0]
    cand_idx = seed_idx.reshape(-1)  # (k n^3,)
    cand_pos = seed_pos.transpose(0, 2, 3, 4, 1).reshape(-1, 3)
    axis = _centers_1d(n_grid, box_size, dtype)
    cx, cy, cz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    centers = jnp.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)
    d = centers[:, None, :] - cand_pos[None, :, :]
    if periodic:
        d = d - box_size * jnp.round(d / box_size)
    d2 = jnp.sum(d * d, axis=-1)
    d2 = jnp.where(cand_idx[None, :] >= 0, d2, big)
    best = jnp.argmin(d2, axis=1)
    best_idx = cand_idx[best].reshape((n_grid,) * 3)
    best_pos = cand_pos[best].reshape((n_grid,) * 3 + (3,)).transpose(3, 0, 1, 2)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0].reshape(
        (n_grid,) * 3
    )
    return best_idx, best_pos, best_d2


def _parent_dist2(n_fine: int, box_size: float, periodic: bool, dtype):
    """Distance^2 from each FINE candidate position (channels-first) to
    the center of the COARSE (2x) cell containing that fine cell."""
    cell = box_size / n_fine
    idx = jnp.arange(n_fine, dtype=jnp.int32)
    axis = ((idx // 2).astype(dtype) + 0.5) * (2.0 * cell)
    cx = axis[:, None, None]
    cy = axis[None, :, None]
    cz = axis[None, None, :]

    def dist2(p):
        dx = cx - p[0]
        dy = cy - p[1]
        dz = cz - p[2]
        if periodic:
            dx = dx - box_size * jnp.round(dx / box_size)
            dy = dy - box_size * jnp.round(dy / box_size)
            dz = dz - box_size * jnp.round(dz / box_size)
        return dx * dx + dy * dy + dz * dz

    return dist2


def _win_min(x):
    """2x2x2 stride-2 min-pool (one fused XLA reduce_window)."""
    return jax.lax.reduce_window(
        x, jnp.asarray(jnp.iinfo(jnp.int32).max if x.dtype == jnp.int32
                       else jnp.finfo(x.dtype).max, x.dtype),
        jax.lax.min, (2, 2, 2), (2, 2, 2), "VALID",
    )


def _win_max(x):
    neg = jnp.asarray(jnp.iinfo(jnp.int32).min if x.dtype == jnp.int32
                      else -jnp.finfo(x.dtype).max, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (2, 2, 2), (2, 2, 2), "VALID"
    )


def _upsample_cube(x):
    for ax in (0, 1, 2):
        idx = jnp.arange(2 * x.shape[ax], dtype=jnp.int32) // 2
        x = jnp.take(x, idx, axis=ax)
    return x


def _pool_seeds(seed_idx, seed_pos, parent_dist2, n_seeds, big):
    """Min-pool seed candidates over 2x2x2 blocks, re-scored against the
    COARSE cell centers, keeping the ``n_seeds`` best per coarse cell.

    Mechanism: pack each fine candidate's coarse-center d2 into sortable
    int32 bits (monotonic for non-negative floats), take the block
    minimum with a fused ``reduce_window``, then recover the winner's
    (idx, pos) by masking fine cells that match the upsampled winning
    bits and max-pooling the masked fields.  Rank r+1 masks out rank
    r's winner and repeats.  Everything is dense window ops — no
    strided lane slicing (slow relayouts), no argsort, no scatter.
    """
    k = seed_idx.shape[0]
    # packed d2 bits per rank, at fine resolution
    d2 = jnp.stack([
        jnp.where(seed_idx[r] >= 0, parent_dist2(seed_pos[r]), big)
        for r in range(k)
    ])
    packed = jax.lax.bitcast_convert_type(d2, jnp.int32)

    out_idx, out_pos = [], []
    bigbits = jax.lax.bitcast_convert_type(jnp.asarray(big), jnp.int32)
    for _ in range(n_seeds):
        flat_min = packed[0]
        for r in range(1, k):
            flat_min = jnp.minimum(flat_min, packed[r])
        win = _win_min(flat_min)                      # (m, m, m) winner bits
        win_f = _upsample_cube(win)                   # back to fine grid
        mask = packed == win_f[None]                  # (k, n, n, n)
        # winner fields via masked max-pool
        mi = jnp.full_like(seed_idx[0], -1)
        mp = [jnp.full_like(seed_pos[0][0], -big) for _ in range(3)]
        for r in range(k):
            mi = jnp.maximum(mi, jnp.where(mask[r], seed_idx[r], -1))
            for c in range(3):
                mp[c] = jnp.maximum(
                    mp[c], jnp.where(mask[r], seed_pos[r][c], -big)
                )
        out_idx.append(
            jnp.where(win < bigbits, _win_max(mi), -1)
        )
        out_pos.append(jnp.stack([_win_max(c) for c in mp]))
        # mask the selected winner out for the next rank (first match
        # only is unnecessary: duplicate-bit candidates are measure-zero)
        packed = jnp.where(mask, jnp.iinfo(jnp.int32).max, packed)
    return jnp.stack(out_idx), jnp.stack(out_pos)


def _upsample(state):
    """2x nearest upsampling via per-axis gathers (``jnp.repeat`` would
    materialize a (..., n, 2) intermediate — see the tiling note)."""
    bi, bp, _ = state

    def up(x, axes):
        for ax in axes:
            idx = jnp.arange(2 * x.shape[ax], dtype=jnp.int32) // 2
            x = jnp.take(x, idx, axis=ax)
        return x

    return up(bi, (0, 1, 2)), up(bp, (1, 2, 3))


# ---------------------------------------------------------------------- #
# value-carry pipeline                                                   #
# ---------------------------------------------------------------------- #
# The descent above answers "WHICH particle is nearest" (int32 indices),
# which forces a final O(N^3)-row ``vec[idx]`` gather to turn the answer
# into field values — 1.7 s of the 3.95 s 512^3 headline at XLA's ~80 M
# gather-rows/s, independent of row width.  The variants below instead
# carry the particle's PAYLOAD (e.g. [vx, vy, vz, rho]) through every
# stage as extra f32 channels, so the descent's output IS the field and
# no gather ever happens.  Channel convention everywhere:
#   [x, y, z, payload_0..payload_{V-1}, occ]  — C = V + 4 channels,
# with occ = 1.0 marking a real candidate (replaces the idx >= 0 test;
# positions cannot encode validity because the periodic minimum-image
# metric wraps any sentinel back into the box).


def _seed_grids_vals(pos: jax.Array, vals: jax.Array, n_grid: int,
                     box_size: float, n_seeds: int, valid=None,
                     engine: str = "auto"):
    """Rank-k nearest-to-center seeds carrying payload channels.

    Returns ``(k, C, n, n, n)`` with C = vals.shape[1] + 4; empty cells
    are all-zero (occ = 0).  Same one-MXU-deposit trick as
    :func:`_seed_grids`, minus the index encode/decode channels.
    """
    from .scatter import resolve_engine

    n_v = vals.shape[1]
    n_cells = n_grid**3
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    ids = (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]
    if valid is not None:
        ids = jnp.where(valid, ids, n_cells)  # sorts last, scatter-dropped
    centers = (ijk.astype(pos.dtype) + 0.5) * cell
    d2 = jnp.sum((pos - centers) ** 2, axis=1)
    pidx = jnp.arange(pos.shape[0], dtype=jnp.int32)
    engine = resolve_engine(engine, n_grid)
    n_ch = n_v + 4

    if engine in ("mxu", "mxu_interpret") and pos.dtype == jnp.float32:
        cols = [pos[:, 0], pos[:, 1], pos[:, 2]] + \
            [vals[:, c] for c in range(n_v)]
        res = jax.lax.sort((ids, d2) + tuple(cols), num_keys=2)
        ids_s = res[0]
        cols_s = res[2:]
        new_seg = ids_s[1:] != ids_s[:-1]
        rank_mask = jnp.concatenate([jnp.array([True]), new_seg])  # k = 0
        chans = []
        for k in range(n_seeds):
            m = rank_mask.astype(jnp.float32)
            chans.extend([c * m for c in cols_s])
            chans.append(m)  # occ: the winner contributes exactly 1.0
            if k + 1 < n_seeds:
                rank_mask = jnp.concatenate(
                    [jnp.array([False]), rank_mask[:-1] & ~new_seg]
                )
        plan = mxu_scatter.make_deposit_plan(ids_s, n_cells)
        grid = mxu_scatter.deposit_planned(
            plan, jnp.stack(chans, axis=1), n_cells,
            interpret=engine == "mxu_interpret",
        ).reshape(n_seeds, n_ch, n_grid, n_grid, n_grid)
        return grid

    ids_s, _, pidx_s = jax.lax.sort((ids, d2, pidx), num_keys=2)
    new_seg = ids_s[1:] != ids_s[:-1]
    rank_mask = jnp.concatenate([jnp.array([True]), new_seg])
    cols = [pos[:, 0], pos[:, 1], pos[:, 2]] + \
        [vals[:, c] for c in range(n_v)] + \
        [jnp.ones((pos.shape[0],), pos.dtype)]
    out = []
    for k in range(n_seeds):
        target = jnp.where(rank_mask, ids_s, n_cells)  # losers dropped
        chan = []
        for col in cols:
            ch = jnp.zeros((n_cells,), pos.dtype).at[target].set(
                col[pidx_s], mode="drop"
            )
            chan.append(ch.reshape((n_grid,) * 3))
        out.append(jnp.stack(chan))
        if k + 1 < n_seeds:
            rank_mask = jnp.concatenate(
                [jnp.array([False]), rank_mask[:-1] & ~new_seg]
            )
    return jnp.stack(out)


def _pool_seeds_vals(seed_ch, parent_dist2, n_seeds, big):
    """:func:`_pool_seeds` for value-carry seeds: min-pool (k, C, n^3)
    candidates over 2x2x2 blocks re-scored against coarse centers, all
    channels recovered by the same packed-bits masked-max-pool trick
    (payload channels may be negative — the -big filler handles that)."""
    k, n_ch = seed_ch.shape[0], seed_ch.shape[1]
    d2 = jnp.stack([
        jnp.where(seed_ch[r, -1] > 0.5, parent_dist2(seed_ch[r, :3]), big)
        for r in range(k)
    ])
    packed = jax.lax.bitcast_convert_type(d2, jnp.int32)

    out = []
    bigbits = jax.lax.bitcast_convert_type(jnp.asarray(big), jnp.int32)
    for _ in range(n_seeds):
        flat_min = packed[0]
        for r in range(1, k):
            flat_min = jnp.minimum(flat_min, packed[r])
        win = _win_min(flat_min)
        win_f = _upsample_cube(win)
        mask = packed == win_f[None]
        ch_out = []
        valid = win < bigbits
        for c in range(n_ch):
            mc = jnp.full_like(seed_ch[0, 0], -big)
            for r in range(k):
                mc = jnp.maximum(mc, jnp.where(mask[r], seed_ch[r, c], -big))
            ch_out.append(jnp.where(valid, _win_max(mc), 0.0))
        out.append(jnp.stack(ch_out))
        packed = jnp.where(mask, jnp.iinfo(jnp.int32).max, packed)
    return jnp.stack(out)


def _coarsest_exact_vals(seed_ch, n_grid, box_size, periodic, big):
    """Dense all-pairs NN at the coarsest level, value-carry layout."""
    dtype = seed_ch.dtype
    n_ch = seed_ch.shape[1]
    cand = seed_ch.transpose(0, 2, 3, 4, 1).reshape(-1, n_ch)  # (k n^3, C)
    axis = _centers_1d(n_grid, box_size, dtype)
    cx, cy, cz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    centers = jnp.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)
    d = centers[:, None, :] - cand[None, :, :3]
    if periodic:
        d = d - box_size * jnp.round(d / box_size)
    d2 = jnp.sum(d * d, axis=-1)
    d2 = jnp.where(cand[None, :, -1] > 0.5, d2, big)
    best = jnp.argmin(d2, axis=1)
    best_ch = cand[best].T.reshape((n_ch,) + (n_grid,) * 3)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0].reshape(
        (n_grid,) * 3
    )
    return best_ch, best_d2


def _sweep_vals(state, dist2, big, shifts, seed_ch):
    """XLA fallback sweep in the value-carry layout; state is
    ``(channels (C, n, n, n), d2 (n, n, n))``."""
    k = seed_ch.shape[0]

    def merge_cand(ch, d, cch):
        cd = jnp.where(cch[-1] > 0.5, dist2(cch[:3]), big)
        take = cd < d
        return jnp.where(take[None], cch, ch), jnp.where(take, cd, d)

    def body(st, sv):
        ch, d = st
        shift = (sv[0], sv[1], sv[2])
        ch, d = merge_cand(ch, d, jnp.roll(ch, shift, axis=(1, 2, 3)))
        for r in range(k):
            ch, d = merge_cand(
                ch, d, jnp.roll(seed_ch[r], shift, axis=(1, 2, 3))
            )
        return (ch, d), None

    state, _ = jax.lax.scan(body, state, jnp.asarray(shifts, jnp.int32))
    return state


def _upsample_vals(ch):
    for ax in (1, 2, 3):
        idx = jnp.arange(2 * ch.shape[ax], dtype=jnp.int32) // 2
        ch = jnp.take(ch, idx, axis=ax)
    return ch


def _premerge_inplace(ch, sc0, n_grid, box_size, periodic, big):
    """Merge a single seed-rank field into the (occ-less) state at its
    own cell, slab-by-slab IN PLACE: an x-slab ``fori_loop`` of
    ``dynamic_update_slice`` keeps the merged state in ``ch``'s own
    buffer, so the peak at the finest level is seeds + one state copy
    instead of seeds + state + merged (~4 GB less at 512^3 — the margin
    between fitting one chip's HBM and not)."""
    dtype = ch.dtype
    n_slab = 8 if n_grid % 8 == 0 else 1
    sx = n_grid // n_slab
    axis = _centers_1d(n_grid, box_size, dtype)

    def body(i, ch):
        x0 = i * sx
        chs = jax.lax.dynamic_slice(
            ch, (0, x0, 0, 0), (ch.shape[0], sx, n_grid, n_grid)
        )
        scs = jax.lax.dynamic_slice(
            sc0, (0, x0, 0, 0), (sc0.shape[0], sx, n_grid, n_grid)
        )
        cx = jax.lax.dynamic_slice(axis, (x0,), (sx,))[:, None, None]
        cy = axis[None, :, None]
        cz = axis[None, None, :]

        def d2(p):
            dx = cx - p[0]
            dy = cy - p[1]
            dz = cz - p[2]
            if periodic:
                dx = dx - box_size * jnp.round(dx / box_size)
                dy = dy - box_size * jnp.round(dy / box_size)
                dz = dz - box_size * jnp.round(dz / box_size)
            return dx * dx + dy * dy + dz * dz

        cd = jnp.where(scs[-1] > 0.5, d2(scs[:3]), big)
        take = (cd < d2(chs[:3]))[None]
        merged = jnp.where(take, scs[:-1], chs)
        return jax.lax.dynamic_update_slice(ch, merged, (0, x0, 0, 0))

    return jax.lax.fori_loop(0, n_slab, body, ch)


def _upsample_vals_mxu(ch):
    """2x nearest upsampling as one-hot expansion matmuls — the MXU
    streams what ``jnp.take``'s gathers walk (the 3-gather
    ``_upsample_vals`` measured 0.17 s / 33 GB accessed at 512^3 —
    ``benchmarks/descent_breakdown.json``).  Bit-exact: each output
    element is a single-term dot (M has exactly one 1 per column), BUT
    only at matmul precision HIGHEST — the TPU default (one bf16 pass)
    rounds the operand to bf16 first (measured 2^-9-scale errors on
    0.6% of elements), and HIGH (bf16x3) still truncates the low
    mantissa segment (measured 2^-17-scale); bf16x6 carries all three
    8-bit segments of the f32 mantissa, each multiplied by an exactly-
    representable 1.0, so the value reconstructs exactly (disjoint
    mantissa segments of one f32 sum without rounding).

    The broadcast-reshape alternative is a trap: anything shaped
    ``(..., m, 2)`` materializes under the TPU (8, 128) tile with the
    2 padded to 128 lanes — a measured 32 GB allocation at 512^3."""
    dtype = ch.dtype
    prec = jax.lax.Precision.HIGHEST

    def expand(m):
        return (
            jnp.arange(m, dtype=jnp.int32)[:, None]
            == jnp.arange(2 * m, dtype=jnp.int32)[None, :] // 2
        ).astype(dtype)

    ch = jnp.einsum("cxyz,xX->cXyz", ch, expand(ch.shape[1]),
                    precision=prec)
    ch = jnp.einsum("cxyz,yY->cxYz", ch, expand(ch.shape[2]),
                    precision=prec)
    return jnp.einsum("cxyz,zZ->cxyZ", ch, expand(ch.shape[3]),
                      precision=prec)


def _premerge_upsampled(state_ch, sc0, n_grid, box_size, periodic, big):
    """MXU nearest-upsample + own-cell rank-0 premerge as one fused
    elementwise consumer: replaces ``_upsample_vals`` (3 gather passes)
    + ``_premerge_inplace`` (a slab-looped full read+write whose
    ``fori_loop`` blocks XLA fusion) — together 0.24 s of the 512^3
    descent (``benchmarks/descent_breakdown.json``).  Bit-identical to
    the sequential pair (asserted by ``tests/test_nn_values.py``)."""
    dtype = state_ch.dtype
    up = _upsample_vals_mxu(state_ch)
    axis = _centers_1d(n_grid, box_size, dtype)
    cx = axis[:, None, None]
    cy = axis[None, :, None]
    cz = axis[None, None, :]

    def d2(px, py, pz):
        dx = cx - px
        dy = cy - py
        dz = cz - pz
        if periodic:
            dx = dx - box_size * jnp.round(dx / box_size)
            dy = dy - box_size * jnp.round(dy / box_size)
            dz = dz - box_size * jnp.round(dz / box_size)
        return dx * dx + dy * dy + dz * dz

    cd_seed = jnp.where(sc0[-1] > 0.5, d2(sc0[0], sc0[1], sc0[2]), big)
    take = cd_seed < d2(up[0], up[1], up[2])
    return jnp.where(take[None], sc0[: state_ch.shape[0]], up)


def _sweep_state_xla(ch, dist2, big, shifts):
    """State-only XLA sweep (pre-merged mode: every candidate valid)."""
    d = dist2(ch[:3])

    def body(st, sv):
        c, dd = st
        cc = jnp.roll(c, (sv[0], sv[1], sv[2]), axis=(1, 2, 3))
        cd = dist2(cc[:3])
        take = cd < dd
        return (jnp.where(take[None], cc, c), jnp.where(take, cd, dd)), None

    (ch, _), _ = jax.lax.scan(body, (ch, d), jnp.asarray(shifts, jnp.int32))
    return ch


# Finest-level policy: above this grid size the k seed fields are merged
# into the state at their own cell BEFORE the sweep and the sweep runs
# state-only.  Rationale: (a) memory — k=2 seed fields of C=8 channels
# at 512^3 are ~11 GB padded, over one chip's HBM on top of the state;
# (b) rank-0 always wins at its own cell (ranks are ordered by own-
# center distance), so the pre-merge loses only the rare neighbor-
# prefers-a-home-loser repairs — sub-cell-bounded errors at a rate
# comparable to fast mode's existing ~1e-3 class (occupancy at these
# sizes is << 1 particle/cell for any realistic Np).  Below the
# threshold the fully-seeded sweep runs unchanged.
_PREMERGE_MIN = 256


# Promoted to default after the on-chip A/B it was gated on: 512^3
# state-only descent 1.514 s (zc=384) -> 1.450 s (zc=512)
# (benchmarks/profile_stages.json, state_zc512_ab_512).  The opt-out
# stays for descriptor-pressure debugging on other parts.
_STATE_ZC512 = os.environ.get("VPOWER_STATE_ZC512", "1") == "1"

# Fuse consecutive sweep passes into one Pallas call (temporal blocking:
# iteration 1 sweeps a reach-extended interior of the VMEM window so
# iteration 2 has correct neighbor values without re-reading HBM).  The
# sweep is DMA-bound, so each fused pair saves nearly a full read+write
# of the n^3 state.  _HALO=4 admits 2 fused iterations of reach-2
# strides.  ``VPOWER_FUSED_SWEEP=0`` opts out (A/B lever).
_FUSED_SWEEP = os.environ.get("VPOWER_FUSED_SWEEP", "1") == "1"

# (The r5 zc=128 fused-seeded reroute A/B lived here; measured SLOWER
# than plain zc=256 single passes — benchmarks/ab_r5.json, 1.705 vs
# 1.558 s — and was then obsoleted outright by the seed-redundancy
# split below: only pass 1 of a seeded level reads the seed fields.)


def _pallas_zc(n: int, state_only: bool = False):
    """z-chunk extent for the value-carry Pallas sweep at grid size
    ``n``, or None when no lane-aligned tiling exists (XLA fallback).

    n % 128 == 0 grids chunk normally (bigger chunk = fewer DMA
    descriptors; the sweep is descriptor-bound — zc=384 measured 0.21 s
    vs 0.28 s at zc=128 on a 384^3 pass).  Other 32-aligned grids run
    one full-z chunk whose halo keeps the DMA lane extent
    128-divisible (``halo_z``: n % 128 == 64 -> 32, == 32 -> 48,
    == 96 -> 16): this puts the 192^3 level of a 384^3 streamed-block
    descent AND the 160^3 level of a 320^3 one on the Pallas path —
    each was, in turn, the single costliest stage of the 2048-range
    pipeline as its XLA fallback (0.61 s of 1.18 s/block at 384^3;
    0.41 s of 0.67 s/block at 320^3).  Capped at 384 to keep the
    seeded sweep's VMEM inside one core (~10 MB at k=2, C=8, wz=448);
    the STATE-ONLY passes (seeds pre-merged, ~4.6 MB at zc=512)
    additionally try zc=512, measured 4% faster end-to-end at 512^3
    (``VPOWER_STATE_ZC512=0`` opts out)."""
    if n % 128 == 0:
        cands = (
            (512, 384, 256, 128)
            if state_only and _STATE_ZC512 else (384, 256, 128)
        )
        for zc in cands:
            if n % zc == 0:
                return zc
    if n % 32 == 0 and 128 < n <= 384:
        return n
    return None


@partial(
    jax.jit,
    static_argnames=(
        "n_grid", "box_size", "periodic", "n_seeds", "rounds", "use_pallas",
        "return_d2",
    ),
)
def nn_gather_grid(
    pos: jax.Array,
    vals: jax.Array,
    n_grid: int,
    box_size: float,
    periodic: bool = True,
    n_seeds: int = 2,
    rounds: int = 1,
    use_pallas: bool = None,
    valid: jax.Array = None,
    return_d2: bool = False,
):
    """``(payload (V, N, N, N), occ ())``: per cell, the payload
    channels of the particle nearest to the cell center, plus a SCALAR
    occupancy flag (1.0 iff any valid particle existed — occupancy is
    spatially uniform because the coarsest-level solve is global, so a
    per-cell channel would only burn an extra N^3 cube of HBM; at 512^3
    that cube was the difference between fitting one chip and not).

    Functionally ``vals[nn_assign(pos, ...)]`` — the reference's
    NN-gather deposition (``interp.py:1018-1049``: ``pyann.nn2`` query
    then ``f[index]``) — but the payload rides the Voronoi multigrid
    descent as extra channels, so the O(N^3)-row gather never happens.
    Exactness class is identical to :func:`nn_assign` fast mode (same
    seeds, same sweeps); for ``exact=True`` semantics use the index path
    + refinement.  ``vals`` is (Np, V) f32; V = 4 ([v, rho]) in the
    production pipelines.
    """
    dtype = pos.dtype
    pos = pos % box_size
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",) and n_grid % 8 == 0
            and n_grid >= 64
        )
    premerge = n_grid >= _PREMERGE_MIN

    levels = [n_grid]
    while levels[-1] > _COARSEST and levels[-1] % 2 == 0:
        levels.append(levels[-1] // 2)

    # In pre-merged mode only rank 0 of the finest level is ever used
    # (it is merged at its own cell, where rank 0 wins by definition);
    # coarser levels regain n_seeds rank diversity from the 8 children
    # per pooling block.
    k_fine = 1 if premerge else n_seeds
    seed_ch = _seed_grids_vals(pos, vals, n_grid, box_size, k_fine,
                               valid=valid)
    n_ch = seed_ch.shape[1]
    dist2_at = {n: _make_dist2(n, box_size, periodic, dtype) for n in levels}
    seeds = {n_grid: seed_ch}
    for n in levels[1:]:
        pd2 = _parent_dist2(n * 2, box_size, periodic, dtype)
        seeds[n] = _pool_seeds_vals(seeds[n * 2], pd2, n_seeds, big)

    n0 = levels[-1]
    state = _coarsest_exact_vals(seeds[n0], n0, box_size, periodic, big)

    for n in reversed(levels[:-1]):
        finest = n == n_grid
        sc = seeds.pop(n)
        if finest and premerge:
            # Fused MXU upsample + own-cell rank-0 merge, WITHOUT the
            # occupancy channel (uniform after the global coarsest
            # solve — a scalar suffices; one less n_grid^3 f32 cube
            # live through the finest level).  Chip A/B vs the
            # sequential gather-upsample + slab premerge: 0.058 vs
            # 0.184 s at 512^3 (``benchmarks/ab_premerge.json``).
            occ_any = jnp.max(sc[0, -1])
            st7 = _premerge_upsampled(
                state[0][:-1], sc[0], n, float(box_size), periodic, big
            )
            del sc
            zc = _pallas_zc(n, state_only=True)
            if use_pallas and zc:
                from .nn_pallas import fit_iters, sweep_tiles_vals

                # temporal blocking: fuse sweep passes pairwise inside
                # the kernel (one HBM read+write per fused pair instead
                # of two — the sweep is DMA-bound, measured ~0.43 s per
                # separate 512^3 pass).  fit_iters: scoped-VMEM budget
                # (the r4 crash class; state-only fits through zc=512)
                max_it = 2 if (_FUSED_SWEEP and periodic) else 1
                max_it = fit_iters(st7.shape[0], 0, zc, max_it)
                left = rounds + 1
                while left > max_it:
                    it = min(max_it, left - 1)  # leave >=1 for payload
                    st7 = sweep_tiles_vals(
                        st7, None, float(box_size), periodic=periodic,
                        has_occ=False, zc=zc, iters=it,
                    )
                    left -= it
                # final pass emits payload channels only (positions are
                # dead past here; 3 fewer output cubes).  When the
                # exactness certificate is requested (:mod:`.nn_window`),
                # the candidate d2 rides out of the same pass as one
                # extra channel — recomputing it from positions would
                # extend st7's HBM lifetime through the pass and tip
                # 512^3 over one chip's HBM.
                pay = sweep_tiles_vals(
                    st7, None, float(box_size), periodic=periodic,
                    has_occ=False, payload_out=True, d2_out=return_d2,
                    zc=zc, iters=left,
                )
                if return_d2:
                    d2_ub = pay[-1]
                    pay = pay[:-1]
            else:
                for _ in range(rounds + 1):
                    st7 = _sweep_state_xla(
                        st7, dist2_at[n], big, _level_shifts(1)
                    )
                pay = st7[3:]
                d2_ub = dist2_at[n](st7[:3]) if return_d2 else None
            if return_d2:
                return pay, occ_any, d2_ub
            return pay, occ_any
        # non-finest (or non-premerged) level: MXU nearest-upsample
        # (bit-exact one-hot matmuls, 4.5x the gather path on chip —
        # ``benchmarks/ab_premerge.json``)
        ch = _upsample_vals_mxu(state[0])
        zc = _pallas_zc(n)
        if use_pallas and zc:
            from .nn_pallas import fit_iters, halo_z, sweep_tiles_vals, \
                wrap_pad

            # Only PASS 1 needs the seed fields.  The merge is a
            # monotone strict-less min over an offset set identical in
            # every pass, the seed fields never change, and every
            # candidate is scored against the SAME cell center c — so
            # pass 1's output at c already lower-bounds every
            # seeds[r][c+d] candidate any later pass could re-offer,
            # and the re-read can never win.  Passes 2+ are therefore
            # state-only (bit-identical result, asserted by
            # tests/test_nn_pallas.py::test_later_pass_seed_redundancy),
            # which drops each later pass's read traffic from
            # (1 + k) fields to 1 and frees the scoped VMEM that the
            # r4 fused-seeded attempt blew (BENCH_r04 19.93 MB OOM).
            kt_p = wrap_pad(
                sc.reshape(sc.shape[0] * n_ch, n, n, n), 1, halo_z(zc)
            )
            ch = sweep_tiles_vals(
                ch, kt_p, float(box_size), periodic=periodic,
                seeds_prepadded=True, zc=zc, iters=1,
            )
            left = rounds
            max_it = 2 if (_FUSED_SWEEP and periodic) else 1
            max_it = fit_iters(n_ch, 0, zc, max_it)
            while left > 0:
                it = min(max_it, left)
                ch = sweep_tiles_vals(
                    ch, None, float(box_size), periodic=periodic,
                    zc=zc, iters=it,
                )
                left -= it
            state = (ch, None)
        else:
            d = jnp.where(ch[-1] > 0.5, dist2_at[n](ch[:3]), big)
            state = (ch, d)
            for r in range(sc.shape[0]):
                cd = jnp.where(sc[r, -1] > 0.5, dist2_at[n](sc[r, :3]), big)
                take = cd < state[1]
                state = (
                    jnp.where(take[None], sc[r], state[0]),
                    jnp.where(take, cd, state[1]),
                )
            state = _sweep_vals(
                state, dist2_at[n], big, _level_shifts(rounds), sc
            )

    # payload channels + uniform occupancy reduced to its scalar
    if return_d2:
        d2_ub = jnp.where(
            state[0][-1] > 0.5, dist2_at[n_grid](state[0][:3]), big
        )
        return state[0][3:-1], jnp.max(state[0][-1]), d2_ub
    return state[0][3:-1], jnp.max(state[0][-1])


# ---------------------------------------------------------------------- #
# exact refinement                                                       #
# ---------------------------------------------------------------------- #
def _ring_refine(
    pos: jax.Array,
    n_grid: int,
    box_size: float,
    periodic: bool,
    radius: int,
    best_idx: jax.Array,
    best_d2: jax.Array,
    valid=None,
):
    """Exact particle-major correction: every particle scatter-mins its
    distance into all cells within ``radius`` rings of its own cell, then
    winners are resolved by a second scatter (lowest index on ties —
    deterministic).  Particle-major means per-cell occupancy never
    matters, unlike any candidate-list scheme."""
    n_cells = n_grid**3
    dtype = pos.dtype
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    pidx = jnp.arange(pos.shape[0], dtype=jnp.int32)

    offsets = np.asarray(
        [
            (dx, dy, dz)
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
            for dz in range(-radius, radius + 1)
        ],
        np.int32,
    )
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def target_and_d2(off):
        tgt = ijk + off[None, :]
        center = (tgt.astype(dtype) + 0.5) * cell
        delta = pos - center
        if periodic:
            tgt_ids = tgt % n_grid
            delta = delta - box_size * jnp.round(delta / box_size)
            flat = (tgt_ids[:, 0] * n_grid + tgt_ids[:, 1]) * n_grid + tgt_ids[:, 2]
        else:
            inside = jnp.all((tgt >= 0) & (tgt < n_grid), axis=1)
            flat = (tgt[:, 0] * n_grid + tgt[:, 1]) * n_grid + tgt[:, 2]
            flat = jnp.where(inside, flat, n_cells)  # dropped
        if valid is not None:
            flat = jnp.where(valid, flat, n_cells)  # padding rows dropped
        return flat, jnp.sum(delta * delta, axis=1)

    def scatter_d2(d2min, off):
        flat, d2 = target_and_d2(off)
        return d2min.at[flat].min(d2, mode="drop"), None

    d2min = jnp.full((n_cells,), big, dtype)
    d2min, _ = jax.lax.scan(scatter_d2, d2min, jnp.asarray(offsets))

    def scatter_idx(idxmin, off):
        flat, d2 = target_and_d2(off)
        win = d2 <= d2min[jnp.clip(flat, 0, n_cells - 1)]
        tgt = jnp.where(win, flat, n_cells)
        return idxmin.at[tgt].min(pidx, mode="drop"), None

    idxmin = jnp.full((n_cells,), np.iinfo(np.int32).max, jnp.int32)
    idxmin, _ = jax.lax.scan(scatter_idx, idxmin, jnp.asarray(offsets))

    d2min = d2min.reshape((n_grid,) * 3)
    idxmin = idxmin.reshape((n_grid,) * 3)
    take = d2min < best_d2
    return (
        jnp.where(take, idxmin, best_idx),
        jnp.where(take, d2min, best_d2),
    )


# ---------------------------------------------------------------------- #
# main entry                                                             #
# ---------------------------------------------------------------------- #
@partial(
    jax.jit,
    static_argnames=(
        "n_grid", "box_size", "periodic", "n_seeds", "rounds",
        "refine_radius", "use_pallas",
    ),
)
def nn_assign(
    pos: jax.Array,
    n_grid: int,
    box_size: float,
    periodic: bool = True,
    n_seeds: int = 2,
    rounds: int = 1,
    refine_radius: int = 0,
    use_pallas: bool = None,
    valid: jax.Array = None,
) -> jax.Array:
    """(N, N, N) int32 grid: index of the particle nearest to each cell
    center — the answer the reference obtained from ``pyann.nn2(k=1)``
    (``interp.py:1027-1034``) / ``Annoy.get_nns_by_vector(n=1)``
    (``parallel_optimized.py:348``).

    ``periodic`` selects the distance metric: minimum-image (True) or
    open-box (False, the reference ANN behavior).  ``use_pallas=None``
    auto-selects the fused TPU sweep kernel on TPU backends for grids
    that fit its tiling.

    ``refine_radius > 0`` adds the particle-major exact correction —
    exact whenever the true NN lies within that many cells of the
    query, at the cost of XLA scatters.

    ``valid`` (N,) bool excludes padding rows entirely (fixed-shape
    per-block candidate sets in the streamed folded pipeline); cells
    with no reachable valid particle return -1.
    """
    dtype = pos.dtype
    pos = pos % box_size
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",) and n_grid % 8 == 0
            and n_grid >= 64
        )

    levels = [n_grid]
    while levels[-1] > _COARSEST and levels[-1] % 2 == 0:
        levels.append(levels[-1] // 2)

    seed_idx, seed_pos = _seed_grids(pos, n_grid, box_size, n_seeds,
                                     valid=valid)
    dist2_at = {n: _make_dist2(n, box_size, periodic, dtype) for n in levels}
    seeds = {n_grid: (seed_idx, seed_pos)}
    for n in levels[1:]:
        si, sp = seeds[n * 2]
        pd2 = _parent_dist2(n * 2, box_size, periodic, dtype)
        seeds[n] = _pool_seeds(si, sp, pd2, n_seeds, big)

    # Coarsest level: exact dense NN against all coarsest seeds.
    n0 = levels[-1]
    si, sp = seeds[n0]
    state = _coarsest_exact(si, sp, n0, box_size, periodic, big)

    # Descend: upsample, merge level seeds, repair sweeps.
    for n in reversed(levels[:-1]):
        level_rounds = rounds
        bi, bp = _upsample(state)
        si, sp = seeds.pop(n)
        # the kernel's z axis must fill whole 128-lane tiles
        if use_pallas and n % 128 == 0:
            from .nn_pallas import sweep_tiles, wrap_pad

            ki_p = wrap_pad(si, 1)
            kp_p = wrap_pad(sp.reshape(si.shape[0] * 3, n, n, n), 1)
            # the kernel compares candidates in parallel (no in-pass
            # chaining like the scan sweep), so give it one extra pass —
            # each pass is a single cheap HBM sweep
            # zc=256 where it divides n: 2x fewer, 2x larger DMA rows
            # than zc=128 — the sweep is DMA-descriptor-bound (measured
            # 2.24 -> 1.85 s nn_assign at 512^3); zc=512 overflows VMEM.
            zc = 256 if n % 256 == 0 else 128
            # only pass 1 reads the seed fields; re-offering the
            # unchanged seeds in later passes is provably redundant
            # (strict-less min over the same offset set, scored against
            # the same centers — see the value-carry split above)
            bi, bp, _ = sweep_tiles(
                bi, bp, ki_p, kp_p, float(box_size), periodic=periodic,
                seeds_prepadded=True, zc=zc,
            )
            for _ in range(level_rounds):
                bi, bp, _ = sweep_tiles(
                    bi, bp, None, None, float(box_size),
                    periodic=periodic, zc=zc,
                )
            bd = jnp.where(bi >= 0, dist2_at[n](bp), big)
            state = (bi, bp, bd)
        else:
            bd = jnp.where(bi >= 0, dist2_at[n](bp), big)
            state = (bi, bp, bd)
            for k in range(si.shape[0]):
                sd_k = jnp.where(si[k] >= 0, dist2_at[n](sp[k]), big)
                state = _merge(state, si[k], sp[k], sd_k)
            state = _sweep(
                state, dist2_at[n], big, _level_shifts(level_rounds), (si, sp)
            )

    best_idx, _, best_d2 = state
    if refine_radius > 0:
        best_idx, best_d2 = _ring_refine(
            pos, n_grid, box_size, periodic, refine_radius, best_idx, best_d2,
            valid=valid,
        )
    return best_idx


def nn_brute_force(
    pos: jax.Array, n_grid: int, box_size: float, periodic: bool = True
) -> jax.Array:
    """Exact O(N^3 * Np) reference (tests only) — the ground truth the
    reference got from exact ANN with eps=0 (``interp.py:246-277``)."""
    cell = box_size / n_grid
    axis = (jnp.arange(n_grid, dtype=pos.dtype) + 0.5) * cell
    xx, yy, zz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    centers = jnp.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)

    def one(c):
        d = c[None, :] - pos
        if periodic:
            d = d - box_size * jnp.round(d / box_size)
        return jnp.argmin(jnp.sum(d * d, axis=1)).astype(jnp.int32)

    return jax.lax.map(one, centers).reshape((n_grid,) * 3)


def nn_velocity_grid(
    particles: Particles,
    n_grid: int,
    periodic: bool = True,
) -> jax.Array:
    """CHANNELS-FIRST (3, n, n, n) velocity cube: each cell takes the
    velocity of its nearest particle — nothing else.

    The velocity-spectrum fast path: for a k=1 NN gather the gathered
    particle's ``(rho v) / rho`` IS its velocity, and the velocity
    power spectrum never reads the mass cube, so carrying ``rho``
    through the Voronoi descent (as :func:`nn_interp_to_field` must,
    to build ``BoxField.mass``) is pure HBM traffic — one of seven
    state channels at every sweep of every pyramid level.  The
    reference's canonical distributed scripts gather exactly this
    3-vector (``parallel_optimized.py:348-356`` fills velocity query
    queues only); the library path's ``[rho v, rho]`` + divide
    (``interp.py:272-273``) exists for the mass product we skip here.
    Empty cells (no valid particle anywhere — occupancy is global,
    see :func:`nn_gather_grid`) come back zero.
    """
    g, occ = nn_gather_grid(
        particles.pos, particles.vel.astype(jnp.float32), n_grid,
        particles.box_size, periodic=periodic,
    )
    return jnp.where(occ > 0.5, g, 0.0)


def nn_interp_to_field(
    particles: Particles,
    n_grid: int,
    periodic: bool = True,
    exact: bool = False,
) -> BoxField:
    """NN-interpolate ``[rho*v, rho]`` onto the grid and form a BoxField.

    Reference semantics (``GasParticles.ann_interp_to_field``,
    ``interp.py:246-277``): gather the nearest particle's
    density-velocity vector per cell, then ``v = (rho v) / rho`` and
    ``mass = rho * Lcell^3``.

    ``exact=True`` routes to the provably-exact sorted-segment window
    sweep (:func:`vpower_tpu.deposit.nn_window.nn_window_gather`) for
    grids its tiling fits (n_grid % 64 == 0) — genuinely exact NN on
    one chip at production sizes, matching the reference library's
    exact-ANN behavior (eps=0) including pathological clustering; other
    grids fall back to three-rank seeding plus the particle-major
    radius-2 refinement.  The default fast mode has a measured <~1e-3
    sub-cell-bounded misassignment rate — still far more accurate than
    the reference's production Annoy single-tree path.

    The fast path carries ``[v, rho]`` through the Voronoi descent
    (:func:`nn_gather_grid`) so no post-assignment gather runs; for a
    single gathered particle ``(rho v) / rho == v`` exactly, so the
    result matches the reference's division semantics bit-for-bit.
    """
    cell = particles.box_size / n_grid
    if not exact:
        vals = jnp.concatenate(
            [particles.vel, particles.density[:, None]], axis=1
        ).astype(jnp.float32)
        g, occ = nn_gather_grid(
            particles.pos, vals, n_grid, particles.box_size,
            periodic=periodic,
        )
        valid = (occ > 0.5) & (g[3] > 0)
        rho = jnp.where(valid, g[3], 0.0)
        v_grid = jnp.where(valid[None], g[:3], 0.0)
        return BoxField(velocity=v_grid, mass=rho * cell**3, cell_size=cell)

    if n_grid % 64 == 0:
        from .nn_window import nn_window_gather

        vals = particles.density_velocity_vector().astype(jnp.float32)
        pay, _, occ = nn_window_gather(
            particles.pos, vals, n_grid, particles.box_size,
            periodic=periodic,
        )
        rho = pay[3]
        valid = (occ > 0.5) & (rho > 0)
        safe = jnp.where(rho > 0, rho, 1.0)
        v_grid = jnp.where(valid[None], pay[:3] / safe, 0.0)
        mass = jnp.where(valid, rho, 0.0) * cell**3
        return BoxField(velocity=v_grid, mass=mass, cell_size=cell)

    idx = nn_assign(
        particles.pos, n_grid, particles.box_size,
        periodic=periodic,
        n_seeds=3,
        rounds=2,
        refine_radius=2,
    )
    vec = particles.density_velocity_vector()
    grid = vec[idx]  # (N, N, N, 4) gather — fused into the stack below
    rho = grid[..., 3]
    safe = jnp.where(rho > 0, rho, 1.0)
    valid = rho > 0
    v_grid = jnp.stack([
        jnp.where(valid, grid[..., c] / safe, 0.0) for c in range(3)
    ])  # CHANNELS-FIRST (TPU layout, see core.field)
    return BoxField(velocity=v_grid, mass=rho * cell**3, cell_size=cell)
