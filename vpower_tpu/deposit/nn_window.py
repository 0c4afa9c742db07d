"""Provably-exact nearest-neighbor deposition: sorted-segment window sweep.

TPU-native replacement for the reference's *exact* ANN path (eps=0 k=1
kd-tree queries, ``/root/reference/vpower/interp.py:1027-1034``) at
production grid sizes — the regime where the particle-major ring
refinement of :mod:`.nn` (XLA scatters) exceeds one chip's HBM at 512^3
and is approximate on adversarially clustered inputs.

Scheme (three chained passes over one Pallas kernel):

1. **Seed** — the fast multigrid descent
   (:func:`vpower_tpu.deposit.nn.nn_gather_grid` with ``return_d2`` and
   ZERO payload channels — the cheap d2-only configuration) yields, per
   query cell, the distance to a real particle — a valid *upper bound*
   r_ub on the true NN distance.  The seed payload is never needed: the
   nudged bound guarantees every cell is overwritten by a real
   candidate during the passes.
2. **Halo requirement** — the grid is tiled (8, 8, zc) cells; a tile's
   candidate window must cover every query's ball(q, r_ub).  Per query,
   the needed halo is ``ceil(r_ub - dist(q, nearest tile face))``; the
   per-tile max decides which pass serves the tile.
3. **Candidate spans** — particles are replicated into the tiles whose
   halo-extended extent contains them (at most one neighbor tile per
   axis for halo <= half tile) and sorted by tile id, so each tile owns
   ONE contiguous span of an (8, R) rows array
   ``[x, y, z, payload..., pad]`` (coordinates in cell units, periodic
   images pre-shifted).  Tier 1 uses a global halo h1 picked from the
   halo-requirement distribution; tier 2 re-covers only the flagged
   tiles (halo <= 8, offsets one tile each way); tiles needing more
   (near-empty regions) fall through to pass C: a full-array span with
   minimum-image wrapping *inside* the kernel.
4. **Kernel** — per (8, 8, zc)-cell tile: stream the span through VMEM
   in 128-aligned chunks (one ``make_async_copy`` per chunk), loop
   candidates with dynamic ``fori_loop`` bounds, extract each
   candidate's row by a lane-mask select + full reduce (dynamic
   lane-dim scalar reads are rejected by Mosaic), update a running
   ``[payload..., d2]`` block with strict ``<`` compares.  Passes chain
   through the state, and min-updates are idempotent, so overlapping
   candidate sets between tiers are harmless.

Exactness argument: the true NN of q lies within ball(q, r_ub); every
pass-covered region for q's tile contains that ball by construction
(tier choice), the seeded d2 is nudged up by a relative epsilon and the
halo requirement by a hundredth of a cell so closed-ball boundary cases
and f32 roundoff cannot exclude the minimizer; therefore the strict-<
scan visits the true NN and keeps it (ties resolve to the first-seen
candidate — any minimizer is a correct NN; tests compare distances).

Measured kernel throughput (one v5e chip, 512^3 tiles, poisson spans):
~6.2 M candidates/s at ~152 cycles/candidate.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nn_window_gather", "nn_exact_assign", "window_pass"]

TILE = 8       # x/y tile width (cells) == VPU sublane count
CHUNK = 512    # candidate rows per DMA (128-aligned lane extent)
_H2_CAP = 8    # tier-2 halo cap (= one x/y tile); beyond -> pass C


def _zc(n_grid: int) -> int:
    """Lane (z) extent of a tile: 128 where the grid allows, else 64."""
    if n_grid % 128 == 0:
        return 128
    if n_grid % 64 == 0:
        return 64
    raise ValueError(
        f"window sweep needs n_grid % 64 == 0, got {n_grid}"
    )


def _ntiles(n_grid: int, zc: int) -> Tuple[int, int, int]:
    return (n_grid // TILE, n_grid // TILE, n_grid // zc)


def _round_rows(n: int) -> int:
    """Static rows capacity: next power of two >= n, min one CHUNK."""
    cap = CHUNK
    while cap < n:
        cap *= 2
    return cap


# ---------------------------------------------------------------------- #
# halo requirement                                                       #
# ---------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("n_grid", "zc"))
def _h_required(d2_cells: jax.Array, n_grid: int, zc: int) -> jax.Array:
    """(T,) int32: per tile, the halo (cells) whose coverage box contains
    ball(q, r_ub) for every query q in the tile.  d2_cells is the seeded
    upper bound in cell^2 units."""
    ntx, nty, ntz = _ntiles(n_grid, zc)
    r = jnp.sqrt(jnp.maximum(d2_cells, 0.0))
    ix = jnp.arange(n_grid, dtype=jnp.int32) % TILE
    fx = 0.5 + jnp.minimum(ix, TILE - 1 - ix).astype(jnp.float32)
    iz = jnp.arange(n_grid, dtype=jnp.int32) % zc
    fz = 0.5 + jnp.minimum(iz, zc - 1 - iz).astype(jnp.float32)
    fd = jnp.minimum(
        jnp.minimum(fx[:, None, None], fx[None, :, None]), fz[None, None, :]
    )
    # +0.01 cells: closed-ball boundary + f32 conversion roundoff slack
    need = jnp.ceil(r - fd + 0.01)
    h_q = jnp.maximum(need, 0.0).astype(jnp.int32)
    h_t = h_q.reshape(ntx, TILE, nty, TILE, ntz, zc).max(axis=(1, 3, 5))
    return h_t.reshape(-1)


# ---------------------------------------------------------------------- #
# span builders                                                          #
# ---------------------------------------------------------------------- #
def _cells_tiles(pos_c: jax.Array, n_grid: int, zc: int):
    cell_i = jnp.clip(jnp.floor(pos_c).astype(jnp.int32), 0, n_grid - 1)
    widths = (TILE, TILE, zc)
    pt = [cell_i[:, a] // widths[a] for a in range(3)]
    off = [cell_i[:, a] - pt[a] * widths[a] for a in range(3)]
    return cell_i, pt, off


def _axis_quals(off, h: int, zc: int):
    """Per axis: does the particle sit within h of a tile face, and which
    neighbor (one at most, h <= width/2)."""
    widths = (TILE, TILE, zc)
    quals, dirs = [], []
    for a in range(3):
        lo = off[a] < h
        hi = off[a] >= widths[a] - h
        quals.append(lo | hi)
        dirs.append(jnp.where(lo, -1, 1).astype(jnp.int32))
    return quals, dirs


def _flat_tile(tt, nt):
    return (tt[0] * nt[1] + tt[1]) * nt[2] + tt[2]


@partial(jax.jit, static_argnames=("n_grid", "zc", "h", "periodic"))
def _tier1_count(pos_c, n_grid, zc, h, periodic, valid_rows=None):
    nt = _ntiles(n_grid, zc)
    _, pt, off = _cells_tiles(pos_c, n_grid, zc)
    quals, _ = _axis_quals(off, h, zc)
    total = jnp.zeros((), jnp.int32)
    for j in range(8):
        use = (j & 1, (j >> 1) & 1, (j >> 2) & 1)
        valid = (jnp.ones(pos_c.shape[0], bool) if valid_rows is None
                 else valid_rows)
        for a in range(3):
            if use[a]:
                valid = valid & quals[a]
                if not periodic:
                    # one of the two directions may fall outside the box
                    t_raw = pt[a] + jnp.where(off[a] < h, -1, 1)
                    valid = valid & (t_raw >= 0) & (t_raw < nt[a])
        total = total + jnp.sum(valid, dtype=jnp.int32)
    return total


@partial(jax.jit, static_argnames=(
    "n_grid", "zc", "h", "periodic", "n_rows", "apply_shift"))
def _tier1_build(pos_c, payload, n_grid, zc, h, periodic, n_rows,
                 apply_shift, valid_rows=None):
    """rows (8, n_rows) f32 + spans (T,) s0/s1.  ``apply_shift`` bakes
    periodic images into the coordinates (wrap-free kernel); with the
    min-image kernel variant it is left off."""
    nt = _ntiles(n_grid, zc)
    n_t = nt[0] * nt[1] * nt[2]
    np_ = pos_c.shape[0]
    _, pt, off = _cells_tiles(pos_c, n_grid, zc)
    quals, dirs = _axis_quals(off, h, zc)

    keys = []
    for j in range(8):
        use = (j & 1, (j >> 1) & 1, (j >> 2) & 1)
        valid = jnp.ones(np_, bool) if valid_rows is None else valid_rows
        tt = []
        for a in range(3):
            if use[a]:
                valid = valid & quals[a]
                t_raw = pt[a] + dirs[a]
            else:
                t_raw = pt[a]
            if periodic:
                tt.append(t_raw % nt[a])
            else:
                valid = valid & (t_raw >= 0) & (t_raw < nt[a])
                tt.append(jnp.clip(t_raw, 0, nt[a] - 1))
        keys.append(jnp.where(valid, _flat_tile(tt, nt), n_t))
    keys = jnp.concatenate(keys)
    pidx = jnp.tile(jnp.arange(np_, dtype=jnp.int32), 8)
    ks, ps = jax.lax.sort((keys, pidx), num_keys=1)
    grow = max(0, n_rows - ks.shape[0])
    ks = jnp.pad(ks, (0, grow), constant_values=n_t)[:n_rows]
    ps = jnp.pad(ps, (0, grow))[:n_rows]

    bounds = jnp.searchsorted(ks, jnp.arange(n_t + 1, dtype=jnp.int32))
    s0 = bounds[:-1].astype(jnp.int32)
    s1 = bounds[1:].astype(jnp.int32)

    rows = _gather_rows(pos_c, payload, ks, ps, n_t, nt, n_grid, zc,
                        apply_shift, max_dt=1)
    return rows, s0, s1


def _gather_rows(pos_c, payload, ks, ps, n_t, nt, n_grid, zc,
                 apply_shift, max_dt):
    """Gather [pos, payload] rows for sorted (key, pidx), shift periodic
    images (|tile delta| > max_dt on an axis means the assignment wrapped
    around the box), pad channels to 8, invalidate overflow rows."""
    n_rows = ks.shape[0]
    src = jnp.concatenate([pos_c, payload], axis=1)  # (Np, 3 + V)
    g = src[ps]                                      # one row gather
    xyz = [g[:, 0], g[:, 1], g[:, 2]]
    if apply_shift:
        widths = (TILE, TILE, zc)
        rem = ks
        tts = []
        for a, base in ((0, nt[1] * nt[2]), (1, nt[2]), (2, 1)):
            tts.append(rem // base)
            rem = rem % base
        for a in range(3):
            pt_a = jnp.clip(
                jnp.floor(xyz[a]).astype(jnp.int32), 0, n_grid - 1
            ) // widths[a]
            dt = tts[a] - pt_a
            shift = jnp.where(
                dt > max_dt, jnp.float32(n_grid),
                jnp.where(dt < -max_dt, jnp.float32(-n_grid), 0.0),
            )
            xyz[a] = xyz[a] + shift
    invalid = ks >= n_t
    far = jnp.float32(4.0 * n_grid + 1e6)
    chans = [jnp.where(invalid, far, c) for c in xyz]
    for c in range(payload.shape[1]):
        chans.append(g[:, 3 + c])
    while len(chans) < 8:
        chans.append(jnp.zeros((n_rows,), jnp.float32))
    return jnp.stack(chans)


@partial(jax.jit, static_argnames=("n_grid", "zc"))
def _tier2_near(pos_c, h_tile, h1, n_grid, zc):
    """Particles within one tile of any flagged tile (bool mask) — the
    cheap pre-filter before the exact 27-offset membership build."""
    nt = _ntiles(n_grid, zc)
    fl = (h_tile > h1).reshape(nt)
    fld = fl
    for a in range(3):
        fld = fld | jnp.roll(fld, 1, a) | jnp.roll(fld, -1, a)
    _, pt, _ = _cells_tiles(pos_c, n_grid, zc)
    return fld[pt[0], pt[1], pt[2]]


@partial(jax.jit, static_argnames=("n_sub",))
def _compact_mask(mask, n_sub):
    idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
    k, s = jax.lax.sort(
        (jnp.where(mask, 0, 1).astype(jnp.int32), idx), num_keys=1
    )
    return s[:n_sub], k[:n_sub] == 0


@partial(jax.jit, static_argnames=("n_grid", "zc", "periodic", "n_rows"))
def _tier2_build(pos_c, payload, sel, selv, h_tile, h1,
                 n_grid, zc, periodic, n_rows):
    """Spans for flagged tiles (h1 < h_req <= 8) over the compacted
    particle subset, one tile of offsets each way."""
    nt = _ntiles(n_grid, zc)
    n_t = nt[0] * nt[1] * nt[2]
    widths = (TILE, TILE, zc)
    sub_pos = pos_c[sel]
    sub_pay = payload[sel]
    m = sub_pos.shape[0]
    cell_i, pt, _ = _cells_tiles(sub_pos, n_grid, zc)

    keys = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                offv = (ox, oy, oz)
                valid = selv
                tt = []
                for a in range(3):
                    t_raw = pt[a] + offv[a]
                    if periodic:
                        tt.append(t_raw % nt[a])
                    else:
                        valid = valid & (t_raw >= 0) & (t_raw < nt[a])
                        tt.append(jnp.clip(t_raw, 0, nt[a] - 1))
                flat = _flat_tile(tt, nt)
                h_tt = jnp.minimum(h_tile[flat], _H2_CAP)
                valid = valid & (h_tile[flat] > h1)
                for a in range(3):
                    lo = (pt[a] + offv[a]) * widths[a]  # unwrapped extent
                    valid = valid & (cell_i[:, a] >= lo - h_tt) & \
                        (cell_i[:, a] < lo + widths[a] + h_tt)
                keys.append(jnp.where(valid, flat, n_t))
    keys = jnp.concatenate(keys)
    pidx = jnp.tile(jnp.arange(m, dtype=jnp.int32), 27)
    ks, ps = jax.lax.sort((keys, pidx), num_keys=1)
    grow = max(0, n_rows - ks.shape[0])
    ks = jnp.pad(ks, (0, grow), constant_values=n_t)[:n_rows]
    ps = jnp.pad(ps, (0, grow))[:n_rows]
    bounds = jnp.searchsorted(ks, jnp.arange(n_t + 1, dtype=jnp.int32))
    rows = _gather_rows(sub_pos, sub_pay, ks, ps, n_t, nt, n_grid, zc,
                        periodic, max_dt=1)
    return rows, bounds[:-1].astype(jnp.int32), bounds[1:].astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_grid", "zc", "n_rows"))
def _passc_build(pos_c, payload, h_tile, n_grid, zc, n_rows,
                 valid_rows=None):
    """Full-array spans for tiles needing halo > 8: every particle is a
    candidate; the kernel applies minimum-image wrapping itself."""
    nt = _ntiles(n_grid, zc)
    n_t = nt[0] * nt[1] * nt[2]
    np_ = pos_c.shape[0]
    pad = n_rows - np_
    chans = [pos_c[:, 0], pos_c[:, 1], pos_c[:, 2]]
    for c in range(payload.shape[1]):
        chans.append(payload[:, c])
    while len(chans) < 8:
        chans.append(jnp.zeros((np_,), jnp.float32))
    far = jnp.float32(4.0 * n_grid + 1e6)
    rows = jnp.stack(chans)
    rows = jnp.pad(rows, ((0, 0), (0, pad)))
    lane = jnp.arange(n_rows)
    real = lane[None, :] < np_
    if valid_rows is not None:
        real = real & jnp.pad(valid_rows, (0, pad))[None, :]
    rows = rows.at[:3].set(jnp.where(real, rows[:3], far))
    s1 = jnp.where(h_tile > _H2_CAP, np_, 0).astype(jnp.int32)
    s0 = jnp.zeros((n_t,), jnp.int32)
    return rows, s0, s1


# ---------------------------------------------------------------------- #
# the kernel                                                             #
# ---------------------------------------------------------------------- #
def _window_kernel(s0v, s1v, rows_hbm, state_in, out, chunk_buf, sem, *,
                   nt, zc, n_pay, n_grid, wrap, smem_rows=False):
    tx = pl.program_id(0)
    ty = pl.program_id(1)
    tz = pl.program_id(2)
    t = (tx * nt[1] + ty) * nt[2] + tz
    s0 = s0v[t]
    s1 = s1v[t]

    carry = tuple(state_in[c] for c in range(n_pay)) + (state_in[n_pay],)

    fx = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE, zc), 0)
    fy = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE, zc), 1)
    fz = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE, zc), 2)
    qx = (fx + tx * TILE).astype(jnp.float32) + 0.5
    qy = (fy + ty * TILE).astype(jnp.float32) + 0.5
    qz = (fz + tz * zc).astype(jnp.float32) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    n_f = jnp.float32(n_grid)
    inv_n = jnp.float32(1.0 / n_grid)

    c0 = pl.multiple_of((s0 // CHUNK) * CHUNK, CHUNK)
    n_chunks = jnp.maximum((s1 - c0 + CHUNK - 1) // CHUNK, 0)

    def chunk_body(ci, carry):
        base = pl.multiple_of(c0 + ci * CHUNK, CHUNK)
        cp = pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(base, CHUNK)], chunk_buf, sem
        )
        cp.start()
        cp.wait()
        k0 = jnp.maximum(s0 - base, 0)
        k1 = jnp.minimum(s1 - base, CHUNK)

        def ext(c, m, k):
            # candidate-row channel c of lane k: direct scalar read when
            # the chunk sits in SMEM (dynamic lane-dim scalar reads from
            # VMEM are rejected by Mosaic), else the lane-mask
            # select + full reduce
            if smem_rows:
                return chunk_buf[c, k]
            return jnp.max(
                jnp.where(m, chunk_buf[c:c + 1, :], jnp.float32(-3e38))
            )

        def cand_body(k, carry2):
            bd = carry2[-1]
            m = None if smem_rows else (lane == k)
            dx = qx - ext(0, m, k)
            dy = qy - ext(1, m, k)
            dz = qz - ext(2, m, k)
            if wrap:
                dx = dx - n_f * jnp.round(dx * inv_n)
                dy = dy - n_f * jnp.round(dy * inv_n)
                dz = dz - n_f * jnp.round(dz * inv_n)
            d2 = dx * dx + dy * dy + dz * dz
            take = d2 < bd
            new_pay = tuple(
                jnp.where(take, ext(3 + c, m, k), carry2[c])
                for c in range(n_pay)
            )
            return new_pay + (jnp.where(take, d2, bd),)

        return jax.lax.fori_loop(k0, k1, cand_body, carry)

    carry = jax.lax.fori_loop(0, n_chunks, chunk_body, carry)
    for c in range(n_pay):
        out[c] = carry[c]
    out[n_pay] = carry[-1]


@partial(jax.jit, static_argnames=(
    "n_grid", "zc", "n_pay", "wrap", "interpret", "smem_rows"))
def window_pass(s0, s1, rows, state, *, n_grid, zc, n_pay, wrap,
                interpret=False, smem_rows=False):
    """One span-scan pass: returns the min-merged (n_pay + 1, N, N, N)
    state ([payload..., d2], cell units).  Chain passes by feeding the
    output back as ``state``.  ``smem_rows`` stages each candidate
    chunk in SMEM and reads rows as scalars instead of the lane-mask
    select + reduce (pending hardware measurement — flip the default
    once timed)."""
    nt = _ntiles(n_grid, zc)
    chunk_space = (pltpu.SMEM if smem_rows else pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=nt,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n_pay + 1, TILE, TILE, zc),
                lambda i, j, l, a, b: (0, i, j, l),
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_pay + 1, TILE, TILE, zc), lambda i, j, l, a, b: (0, i, j, l)
        ),
        scratch_shapes=[
            chunk_space((8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        partial(
            _window_kernel,
            nt=nt, zc=zc, n_pay=n_pay, n_grid=n_grid, wrap=wrap,
            smem_rows=smem_rows,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pay + 1,) + (n_grid,) * 3, jnp.float32
        ),
        interpret=interpret,
    )
    return fn(s0, s1, rows, state)


@partial(jax.jit, static_argnames=("n_grid", "zc", "n_pay", "wrap"))
def _window_pass_xla(s0, s1, rows, state, *, n_grid, zc, n_pay, wrap):
    """Pure-XLA mirror of the kernel (CPU tests / non-TPU backends):
    identical candidate order and strict-< tie semantics."""
    nt = _ntiles(n_grid, zc)
    n_t = nt[0] * nt[1] * nt[2]
    n_rows = rows.shape[1]
    n_f = jnp.float32(n_grid)
    cells = TILE * TILE * zc

    iz = jnp.arange(zc, dtype=jnp.float32) + 0.5
    ixy = jnp.arange(TILE, dtype=jnp.float32) + 0.5

    def one_tile(t):
        tx = t // (nt[1] * nt[2])
        ty = (t // nt[2]) % nt[1]
        tz = t % nt[2]
        st = jax.lax.dynamic_slice(
            state, (jnp.int32(0), tx * TILE, ty * TILE, tz * zc),
            (n_pay + 1, TILE, TILE, zc),
        )
        qx = (ixy + (tx * TILE).astype(jnp.float32))[:, None, None]
        qy = (ixy + (ty * TILE).astype(jnp.float32))[None, :, None]
        qz = (iz + (tz * zc).astype(jnp.float32))[None, None, :]
        q = jnp.stack([
            jnp.broadcast_to(qx, (TILE, TILE, zc)).reshape(cells),
            jnp.broadcast_to(qy, (TILE, TILE, zc)).reshape(cells),
            jnp.broadcast_to(qz, (TILE, TILE, zc)).reshape(cells),
        ])  # (3, cells)
        s0t = s0[t]
        s1t = s1[t]
        c0 = (s0t // CHUNK) * CHUNK
        n_chunks = jnp.maximum((s1t - c0 + CHUNK - 1) // CHUNK, 0)

        def chunk_body(ci, carry):
            base = c0 + ci * CHUNK
            ch = jax.lax.dynamic_slice(
                rows, (jnp.int32(0), base.astype(jnp.int32)), (8, CHUNK)
            )
            k0 = jnp.maximum(s0t - base, 0)
            k1 = jnp.minimum(s1t - base, CHUNK)
            kvalid = (jnp.arange(CHUNK) >= k0) & (jnp.arange(CHUNK) < k1)
            d = q[:, :, None] - ch[:3, None, :]       # (3, cells, CHUNK)
            if wrap:
                d = d - n_f * jnp.round(d / n_f)
            d2 = jnp.sum(d * d, axis=0)
            d2 = jnp.where(kvalid[None, :], d2, jnp.float32(jnp.inf))
            kbest = jnp.argmin(d2, axis=1)            # first minimizer
            dbest = jnp.take_along_axis(d2, kbest[:, None], axis=1)[:, 0]
            pay, bd = carry
            take = dbest < bd
            newp = ch[3:3 + n_pay, kbest]             # (n_pay, cells)
            pay = jnp.where(take[None], newp, pay)
            return pay, jnp.where(take, dbest, bd)

        pay0 = st[:n_pay].reshape(n_pay, cells)
        bd0 = st[n_pay].reshape(cells)
        pay, bd = jax.lax.fori_loop(0, n_chunks, chunk_body, (pay0, bd0))
        return jnp.concatenate(
            [pay, bd[None]], axis=0
        ).reshape(n_pay + 1, TILE, TILE, zc)

    tiles = jax.lax.map(one_tile, jnp.arange(n_t, dtype=jnp.int32))
    # (T, C, 8, 8, zc) -> (C, N, N, N)
    tiles = tiles.reshape(nt[0], nt[1], nt[2], n_pay + 1, TILE, TILE, zc)
    return tiles.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
        (n_pay + 1,) + (n_grid,) * 3
    )


# ---------------------------------------------------------------------- #
# orchestrator                                                           #
# ---------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("n_grid", "box_size"))
def _to_cells(pos, d2_seed, n_grid, box_size):
    cell = box_size / n_grid
    pos_c = (pos % box_size) * jnp.float32(1.0 / cell)
    d2_c = jnp.minimum(d2_seed * jnp.float32(1.0 / cell**2), 1e30)
    return pos_c, d2_c


def nn_window_gather(
    pos: jax.Array,
    vals: jax.Array,
    n_grid: int,
    box_size: float,
    periodic: bool = True,
    impl: Optional[str] = None,
    valid: Optional[jax.Array] = None,
):
    """Exact NN payload per cell: ``(payload (V, N, N, N), d2 (N, N, N)
    physical units, occ scalar)``.

    Matches the reference's exact-ANN deposition
    (``/root/reference/vpower/interp.py:1018-1049``: ``pyann.nn2`` with
    eps=0 then ``f[index]``) with a guarantee the ring-refined multigrid
    could not give on clustered inputs, at any N one chip's HBM fits.

    ``impl``: 'pallas' (TPU), 'xla' (any backend; same semantics), or
    'interpret' (Pallas interpret mode, small tests only).  Default
    picks pallas on accelerators, xla on CPU.

    ``valid``: optional (Np,) bool mask — invalid rows never become
    candidates (fixed-shape padded inputs, e.g. the streamed pipeline's
    per-block candidate windows).
    """
    from .nn import nn_gather_grid

    zc = _zc(n_grid)
    nt = _ntiles(n_grid, zc)
    n_t = nt[0] * nt[1] * nt[2]
    n_pay = vals.shape[1]
    if n_pay > 5:
        raise ValueError("rows layout holds at most 5 payload channels")
    if impl is None:
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"

    cell = box_size / n_grid
    # d2-only descent: the window passes are guaranteed to overwrite
    # every cell's payload (the true NN strictly beats the nudged seed
    # bound, and each tile's window contains its ball by construction),
    # so the seed PAYLOAD is never consumed — running the multigrid with
    # zero value channels halves its DMA cost and drops ~5 n^3 cubes of
    # HBM, the difference between 512^3 fitting one chip and not.
    _, occ, d2_seed = nn_gather_grid(
        pos, jnp.zeros((pos.shape[0], 0), jnp.float32), n_grid, box_size,
        periodic=periodic, return_d2=True, valid=valid,
    )
    pos_c, d2_c = _to_cells(pos, d2_seed, n_grid, float(box_size))
    h_tile = _h_required(d2_c, n_grid, zc)

    # host decisions: tier-1 halo from the requirement distribution
    frac = np.asarray(
        jax.jit(lambda h: jnp.stack([
            jnp.mean((h > 2).astype(jnp.float32)),
            jnp.mean((h > 3).astype(jnp.float32)),
            jnp.mean((h > 4).astype(jnp.float32)),
        ]))(h_tile)
    )
    h1 = 2 if frac[0] <= 0.05 else (3 if frac[1] <= 0.05 else 4)

    def run_pass(s0, s1, rows, state, wrap):
        if impl == "xla":
            return _window_pass_xla(
                s0, s1, rows, state,
                n_grid=n_grid, zc=zc, n_pay=n_pay, wrap=wrap,
            )
        return window_pass(
            s0, s1, rows, state,
            n_grid=n_grid, zc=zc, n_pay=n_pay, wrap=wrap,
            interpret=impl == "interpret",
        )

    # wrap-free rows need unambiguous image inference: >= 3 tiles/axis
    kernel_wrap = periodic and min(nt) < 3

    total1 = int(_tier1_count(pos_c, n_grid, zc, h1, periodic,
                              valid_rows=valid))
    n_rows1 = _round_rows(total1)
    rows1, s0, s1 = _tier1_build(
        pos_c, vals, n_grid, zc, h1, periodic, n_rows1,
        apply_shift=periodic and not kernel_wrap, valid_rows=valid,
    )
    # seed state: zero payload + nudged d2.  The nudge makes the true
    # NN (d2_true <= d2_seed) win the strict-< compare at EVERY cell,
    # so the zero payload is always replaced by a real candidate's.
    state = jnp.concatenate(
        [
            jnp.zeros((n_pay,) + (n_grid,) * 3, jnp.float32),
            (d2_c * jnp.float32(1 + 1e-5) + 1e-6)[None],
        ],
        axis=0,
    )
    state = run_pass(s0, s1, rows1, state, kernel_wrap)

    n_flag = int(jnp.sum((h_tile > h1) & (h_tile <= _H2_CAP)))
    if n_flag > 0:
        near = _tier2_near(pos_c, h_tile, h1, n_grid, zc)
        if valid is not None:
            near = near & valid
        n_near = int(jnp.sum(near))
        if n_near > 0:
            n_sub = min(_round_rows(n_near), pos.shape[0])
            sel, selv = _compact_mask(near, n_sub)
            # capacity: worst case 27 replicas of the compacted subset
            n_rows2 = _round_rows(27 * n_sub)
            rows2, s0b, s1b = _tier2_build(
                pos_c, vals, sel, selv, h_tile, h1,
                n_grid, zc, periodic, n_rows2,
            )
            state = run_pass(s0b, s1b, rows2, state, kernel_wrap)

    n_flag2 = int(jnp.sum(h_tile > _H2_CAP))
    if n_flag2 > 0:
        n_rows3 = _round_rows(pos.shape[0])
        rows3, s0c, s1c = _passc_build(
            pos_c, vals, h_tile, n_grid, zc, n_rows3, valid_rows=valid
        )
        state = run_pass(s0c, s1c, rows3, state, periodic)

    payload = state[:n_pay]
    d2 = state[n_pay] * jnp.float32(cell * cell)
    return payload, d2, occ


def nn_exact_assign(
    pos: jax.Array,
    n_grid: int,
    box_size: float,
    periodic: bool = True,
    impl: Optional[str] = None,
) -> jax.Array:
    """(N, N, N) int32 exact NN particle index (tests / index consumers).

    The index rides the window sweep as two exact-in-f32 payload
    channels (hi = (i+1) >> 11, lo = (i+1) & 2047 — same encoding as the
    MXU seed deposit, :func:`vpower_tpu.deposit.nn._seed_grids`)."""
    enc = jnp.arange(pos.shape[0], dtype=jnp.int32) + 1
    vals = jnp.stack([
        (enc >> 11).astype(jnp.float32),
        (enc & 2047).astype(jnp.float32),
    ], axis=1)
    payload, _, _ = nn_window_gather(
        pos, vals, n_grid, box_size, periodic=periodic, impl=impl
    )
    idx = (jnp.round(payload[0]).astype(jnp.int32) << 11) + \
        jnp.round(payload[1]).astype(jnp.int32)
    return idx - 1
