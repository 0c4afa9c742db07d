"""Pallas TPU kernel for the NN fine-level sweep.

The XLA fallback (:func:`vpower_tpu.deposit.nn._sweep`) rolls whole
grid cubes per neighbor offset; a dynamic ``jnp.roll`` lowers to
``concat(x, x) + dynamic_slice``, so every offset costs a full-cube
copy AND a doubled temporary — at 512^3 that is gigabytes of HLO temps
and ~78 cube passes per level.  This kernel does the entire
26-neighborhood x {state + rank-k seeds} x {stride 1, 2} compare in ONE
pass over HBM.

Hardware constraints that shaped it (all discovered the hard way):

* HBM->VMEM DMA slices must be 8-aligned on the sublane (second-minor)
  dim and 128-aligned on the lane (minor) dim — unaligned slices fault
  the TPU worker at runtime.  So inputs are pre-padded in XLA with
  periodic halos (x/y: 4 cells; z: 64 cells) sized so every tile's DMA
  window has aligned start AND extent, and each tile needs exactly one
  contiguous DMA per field.
* VMEM is ~16 MiB: the z axis is chunked (128 lanes per tile) instead
  of resident, and neighbor z-shifts are static slices into the
  z-extended window (no ``pltpu.roll`` copies).
* ``tpu.iota`` is integer-only; float coordinates are cast afterwards.
* Positions are carried channels-first (3, N, N, N): a trailing dim of
  3 in a materialized layout costs up to 40x its logical HBM size under
  the (8, 128) tile.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sweep_tiles", "sweep_tiles_vals", "halo_z", "fit_iters"]

_HALO = 4    # x/y halo; strides 1-2 need 2, 4 keeps DMA sublane-aligned
_ZHALO = 64  # z halo; keeps DMA lane-aligned (128-divisible extents)


def fit_iters(n_ch: int, k: int, zc: int, iters: int) -> int:
    """Largest fused-iteration count <= ``iters`` whose Mosaic stack
    fits the TPU's ~16 MB scoped-VMEM limit for the value-carry sweep.

    The limit binds the compiler's implicit vector temporaries, NOT the
    explicit ``scratch_shapes`` windows (VMEM proper is ~128 MB) — so
    it scales with the per-iteration extended-region register shapes,
    which resist closed-form modeling (unaligned window relayouts
    dominate).  Bounds are from on-chip compile probes of this exact
    kernel (round-5; limit lowered via ``--xla_tpu_scoped_vmem_limit_kib``
    to read back true requirements):

    ==========  =====  ====  =======  ============
    mode        n_ch    zc   iters=2  measured MB
    ==========  =====  ====  =======  ============
    seeded k=2      7   256        2  19.93 (OOM — the BENCH_r04 crash)
    seeded k=2      7   256        1   7.88
    seeded k=2      7   128        2   5.25
    seeded k=2      8   128        2   6.00
    state-only      7   512        2   compiles+runs (r4 A/B, 1.45 s)
    ==========  =====  ====  =======  ============

    Anything outside the probed envelope degrades to 1 (a safe,
    single-pass compile) instead of surfacing as a chip compile error —
    the failure mode that shipped in round 4 (``nn.py`` passed
    ``iters=2`` at seeded zc=256 without a budget check).
    """
    if iters <= 1:
        return iters
    if k == 0:
        # state-only sweeps: probed up to n_ch=7 at zc<=512
        return iters if (n_ch <= 8 and zc <= 512) else 1
    # seeded sweeps: the zc=256 extended-region temporaries blow the
    # stack; zc<=128 probed safe through n_ch=8
    return iters if (n_ch <= 8 and k <= 2 and zc <= 128) else 1


def halo_z(zc: int) -> int:
    """z halo for a chunk extent ``zc``: the smallest halo >= the sweep
    reach (2) that keeps the DMA window lane extent (zc + 2 hz) a
    multiple of 128.  zc % 128 == 0 -> 64 (the classic chunking);
    zc % 128 in (32, 64, 96) -> 48/32/16 (single-full-z-chunk mode for
    n % 128 != 0 grids — e.g. the 192^3 level of a 384^3 streamed-block
    descent and the 160^3 level of a 320^3 one, whose XLA fallbacks
    were in turn the costliest stage of the 2048-range pipeline); small
    even zc (interpret-mode tests) get the aligned complement."""
    assert zc % 2 == 0, zc
    hz = ((128 - zc % 128) % 128) // 2
    if hz < 2:
        hz += 64
    return hz


def _sweep_kernel(
    *refs,
    n_grid: int,
    tile: int,
    zc: int,
    n_seeds: int,
    box_size: float,
    periodic: bool,
    strides: Tuple[int, ...],
):
    if n_seeds > 0:
        (state_idx_hbm, state_pos_hbm, seed_idx_hbm, seed_pos_hbm,
         out_idx, out_pos, out_d2,
         sidx_t, spos_t, kidx_t, kpos_t, sems) = refs
    else:
        (state_idx_hbm, state_pos_hbm,
         out_idx, out_pos, out_d2,
         sidx_t, spos_t, sems) = refs
        seed_idx_hbm = seed_pos_hbm = kidx_t = kpos_t = None
    tx = pl.program_id(0)
    ty = pl.program_id(1)
    tz = pl.program_id(2)
    x0 = tx * tile
    y0 = ty * tile
    z0 = tz * zc
    h = _HALO
    hz = _ZHALO
    w = tile + 2 * h
    wz = zc + 2 * hz
    cell = box_size / n_grid
    big = jnp.float32(3.0e38)

    pairs = [
        (state_idx_hbm, sidx_t, False),
        (state_pos_hbm, spos_t, True),
    ]
    if n_seeds > 0:
        pairs += [
            (seed_idx_hbm, kidx_t, True),
            (seed_pos_hbm, kpos_t, True),
        ]
    copies = []
    for src, dst, lead in pairs:
        if lead:
            c = pltpu.make_async_copy(
                src.at[:, pl.ds(x0, w), pl.ds(y0, w), pl.ds(z0, wz)],
                dst, sems.at[len(copies)],
            )
        else:
            c = pltpu.make_async_copy(
                src.at[pl.ds(x0, w), pl.ds(y0, w), pl.ds(z0, wz)],
                dst, sems.at[len(copies)],
            )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    def fiota(dim):
        return jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile, zc), dim
        ).astype(jnp.float32)

    fx = (fiota(0) + (jnp.float32(x0) + 0.5)) * cell
    fy = (fiota(1) + (jnp.float32(y0) + 0.5)) * cell
    fz = (fiota(2) + (jnp.float32(z0) + 0.5)) * cell

    def dist2(px, py, pz):
        dx_ = fx - px
        dy_ = fy - py
        dz_ = fz - pz
        if periodic:
            dx_ = dx_ - box_size * jnp.round(dx_ / box_size)
            dy_ = dy_ - box_size * jnp.round(dy_ / box_size)
            dz_ = dz_ - box_size * jnp.round(dz_ / box_size)
        return dx_ * dx_ + dy_ * dy_ + dz_ * dz_

    def window(ref, dx, dy, dz, leading_index=None):
        xsl = slice(h + dx, h + dx + tile)
        ysl = slice(h + dy, h + dy + tile)
        zsl = slice(hz + dz, hz + dz + zc)
        if leading_index is None:
            return ref[xsl, ysl, zsl]
        return ref[leading_index, xsl, ysl, zsl]

    best_i = window(sidx_t, 0, 0, 0)
    bpx = window(spos_t, 0, 0, 0, 0)
    bpy = window(spos_t, 0, 0, 0, 1)
    bpz = window(spos_t, 0, 0, 0, 2)
    best_d = jnp.where(best_i >= 0, dist2(bpx, bpy, bpz), big)

    best = (best_i, best_d)
    best_p = (bpx, bpy, bpz)

    def consider_p(ci, px, py, pz, best, best_p):
        best_i, best_d = best
        cd = jnp.where(ci >= 0, dist2(px, py, pz), big)
        take = cd < best_d
        return (
            (jnp.where(take, ci, best_i), jnp.where(take, cd, best_d)),
            (
                jnp.where(take, px, best_p[0]),
                jnp.where(take, py, best_p[1]),
                jnp.where(take, pz, best_p[2]),
            ),
        )

    for s in strides:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if (dx, dy, dz) == (0, 0, 0):
                        fields = range(n_seeds)  # seeds at own cell
                    else:
                        fields = range(-1, n_seeds)  # -1 = state field
                    for f in fields:
                        if f < 0:
                            ci = window(sidx_t, dx * s, dy * s, dz * s)
                            px = window(spos_t, dx * s, dy * s, dz * s, 0)
                            py = window(spos_t, dx * s, dy * s, dz * s, 1)
                            pz = window(spos_t, dx * s, dy * s, dz * s, 2)
                        else:
                            ci = window(kidx_t, dx * s, dy * s, dz * s, f)
                            px = window(kpos_t, dx * s, dy * s, dz * s, 3 * f)
                            py = window(kpos_t, dx * s, dy * s, dz * s, 3 * f + 1)
                            pz = window(kpos_t, dx * s, dy * s, dz * s, 3 * f + 2)
                        best, best_p = consider_p(ci, px, py, pz, best, best_p)

    out_idx[:, :, :] = best[0]
    out_d2[:, :, :] = best[1]
    out_pos[0, :, :, :] = best_p[0]
    out_pos[1, :, :, :] = best_p[1]
    out_pos[2, :, :, :] = best_p[2]


def _sweep_vals_kernel(
    *refs,
    n_grid: int,
    tile: int,
    zc: int,
    n_seeds: int,
    n_ch: int,
    has_occ: bool,
    payload_out: bool,
    d2_out: bool,
    box_size: float,
    periodic: bool,
    strides: Tuple[int, ...],
    iters: int,
):
    """Value-carry variant of :func:`_sweep_kernel`: the candidate state
    carries ``n_ch`` f32 channels ``[x, y, z, payload..., occ?]``
    instead of a particle index — eliminating the final O(N^3)-row
    ``vec[idx]`` gather of the NN pipeline (the reference's gather at
    ``vpower/interp.py:1041-1045``), which at 512^3 cost 1.7 s of a
    3.95 s run at XLA's ~80 M gather-rows/s.  Validity is the trailing
    occupancy channel (1.0 = real candidate) when ``has_occ``;
    ``has_occ=False`` asserts every candidate valid — the pre-merged
    state-only mode (``n_seeds == 0``) used at memory-bound grid sizes,
    where carrying k seed fields of C channels each would exceed HBM
    (k=2, C=8 at 512^3 is ~11 GB of padded seed grids alone).
    ``payload_out`` drops the position channels from the output — the
    final pass of a descent needs only the payload, and emitting 3
    fewer n^3 cubes is the difference between the 512^3 output
    assembly fitting HBM or not."""
    if n_seeds > 0:
        state_hbm, seed_hbm, out_state, st_t, kt_t, sems = refs
    else:
        state_hbm, out_state, st_t, sems = refs
        seed_hbm = kt_t = None
    tx = pl.program_id(0)
    ty = pl.program_id(1)
    tz = pl.program_id(2)
    x0 = tx * tile
    y0 = ty * tile
    # single-full-z-chunk mode: the start is statically 0 (Mosaic cannot
    # prove tz * zc lane alignment when zc % 128 != 0, but tz == 0)
    z0 = 0 if zc == n_grid else tz * zc
    h = _HALO
    hz = halo_z(zc)
    w = tile + 2 * h
    wz = zc + 2 * hz
    cell = box_size / n_grid
    big = jnp.float32(3.0e38)

    pairs = [(state_hbm, st_t)]
    if n_seeds > 0:
        pairs.append((seed_hbm, kt_t))
    copies = []
    for src, dst in pairs:
        c = pltpu.make_async_copy(
            src.at[:, pl.ds(x0, w), pl.ds(y0, w), pl.ds(z0, wz)],
            dst, sems.at[len(copies)],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    reach = max(strides)

    def run_iter(e):
        """One Jacobi sweep over the window region extended by ``e``
        cells per side beyond the inner tile (temporal blocking: the
        extended ring gives the NEXT in-kernel iteration correct
        neighbor values without another HBM round-trip — the sweep is
        DMA-bound, so fusing iterations nearly halves its cost)."""
        ex, ez = tile + 2 * e, zc + 2 * e

        def fiota(dim):
            return jax.lax.broadcasted_iota(
                jnp.int32, (ex, ex, ez), dim
            ).astype(jnp.float32)

        fx = (fiota(0) + (jnp.float32(x0 - e) + 0.5)) * cell
        fy = (fiota(1) + (jnp.float32(y0 - e) + 0.5)) * cell
        fz = (fiota(2) + (jnp.float32(z0 - e) + 0.5)) * cell

        def dist2(px, py, pz):
            dx_ = fx - px
            dy_ = fy - py
            dz_ = fz - pz
            if periodic:
                dx_ = dx_ - box_size * jnp.round(dx_ / box_size)
                dy_ = dy_ - box_size * jnp.round(dy_ / box_size)
                dz_ = dz_ - box_size * jnp.round(dz_ / box_size)
            return dx_ * dx_ + dy_ * dy_ + dz_ * dz_

        def window(ref, c0, dx, dy, dz):
            return ref[
                c0,
                slice(h - e + dx, h - e + dx + ex),
                slice(h - e + dy, h - e + dy + ex),
                slice(hz - e + dz, hz - e + dz + ez),
            ]

        best_c = [window(st_t, c, 0, 0, 0) for c in range(n_ch)]
        if has_occ:
            best_d = jnp.where(
                best_c[n_ch - 1] > 0.5,
                dist2(best_c[0], best_c[1], best_c[2]),
                big,
            )
        else:
            best_d = dist2(best_c[0], best_c[1], best_c[2])

        def consider(ref, c0, dx, dy, dz, best_c, best_d):
            px = window(ref, c0, dx, dy, dz)
            py = window(ref, c0 + 1, dx, dy, dz)
            pz = window(ref, c0 + 2, dx, dy, dz)
            if has_occ:
                occ = window(ref, c0 + n_ch - 1, dx, dy, dz)
                cd = jnp.where(occ > 0.5, dist2(px, py, pz), big)
            else:
                cd = dist2(px, py, pz)
            take = cd < best_d
            new_c = [
                jnp.where(take, window(ref, c0 + c, dx, dy, dz), best_c[c])
                if c > 2 else None
                for c in range(n_ch)
            ]
            new_c[0] = jnp.where(take, px, best_c[0])
            new_c[1] = jnp.where(take, py, best_c[1])
            new_c[2] = jnp.where(take, pz, best_c[2])
            return new_c, jnp.where(take, cd, best_d)

        for s in strides:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        if (dx, dy, dz) == (0, 0, 0):
                            fields = range(n_seeds)  # seeds at own cell
                        else:
                            fields = range(-1, n_seeds)  # -1 = state
                        for f in fields:
                            if f < 0:
                                best_c, best_d = consider(
                                    st_t, 0, dx * s, dy * s, dz * s,
                                    best_c, best_d,
                                )
                            else:
                                best_c, best_d = consider(
                                    kt_t, f * n_ch, dx * s, dy * s,
                                    dz * s, best_c, best_d,
                                )
        return best_c, best_d

    for it in range(iters - 1):
        e = reach * (iters - 1 - it)
        best_c, _ = run_iter(e)
        # Jacobi write-back: every read of the loop above is consumed
        # before the first store (program order on the same ref)
        ex, ez = tile + 2 * e, zc + 2 * e
        for c in range(n_ch):
            st_t[
                c,
                slice(h - e, h - e + ex),
                slice(h - e, h - e + ex),
                slice(hz - e, hz - e + ez),
            ] = best_c[c]

    best_c, best_d = run_iter(0)

    if payload_out:
        n_pay = n_ch - 3 - (1 if has_occ else 0)
        for c in range(n_pay):
            out_state[c, :, :, :] = best_c[3 + c]
        if d2_out:
            # the exactness upper bound for the window sweep
            # (:mod:`.nn_window`) rides out as one extra channel —
            # zero extra HBM lifetime vs recomputing it from positions
            out_state[n_pay, :, :, :] = best_d
    else:
        for c in range(n_ch):
            out_state[c, :, :, :] = best_c[c]


def wrap_pad(x: jax.Array, spatial_start: int, hz: int = _ZHALO) -> jax.Array:
    """Periodic pad for the sweep kernel: x/y by _HALO, z by ``hz``
    (pass ``halo_z(zc)`` of the chunk extent the sweep will use).
    Exposed so callers invoking the kernel repeatedly can pad the
    (unchanging) seed fields once."""
    pad = [(0, 0)] * x.ndim
    pad[spatial_start] = (_HALO, _HALO)
    pad[spatial_start + 1] = (_HALO, _HALO)
    pad[spatial_start + 2] = (hz, hz)
    return jnp.pad(x, pad, mode="wrap")


@partial(
    jax.jit,
    static_argnames=("box_size", "periodic", "tile", "zc", "strides",
                     "interpret", "seeds_prepadded"),
)
def sweep_tiles(
    state_idx: jax.Array,   # (N, N, N) i32
    state_pos: jax.Array,   # (3, N, N, N) f32 channels-first
    seed_idx: jax.Array,    # (k, N, N, N) i32 (or pre-padded)
    seed_pos: jax.Array,    # (3k, N, N, N) f32 (or pre-padded)
    box_size: float,
    periodic: bool = True,
    tile: int = 8,
    zc: int = 128,
    strides: Tuple[int, ...] = (2, 1),
    interpret: bool = False,
    seeds_prepadded: bool = False,
):
    """One fused sweep pass.  Returns (best_idx, best_pos, best_d2) with
    best_pos channels-first.  Requires N to be a multiple of 128 (lane
    alignment of the z chunking); tests run any N in interpret mode.
    ``seed_idx=None`` runs the state-only repair pass (passes 2+ of a
    level: re-reading the unchanged seed fields is provably redundant —
    see the seeded-once split in ``nn.py`` — so dropping them cuts the
    pass's HBM reads from 12 to 4 channel-cubes)."""
    n = state_idx.shape[0]
    assert n % tile == 0, "grid must divide the tile size"
    zc = min(zc, n)
    assert n % zc == 0
    k = seed_idx.shape[0] if seed_idx is not None else 0
    grid = (n // tile, n // tile, n // zc)
    h, hz = _HALO, _ZHALO
    w, wz = tile + 2 * h, zc + 2 * hz

    si_p = wrap_pad(state_idx, 0)
    sp_p = wrap_pad(state_pos, 1)
    operands = [si_p, sp_p]
    scratch = [
        pltpu.VMEM((w, w, wz), jnp.int32),
        pltpu.VMEM((3, w, w, wz), jnp.float32),
    ]
    if k > 0:
        if seeds_prepadded:
            ki_p, kp_p = seed_idx, seed_pos
        else:
            ki_p = wrap_pad(seed_idx, 1)
            kp_p = wrap_pad(seed_pos, 1)
        operands += [ki_p, kp_p]
        scratch += [
            pltpu.VMEM((k, w, w, wz), jnp.int32),
            pltpu.VMEM((3 * k, w, w, wz), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((len(operands),)))

    kernel = partial(
        _sweep_kernel,
        n_grid=n,
        tile=tile,
        zc=zc,
        n_seeds=k,
        box_size=float(box_size),
        periodic=periodic,
        strides=strides,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((n, n, n), jnp.int32),
        jax.ShapeDtypeStruct((3, n, n, n), jnp.float32),
        jax.ShapeDtypeStruct((n, n, n), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=(
            pl.BlockSpec((tile, tile, zc), lambda i, j, l: (i, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile, tile, zc), lambda i, j, l: (0, i, j, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile, zc), lambda i, j, l: (i, j, l),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


@partial(
    jax.jit,
    static_argnames=("box_size", "periodic", "has_occ", "payload_out",
                     "d2_out", "tile", "zc", "strides", "interpret",
                     "seeds_prepadded", "iters"),
)
def sweep_tiles_vals(
    state: jax.Array,       # (C, N, N, N) f32: [x, y, z, payload..., occ?]
    seeds: jax.Array,       # (k*C, N, N, N) f32 (or pre-padded) or None
    box_size: float,
    periodic: bool = True,
    has_occ: bool = True,
    payload_out: bool = False,
    d2_out: bool = False,
    tile: int = 8,
    zc: int = 128,
    strides: Tuple[int, ...] = (2, 1),
    interpret: bool = False,
    seeds_prepadded: bool = False,
    iters: int = 1,
):
    """One fused value-carry sweep pass.  ``state`` carries candidate
    position channels 0..2 and payload channels, with a trailing
    occupancy channel when ``has_occ``; ``seeds`` stacks ``k`` rank
    fields of the same layout, or is None for the pre-merged state-only
    mode.  Returns the merged (C, N, N, N) state.  Compiled-path
    alignment: zc % 128 == 0 chunking, or zc == N single-chunk mode
    with the lane-aligning halo for 32-aligned grids (``halo_z``);
    tests run any N in interpret mode."""
    n_ch = state.shape[0]
    n = state.shape[1]
    assert n % tile == 0, "grid must divide the tile size"
    zc = min(zc, n)
    assert n % zc == 0
    # multi-chunk DMA starts (tz * zc) must be 128-aligned on the lane
    # dim; zc % 128 == 64 is allowed only in single-full-z-chunk mode
    assert zc % 128 == 0 or zc == n, (
        f"zc={zc} needs zc % 128 == 0 unless it spans the whole z axis"
    )
    if seeds is not None:
        assert seeds.shape[0] % n_ch == 0
        k = seeds.shape[0] // n_ch
    else:
        k = 0
    grid = (n // tile, n // tile, n // zc)
    h, hz = _HALO, halo_z(zc)
    w, wz = tile + 2 * h, zc + 2 * hz
    # Fused in-kernel iterations (temporal blocking): iteration j
    # sweeps a region extended reach*(iters-1-j) cells per side, so
    # every halo read of every iteration stays inside the DMA window.
    reach = max(strides)
    assert iters >= 1
    if iters > 1:
        assert periodic, "fused iters require periodic wrap semantics"
        assert reach * iters <= h and reach * iters <= hz, (
            f"iters={iters} needs halo >= {reach * iters} (h={h}, hz={hz})"
        )
        if not interpret and fit_iters(n_ch, k, zc, iters) < iters:
            # trace-time guard: this configuration's Mosaic stack
            # exceeds the ~16 MB scoped-VMEM limit (the round-4 chip
            # crash class).  Callers plan with fit_iters(); erroring
            # here (instead of silently degrading) keeps their sweep
            # pass accounting honest.
            raise ValueError(
                f"sweep_tiles_vals(iters={iters}, n_ch={n_ch}, k={k}, "
                f"zc={zc}) exceeds the scoped-VMEM envelope; consult "
                f"nn_pallas.fit_iters for the admissible count"
            )

    st_p = wrap_pad(state, 1, hz)
    operands = [st_p]
    scratch = [pltpu.VMEM((n_ch, w, w, wz), jnp.float32)]
    if k > 0:
        kt_p = seeds if seeds_prepadded else wrap_pad(seeds, 1, hz)
        operands.append(kt_p)
        scratch.append(pltpu.VMEM((k * n_ch, w, w, wz), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((len(operands),)))

    kernel = partial(
        _sweep_vals_kernel,
        n_grid=n,
        tile=tile,
        zc=zc,
        n_seeds=k,
        n_ch=n_ch,
        has_occ=has_occ,
        payload_out=payload_out,
        d2_out=d2_out,
        box_size=float(box_size),
        periodic=periodic,
        strides=strides,
        iters=iters,
    )
    n_out = (n_ch - 3 - (1 if has_occ else 0)) if payload_out else n_ch
    if payload_out and d2_out:
        n_out += 1
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(
            (n_out, tile, tile, zc), lambda i, j, l: (0, i, j, l),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, n, n, n), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
