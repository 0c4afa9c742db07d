"""Block-streamed folded spectra of DERIVED fields (velocity / energy)
at O(n_grid^3) memory — the reference's canonical large-velocity
workload (``scripts/parallel_optimized.py:337-398``: NN-gather velocity
per full-resolution point, phase, fold-accumulate), re-designed for TPU.

The full-resolution lattice (n_total = m * n_grid) is processed as the
m^3 contiguous blocks the fold sums over.  Because a fold maps full-res
cell ``i = q * n_grid + c`` onto folded cell ``c``, and the fold phase
splits as::

    exp(-i 2 pi beta . i / n_total)
      = exp(-i 2 pi beta . c / n_total) * exp(-i 2 pi beta . q / m)

the folded field for ANY beta is ``phase_c (x) sum_q s(q, beta) V_q``
with a per-(block, beta) COMPLEX SCALAR ``s`` and a beta-independent
block field ``V_q``.  So one pass over blocks services a whole batch of
betas: per block, compute the full-res field values once (NN gather or
scatter+divide), then update B running folded accumulators with B
scalar multiply-adds.  Memory is B folded cubes + one block working
set, never the n_total^3 grid (the thing ``run/cli.py`` round 1
materialized for gather methods — the planner-defeating bug).

Per-block NN is exact-by-construction inside a configurable margin:
each block's candidate set is every particle within ``margin_cells``
full-res cells of the block (periodic images included, open-box
distances — the reference ANN metric), padded to a fixed shape and
masked via ``nn_assign(valid=...)``.

The margin carries a per-block CERTIFICATE (``certify=True``, the
default): a particle excluded from block q's candidates is, along some
axis, more than ``margin_phys`` outside the block, hence more than
``margin_phys`` from every cell center inside the block — so any cell
whose ASSIGNED neighbor lies strictly closer than ``margin_phys`` is
provably unaffected by the margin (its true NN was among the
candidates).  Blocks with any uncertified cell are automatically re-run
with a doubled margin (up to the representability limit), so small
margins are safe by construction and the default can track the
particle density (~3 mean interparticle spacings) instead of a
worst-case constant — at 10M particles / 2048 range that is a 320^3
extended descent instead of 384^3, ~1.7x less NN work per block.  The
certificate bounds the CANDIDATE set, not the descent: fast-mode
assignments keep :func:`~vpower_tpu.deposit.nn.nn_assign`'s exactness
class among candidates; with ``exact=True`` a certified cell is
globally exact.

The reference pays the same query cost per beta loop
(``parallel_optimized.py:323-356`` re-queries Annoy inside the beta
loop; gen-2 cached indices on disk, ``parallel_disk.py:305-332``).
Here the block VALUES are cached host-side after the first pass
(``cache=True``), so sweeps with more betas than fit in one batch pay
the NN cost once.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.particles import Particles
from ..deposit import mxu_scatter
from ..deposit.nn import nn_assign, nn_gather_grid
from ..deposit.scatter import resolve_engine
from ..spectrum import power as power_mod
from ..spectrum.fold import get_phase
from ..spectrum.spectrum import PowerSpectrum, SpectrumList, init_beta_space

__all__ = ["streamed_folded_sweep", "streamed_folded_spectrum"]


def round_ext(n_grid: int, margin_cells: int):
    """``(n_ext, margin_cells)``: the extended block grid for streamed
    NN — the multigrid wants an even-split-friendly size and the Pallas
    sweep a lane-aligned one (multiples of 64 up to 384 via the
    single-full-z-chunk mode, multiples of 128 beyond).  Picks the
    smallest capable size so the requested margin is not inflated
    (margin 32 on a 256 block runs 320^3, 1.7x less NN work than
    384^3).  Shared with the planner's streamed memory model."""
    n_raw = n_grid + 2 * margin_cells
    if n_raw < 256:
        n_ext = int(np.ceil(n_raw / 8) * 8)
    else:
        n_ext = min(
            ne
            for r in (64, 128)
            for ne in (int(np.ceil(n_raw / r) * r),)
            if ne % 128 == 0 or ne <= 384
        )
    margin_cells = (n_ext - n_grid) // 2
    if n_ext - n_grid != 2 * margin_cells:
        n_ext += 8
        margin_cells = (n_ext - n_grid) // 2
    return n_ext, margin_cells


# ---------------------------------------------------------------------- #
# host-side per-block candidate runs (NN gather path)                    #
# ---------------------------------------------------------------------- #
def _block_candidates(
    particles: Particles, m: int, n_grid: int, margin_cells: int
):
    """Sort particle rows into m^3 per-block candidate runs.

    Returns ``(rows, starts, counts, pad, ext_box, margin_phys)`` where
    ``rows`` is an (R + pad, 7) float32 host array of
    ``[x, y, z (block-extended frame), vx, vy, vz, rho]`` with blocks
    contiguous; block q's run is ``rows[starts[q] : starts[q]+counts[q]]``
    and every run fits in a fixed ``pad``-row window (device-side
    ``dynamic_slice``).  Particles within ``margin_cells`` full-res
    cells of a block are included in its run with periodic images
    unwrapped into the extended open-box frame.
    """
    box = float(particles.box_size)
    n_total = m * n_grid
    cell = box / n_total
    margin_phys = margin_cells * cell
    block_size = box / m
    ext_size = block_size + 2.0 * margin_phys
    if ext_size > box + 1e-9 * box:
        raise ValueError(
            f"margin_cells={margin_cells} makes the extended block "
            f"({ext_size:.3g}) larger than the box ({box:.3g}); at most "
            f"one periodic image per particle is representable — lower "
            f"the margin to <= {(box - block_size) / 2 / cell:.0f} cells."
        )

    pos = np.asarray(particles.pos, np.float64) % box
    vel = np.asarray(particles.vel, np.float32)
    rho = np.asarray(particles.density, np.float32)

    # threaded native builder where the host runtime is available
    # (row-parity with the numpy path below; order within a run can
    # permute with the thread count — min-compares downstream are
    # order-free up to exact ties)
    from ..io import native as _native

    if _native.native_available():
        rows, starts, counts, pad = _native.block_candidates_host(
            np.asarray(particles.pos, np.float32), vel, rho,
            m, box, margin_phys,
        )
        return rows, starts, counts, pad, float(ext_size), margin_phys

    # Vectorized membership: particle x belongs to block q along an axis
    # iff (x + margin - q * bs) mod L < ext.  With rel0 the offset in
    # the HIGHEST containing block (j = 0), the j-th lower block holds
    # the particle at rel0 + j * bs < ext, so the per-axis block count
    # is n_a = ceil((ext - rel0) / bs) capped at m (j's distinct mod m).
    # Each particle's n_x * n_y * n_z combos expand through ONE
    # mixed-radix np.repeat decode — a single R-row gather pass instead
    # of J^3 masked 10M-row passes, and an int32-key radix argsort
    # instead of int64: ~5x faster host stage than the loop it replaces
    # (which itself replaced m^3 full passes, ~10 min at m = 8).
    y = pos + margin_phys
    q_hi = np.floor(y / block_size).astype(np.int32)  # (N, 3)
    rel0 = (y - q_hi * block_size).astype(np.float32)  # in [0, bs)
    n_ax = np.minimum(
        np.ceil((ext_size - rel0.astype(np.float64)) / block_size)
        .astype(np.int32),
        m,
    )  # (N, 3) >= 1 since ext >= bs

    c = n_ax[:, 0] * n_ax[:, 1] * n_ax[:, 2]          # combos/particle
    n = pos.shape[0]
    total = int(c.sum())
    pid = np.repeat(np.arange(n, dtype=np.int64), c)  # (R,)
    base = np.zeros(n + 1, np.int64)
    np.cumsum(c, out=base[1:])
    r = np.arange(total, dtype=np.int64) - base[pid]  # combo rank
    nz = n_ax[pid, 2]
    ny = n_ax[pid, 1]
    jz = (r % nz).astype(np.int32)
    t = r // nz
    jy = (t % ny).astype(np.int32)
    jx = (t // ny).astype(np.int32)

    qh = q_hi[pid]
    bids = (
        ((qh[:, 0] - jx) % m) * m + (qh[:, 1] - jy) % m
    ) * m + (qh[:, 2] - jz) % m
    rel = rel0[pid]
    bsf = np.float32(block_size)
    rel[:, 0] += jx.astype(np.float32) * bsf
    rel[:, 1] += jy.astype(np.float32) * bsf
    rel[:, 2] += jz.astype(np.float32) * bsf

    order = np.argsort(bids, kind="stable")  # int32 keys -> radix sort
    bids = bids[order]
    counts = np.bincount(bids, minlength=m**3).astype(np.int64)
    pad = max(int(counts.max()), 1)
    starts = np.zeros((m**3,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sel = pid[order]
    rows = np.empty((total + pad, 7), np.float32)
    rows[:total, :3] = rel[order]
    rows[:total, 3:6] = vel[sel]
    rows[:total, 6] = rho[sel]
    rows[total:] = 0.0
    return rows, starts, counts, pad, float(ext_size), margin_phys


@partial(jax.jit, static_argnames=("m", "box", "block_size", "margin_phys"))
def _cand_table(pos, vel, rho, m, box, block_size, margin_phys):
    """Per-particle candidate table for the device-side builder:
    ``(T (N, 12) f32 [rel0, q_hi, ny, nz, vel, rho], c (N,) i32 combo
    counts)``.  One jit so the combo counts the expansion was sized for
    and the ones the decode uses cannot disagree."""
    ext_size = block_size + 2.0 * margin_phys
    y = (pos % box) + margin_phys
    q_hi = jnp.floor(y / block_size).astype(jnp.int32)
    rel0 = (y - q_hi.astype(jnp.float32) * block_size).astype(jnp.float32)
    n_ax = jnp.minimum(
        jnp.ceil((ext_size - rel0) / block_size).astype(jnp.int32), m
    )
    c = n_ax[:, 0] * n_ax[:, 1] * n_ax[:, 2]
    table = jnp.concatenate(
        [
            rel0,
            q_hi.astype(jnp.float32),
            n_ax[:, 1:3].astype(jnp.float32),
            vel.astype(jnp.float32),
            rho[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return table, c


@partial(jax.jit, static_argnames=("m", "block_size", "r_pad"))
def _cand_expand_sort(table, c, m, block_size, r_pad):
    """Expand each particle's combos (mixed-radix decode of a flat rank)
    and sort rows by block id — all on device.  Returns
    ``(rows (r_pad, 7), starts (m^3,), counts (m^3,))``.  Rows past the
    real total carry the sentinel block id m^3: they sort to the end,
    past every run."""
    n = c.shape[0]
    n_t = m**3
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(c, dtype=jnp.int32)]
    )
    r_total = base[n]
    i = jnp.arange(r_pad, dtype=jnp.int32)
    # owner of row i = #particles whose combo range ends at or before i
    # (scatter-mark + prefix sum; searchsorted would binary-search-gather
    # 24x the rows)
    mark = jnp.zeros((r_pad + 1,), jnp.int32).at[
        jnp.minimum(base[1:], r_pad)
    ].add(1)
    pid = jnp.cumsum(mark[:r_pad])
    valid = i < r_total
    pidc = jnp.minimum(pid, n - 1)
    g = table[pidc]                                  # ONE row gather
    r = i - base[pidc]
    ny = g[:, 6].astype(jnp.int32)
    nz = g[:, 7].astype(jnp.int32)
    jz = r % nz
    t = r // nz
    jy = t % ny
    jx = t // ny
    q = g[:, 3:6].astype(jnp.int32)
    bids = (
        ((q[:, 0] - jx) % m) * m + (q[:, 1] - jy) % m
    ) * m + (q[:, 2] - jz) % m
    bids = jnp.where(valid, bids, n_t).astype(jnp.int32)
    off = jnp.stack([jx, jy, jz], 1).astype(jnp.float32) * jnp.float32(
        block_size
    )
    rows_u = jnp.concatenate([g[:, :3] + off, g[:, 8:12]], axis=1)
    sk, perm = jax.lax.sort(
        (bids, i), num_keys=1, is_stable=True
    )
    rows = rows_u[perm]
    bounds = jnp.searchsorted(sk, jnp.arange(n_t + 1, dtype=jnp.int32))
    starts = bounds[:-1].astype(jnp.int32)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    return rows, starts, counts


def _block_candidates_device(
    particles: Particles, m: int, n_grid: int, margin_cells: int
):
    """Device-side :func:`_block_candidates`: same run layout, built by
    the TPU's sort instead of host numpy (the 34M-row host build took
    ~100 s on a 1-vCPU host; the device build is seconds).  Returns
    ``rows`` as a DEVICE array."""
    if jax.default_backend() == "cpu":
        # lax.sort is single-threaded on CPU; the host builder (native
        # where available) is the faster path there
        rows, starts, counts, pad, ext_size, margin_phys = \
            _block_candidates(particles, m, n_grid, margin_cells)
        return (jnp.asarray(rows), starts, counts, pad, ext_size,
                margin_phys)
    box = float(particles.box_size)
    n_total = m * n_grid
    cell = box / n_total
    margin_phys = margin_cells * cell
    block_size = box / m
    ext_size = block_size + 2.0 * margin_phys
    if ext_size > box + 1e-9 * box:
        raise ValueError(
            f"margin_cells={margin_cells} makes the extended block "
            f"({ext_size:.3g}) larger than the box ({box:.3g}); at most "
            f"one periodic image per particle is representable — lower "
            f"the margin to <= {(box - block_size) / 2 / cell:.0f} cells."
        )
    table, c = _cand_table(
        particles.pos, particles.vel, particles.density,
        m, box, block_size, margin_phys,
    )
    r_total = int(jnp.sum(c))
    # round the static expansion size up (few recompiles across runs)
    quantum = 1 << 22 if r_total > (1 << 22) else 1024
    r_pad = ((r_total + quantum) // quantum) * quantum  # >= total + pad
    rows, starts_d, counts_d = _cand_expand_sort(
        table, c, m, block_size, r_pad
    )
    starts = np.asarray(starts_d, np.int64)
    counts = np.asarray(counts_d, np.int64)
    pad = max(int(counts.max()), 1)
    if r_total + pad > r_pad:  # every block window must stay in bounds
        rows = jnp.pad(rows, ((0, r_total + pad - r_pad), (0, 0)))
    return rows, starts, counts, pad, float(ext_size), margin_phys


def _default_margin_cells(n_grid: int, n_total: int, n_particles: int):
    """Density-aware default candidate margin: ~3 mean interparticle
    spacings in full-res cells (Poisson P(NN > 3 spacings) ~ e^-113, so
    violations only arise in genuinely under-dense regions — which the
    certificate catches and escalates per block).  Never larger than
    the former worst-case default ``n_grid // 4``."""
    spacing = n_total / max(float(n_particles), 1.0) ** (1.0 / 3.0)
    return int(min(max(8, int(np.ceil(3.0 * spacing))),
                   max(n_grid // 4, 8)))


def _round_ext_capped(n_grid: int, margin_cells: int, margin_max: int):
    """:func:`round_ext` with the representability cap: the rounded
    margin never exceeds ``margin_max`` (= floor((box - block)/2/cell),
    beyond which a particle could need two periodic images in the
    extended open-box frame).  Past the cap the extended size rounds
    DOWN to a multiple of 8 (any even-split multigrid size; the sweep
    falls back to XLA if the Pallas tiling does not fit)."""
    n_ext, mc = round_ext(n_grid, min(margin_cells, margin_max))
    if mc > margin_max:
        mc = margin_max // 4 * 4  # 2*mc keeps n_ext a multiple of 8
        if mc <= 0:
            mc = margin_max
        n_ext = n_grid + 2 * mc
    return n_ext, mc


def _single_block_rows(
    particles: Particles, q3: np.ndarray, m: int, margin_phys: float,
    pad_quantum: int = 4096, device=None,
):
    """Candidate rows of ONE block at an arbitrary margin — the
    escalation path of the margin certificate (recomputed from the full
    particle set; the pre-sorted runs were built for the base margin).
    Returns ``(rows (Kpad, 7) f32 device array, count)`` in the block's
    extended open-box frame, padded to a ``pad_quantum`` multiple so
    escalations reuse compiles."""
    box = float(particles.box_size)
    from ..io import native as _native

    if _native.native_available():
        # threaded native selection: a mass escalation (hundreds of
        # blocks) stays seconds of host time instead of minutes of
        # numpy full-array passes on a 1-vCPU-class host
        sel, k = _native.single_block_rows_host(
            np.asarray(particles.pos, np.float32),
            np.asarray(particles.vel, np.float32),
            np.asarray(particles.density, np.float32),
            m, box, margin_phys, q3,
        )
        kpad = max((k + pad_quantum) // pad_quantum * pad_quantum,
                   pad_quantum)
        rows = np.zeros((kpad, 7), np.float32)
        rows[:k] = sel[:k]
    else:
        bs = box / m
        ext = bs + 2.0 * margin_phys
        pos = np.asarray(particles.pos, np.float64) % box
        lo = q3.astype(np.float64) * bs
        rel = (pos - lo[None, :] + margin_phys) % box
        inside = np.all(rel < ext, axis=1)
        k = int(inside.sum())
        kpad = max((k + pad_quantum) // pad_quantum * pad_quantum,
                   pad_quantum)
        rows = np.zeros((kpad, 7), np.float32)
        rows[:k, :3] = rel[inside]
        rows[:k, 3:6] = np.asarray(particles.vel, np.float32)[inside]
        rows[:k, 6] = np.asarray(particles.density, np.float32)[inside]
    if device is not None:
        return jax.device_put(rows, device), k
    return jnp.asarray(rows), k


# ---------------------------------------------------------------------- #
# per-block full-resolution field values                                 #
# ---------------------------------------------------------------------- #
def _block_values_at(cand, count, n_grid, n_ext_q, mc_q, cell_total,
                     quantity, exact, want_certify, want_mask=False):
    """One block's (n_ch, n_grid^3) values at an explicit extended size:
    exact mode routes through the provably-exact window sweep where its
    tiling fits; everything else takes the jitted value-carry/ring
    path.  Shared by the sweep drivers and the escalation loop
    (``want_mask=True`` also returns the flat per-cell suspect mask for
    the wrap-exact backstop)."""
    n_ch = 1 if quantity == "energy" else 3
    ext_q = n_ext_q * cell_total
    if exact and n_ext_q % 64 == 0:
        out = _nn_block_values_exact(
            cand, count, n_grid, n_ext_q, mc_q, float(ext_q),
            float(cell_total), quantity, certify=want_certify,
            want_mask=want_mask,
        )
    else:
        out = _nn_block_values(
            cand, count, n_grid, n_ext_q, mc_q, float(ext_q),
            float(cell_total), quantity, exact, certify=want_certify,
            want_mask=want_mask,
        )
    if want_certify and want_mask:
        return (out[0].reshape(n_ch, n_grid**3), out[1],
                out[2].reshape(n_grid**3))
    if want_certify:
        return out[0].reshape(n_ch, n_grid**3), out[1]
    return out.reshape(n_ch, n_grid**3)


# Work ceiling for the wrap-exact brute-force backstop (suspect cells
# x particles).  2e12 pair distances is ~10-60 s of VPU time — past it
# the uncertified cells keep the in-frame assignment with a warning
# (a production snapshot dense enough to matter never gets here: the
# backstop only triggers on voids wider than (L - L/m)/2).
_WRAP_BRUTE_BUDGET = 2.0e12


@partial(jax.jit, static_argnames=("box",))
def _wrap_nn_brute(cgrps, pos, pay, box):
    """True PERIODIC-metric NN payloads for cell-center groups
    ``cgrps (G, CH, 3)`` against every particle — the brute-force
    exactness backstop past the extended-frame representability cap
    (the open-box frame can misrank pairs beyond axis distance L/2;
    the wrap metric here cannot)."""

    def one(_, c):
        d2 = jnp.zeros((c.shape[0], pos.shape[0]), jnp.float32)
        for a in range(3):
            d = jnp.abs(pos[None, :, a] - c[:, a, None])
            d = jnp.minimum(d, box - d)
            d2 = d2 + d * d
        return None, pay[jnp.argmin(d2, axis=1)]

    _, out = jax.lax.scan(one, None, cgrps)
    return out


def _wrap_exact_cells(particles, q3, m, n_grid, cell_total, quantity,
                      sus_flat):
    """(n_bad, C) true periodic-NN values for the flat block-cell ids
    ``sus_flat`` (C-order within the block)."""
    box = float(particles.box_size)
    iz = sus_flat % n_grid
    iy = (sus_flat // n_grid) % n_grid
    ix = sus_flat // (n_grid * n_grid)
    centers = (
        (q3[None, :] * n_grid + np.stack([ix, iy, iz], axis=1)) + 0.5
    ).astype(np.float64) * cell_total
    n_bad = int(sus_flat.shape[0])
    ch = 64
    padb = (-n_bad) % ch
    centers = np.pad((centers % box).astype(np.float32),
                     ((0, padb), (0, 0)))
    pos = jnp.asarray(particles.pos, jnp.float32) % box
    pay = _quantity_vals(
        jnp.asarray(particles.vel, jnp.float32),
        jnp.asarray(particles.density, jnp.float32),
        cell_total, quantity,
    )
    out = _wrap_nn_brute(
        jnp.asarray(centers).reshape(-1, ch, 3), pos, pay, box
    )
    return np.asarray(out).reshape(-1, pay.shape[1])[:n_bad]


def _escalate_block(particles, q, m, n_grid, base_margin_cells,
                    margin_max, cell_total, quantity, exact,
                    device=None):
    """Re-run one uncertified block at doubled margins until the
    certificate clears; at the representability cap the remaining
    suspect cells get their TRUE periodic NN by brute force
    (:func:`_wrap_nn_brute`), so every cell ends exact — unless the
    suspect-cells x particles work exceeds ``_WRAP_BRUTE_BUDGET``,
    where the best in-frame attempt is kept with a warning.  Returns
    ``(vals (n_ch, n_grid^3), n_uncertified)``."""
    q3 = np.array([q // (m * m), (q // m) % m, q % m], np.int64)
    mc_req = base_margin_cells
    while True:
        mc_req = min(max(mc_req * 2, mc_req + 8), margin_max)
        n_ext2, mc = _round_ext_capped(n_grid, mc_req, margin_max)
        if exact and n_ext2 % 64 and n_grid % 2 == 0:
            # keep exact escalations on the window sweep
            ne64 = int(np.ceil(n_ext2 / 64) * 64)
            if (ne64 - n_grid) // 2 <= margin_max:
                n_ext2 = ne64
                mc = (ne64 - n_grid) // 2
        rows2, k2 = _single_block_rows(
            particles, q3, m, mc * cell_total, device=device,
        )
        at_cap = mc_req >= margin_max
        out = _block_values_at(
            rows2, jnp.int32(k2), n_grid, n_ext2, mc, cell_total,
            quantity, exact, True, want_mask=at_cap,
        )
        vals, nsus = out[0], out[1]
        n_bad = int(nsus)
        if n_bad == 0 or at_cap:
            if n_bad:
                sus_flat = np.nonzero(np.asarray(out[2]))[0]
                n_p = int(particles.pos.shape[0])
                if n_bad * n_p <= _WRAP_BRUTE_BUDGET:
                    fix = _wrap_exact_cells(
                        particles, q3, m, n_grid, cell_total,
                        quantity, sus_flat,
                    )
                    vals_np = np.array(vals)  # mutable host copy
                    vals_np[:, sus_flat] = fix.T
                    vals = (jax.device_put(vals_np, device)
                            if device is not None
                            else jnp.asarray(vals_np))
                    n_bad = 0
                else:
                    import warnings

                    warnings.warn(
                        f"block {q}: {n_bad} cells uncertified at the "
                        f"largest representable margin ({mc} cells) "
                        f"and the wrap-exact backstop would need "
                        f"{n_bad * n_p:.1e} pair distances (budget "
                        f"{_WRAP_BRUTE_BUDGET:.0e}); those cells keep "
                        f"their nearest in-frame assignment.",
                        stacklevel=2,
                    )
            return vals, n_bad


def _quantity_vals(vel, rho, cell, quantity):
    """Per-particle payload channels for a derived quantity (reference
    semantics: mass = rho * Lcell^3, ``interp.py:273``)."""
    if quantity == "velocity":
        return vel
    if quantity == "momentum":
        return vel * (rho[:, None] * cell**3)
    if quantity == "energy":
        return (rho * cell**3 * jnp.sum(vel**2, axis=1))[:, None]
    raise ValueError(f"Unsupported quantity {quantity!r}")


def _nn_block_values_exact(
    cand, count, n_grid, n_ext, margin_cells, ext_box, cell, quantity,
    certify=False, want_mask=False,
):
    """Provably-exact variant of :func:`_nn_block_values` — routes the
    block through the sorted-segment window sweep
    (:func:`vpower_tpu.deposit.nn_window.nn_window_gather`), exact
    among the block's candidates (i.e. exact wherever the true NN lies
    within the margin — the block-candidate contract).  Host-orchestrated
    (the sweep's tier decisions sync), so NOT jitted.

    ``certify=True`` additionally returns the count of interior cells
    whose assigned distance REACHES the margin (the cells the margin
    certificate cannot clear — see the module docstring)."""
    from ..deposit.nn_window import nn_window_gather

    pos = cand[:, :3]
    valid = jnp.arange(cand.shape[0], dtype=jnp.int32) < count
    vals = _quantity_vals(cand[:, 3:6], cand[:, 6], cell, quantity)
    pay, d2, occ = nn_window_gather(
        pos, vals, n_ext, ext_box, periodic=False, valid=valid,
    )
    sl = slice(margin_cells, margin_cells + n_grid)
    n_ch = pay.shape[0]
    out = jnp.where(occ > 0.5, pay[:, sl, sl, sl], 0.0).reshape(
        n_ch, n_grid**3
    )
    if not certify:
        return out
    margin_phys = margin_cells * (ext_box / n_ext)
    sus = d2[sl, sl, sl] >= margin_phys * margin_phys
    if want_mask:
        return out, jnp.sum(sus).astype(jnp.int32), sus
    return out, jnp.sum(sus).astype(jnp.int32)
@partial(
    jax.jit,
    static_argnames=(
        "n_grid", "n_ext", "margin_cells", "ext_box", "cell", "quantity",
        "exact", "certify", "want_mask",
    ),
)
def _nn_block_values(
    cand: jax.Array,   # (P, 7) [pos(ext frame), vel, rho]
    count: jax.Array,  # () int
    n_grid: int,
    n_ext: int,
    margin_cells: int,
    ext_box: float,
    cell: float,
    quantity: str,
    exact: bool,
    certify: bool = False,
    want_mask: bool = False,
):
    """(C, n_grid^3) full-res field values of one block by exact-NN
    gather (reference ANN semantics: open-box metric, value of the
    nearest particle — ``interp.py:246-277, 1018-1049``).

    ``want_mask=True`` (escalation's final attempt only) additionally
    returns the per-cell suspect mask (n, n, n bool) so the wrap-exact
    backstop knows WHICH cells to brute-force.

    The fast path (``exact=False``) carries the quantity's channels
    through the Voronoi descent (:func:`~vpower_tpu.deposit.nn.
    nn_gather_grid`) instead of gathering rows afterwards — the gather
    was the single largest cost of the 2048-range streamed run.

    ``certify=True`` also returns an int32 scalar: the number of
    interior cells whose assigned distance reaches ``margin_cells``
    cells (cells the margin certificate cannot prove unaffected by the
    finite candidate margin; unoccupied cells count as uncertified).
    """
    pos = cand[:, :3]
    vel = cand[:, 3:6]
    rho = cand[:, 6]
    valid = jnp.arange(cand.shape[0], dtype=jnp.int32) < count
    sl = slice(margin_cells, margin_cells + n_grid)
    margin_phys = margin_cells * (ext_box / n_ext)

    if not exact:
        vals = _quantity_vals(vel, rho, cell, quantity)
        if certify:
            g, occ, d2 = nn_gather_grid(
                pos, vals, n_ext, ext_box, periodic=False, valid=valid,
                return_d2=True,
            )
            out = jnp.where(occ > 0.5, g[:, sl, sl, sl], 0.0)
            sus = d2[sl, sl, sl] >= margin_phys * margin_phys
            n_sus = jnp.sum(sus).astype(jnp.int32)
            if want_mask:
                return out, n_sus, sus
            return out, n_sus
        g, occ = nn_gather_grid(
            pos, vals, n_ext, ext_box, periodic=False, valid=valid,
        )
        return jnp.where(occ > 0.5, g[:, sl, sl, sl], 0.0)

    idx = nn_assign(
        pos, n_ext, ext_box, periodic=False,
        n_seeds=3,
        refine_radius=2,
        valid=valid,
    )
    idx = idx[sl, sl, sl]
    ok = idx >= 0
    idxc = jnp.where(ok, idx, 0)

    def gather(f):
        return jnp.where(ok, f[idxc], 0.0)

    if quantity == "velocity":
        out = jnp.stack([gather(vel[:, c]) for c in range(3)])
    else:
        # reference mass = rho * Lcell^3 (interp.py:273)
        mass = rho * cell**3
        if quantity == "momentum":
            out = jnp.stack([gather(mass * vel[:, c]) for c in range(3)])
        elif quantity == "energy":
            out = gather(mass * jnp.sum(vel**2, axis=1))[None]
        else:
            raise ValueError(f"Unsupported quantity {quantity!r}")
    if not certify:
        return out
    ax = (jnp.arange(n_grid, dtype=pos.dtype)
          + (margin_cells + 0.5)) * (ext_box / n_ext)
    p = pos[idxc]
    d2 = ((p[..., 0] - ax[:, None, None]) ** 2
          + (p[..., 1] - ax[None, :, None]) ** 2
          + (p[..., 2] - ax[None, None, :]) ** 2)
    # the ring-refined path is only PROVABLY exact when the assignment
    # lies within the refine radius (2 cells) — certify to the tighter
    # of that and the margin, so exact-mode blocks on non-window grid
    # sizes self-escalate to a window-capable size instead of silently
    # keeping ring-class assignments
    thresh = min(margin_phys, 2.0 * ext_box / n_ext)
    sus = ~ok | (d2 >= thresh * thresh)
    if want_mask:
        return out, jnp.sum(sus).astype(jnp.int32), sus
    return out, jnp.sum(sus).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("n_grid", "n_total", "box", "method", "quantity",
                     "s_max"),
)
def _scatter_block_values(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    block_q: jax.Array,  # (3,) int32 — traced: one compile for all blocks
    n_grid: int,
    n_total: int,
    box: float,
    method: str,
    quantity: str,
    h: jax.Array = None,
    s_max: int = 1,
) -> jax.Array:
    """(C, n_grid^3) full-res field values of one block by scatter
    deposition + division — the NGP/CIC/SPH analog of the NN gather
    (same block semantics; full-res cells partition exactly across
    blocks).  SPH weights are normalized over the particle's FULL
    footprint (identical in every block), so contributions straddling
    block boundaries land in whichever block owns the target cell and
    global conservation is exact."""
    cell = box / n_total
    n_cells = n_grid**3
    values = jnp.concatenate(
        [vel * mass[:, None], mass[:, None]], axis=1
    )

    if method == "ngp":
        corners = [(jnp.floor(pos / cell).astype(jnp.int32) % n_total, None)]
    elif method == "sph":
        from ..deposit.sph import kernel_weight

        h_eff = jnp.clip(h, 1e-6 * cell, (s_max + 0.5) * cell)
        base = jnp.floor(pos / cell).astype(jnp.int32)

        def offset_weight(d):
            center = (base.astype(pos.dtype)
                      + jnp.asarray(d, pos.dtype) + 0.5) * cell
            delta = pos - center
            delta = delta - box * jnp.round(delta / box)
            r = jnp.sqrt(jnp.sum(delta * delta, axis=1))
            return kernel_weight(r / h_eff, "cubic_spline")

        offs = [(dx, dy, dz)
                for dx in range(-s_max, s_max + 1)
                for dy in range(-s_max, s_max + 1)
                for dz in range(-s_max, s_max + 1)]
        wsum = jnp.zeros(pos.shape[0], pos.dtype)
        for d in offs:
            wsum = wsum + offset_weight(d)
        degenerate = wsum <= 0.0
        wsum = jnp.where(degenerate, 1.0, wsum)
        corners = []
        for d in offs:
            w = offset_weight(d) / wsum
            w = jnp.where(
                degenerate,
                jnp.asarray(1.0 if d == (0, 0, 0) else 0.0, pos.dtype),
                w,
            )
            idx = (base + jnp.asarray(d, jnp.int32)[None, :]) % n_total
            corners.append((idx, w))
    elif method == "cic":
        u = pos / cell - 0.5
        base = jnp.floor(u).astype(jnp.int32)
        frac = u - base
        corners = []
        for dx in (0, 1):
            wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
            for dy in (0, 1):
                wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
                for dz in (0, 1):
                    wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                    idx = jnp.stack(
                        [(base[:, 0] + dx) % n_total,
                         (base[:, 1] + dy) % n_total,
                         (base[:, 2] + dz) % n_total], axis=1
                    )
                    corners.append((idx, wx * wy * wz))
    else:
        raise ValueError(f"Unsupported scatter method {method!r}")

    ids_all, vals_all = [], []
    lo = block_q * n_grid
    for idx, w in corners:
        loc = idx - lo[None, :]
        inside = jnp.all((loc >= 0) & (loc < n_grid), axis=1)
        flat = (loc[:, 0] * n_grid + loc[:, 1]) * n_grid + loc[:, 2]
        ids_all.append(jnp.where(inside, flat, n_cells))
        vals_all.append(values if w is None else values * w[:, None])
    ids = jnp.concatenate(ids_all) if len(ids_all) > 1 else ids_all[0]
    vals = jnp.concatenate(vals_all) if len(vals_all) > 1 else vals_all[0]

    engine = resolve_engine("auto", n_grid)
    if engine == "mxu":
        # outside-block ids hold the sentinel n_cells — exactly the
        # value the deposit plan's pair tables mask out.
        res = jax.lax.sort(
            (ids,) + tuple(vals[:, c] for c in range(vals.shape[1])),
            num_keys=1,
        )
        flat4 = mxu_scatter.mxu_deposit_sorted(
            res[0], jnp.stack(res[1:], axis=1), n_grid
        ).reshape(vals.shape[1], n_cells)
    else:
        grid = jax.ops.segment_sum(
            vals, ids, num_segments=n_cells + 1
        )[:n_cells]
        flat4 = grid.T
    mv, mg = flat4[:3], flat4[3]
    if quantity == "momentum":
        return mv
    safe = jnp.where(mg > 0, mg, 1.0)
    v = jnp.where(mg[None] > 0, mv / safe[None], 0.0)
    if quantity == "velocity":
        return v
    if quantity == "energy":
        return (mg * jnp.sum(v**2, axis=0))[None]
    raise ValueError(f"Unsupported quantity {quantity!r}")


# ---------------------------------------------------------------------- #
# accumulate + finish                                                    #
# ---------------------------------------------------------------------- #
def _backend_jit(fn, static=(), donate=()):
    """jit with buffer donation on accelerators only — the CPU backend
    cannot honor these donations and warns once per compile, which
    turns every CPU-mesh test run into warning noise."""
    fast = partial(jax.jit, static_argnames=static,
                   donate_argnames=donate)(fn)
    plain = partial(jax.jit, static_argnames=static)(fn)

    def wrapper(*args, **kwargs):
        use = plain if jax.default_backend() == "cpu" else fast
        return use(*args, **kwargs)

    return wrapper


def _add_inplace_impl(a: jax.Array, b: jax.Array) -> jax.Array:
    """Reduce per-device folded accumulators onto one device (the
    round-robin multi-device mode's batch-end combine)."""
    return a + b


_add_inplace = _backend_jit(_add_inplace_impl, donate=("a",))


@partial(
    jax.jit,
    static_argnames=(
        "pad", "n_grid", "n_ext", "margin_cells", "ext_box", "cell",
        "quantity", "exact", "certify", "want_lo",
    ),
)
def _nn_chunk_values(
    rows: jax.Array,     # (R + pad, 7) device candidate rows
    starts: jax.Array,   # (m^3,) int32
    counts: jax.Array,   # (m^3,) int32
    qs: jax.Array,       # (chunk,) int32 block ids to compute
    pad: int,
    n_grid: int,
    n_ext: int,
    margin_cells: int,
    ext_box: float,
    cell: float,
    quantity: str,
    exact: bool,
    certify: bool,
    want_lo: bool,
):
    """A CHUNK of blocks' field values in ONE dispatch — a ``lax.scan``
    over block ids (the round-3 record spent ~30% of its wall time on
    per-block host dispatch; the distributed path already scanned
    blocks, this is the same shape single-device).  Returns
    ``(vals (chunk, C, n_grid^3) f32, lo, nsus (chunk,) i32)`` where
    ``lo`` is a float16 copy for the host block cache (``want_lo``;
    halves the device->host pull) or a per-step scalar placeholder."""
    n_ch = 1 if quantity == "energy" else 3

    def body(_, q):
        cand = jax.lax.dynamic_slice(
            rows, (starts[q], jnp.int32(0)), (pad, rows.shape[1])
        )
        out = _nn_block_values(
            cand, counts[q], n_grid, n_ext, margin_cells, ext_box,
            cell, quantity, exact, certify=certify,
        )
        if certify:
            vals, nsus = out[0], out[1]
        else:
            vals, nsus = out, jnp.int32(0)
        vals = vals.reshape(n_ch, n_grid**3)
        lo = vals.astype(jnp.float16) if want_lo else jnp.float16(0.0)
        return None, (vals, lo, nsus)

    _, (vals, lo, nsus) = jax.lax.scan(body, None, qs)
    return vals, lo, nsus


@partial(
    jax.jit,
    static_argnames=(
        "n_grid", "n_total", "box", "method", "quantity", "s_max",
        "want_lo",
    ),
)
def _scatter_chunk_values(
    pos, vel, mass, qs, n_grid, n_total, box, method, quantity,
    h=None, s_max: int = 1, want_lo: bool = False,
):
    """Scatter-method counterpart of :func:`_nn_chunk_values` (same
    one-dispatch-per-chunk contract, no certificate)."""
    m = n_total // n_grid
    n_ch = 1 if quantity == "energy" else 3

    def body(_, q):
        qv = jnp.stack([q // (m * m), (q // m) % m, q % m]).astype(
            jnp.int32
        )
        vals = _scatter_block_values(
            pos, vel, mass, qv, n_grid, n_total, box, method, quantity,
            h=h, s_max=s_max,
        ).reshape(n_ch, n_grid**3)
        lo = vals.astype(jnp.float16) if want_lo else jnp.float16(0.0)
        return None, (vals, lo)

    _, (vals, lo) = jax.lax.scan(body, None, qs)
    return vals, lo


def _accumulate_chunk_impl(
    acc_re: jax.Array, acc_im: jax.Array,  # (B, C, n^3) f32
    vals: jax.Array,                       # (Q, C, n^3) f32/f16
    s_re: jax.Array, s_im: jax.Array,      # (B, Q) f32
) -> Tuple[jax.Array, jax.Array]:
    """acc += s @ vals over a whole block chunk — one read/write of the
    accumulators per CHUNK instead of per block."""
    v = vals.astype(jnp.float32).reshape(vals.shape[0], -1)
    sh = acc_re.shape
    return (
        (acc_re.reshape(sh[0], -1) + s_re @ v).reshape(sh),
        (acc_im.reshape(sh[0], -1) + s_im @ v).reshape(sh),
    )


_accumulate_chunk = _backend_jit(
    _accumulate_chunk_impl, donate=("acc_re", "acc_im")
)


@partial(jax.jit, donate_argnames=("acc_re", "acc_im"))
def _accumulate(
    acc_re: jax.Array, acc_im: jax.Array,  # (B, C, n^3) float32 each
    vals: jax.Array,                       # (C, n^3) float32
    s_re: jax.Array, s_im: jax.Array,      # (B,) float32
) -> Tuple[jax.Array, jax.Array]:
    """acc += s (B,) complex * vals, carried as (re, im) REAL pairs:
    complex64 buffers crossing a jit boundary are unimplemented on the
    axon TPU platform (complex is fine strictly inside a program)."""
    return (
        acc_re + s_re[:, None, None] * vals[None],
        acc_im + s_im[:, None, None] * vals[None],
    )


@partial(jax.jit, static_argnames=("n_grid", "n_total", "box", "n_bins"))
def _finish_beta(
    acc_re: jax.Array,    # (C, n^3) f32 — Re sum_q s(q, beta) V_q
    acc_im: jax.Array,    # (C, n^3) f32
    beta: jax.Array,      # (3,) int32
    n_grid: int,
    n_total: int,
    box: float,
    n_bins: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Apply the per-cell phase, FFT, and bin one folded sub-spectrum on
    the global k lattice (same lattice/kshift conventions as
    ``_fused_fold_sweep_device``)."""
    m = n_total // n_grid
    folded_box = box / m
    shape = (acc_re.shape[0],) + (n_grid,) * 3
    phase = get_phase(beta, total_n=n_total, n_local=n_grid)
    acc_beta = jax.lax.complex(acc_re, acc_im)  # complex stays inside jit
    f = acc_beta.reshape(shape) * phase[None]
    p_grid = power_mod.vector_power_from_complex(f, folded_box)
    kmin = 2.0 * jnp.pi / box
    kshift = 2.0 * jnp.pi * beta.astype(p_grid.dtype) / box
    bins = power_mod.bin_grid_local(
        p_grid.shape, n_grid, folded_box, float(kmin), float(kmin),
        n_bins, jnp.zeros((3,), jnp.int32), kshift, dtype=p_grid.dtype,
    )
    psum, nsamp = power_mod._cascade_bin(p_grid, bins, n_bins)
    k_centers = kmin + kmin * jnp.arange(n_bins, dtype=p_grid.dtype)
    return k_centers, psum, nsamp


def _finish_batch_impl(
    acc_re: jax.Array,   # (B, C, n^3)
    acc_im: jax.Array,   # (B, C, n^3)
    betas: jax.Array,    # (B, 3) int32
    n_grid: int,
    n_total: int,
    box: float,
    n_bins: int,
):
    """All of a batch's :func:`_finish_beta` calls in ONE dispatch (a
    ``lax.scan`` over the beta axis): the per-beta phase+FFT+bin work
    is small, so issuing it per beta paid a host round trip each — the
    finish stage of the 2048-range run was dispatch-bound."""

    def body(_, x):
        ar, ai, b = x
        return None, _finish_beta(ar, ai, b, n_grid, n_total, box, n_bins)

    _, (k, psum, nsamp) = jax.lax.scan(body, None, (acc_re, acc_im, betas))
    return k, psum, nsamp


# no donation: the outputs are small spectra, so no input buffer can be
# reused and XLA warns "donated buffers were not usable" on every run
_finish_batch = _backend_jit(
    _finish_batch_impl,
    static=("n_grid", "n_total", "box", "n_bins"),
)


# ---------------------------------------------------------------------- #
# driver                                                                 #
# ---------------------------------------------------------------------- #
def streamed_folded_sweep(
    particles: Particles,
    n_grid: int,
    m: int,
    quantity: str = "velocity",
    method: str = "nn",
    beta_sequence: Optional[np.ndarray] = None,
    beta_batch: int = 4,
    margin_cells: Optional[int] = None,
    exact: bool = False,
    certify: bool = True,
    cache: bool = True,
    cache_bytes_limit: float = 32e9,
    cache_dir: Optional[str] = None,
    devices=None,
    progress=None,
    on_spectrum=None,
    stage_times: Optional[dict] = None,
) -> SpectrumList:
    """Folded sub-spectra of a DERIVED field (velocity / energy /
    momentum) for any deposition method, with O(n_grid^3) device memory
    for a total dynamic range of ``m * n_grid``.

    One pass over the m^3 full-resolution blocks services
    ``beta_batch`` betas (B folded accumulators live at once); block
    values are computed by exact-NN gather (``method='nn'``) or
    scatter+divide (``'ngp'``/``'cic'``) and optionally cached host-side
    (float32 under ``cache_bytes_limit``, else float16) so later batches
    skip the deposition entirely.

    ``cache_dir``: spill the block-value cache to DISK (one ``.npy``
    per block) instead of RAM — the role the reference's gen-2 disk
    buffers played (``scripts/parallel_disk.py:67-85``), minus their
    recompute: a re-run (or a crash-resumed run) with the same
    ``cache_dir`` reuses every block already deposited, and host RAM
    stays O(1 block).  Files are committed atomically (tmp + rename),
    so a crash mid-write never leaves a truncated block.  The dtype
    still follows ``cache_bytes_limit`` (disk bytes instead of RAM).

    ``certify`` (NN only): verify per block that no interior cell's
    assigned neighbor reaches the candidate margin (which would mean
    the true NN could have been excluded); offending blocks re-run at
    doubled margins until certified or the margin hits the periodic
    representability limit.  With the certificate on, the default
    margin is density-aware (~3 mean spacings) instead of the
    worst-case ``n_grid // 4`` — the dominant per-block descent shrinks
    by ~1.7x at production occupancy.  The lookahead settle keeps one
    block in flight so certification does not serialize host and
    device.

    Matches the reference's canonical distributed pipeline semantics
    (``parallel_optimized.py:337-398``) — this is the "folded velocity
    power spectrum" the project is named for.

    ``devices``: optional list of devices — block q is placed on
    ``devices[q % ndev]`` (its candidate rows are transferred there and
    every jit, INCLUDING the window sweep's host-orchestrated exact
    passes and any certificate escalations, runs where its inputs
    live), with one folded accumulator per device summed at batch end.
    This is how EXACT mode distributes: the window sweep's tier
    decisions are data-dependent host syncs, which SPMD (`shard_map`)
    cannot express per block — round-robin placement keeps them while
    the other devices' queues stay busy.  Fast mode has a zero-sync
    block program, so :func:`vpower_tpu.parallel.streamed.
    distributed_streamed_sweep` (one jit, one psum) remains the better
    fast-mode route.

    ``stage_times``: pass a dict to receive a wall-clock breakdown —
    ``candidates_s`` (host-side per-block run sort), ``blocks_s``
    (deposition + fold-accumulate, synced once per batch by a scalar
    transfer — device syncs are free relative to a batch), ``finish_s``
    (per-beta FFT power + shell binning) — plus certificate stats:
    ``suspect_cells`` (uncertified at the base margin),
    ``escalated_blocks``, ``uncertified_cells`` (remaining after the
    largest representable margin; 0 in any non-degenerate box).
    """
    import time as _time
    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    betas_np = np.asarray(beta_sequence, np.int32).reshape(-1, 3)
    box = float(particles.box_size)
    n_total = m * n_grid
    n_ch = 1 if quantity == "energy" else 3

    kmin = 2.0 * np.pi / box
    kmax = float(np.pi / (box / n_total))
    n_bins = int((kmax - kmin) / kmin) + 1

    certify = certify and method == "nn"
    multi = devices is not None and len(devices) >= 1
    n_dev = len(devices) if multi else 1
    if multi and method != "nn":
        raise ValueError(
            "devices= round-robin placement is the NN (gather) path; "
            "scatter methods distribute via distributed_streamed_sweep"
        )

    if method == "nn":
        margin_max = (n_total - n_grid) // 2  # representability cap
        if margin_cells is None and certify:
            want = _default_margin_cells(
                n_grid, n_total, particles.pos.shape[0]
            )
            n_ext, margin_cells = _round_ext_capped(
                n_grid, want, margin_max
            )
        else:
            if margin_cells is None:
                margin_cells = max(n_grid // 4, 8)
            n_ext, margin_cells = round_ext(n_grid, margin_cells)
        _t0 = _time.time()
        if multi:
            # host rows: each block's window is transferred to its
            # round-robin device (a few MB — small next to the block)
            rows_h, starts, counts, pad, ext_box, _ = _block_candidates(
                particles, m, n_grid, margin_cells
            )
            rows_h = np.asarray(rows_h)
        else:
            rows_d, starts, counts, pad, ext_box, _ = \
                _block_candidates_device(
                    particles, m, n_grid, margin_cells
                )
            starts_dev = jnp.asarray(starts, jnp.int32)
            counts_dev = jnp.asarray(counts, jnp.int32)
            float(jnp.sum(rows_d[0]))  # sync so the stage time is honest
        if stage_times is not None:
            stage_times["candidates_s"] = round(_time.time() - _t0, 2)
        cell_total = box / n_total
        # the extended frame covers n_ext cells of the SAME cell size
        ext_box_grid = n_ext * cell_total
        if ext_box_grid < ext_box - 1e-9:
            raise AssertionError("extended grid smaller than candidate box")

        def block_values(q: int):
            if multi:
                cand_np = np.zeros((pad, 7), np.float32)
                c = int(counts[q])
                cand_np[:c] = rows_h[int(starts[q]): int(starts[q]) + c]
                cand = jax.device_put(cand_np, devices[q % n_dev])
            else:
                cand = jax.lax.dynamic_slice(
                    rows_d, (int(starts[q]), 0), (pad, 7)
                )
            return _block_values_at(
                cand, jnp.int32(counts[q]), n_grid, n_ext, margin_cells,
                cell_total, quantity, exact, certify,
            )

        def escalate_block(q: int):
            return _escalate_block(
                particles, q, m, n_grid, margin_cells, margin_max,
                cell_total, quantity, exact,
                device=devices[q % n_dev] if multi else None,
            )

    elif method in ("ngp", "cic", "sph"):
        pos_d = particles.pos
        vel_d = particles.vel
        mass_d = particles.mass
        h_d = particles.smoothing_length() if method == "sph" else None

        def block_values(q: int) -> jax.Array:
            qv = jnp.asarray(
                [q // (m * m), (q // m) % m, q % m], jnp.int32
            )
            return _scatter_block_values(
                pos_d, vel_d, mass_d, qv, n_grid, n_total, box,
                method, quantity, h=h_d,
            ).reshape(n_ch, n_grid**3)

    else:
        raise ValueError(
            f"streamed folded spectra support methods nn/ngp/cic/sph, "
            f"got {method!r}"
        )

    # host-side block-value cache: f32 if it fits the budget, else f16
    n_blocks = m**3
    cache_store: dict = {}
    cache_dtype = None
    disk_mode = cache_dir is not None
    if disk_mode:
        cache = True  # an explicit directory means: cache, on disk
    if cache:
        total_bytes_f32 = n_blocks * n_ch * n_grid**3 * 4
        if total_bytes_f32 <= cache_bytes_limit:
            cache_dtype = np.float32
        elif disk_mode or total_bytes_f32 / 2 <= cache_bytes_limit:
            import warnings

            cache_dtype = np.float16
            warnings.warn(
                f"block-value cache ({total_bytes_f32 / 1e9:.1f} GB as "
                f"float32) exceeds cache_bytes_limit="
                f"{cache_bytes_limit / 1e9:.1f} GB; caching in float16 — "
                f"beta batches after the first reuse f16-rounded field "
                f"values (~3 decimal digits).  Raise cache_bytes_limit, "
                f"lower beta_batch, or pass cache=False for full "
                f"precision on every pass.",
                stacklevel=2,
            )
        else:
            import warnings

            cache = False
            warnings.warn(
                f"block-value cache would need "
                f"{total_bytes_f32 / 2e9:.1f} GB even as float16 — over "
                f"cache_bytes_limit={cache_bytes_limit / 1e9:.1f} GB; "
                f"caching disabled, every beta batch recomputes block "
                f"values at full precision (pass cache_dir= to spill "
                f"the cache to disk instead).",
                stacklevel=2,
            )

    if cache and disk_mode:
        import hashlib
        import json as _json
        import os as _os

        _os.makedirs(cache_dir, exist_ok=True)
        head = np.ascontiguousarray(
            np.asarray(particles.pos[:4096], np.float32)
        )
        manifest = {
            "n_grid": n_grid, "m": m, "n_ch": n_ch,
            "quantity": quantity, "method": method, "exact": bool(exact),
            "certify": bool(certify), "margin_cells": margin_cells,
            "n_particles": int(particles.pos.shape[0]),
            "box": box, "dtype": np.dtype(cache_dtype).name,
            "pos_head_sha1": hashlib.sha1(head.tobytes()).hexdigest(),
        }
        mpath = _os.path.join(cache_dir, "manifest.json")
        if _os.path.exists(mpath):
            with open(mpath) as fh:
                on_disk = _json.load(fh)
            if on_disk != manifest:
                raise ValueError(
                    f"cache_dir {cache_dir!r} holds blocks for a "
                    f"different run (manifest mismatch: {on_disk} vs "
                    f"{manifest}); point cache_dir at a fresh directory."
                )
        else:
            tmp = mpath + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump(manifest, fh)
            _os.replace(tmp, mpath)

        def _cpath(q):
            return _os.path.join(cache_dir, f"block_{q:06d}.npy")

        # single background writer: .npy serialization is disk-bound
        # and would otherwise serialize with the block loop; the
        # 2-deep queue bounds host RAM to ~2 extra blocks of values
        import queue as _queue
        import threading as _threading

        _wq: "_queue.Queue" = _queue.Queue(maxsize=2)
        _written = {
            int(f[6:12])
            for f in _os.listdir(cache_dir)
            if f.startswith("block_") and f.endswith(".npy")
            and not f.endswith(".tmp.npy")
        }

        _werr: list = []  # first writer exception (e.g. disk full)

        def _writer():
            while True:
                item = _wq.get()
                try:
                    if item is None:
                        return
                    if _werr:
                        continue  # drain without writing so puts unblock
                    q, arr = item
                    tmp = _cpath(q) + ".tmp.npy"
                    np.save(tmp, arr)
                    _os.replace(tmp, _cpath(q))
                except BaseException as e:  # noqa: BLE001
                    _werr.append(e)
                finally:
                    _wq.task_done()

        _wthread = _threading.Thread(target=_writer, daemon=True)
        _wthread.start()

        def _check_writer():
            if _werr:
                raise RuntimeError(
                    f"block-cache writer failed ({cache_dir!r})"
                ) from _werr[0]

        def _cache_has(q):
            return q in _written

        def _cache_get(q):
            if not _os.path.exists(_cpath(q)):
                _wq.join()  # queued but not yet on disk
                _check_writer()
            return np.load(_cpath(q))

        def _cache_put(q, vals):
            _check_writer()
            _wq.put((q, np.asarray(vals, cache_dtype)))
            _written.add(q)

        def _cache_finish():
            _wq.join()
            _wq.put(None)
            _check_writer()
    else:
        def _cache_has(q):
            return q in cache_store

        def _cache_get(q):
            return cache_store[q]

        def _cache_put(q, vals):
            cache_store[q] = np.asarray(vals, cache_dtype)

        def _cache_finish():
            pass

    stats = {"suspect_cells": 0, "escalated_blocks": 0,
             "uncertified_cells": 0}
    # Chunked device-side block loop (single device, jittable block
    # program): a lax.scan over `block_chunk` blocks per dispatch, one
    # einsum accumulate and ONE certificate sync per chunk — the
    # per-block host dispatch/settle overhead was ~30% of the round-3
    # 2048-range record.  Round-robin multi-device and the
    # host-orchestrated exact window sweep keep the per-block loop.
    use_chunks = not multi and not (method == "nn" and exact)
    if use_chunks:
        per_block = n_ch * n_grid**3 * 4
        width = per_block * (1.5 if (cache and cache_dtype == np.float16)
                             else 1.0)
        block_chunk = 1
        while (block_chunk < 8 and block_chunk * 2 <= n_blocks
               and block_chunk * 2 * width <= 1.6e9):
            block_chunk *= 2
    spectra: List[PowerSpectrum] = []
    n_batches = (len(betas_np) + beta_batch - 1) // beta_batch
    for bi in range(n_batches):
        batch = betas_np[bi * beta_batch: (bi + 1) * beta_batch]
        B = len(batch)
        _tb = _time.time()
        shape = (B, n_ch, n_grid**3)
        if multi:
            # np.zeros pages are COW-zero until touched: each device
            # gets its zeros streamed from host with no default-device
            # detour or transient HBM spike
            zeros_h = np.zeros(shape, np.float32)
            accs = [
                (jax.device_put(zeros_h, dv), jax.device_put(zeros_h, dv))
                for dv in devices
            ]
            acc_re = acc_im = None
        else:
            acc_re = jnp.zeros(shape, jnp.float32)
            acc_im = jnp.zeros(shape, jnp.float32)

        if use_chunks:
            want_lo = bool(cache) and cache_dtype == np.float16
            fresh = [q for q in range(n_blocks)
                     if not (cache and _cache_has(q))]
            done_qs = [q for q in range(n_blocks)
                       if cache and _cache_has(q)]

            def _pad_group(group):
                qs = np.full((block_chunk,), group[-1], np.int32)
                qs[: len(group)] = group
                return qs

            def _s_matrix(qs, zero_cols=()):
                qv = np.stack(
                    [qs // (m * m), (qs // m) % m, qs % m], axis=1
                ).astype(np.float64)
                s = np.exp(
                    -2j * np.pi * (batch.astype(np.float64) @ qv.T) / m
                ) / m**1.5
                zero_cols = list(zero_cols)
                if zero_cols:
                    s[:, zero_cols] = 0.0
                return (jnp.asarray(s.real, jnp.float32),
                        jnp.asarray(s.imag, jnp.float32))

            def compute_chunk(group):
                qs = _pad_group(group)
                if method == "nn":
                    vals, lo, nsus = _nn_chunk_values(
                        rows_d, starts_dev, counts_dev,
                        jnp.asarray(qs), pad=pad, n_grid=n_grid,
                        n_ext=n_ext, margin_cells=margin_cells,
                        ext_box=float(ext_box_grid),
                        cell=float(cell_total), quantity=quantity,
                        exact=exact, certify=certify, want_lo=want_lo,
                    )
                else:
                    vals, lo = _scatter_chunk_values(
                        pos_d, vel_d, mass_d, jnp.asarray(qs),
                        n_grid, n_total, box, method, quantity,
                        h=h_d, want_lo=want_lo,
                    )
                    nsus = None
                return (group, qs, vals, lo, nsus)

            def settle_chunk(entry):
                nonlocal acc_re, acc_im
                group, qs, vals, lo, nsus = entry
                bad = []
                if nsus is not None and certify:
                    nsus_np = np.asarray(nsus)  # ONE sync per chunk
                    bad = [(i, q, int(nsus_np[i]))
                           for i, q in enumerate(group)
                           if int(nsus_np[i])]
                zero = (list(range(len(group), block_chunk))
                        + [i for i, _, _ in bad])
                s_re, s_im = _s_matrix(qs, zero)
                acc_re, acc_im = _accumulate_chunk(
                    acc_re, acc_im, vals, s_re, s_im
                )
                vals_host = None
                if cache:
                    vals_host = np.asarray(lo if want_lo else vals)
                badset = set()
                for i, q, nb in bad:
                    badset.add(q)
                    stats["suspect_cells"] += nb
                    stats["escalated_blocks"] += 1
                    v_esc, left = escalate_block(q)
                    stats["uncertified_cells"] += left
                    qv = np.array(
                        [q // (m * m), (q // m) % m, q % m], np.float64
                    )
                    s = np.exp(-2j * np.pi * (batch @ qv) / m) / m**1.5
                    acc_re, acc_im = _accumulate(
                        acc_re, acc_im, v_esc,
                        jnp.asarray(s.real, jnp.float32),
                        jnp.asarray(s.imag, jnp.float32),
                    )
                    if cache and not _cache_has(q):
                        _cache_put(q, v_esc)
                if cache:
                    for i, q in enumerate(group):
                        if q not in badset and not _cache_has(q):
                            _cache_put(q, vals_host[i])

            pending = None
            n_done = 0
            for g0 in range(0, len(fresh), block_chunk):
                group = fresh[g0: g0 + block_chunk]
                entry = compute_chunk(group)
                if cache:
                    # start the device->host pull now so it overlaps the
                    # NEXT chunk's compute instead of stalling settle()
                    src = entry[3] if want_lo else entry[2]
                    getattr(src, "copy_to_host_async", lambda: None)()
                if pending is not None:
                    settle_chunk(pending)
                pending = entry
                n_done += len(group)
                if progress is not None:
                    progress(bi, n_batches, n_done - 1, n_blocks)
            if pending is not None:
                settle_chunk(pending)

            if done_qs:
                # cached blocks: double-buffered disk/host reads feeding
                # chunked device accumulates (extra beta batches cost
                # cache IO + one matmul per chunk, no deposition)
                import concurrent.futures as _cf

                groups = [done_qs[g0: g0 + block_chunk]
                          for g0 in range(0, len(done_qs), block_chunk)]

                def read_group(group):
                    arr = np.zeros((block_chunk, n_ch, n_grid**3),
                                   cache_dtype)
                    for i, q in enumerate(group):
                        arr[i] = _cache_get(q)
                    return arr

                with _cf.ThreadPoolExecutor(1) as ex:
                    fut = ex.submit(read_group, groups[0])
                    for gi, group in enumerate(groups):
                        arr = fut.result()
                        if gi + 1 < len(groups):
                            fut = ex.submit(read_group, groups[gi + 1])
                        s_re, s_im = _s_matrix(
                            _pad_group(group),
                            range(len(group), block_chunk),
                        )
                        acc_re, acc_im = _accumulate_chunk(
                            acc_re, acc_im, jnp.asarray(arr), s_re, s_im
                        )
                        n_done += len(group)
                        if progress is not None:
                            progress(bi, n_batches, n_done - 1, n_blocks)
        else:
            def settle(entry):
                """Certify (escalating if needed), cache, and
                fold-accumulate one block.  Called one block BEHIND the
                dispatch loop so the certificate read syncs against
                already-finished work."""
                nonlocal acc_re, acc_im
                q, vals, nsus = entry
                if nsus is not None:
                    n_bad = int(nsus)
                    if n_bad:
                        stats["suspect_cells"] += n_bad
                        stats["escalated_blocks"] += 1
                        vals, left = escalate_block(q)
                        stats["uncertified_cells"] += left
                if cache and not _cache_has(q):
                    _cache_put(q, vals)
                qv = np.array([q // (m * m), (q // m) % m, q % m],
                              np.float64)
                s = np.exp(-2j * np.pi * (batch @ qv) / m) / m**1.5
                s_re = jnp.asarray(s.real, jnp.float32)
                s_im = jnp.asarray(s.imag, jnp.float32)
                if multi:
                    k = q % n_dev
                    accs[k] = _accumulate(accs[k][0], accs[k][1], vals,
                                          s_re, s_im)
                else:
                    acc_re, acc_im = _accumulate(acc_re, acc_im, vals,
                                                 s_re, s_im)

            # in-flight depth: settling an entry host-syncs (certificate
            # read / cache pull), so keep one dispatched block per device
            # ahead of the settle point — the single-device case reduces
            # to the classic one-block lookahead
            from collections import deque

            depth = max(1, n_dev)
            pending = deque()
            for q in range(n_blocks):
                if cache and _cache_has(q):
                    cached = np.asarray(_cache_get(q), np.float32)
                    v = (jax.device_put(cached, devices[q % n_dev])
                         if multi else jnp.asarray(cached))
                    entry = (q, v, None)
                elif certify:
                    vals, nsus = block_values(q)
                    entry = (q, vals, nsus)
                else:
                    entry = (q, block_values(q), None)
                if cache and not _cache_has(q):
                    # start the device->host copy for the cache now, so
                    # it overlaps the NEXT block's compute instead of
                    # stalling settle() (no-op where the platform lacks
                    # async copies)
                    getattr(entry[1], "copy_to_host_async", lambda: None)()
                pending.append(entry)
                if len(pending) > depth:
                    settle(pending.popleft())
                if progress is not None:
                    progress(bi, n_batches, q, n_blocks)
            while pending:
                settle(pending.popleft())

        if multi:
            # batch-end combine: per-device partial accumulators summed
            # on devices[0] (ndev - 1 transfers of B folded cubes)
            acc_re, acc_im = accs[0]
            for k in range(1, n_dev):
                acc_re = _add_inplace(
                    acc_re, jax.device_put(accs[k][0], devices[0])
                )
                acc_im = _add_inplace(
                    acc_im, jax.device_put(accs[k][1], devices[0])
                )
            accs = None
        if stage_times is not None:
            float(acc_re[0, 0, 0])  # sync (axon: block_until_ready no-op)
            stage_times["blocks_s"] = round(
                stage_times.get("blocks_s", 0.0) + _time.time() - _tb, 2
            )
            _tb = _time.time()
        ks, psums, nsamps = _finish_batch(
            acc_re, acc_im, jnp.asarray(batch, jnp.int32),
            n_grid, n_total, box, n_bins,
        )
        ks, psums, nsamps = (
            np.asarray(ks), np.asarray(psums), np.asarray(nsamps),
        )
        for j, beta in enumerate(batch):
            s = PowerSpectrum.from_binned(
                ks[j], psums[j], nsamps[j],
                m=m, beta=tuple(int(b) for b in beta),
            )
            spectra.append(s)
            if on_spectrum is not None:
                on_spectrum(s)  # e.g. the CLI's per-beta checkpoint
        if stage_times is not None:
            stage_times["finish_s"] = round(
                stage_times.get("finish_s", 0.0) + _time.time() - _tb, 2
            )
    if stage_times is not None and certify:
        stage_times.update(stats)
    _cache_finish()  # disk mode: drain + stop the background writer
    return SpectrumList(spectra)


def streamed_folded_spectrum(
    particles: Particles,
    n_grid: int,
    m: int,
    quantity: str = "velocity",
    method: str = "nn",
    beta_sequence: Optional[np.ndarray] = None,
    **kwargs,
) -> PowerSpectrum:
    """Combined folded spectrum over a beta sequence (full m^3 sweep by
    default) — :func:`streamed_folded_sweep` + Nsample-weighted combine
    (reference ``SpectrumList.combine_all``, ``spctrm.py:277-282``)."""
    sweep = streamed_folded_sweep(
        particles, n_grid, m, quantity=quantity, method=method,
        beta_sequence=beta_sequence, **kwargs,
    )
    combined = sweep.combine_all()
    combined.m = m
    return combined
