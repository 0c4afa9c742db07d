"""End-to-end pipelines: particles -> grid -> P(k), single chip.

This is the unified core that the reference implemented twice — once in
the library (``vpower/interp.py``) and once, diverging, in the MPI
scripts (``scripts/parallel_optimized.py``); SURVEY.md §1 calls out the
duplication as the thing to unify.  Everything here is functional and
jittable; host-side orchestration (PowerSpectrum objects, folding sweeps)
wraps the jitted device kernels.

Deposition semantics
--------------------
Scatter methods (``ngp``, ``cic``, ``sph``) deposit ``[m*v, m]`` and
derive ``v = p / m`` — exactly conservative in mass and momentum.  The
gather method (``nn``) assigns each cell the velocity/density of its
nearest particle with ``mass = rho * Lcell^3``, the reference's ANN
semantics (``interp.py:272-273``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.field import BoxField, FoldedField
from ..core.particles import Particles
from ..deposit import mxu_scatter
from ..deposit.scatter import deposit_cic, deposit_ngp
from ..spectrum import fold as fold_mod
from ..spectrum import power as power_mod
from ..spectrum.spectrum import PowerSpectrum, SpectrumList, init_beta_space

__all__ = [
    "deposit",
    "power_spectrum",
    "spectrum_from_field",
    "folded_spectrum",
    "folded_spectrum_sweep",
    "fused_fold_spectrum",
    "fused_fold_full_spectrum",
    "cross_spectrum",
    "spectrum_from_folded",
]


def _divide_momentum(p_grid: jax.Array, m_grid: jax.Array) -> jax.Array:
    """v = p / m (channels-first) with an exact zero-mass guard
    (reference zero-mass handling at ``interp.py:629, 996-1015``)."""
    safe = jnp.where(m_grid > 0, m_grid, 1.0)
    return jnp.where(m_grid[None] > 0, p_grid / safe[None], 0.0)


@partial(jax.jit, static_argnames=("n_grid", "method"))
def _deposit_scatter(particles: Particles, n_grid: int, method: str) -> BoxField:
    values = jnp.concatenate(
        [particles.vel * particles.mass[:, None], particles.mass[:, None]], axis=1
    )
    fn = {"ngp": deposit_ngp, "cic": deposit_cic}[method]
    grid = fn(particles.pos, values, n_grid, particles.box_size)
    m_grid = grid[3]
    v_grid = _divide_momentum(grid[:3], m_grid)
    return BoxField(
        velocity=v_grid, mass=m_grid, cell_size=particles.box_size / n_grid
    )


def deposit(
    particles: Particles,
    n_grid: int,
    method: str = "cic",
    **kwargs,
) -> BoxField:
    """Deposit/interpolate particles onto an (n_grid)^3 field.

    ``method``: ``ngp`` | ``cic`` (scatter), ``nn`` (exact nearest-
    neighbor gather, reference ``ann_interp_to_field`` ``interp.py:246-277``),
    ``sph`` (adaptive-kernel scatter, reference ``voxelize_interp_to_field``
    ``interp.py:280-340``).
    """
    if method in ("ngp", "cic"):
        return _deposit_scatter(particles, n_grid, method)
    if method == "nn":
        from ..deposit.nn import nn_interp_to_field

        return nn_interp_to_field(particles, n_grid, **kwargs)
    if method == "sph":
        from ..deposit.sph import sph_interp_to_field

        return sph_interp_to_field(particles, n_grid, **kwargs)
    raise ValueError(f"Unknown deposition method {method!r}")


# ---------------------------------------------------------------------- #
# spectra                                                                #
# ---------------------------------------------------------------------- #
def _quantity_grid(field: BoxField, quantity: str) -> jax.Array:
    if quantity == "velocity":
        return field.velocity
    if quantity == "momentum":
        return field.momentum()
    if quantity == "energy":
        return field.kinetic_energy()
    raise ValueError(
        "Unrecognized physical quantity name. "
        "Supported: 'velocity', 'momentum', 'energy'."
    )


@partial(
    jax.jit,
    static_argnames=("quantity", "kmin", "kmax", "spacing", "compensate_order"),
)
def _spectrum_device(
    field: BoxField,
    quantity: str,
    kmin: Optional[float],
    kmax: Optional[float],
    spacing: Optional[float],
    compensate_order: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    data = _quantity_grid(field, quantity)
    # real fields take the rfft half-space route (half the FFT flops /
    # HBM traffic / power-grid footprint; identical binned output)
    return power_mod.real_power_binned(
        data, field.box_size, kmin=kmin, kmax=kmax, spacing=spacing,
        compensate_order=compensate_order,
    )


def spectrum_from_field(
    field: BoxField,
    quantity: str = "velocity",
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
    compensate_order: int = 0,
) -> PowerSpectrum:
    """FFT power + shell binning + ESD weighting -> PowerSpectrum.

    Reference ``BoxField.spctrm`` (``interp.py:560-595``): same defaults
    (kmin = 2 pi / L, kmax = pi / Lcell, spacing = kmin) and the same
    ``4 pi k^2`` shell weighting applied on the host via
    :meth:`PowerSpectrum.from_binned`.  ``compensate_order`` divides the
    power grid by the deposition window squared before binning
    (1 = NGP, 2 = CIC; 0 = off, reference parity).
    """
    k, psum, nsample = _spectrum_device(
        field, quantity, kmin, kmax, spacing, compensate_order
    )
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample)
    )


def cross_spectrum(
    field_a: BoxField,
    field_b: BoxField,
    quantity: str = "velocity",
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
) -> PowerSpectrum:
    """Cross-spectrum of two fields on the same grid (e.g. velocity of
    two snapshots, or velocity x momentum of one) — SURVEY.md §7 build
    step 6."""
    assert field_a.n_grid == field_b.n_grid, "grids must match"

    @partial(jax.jit, static_argnames=())
    def run(fa, fb):
        da = _quantity_grid(fa, quantity)
        db = _quantity_grid(fb, quantity)
        p_grid = power_mod.cross_power(da, db, fa.box_size)
        return power_mod.shell_bin(
            p_grid, fa.box_size, kmin=kmin, kmax=kmax, spacing=spacing
        )

    k, psum, nsample = run(field_a, field_b)
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample)
    )


def power_spectrum(
    particles: Particles,
    n_grid: int,
    method: str = "cic",
    quantity: str = "velocity",
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
    interlace: bool = False,
    compensate: bool = False,
    **deposit_kwargs,
) -> PowerSpectrum:
    """The docs-quickstart pipeline in one call: load -> interp -> spctrm
    (reference ``docs/source/getting_started.rst:30-78``).

    ``interlace`` deposits a second, half-cell-shifted grid and combines
    the two transforms to cancel odd aliasing images (scatter methods
    only); ``compensate`` deconvolves the NGP/CIC deposition window.
    Both are off by default for reference parity.
    """
    comp_order = {"ngp": 1, "cic": 2}.get(method, 0) if compensate else 0
    if compensate and comp_order == 0:
        raise ValueError("compensate=True is defined for ngp/cic only")
    if (method == "nn" and quantity == "velocity" and not interlace
            and not deposit_kwargs.get("exact", False)):
        # velocity-only NN fast path: the spectrum never reads the mass
        # cube, so skip carrying rho through the descent (~1/7 of the
        # sweep traffic; see nn_velocity_grid) and fuse deposit -> FFT
        # power -> binning in one jit
        from ..deposit.nn import nn_velocity_grid

        @partial(jax.jit, static_argnames=())
        def run_nn(p):
            v = nn_velocity_grid(
                p, n_grid,
                periodic=deposit_kwargs.get("periodic", True),
            )
            return power_mod.real_power_binned(
                v, p.box_size, kmin=kmin, kmax=kmax, spacing=spacing
            )

        k, psum, nsample = run_nn(particles)
        return PowerSpectrum.from_binned(
            np.asarray(k), np.asarray(psum), np.asarray(nsample)
        )
    if not interlace:
        field = deposit(particles, n_grid, method=method, **deposit_kwargs)
        return spectrum_from_field(
            field, quantity=quantity, kmin=kmin, kmax=kmax, spacing=spacing,
            compensate_order=comp_order,
        )
    if method not in ("ngp", "cic"):
        raise ValueError("interlace=True is defined for scatter methods")

    import dataclasses as _dc

    cell = particles.box_size / n_grid
    shifted = _dc.replace(
        particles, pos=(particles.pos + cell / 2) % particles.box_size
    )

    @partial(jax.jit, static_argnames=())
    def run(p1, p2):
        f1 = _deposit_scatter(p1, n_grid, method)
        f2 = _deposit_scatter(p2, n_grid, method)
        d1 = _quantity_grid(f1, quantity)
        d2 = _quantity_grid(f2, quantity)
        if d1.ndim == 3:
            d1 = d1[None]
            d2 = d2[None]
        p_grid = power_mod.interlaced_vector_power(d1, d2, f1.box_size)
        if comp_order > 0:
            p_grid = p_grid * power_mod.window_compensation(
                n_grid, comp_order, dtype=p_grid.dtype
            )
        return power_mod.shell_bin(
            p_grid, f1.box_size, kmin=kmin, kmax=kmax, spacing=spacing
        )

    k, psum, nsample = run(particles, shifted)
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample)
    )


# ---------------------------------------------------------------------- #
# folded spectra                                                         #
# ---------------------------------------------------------------------- #
def spectrum_from_folded(folded: FoldedField) -> PowerSpectrum:
    """Sub-spectrum of an already-folded complex field (reference
    ``FoldedBox.fold_spctrm``, ``interp.py:755-791``): FFT power ->
    binning on the global lattice with the ``+2 pi beta / Ltot``
    k-shift -> ESD weighting."""
    f = folded.field
    if f.ndim == 4:
        p_grid = power_mod.vector_power_from_complex(f, folded.box_size)
    else:
        p_grid = power_mod.scalar_power_from_complex(f, folded.box_size)
    total_box = folded.total_box_size
    beta = folded.beta
    kshift = tuple(2.0 * np.pi * b / total_box for b in beta)
    k, psum, nsample = power_mod.shell_bin(
        p_grid,
        folded.box_size,
        kmin=2.0 * np.pi / total_box,
        kmax=float(np.pi / folded.cell_size),
        spacing=2.0 * np.pi / total_box,
        kshift=kshift,
    )
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample),
        m=folded.fold_factor, beta=beta,
    )


@partial(jax.jit, static_argnames=("quantity", "m", "beta", "kmax_total"))
def _folded_spectrum_device(
    field: BoxField,
    quantity: str,
    m: int,
    beta: Tuple[int, int, int],
    kmax_total: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    folded = fold_mod.fold_box_field(field, m, beta, quantity=quantity)
    p_grid = power_mod.vector_power_from_complex(folded.field, folded.box_size) \
        if folded.field.ndim == 4 else \
        power_mod.scalar_power_from_complex(folded.field, folded.box_size)
    total_box = folded.total_box_size
    kshift = tuple(2.0 * np.pi * b / total_box for b in beta)
    # Bin on the GLOBAL lattice: kmin/spacing from the full box so all
    # sub-spectra share one bin set (reference parallel_optimized.py:430).
    return power_mod.shell_bin(
        p_grid,
        folded.box_size,
        kmin=2.0 * np.pi / total_box,
        kmax=kmax_total,
        spacing=2.0 * np.pi / total_box,
        kshift=kshift,
    )


def folded_spectrum(
    field: BoxField,
    m: int,
    beta: Sequence[int],
    quantity: str = "velocity",
) -> PowerSpectrum:
    """Sub-spectrum for one phase offset beta of a fold-by-m
    (reference ``FoldedBox.fold_spctrm``, ``interp.py:755-791``)."""
    beta = tuple(int(b) for b in beta)
    kmax_total = float(np.pi / field.cell_size)  # Nyquist of the folded grid
    k, psum, nsample = _folded_spectrum_device(
        field, quantity, int(m), beta, kmax_total
    )
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample), m=int(m), beta=beta
    )


def folded_spectrum_sweep(
    field: BoxField,
    m: int,
    quantity: str = "velocity",
    beta_sequence: Optional[np.ndarray] = None,
) -> SpectrumList:
    """All (or a subset of) the m^3 beta sub-spectra — embarrassingly
    parallel over beta (SURVEY.md §2.4)."""
    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    return SpectrumList(
        [folded_spectrum(field, m, beta, quantity) for beta in beta_sequence]
    )


@partial(jax.jit, static_argnames=("n_grid", "m", "n_bins", "method",
                                   "interlace", "compensate"))
def _fused_fold_sweep_device(
    particles: Particles,
    betas: jax.Array,  # (B, 3) int32
    n_grid: int,
    m: int,
    n_bins: int,
    method: str = "ngp",
    interlace: bool = False,
    compensate: bool = False,
):
    """Beta sweep of the fused folded momentum spectrum with the
    per-beta-invariant work HOISTED:

    * scatter targets (folded cell ids, deposition-weighted values,
      full-res phase indices — :func:`fold_scatter_targets`) and their
      cell-id sort happen ONCE (the reference re-queried its NN index
      for every beta loop, ``parallel_optimized.py:323-356``);
    * the beta loop is a ``lax.scan`` on device: per beta only the
      phase weights, two pre-sorted segment-sums, three FFTs and the
      binning run; Psum/Nsample accumulate on device on the shared
      global lattice (the reference's incremental Pk.txt rewrite,
      ``parallel_optimized.py:470-487``, becomes a scan carry).

    ``method`` is ``ngp`` (one target per particle) or ``cic`` (eight
    per-corner-phased targets per particle — exact parity with
    deposit-at-full-res -> phase -> fold).  Memory stays O(n_grid^3)
    for any total dynamic range m * n_grid.

    ``interlace`` additionally folds a SECOND deposit from positions
    shifted by half a full-resolution cell per axis and combines the
    two transforms on the global mode lattice ``K = m t + beta``
    (:func:`~vpower_tpu.spectrum.power.interlaced_power_from_complex`)
    — the aliasing-image cancellation of the unfolded
    ``power_spectrum(interlace=True)``, now at folded dynamic range.
    ``compensate`` deconvolves the full-resolution NGP/CIC deposition
    window ``sinc(pi K / N_total)^order`` evaluated at the same global
    modes.  (BASELINE.md scale ceiling: "folded/interlaced spectra".)
    """
    box = particles.box_size
    folded_box = box / m
    n_total = m * n_grid
    n_cells = n_grid**3
    comp_order = {"ngp": 1, "cic": 2}[method] if compensate else 0

    values = particles.vel * particles.mass[:, None]
    use_mxu = (jax.default_backend() == "tpu"
               and mxu_scatter.mxu_supported(n_grid))

    def targets(pos):
        """Sorted phased-scatter targets + deposit plan for one
        deposit (hoisted out of the beta scan; the interlaced second
        deposit gets its own, from the shifted positions)."""
        ids, vals, idx_full = fold_mod.fold_scatter_targets(
            pos, values, m, box, n_grid, method=method
        )
        # one joint sort with payload columns (argsort + per-array
        # gathers ran the 80M-row gathers twice over at m=4/cic)
        n_vc = vals.shape[1]
        res = jax.lax.sort(
            (ids,)
            + tuple(vals[:, c] for c in range(n_vc))
            + tuple(idx_full[:, c].astype(jnp.float32) for c in range(3)),
            num_keys=1,
        )
        ids_s = res[0]
        values_s = jnp.stack(res[1:1 + n_vc], axis=1)
        qidx_s = jnp.stack(res[1 + n_vc:4 + n_vc], axis=1)
        # The deposit plan depends only on the sorted ids: one plan
        # serves every beta.
        plan = (mxu_scatter.make_deposit_plan(ids_s, n_cells)
                if use_mxu else None)
        return ids_s, values_s, qidx_s, plan

    tgt = [targets(particles.pos)]
    if interlace:
        cell_total = box / n_total
        tgt.append(targets((particles.pos + cell_total / 2.0) % box))

    kmin = 2.0 * jnp.pi / box
    idx1 = jax.lax.iota(jnp.int32, n_grid)
    wrapped = jnp.where(idx1 < (n_grid + 1) // 2, idx1, idx1 - n_grid)

    def fold_grid(beta, ids_s, values_s, qidx_s, plan):
        theta = (2.0 * jnp.pi / n_total) * (
            qidx_s @ beta.astype(jnp.float32)
        )
        cosw = jnp.cos(theta)[:, None] * values_s
        sinw = -jnp.sin(theta)[:, None] * values_s
        n_ch = values_s.shape[1]
        if use_mxu:
            # re/im as 2C channels of ONE MXU deposit (the phased
            # scatter-add is the per-beta hot spot).
            g6 = mxu_scatter.deposit_planned(
                plan, jnp.concatenate([cosw, sinw], axis=1),
                n_cells,
            ).reshape(2 * n_ch, n_grid, n_grid, n_grid)
            return jax.lax.complex(g6[:n_ch], g6[n_ch:])
        g_re = jax.ops.segment_sum(cosw, ids_s, num_segments=n_cells,
                                   indices_are_sorted=True)
        g_im = jax.ops.segment_sum(sinw, ids_s, num_segments=n_cells,
                                   indices_are_sorted=True)
        return jax.lax.complex(
            g_re.T.reshape((n_ch,) + (n_grid,) * 3),
            g_im.T.reshape((n_ch,) + (n_grid,) * 3),
        )

    # Bin on the GLOBAL lattice: kmin/spacing from the full box.
    def one_beta(carry, beta):
        psum_acc, nsamp_acc = carry
        grid = fold_grid(beta, *tgt[0])
        # global per-axis modes K_a = m * t_a + beta_a (signed t)
        kf = [m * wrapped.astype(grid.real.dtype)
              + beta[a].astype(grid.real.dtype) for a in range(3)]
        if interlace:
            grid2 = fold_grid(beta, *tgt[1])
            th = (jnp.pi / n_total) * (
                kf[0][:, None, None] + kf[1][None, :, None]
                + kf[2][None, None, :]
            )
            p_grid = power_mod.interlaced_power_from_complex(
                grid, grid2, folded_box, th
            )
        else:
            p_grid = power_mod.vector_power_from_complex(grid, folded_box)
        if comp_order > 0:
            x = [jnp.pi * k / n_total for k in kf]
            s = [jnp.where(xi != 0,
                           jnp.sin(xi) / jnp.where(xi != 0, xi, 1.0),
                           1.0) ** comp_order for xi in x]
            w = (s[0][:, None, None] * s[1][None, :, None]
                 * s[2][None, None, :])
            p_grid = p_grid / (w * w)
        kshift = 2.0 * jnp.pi * beta.astype(p_grid.dtype) / box
        bins = power_mod.bin_grid_local(
            p_grid.shape, n_grid, folded_box, float(kmin), float(kmin),
            n_bins, jnp.zeros((3,), jnp.int32),
            kshift, dtype=p_grid.dtype,
        )
        psum, nsamp = power_mod._cascade_bin(p_grid, bins, n_bins)
        return (psum_acc + psum, nsamp_acc + nsamp), None

    zeros = jnp.zeros((n_bins,), tgt[0][1].dtype)
    (psum, nsamp), _ = jax.lax.scan(
        one_beta, (zeros, zeros), betas
    )
    k_centers = kmin + kmin * jnp.arange(n_bins, dtype=tgt[0][1].dtype)
    return k_centers, psum, nsamp


def fused_fold_full_spectrum(
    particles: Particles,
    n_grid: int,
    m: int,
    beta_sequence: Optional[np.ndarray] = None,
    beta_batch: int = 8,
    method: str = "ngp",
    interlace: bool = False,
    compensate: bool = False,
) -> PowerSpectrum:
    """The COMBINED momentum spectrum over a beta sweep with fold, sort
    and compile hoisted out of the beta loop — the production path for
    large dynamic range on one chip (fold m * n_grid total range with
    O(n_grid^3) memory).

    ``beta_batch`` bounds the betas per device execution: one
    multi-minute device program can trip remote-execution watchdogs
    (observed on the axon platform at >= ~2 min), so the sweep runs as
    host-batched scans whose partial Psum/Nsample accumulate exactly
    (the same merge algebra as :meth:`PowerSpectrum.add`).
    """
    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    betas_np = np.asarray(beta_sequence, np.int32)
    cell_total = particles.box_size / (m * n_grid)
    kmin = 2.0 * np.pi / particles.box_size
    kmax = float(np.pi / cell_total)
    n_bins = int((kmax - kmin) / kmin) + 1

    # pad the last batch by repeating its first beta with zero effect?
    # simpler: equal-shape batches via host loop over full slices plus a
    # remainder call (two compiled shapes at most).
    psum_tot = np.zeros((n_bins,), np.float64)
    nsamp_tot = np.zeros((n_bins,), np.float64)
    k_out = None
    i = 0
    while i < len(betas_np):
        chunk = betas_np[i:i + beta_batch]
        # keep at most two distinct shapes (full batch + remainder)
        k, psum, nsamp = _fused_fold_sweep_device(
            particles, jnp.asarray(chunk), int(n_grid), int(m), n_bins,
            method=method, interlace=interlace, compensate=compensate,
        )
        psum_tot += np.asarray(psum, np.float64)
        nsamp_tot += np.asarray(nsamp, np.float64)
        k_out = np.asarray(k)
        i += beta_batch
    return PowerSpectrum.from_binned(
        k_out, psum_tot, nsamp_tot, m=int(m)
    )


def fused_fold_spectrum(
    particles: Particles,
    n_grid: int,
    m: int,
    beta: Sequence[int],
    method: str = "ngp",
    interlace: bool = False,
    compensate: bool = False,
) -> PowerSpectrum:
    """Momentum sub-spectrum with fold+phase fused into deposition
    (``method`` = ``ngp`` | ``cic``).

    ``n_grid`` is the size of the FOLDED grid, so memory is
    O((n_grid)^3) regardless of the total dynamic range ``m * n_grid``
    — the property the reference's brick/MPI machinery existed to
    provide (SURVEY.md §3.3-3.4).  ``interlace`` / ``compensate``
    cancel / deconvolve the deposition-window aliasing on the global
    mode lattice (see :func:`_fused_fold_sweep_device`).
    """
    beta = tuple(int(b) for b in beta)
    cell = particles.box_size / (m * n_grid)
    kmin = 2.0 * np.pi / particles.box_size
    kmax = float(np.pi / cell)
    n_bins = int((kmax - kmin) / kmin) + 1
    k, psum, nsample = _fused_fold_sweep_device(
        particles, jnp.asarray([beta], jnp.int32), int(n_grid), int(m),
        n_bins, method=method, interlace=interlace, compensate=compensate,
    )
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample), m=int(m), beta=beta
    )
