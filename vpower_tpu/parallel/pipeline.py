"""Multi-chip end-to-end pipeline: sharded deposit -> pencil FFT ->
local shell binning -> psum.

This is the TPU-native equivalent of the reference's canonical MPI
entry point (``scripts/parallel_optimized.py``, SURVEY.md §3.4), with
the communication pattern redesigned:

| reference (MPI)                       | here (mesh/ICI)                 |
|---------------------------------------|---------------------------------|
| allgather of query buffers (:365-368) | none — owner-scattered deposit  |
| per-rank folded FFT (:404-411)        | pencil FFT, 2x all_to_all       |
| Reduce(SUM) of Psum/Nsample (:455)    | psum over the mesh              |
| rank->(r,s,t) box map (:229-236)      | mesh axis indices               |

Folding composes: pass ``fold=(m, beta)`` and the fold+phase is fused
into the deposition weights (never materializing the unfolded grid),
with the beta k-shift applied in binning.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.particles import Particles
from ..fft.distributed import pencil_output_starts, pencil_power_vector, \
    pencil_power_scalar
from ..spectrum import fold as fold_mod
from ..spectrum.power import default_k_bins, shell_bin_local
from ..spectrum.spectrum import PowerSpectrum, SpectrumList, init_beta_space
from .deposit import deposit_cic_local, deposit_ngp_local

__all__ = ["distributed_spectrum", "distributed_folded_sweep"]


def _local_quantity(grid4, quantity):
    """Channels-first [m vx, m vy, m vz, m] block -> requested quantity."""
    m_grid = grid4[3]
    if quantity == "momentum":
        return grid4[:3]
    safe = jnp.where(m_grid != 0, m_grid, 1.0)
    v = jnp.where(m_grid[None] != 0, grid4[:3] / safe[None], 0.0)
    if quantity == "velocity":
        return v
    if quantity == "energy":
        return m_grid * jnp.sum(v**2, axis=0)
    raise ValueError(f"Unsupported quantity {quantity!r}")


def _build_runner(
    mesh: Mesh,
    n_grid: int,
    box_size: float,
    method: str,
    quantity: str,
    fold_m: int,
    beta: Tuple[int, int, int],
    kmin: Optional[float],
    kmax: Optional[float],
    spacing: Optional[float],
):
    """jit(shard_map(...)) closure for one (shape, method, beta) config."""
    deposit_local = {"ngp": deposit_ngp_local, "cic": deposit_cic_local}[method]
    total_box = box_size  # box of the UNFOLDED field
    grid_box = box_size / fold_m  # box covered by the deposited grid
    # Global bin lattice (shared across betas / folds).
    kmin_d, kmax_d, spacing_d, _ = default_k_bins(
        total_box, grid_box / n_grid, kmin, kmax, spacing
    )
    kshift = tuple(2.0 * np.pi * b / total_box for b in beta)

    def run(pos, values):
        if fold_m > 1:
            fpos, fvals = fold_mod.fold_deposit_weights(
                pos, values, fold_m, beta, total_box, n_total=fold_m * n_grid
            )
            grid_re = deposit_local(fpos, jnp.real(fvals), n_grid, grid_box)
            grid_im = deposit_local(fpos, jnp.imag(fvals), n_grid, grid_box)
            grid4 = jax.lax.complex(grid_re, grid_im)
        else:
            grid4 = deposit_local(pos, values, n_grid, grid_box)
        data = _local_quantity(grid4, quantity)
        if data.ndim == 4:
            p_local = pencil_power_vector(data, grid_box, n_grid)
        else:
            p_local = pencil_power_scalar(data, grid_box, n_grid)
        starts = pencil_output_starts(n_grid)
        k, psum, nsample = shell_bin_local(
            p_local, n_grid, grid_box, starts,
            kmin=kmin_d, kmax=kmax_d, spacing=spacing_d, kshift=kshift,
        )
        psum = jax.lax.psum(psum, ("x", "y"))
        nsample = jax.lax.psum(nsample, ("x", "y"))
        return k, psum, nsample

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P()),  # particles replicated (reference loads the
        # full snapshot on every rank, parallel_optimized.py:272-276)
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded)


def distributed_spectrum(
    particles: Particles,
    n_grid: int,
    mesh: Mesh,
    method: str = "ngp",
    quantity: str = "velocity",
    fold: Optional[Tuple[int, Sequence[int]]] = None,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
) -> PowerSpectrum:
    """One spectrum (optionally one folded sub-spectrum) on the mesh.

    ``n_grid`` is the size of the deposited (possibly folded) grid; with
    ``fold=(m, beta)`` the effective dynamic range is ``m * n_grid``
    while per-device memory stays O(n_grid^3 / n_devices).
    """
    fold_m, beta = (1, (0, 0, 0)) if fold is None else (
        int(fold[0]), tuple(int(b) for b in fold[1])
    )
    if fold is not None and fold_m > 1 and quantity != "momentum":
        raise ValueError(
            "Fused folded deposition is defined for the momentum field "
            "(scatter of m*v with phase weights); velocity/energy would "
            "require dividing phase-mixed complex fields. Fold the "
            "gridded field instead (vpower_tpu.spectrum.fold) for those."
        )
    runner = _build_runner(
        mesh, n_grid, particles.box_size, method, quantity,
        fold_m, beta, kmin, kmax, spacing,
    )
    values = jnp.concatenate(
        [particles.vel * particles.mass[:, None], particles.mass[:, None]],
        axis=1,
    )
    k, psum, nsample = runner(particles.pos, values)
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psum), np.asarray(nsample),
        m=fold_m if fold else 0,
        beta=beta if fold else (-1, -1, -1),
    )


def distributed_folded_sweep(
    particles: Particles,
    n_grid: int,
    mesh: Mesh,
    m: int,
    method: str = "ngp",
    quantity: str = "momentum",
    beta_sequence: Optional[np.ndarray] = None,
) -> SpectrumList:
    """All m^3 folded sub-spectra, sequentially over beta (each beta is a
    full-mesh computation; the reference's beta loop,
    ``parallel_optimized.py:323``)."""
    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    return SpectrumList(
        [
            distributed_spectrum(
                particles, n_grid, mesh, method=method, quantity=quantity,
                fold=(m, beta),
            )
            for beta in beta_sequence
        ]
    )
