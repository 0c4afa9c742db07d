"""Multi-chip end-to-end pipeline: owner-sharded deposit -> pencil FFT
-> local shell binning -> psum.

This is the TPU-native equivalent of the reference's canonical MPI
entry point (``scripts/parallel_optimized.py``, SURVEY.md §3.4), with
the communication pattern redesigned:

| reference (MPI)                       | here (mesh/ICI)                  |
|---------------------------------------|----------------------------------|
| full snapshot loaded per rank (:272)  | particles bucketed to owner chip |
| allgather of query buffers (:365-368) | one-cell CIC halo ppermute       |
| per-rank folded FFT (:404-411)        | pencil FFT, 2x all_to_all        |
| beta loop re-queries + re-plans (:323)| on-device lax.scan over betas    |
| Reduce(SUM) of Psum/Nsample (:455)    | one psum over the mesh           |
| rank->(r,s,t) box map (:229-236)      | mesh axis indices                |

Deposit work is O(Np / n_devices) per chip (particles pre-bucketed by
their folded base cell, :func:`..parallel.deposit.shard_particles_host`)
and the whole beta sweep is ONE compiled program — beta enters as a
traced scan input, so m^3 sub-spectra cost one compilation and one
final psum.  Folding fuses into deposition with per-corner phases
(exact CIC folding, same contract as
:func:`vpower_tpu.spectrum.fold.fold_scatter_targets`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.particles import Particles
from ..fft.distributed import pencil_fftn, pencil_output_starts, \
    pencil_power_vector, pencil_power_scalar
from ..spectrum.power import default_k_bins, shell_bin_local
from ..spectrum.spectrum import PowerSpectrum, SpectrumList, init_beta_space
from .deposit import (
    deposit_cic_sharded,
    deposit_ngp_local,
    fold_local_targets,
    halo_add,
    local_block_info,
    shard_particles_host,
)

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


_RUNNER_CACHE: dict = {}


def _build_runner(
    mesh: Mesh,
    n_grid: int,
    box_size: float,
    method: str,
    quantity: str,
    fold_m: int,
    kmin: Optional[float],
    kmax: Optional[float],
    spacing: Optional[float],
    interlace: bool = False,
    compensate_order: int = 0,
):
    """One jit(shard_map(...)) per (mesh, shape-independent config):
    ``run(pos (px,py,P,3), values (px,py,P,C)[, pos2, values2], betas
    (B,3)) -> (k, Psum (B, n_bins), Nsample (B, n_bins))``.  The second
    (pos2, values2) pair is present iff ``interlace`` — the deposit of
    positions shifted by half a FULL-RESOLUTION cell, bucketed to its
    own owner devices."""
    key = (id(mesh), n_grid, box_size, method, quantity, fold_m,
           kmin, kmax, spacing, interlace, compensate_order)
    if key in _RUNNER_CACHE:
        return _RUNNER_CACHE[key]

    total_box = box_size             # box of the UNFOLDED field
    grid_box = box_size / fold_m     # box covered by the deposited grid
    n_total = fold_m * n_grid
    # Global bin lattice (shared across betas / folds).
    kmin_d, kmax_d, spacing_d, _ = default_k_bins(
        total_box, grid_box / n_grid, kmin, kmax, spacing
    )
    norm = 1.0 / float(fold_m) ** 1.5
    # interlace/compensate need the complex pencil transforms on the
    # global mode lattice -> always take the fused-fold route (exact at
    # fold_m = 1 too: every phase is 1)
    use_fused = fold_m > 1 or interlace or compensate_order > 0

    def run(pos, values, *rest):
        if interlace:
            pos2, values2, betas = rest
            pos2 = pos2.reshape(-1, 3)
            values2 = values2.reshape(-1, values2.shape[-1])
        else:
            (betas,) = rest
        pos = pos.reshape(-1, 3)
        values = values.reshape(-1, values.shape[-1])
        starts = pencil_output_starts(n_grid)

        if not use_fused:
            if method == "ngp":
                grid4 = deposit_ngp_local(pos, values, n_grid, grid_box)
            else:
                grid4 = deposit_cic_sharded(pos, values, n_grid, grid_box)
            data = _local_quantity(grid4, quantity)
            if data.ndim == 4:
                p_local = pencil_power_vector(data, grid_box, n_grid)
            else:
                p_local = pencil_power_scalar(data, grid_box, n_grid)
            k, psum, nsample = shell_bin_local(
                p_local, n_grid, grid_box, starts,
                kmin=kmin_d, kmax=kmax_d, spacing=spacing_d,
            )
            psums, nsamples = psum[None], nsample[None]
        else:
            # fused fold: hoist beta-independent targets + local sort
            (nlx, nly, nlz), _ = local_block_info(n_grid)
            ext_shape = (nlx + 1, nly + 1, nlz) if method == "cic" else \
                (nlx, nly, nlz)
            n_ext = ext_shape[0] * ext_shape[1] * nlz
            n_ch = values.shape[1]

            def targets(p, v):
                ids, w, qidx = fold_local_targets(
                    p, n_grid, n_total, total_box, method
                )
                base_vals = (
                    v if method == "ngp" else jnp.tile(v, (8, 1))
                ) * (w * norm)[:, None]
                order = jnp.argsort(ids)
                return (ids[order], base_vals[order],
                        qidx[order].astype(jnp.float32))

            tgt = [targets(pos, values)]
            if interlace:
                tgt.append(targets(pos2, values2))

            def fold_grid(beta, ids_s, vals_s, qidx_s):
                theta = (2.0 * jnp.pi / n_total) * (
                    qidx_s @ beta.astype(jnp.float32)
                )
                g_re = jax.ops.segment_sum(
                    jnp.cos(theta)[:, None] * vals_s, ids_s,
                    num_segments=n_ext + 1, indices_are_sorted=True,
                )[:n_ext].T.reshape((n_ch,) + ext_shape)
                g_im = jax.ops.segment_sum(
                    -jnp.sin(theta)[:, None] * vals_s, ids_s,
                    num_segments=n_ext + 1, indices_are_sorted=True,
                )[:n_ext].T.reshape((n_ch,) + ext_shape)
                if method == "cic":
                    g_re = halo_add(g_re)
                    g_im = halo_add(g_im)
                return jax.lax.complex(g_re, g_im)

            def global_modes(shape, beta):
                """Per-axis global mode coordinates K_a = m t_a + beta_a
                of this device's pencil-OUTPUT block (X full, Y/x, Z/y;
                same lattice as the single-chip fused sweep,
                :func:`vpower_tpu.run.pipeline._fused_fold_sweep_device`)."""
                ks = []
                for a in range(3):
                    j = (starts[a] + jax.lax.iota(jnp.int32, shape[a])) \
                        % n_grid
                    t = jnp.where(j < (n_grid + 1) // 2, j, j - n_grid)
                    ks.append(fold_m * t.astype(jnp.float32)
                              + beta[a].astype(jnp.float32))
                return ks

            a_norm = (grid_box / (2.0 * jnp.pi)) ** 1.5 / float(n_grid) ** 3

            def one_beta(_, beta):
                grid = fold_grid(beta, *tgt[0])
                if interlace or compensate_order > 0:
                    fk1 = [pencil_fftn(grid[c]) for c in range(n_ch)]
                    kf = global_modes(fk1[0].shape, beta)
                    if interlace:
                        grid2 = fold_grid(beta, *tgt[1])
                        th = (jnp.pi / n_total) * (
                            kf[0][:, None, None] + kf[1][None, :, None]
                            + kf[2][None, None, :]
                        )
                        # half-cell shift rotates true modes by
                        # e^{+i K.delta}: rotate F2 back (same convention
                        # as interlaced_power_from_complex)
                        ph = jax.lax.complex(jnp.cos(th), -jnp.sin(th))
                        fk1 = [0.5 * (fk1[c] + ph * pencil_fftn(grid2[c]))
                               for c in range(n_ch)]
                    p_local = sum(
                        0.5 * (jnp.real(f) ** 2 + jnp.imag(f) ** 2)
                        for f in fk1
                    ) * (a_norm * a_norm)
                    if compensate_order > 0:
                        x = [jnp.pi * k_ / n_total for k_ in kf]
                        s = [jnp.where(
                            xi != 0,
                            jnp.sin(xi) / jnp.where(xi != 0, xi, 1.0),
                            1.0,
                        ) ** compensate_order for xi in x]
                        w = (s[0][:, None, None] * s[1][None, :, None]
                             * s[2][None, None, :])
                        p_local = p_local / (w * w)
                else:
                    p_local = pencil_power_vector(grid, grid_box, n_grid)
                kshift = 2.0 * jnp.pi * beta.astype(p_local.dtype) / total_box
                k, psum, nsample = shell_bin_local(
                    p_local, n_grid, grid_box, starts,
                    kmin=kmin_d, kmax=kmax_d, spacing=spacing_d,
                    kshift=kshift,
                )
                return None, (k, psum, nsample)

            _, (ks, psums, nsamples) = jax.lax.scan(one_beta, None, betas)
            k = ks[0]

        psums = jax.lax.psum(psums, ("x", "y"))
        nsamples = jax.lax.psum(nsamples, ("x", "y"))
        return k, psums, nsamples

    in_specs = (
        (P("x", "y"), P("x", "y"), P("x", "y"), P("x", "y"), P())
        if interlace else (P("x", "y"), P("x", "y"), P())
    )
    runner = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P(), P()),
        )
    )
    _RUNNER_CACHE[key] = runner
    return runner


def _sharded_inputs(particles: Particles, mesh: Mesh, n_grid: int,
                    fold_m: int, method: str, momentum_only: bool):
    """Owner-bucketed (px, py, Pmax, .) host arrays for the runner."""
    if momentum_only:
        values = np.asarray(particles.vel) * np.asarray(
            particles.mass
        )[:, None]
    else:
        values = np.concatenate(
            [
                np.asarray(particles.vel)
                * np.asarray(particles.mass)[:, None],
                np.asarray(particles.mass)[:, None],
            ],
            axis=1,
        )
    px, py = mesh.devices.shape
    return shard_particles_host(
        np.asarray(particles.pos), values, (px, py), n_grid,
        float(particles.box_size), fold_m=fold_m, method=method,
    )


def _interlaced_particles(particles: Particles, n_total: int) -> Particles:
    """The second deposit of an interlaced pair: positions shifted by
    half a FULL-RESOLUTION cell per axis (periodic wrap)."""
    import dataclasses as _dc

    cell_total = particles.box_size / n_total
    return _dc.replace(
        particles,
        pos=(particles.pos + cell_total / 2.0) % particles.box_size,
    )


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
    interlace: bool = False,
    compensate: bool = False,
) -> PowerSpectrum:
    """One spectrum (optionally one folded sub-spectrum) on the mesh.

    ``n_grid`` is the size of the deposited (possibly folded) grid; with
    ``fold=(m, beta)`` the effective dynamic range is ``m * n_grid``
    while per-device memory stays O(n_grid^3 / n_devices) and deposit
    work O(Np / n_devices).

    ``interlace`` folds a SECOND deposit from half-full-res-cell-shifted
    positions (bucketed to its own owner devices) and combines the two
    pencil transforms on the global mode lattice ``K = m t + beta``;
    ``compensate`` deconvolves the full-resolution deposition window —
    the mesh analogs of the single-chip
    :func:`vpower_tpu.run.pipeline.power_spectrum` flags, momentum only
    (the fused fold scatters ``m v`` with phase weights).
    """
    fold_m, beta = (1, (0, 0, 0)) if fold is None else (
        int(fold[0]), tuple(int(b) for b in fold[1])
    )
    if (fold_m > 1 or interlace or compensate) and quantity != "momentum":
        raise ValueError(
            "Fused folded/interlaced/compensated deposition on the mesh "
            "is defined for the momentum field (scatter of m*v with "
            "phase weights); for folded velocity/energy use the "
            "block-streamed pipeline (vpower_tpu.streamed_folded_sweep)."
        )
    comp_order = ({"ngp": 1, "cic": 2}[method] if compensate else 0)
    momentum_only = fold_m > 1 or interlace or compensate
    runner = _build_runner(
        mesh, n_grid, float(particles.box_size), method, quantity,
        fold_m, kmin, kmax, spacing,
        interlace=interlace, compensate_order=comp_order,
    )
    pos_sh, val_sh = _sharded_inputs(
        particles, mesh, n_grid, fold_m, method, momentum_only=momentum_only
    )
    betas = jnp.asarray([beta], jnp.int32)
    if interlace:
        p2 = _interlaced_particles(particles, fold_m * n_grid)
        pos2_sh, val2_sh = _sharded_inputs(
            p2, mesh, n_grid, fold_m, method, momentum_only=momentum_only
        )
        k, psums, nsamples = runner(pos_sh, val_sh, pos2_sh, val2_sh, betas)
    else:
        k, psums, nsamples = runner(pos_sh, val_sh, betas)
    return PowerSpectrum.from_binned(
        np.asarray(k), np.asarray(psums[0]), np.asarray(nsamples[0]),
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
    beta_batch: Optional[int] = None,
    interlace: bool = False,
    compensate: bool = False,
) -> SpectrumList:
    """All m^3 (or a subset of) folded sub-spectra on the mesh in ONE
    compiled program: particles are bucketed once, the beta loop is an
    on-device ``lax.scan`` (the reference re-queried its NN index and
    re-planned per beta, ``parallel_optimized.py:323``; round 1 here
    re-compiled per beta).

    ``beta_batch`` optionally splits the scan into host-level chunks to
    bound single-program wall time (remote-execution watchdogs).
    ``interlace``/``compensate``: see :func:`distributed_spectrum`."""
    if (m > 1 or interlace or compensate) and quantity != "momentum":
        raise ValueError(
            "Fused folded deposition on the mesh is defined for the "
            "momentum field; for folded velocity/energy use "
            "vpower_tpu.streamed_folded_sweep."
        )
    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    betas_np = np.asarray(beta_sequence, np.int32).reshape(-1, 3)
    comp_order = ({"ngp": 1, "cic": 2}[method] if compensate else 0)
    runner = _build_runner(
        mesh, n_grid, float(particles.box_size), method, quantity,
        int(m), None, None, None,
        interlace=interlace, compensate_order=comp_order,
    )
    pos_sh, val_sh = _sharded_inputs(
        particles, mesh, n_grid, int(m), method,
        momentum_only=quantity == "momentum",
    )
    extra = ()
    if interlace:
        p2 = _interlaced_particles(particles, int(m) * n_grid)
        extra = _sharded_inputs(
            p2, mesh, n_grid, int(m), method,
            momentum_only=quantity == "momentum",
        )
    if beta_batch is None:
        beta_batch = len(betas_np)
    spectra = []
    for i in range(0, len(betas_np), beta_batch):
        chunk = betas_np[i: i + beta_batch]
        k, psums, nsamples = runner(pos_sh, val_sh, *extra,
                                    jnp.asarray(chunk))
        k = np.asarray(k)
        psums = np.asarray(psums)
        nsamples = np.asarray(nsamples)
        for j, beta in enumerate(chunk):
            spectra.append(
                PowerSpectrum.from_binned(
                    k, psums[j], nsamples[j], m=int(m),
                    beta=tuple(int(b) for b in beta),
                )
            )
    return SpectrumList(spectra)
