"""Run planner: (target resolution, devices, HBM) -> (mesh, grid, fold).

TPU analog of the reference's planner
(``scripts/parallel_optimized.py:70-88``), which factorized
``NTOT = threads_per_axis * Nbox * loops_per_axis`` under a memory cap
``MAXNBOX``.  Here the factorization is
``NTOT = fold_m * n_grid`` with ``n_grid^3 / n_devices`` blocks bounded
by per-device HBM, and the "loops" dimension becomes the sequential
beta schedule (m^3 sub-spectra, optionally subsampled).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .mesh import mesh_shape_for

__all__ = ["Plan", "plan_run"]

# Peak simultaneously-live f32 cubes in the sharded spectrum pipeline
# (grid4 complex ~ 8 channels + FFT work ~ 4 + binning ~ 2).
_WORKING_CUBES = 14.0


@dataclasses.dataclass(frozen=True)
class Plan:
    """A validated execution plan (the reference printed its plan and
    asked for confirmation, ``parallel_optimized.py:238-245``; we return
    it as data)."""

    n_total: int            # target dynamic range (NTOT)
    n_grid: int             # deposited grid size per beta (Nbox analog)
    fold_m: int             # fold factor (m)
    mesh_shape: Tuple[int, int]
    n_betas: int            # sub-spectra to compute (m^3 for full sweep)
    bytes_per_device: int   # estimated peak
    n_particles: int

    def describe(self) -> str:
        px, py = self.mesh_shape
        return (
            f"Planner: NTOT={self.n_total} = fold {self.fold_m} x grid "
            f"{self.n_grid}, mesh {px}x{py} ({px * py} chips), "
            f"{self.n_betas} beta sub-spectra, "
            f"~{self.bytes_per_device / 2**30:.2f} GiB/chip peak."
        )


def plan_run(
    n_total: int,
    n_devices: int,
    hbm_bytes: float = 16e9,
    n_particles: int = 0,
    max_n_grid: Optional[int] = None,
    beta_subsample: Optional[int] = None,
) -> Plan:
    """Choose (n_grid, fold_m, mesh) for a target resolution.

    Mirrors the reference's constraints: the grid must divide the
    resolution evenly (``parallel_optimized.py:76-83``) and fit the
    memory cap; unlike the reference, chip count need not be a perfect
    cube — any (px, py) factorization works for pencil decomposition.
    """
    mesh_shape = mesh_shape_for(n_devices)
    px, py = mesh_shape

    particle_bytes = n_particles * 4 * 9  # pos+vel+mass+values, replicated
    budget = 0.9 * hbm_bytes - particle_bytes
    if budget <= 0:
        raise ValueError("Particle set alone exceeds the HBM budget.")

    fold_m = 1
    while True:
        if n_total % fold_m == 0:
            n_grid = n_total // fold_m
            block_cells = n_grid**3 / (px * py)
            peak = block_cells * 4 * _WORKING_CUBES
            fits = peak <= budget
            divisible = (n_grid % px == 0) and (n_grid % py == 0)
            small_enough = max_n_grid is None or n_grid <= max_n_grid
            if fits and divisible and small_enough:
                break
        fold_m += 1
        if fold_m > n_total:
            raise ValueError(
                f"No feasible plan for NTOT={n_total} on {n_devices} "
                f"devices with {hbm_bytes / 2**30:.1f} GiB HBM."
            )

    n_betas = beta_subsample if beta_subsample is not None else fold_m**3
    block_cells = (n_total // fold_m) ** 3 / (px * py)
    return Plan(
        n_total=n_total,
        n_grid=n_total // fold_m,
        fold_m=fold_m,
        mesh_shape=mesh_shape,
        n_betas=int(n_betas),
        bytes_per_device=int(block_cells * 4 * _WORKING_CUBES + particle_bytes),
        n_particles=n_particles,
    )
