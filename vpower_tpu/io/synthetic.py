"""Synthetic snapshot generation: Gaussian random velocity fields with a
known power spectrum, sampled onto particles.

The reference has no test data generator (SURVEY.md §4: no test suite);
this module fills that gap and doubles as the benchmark workload
generator, replacing the 9.6M-particle ``snapshot_550.hdf5`` workload
(``scripts/buffer_test.log:11``) with a reproducible synthetic one.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.particles import Particles

__all__ = [
    "gaussian_random_field",
    "grid_positions",
    "particles_from_field",
    "synthetic_particles",
]


def _k_magnitude(n_grid: int, box_size: float, dtype) -> jax.Array:
    idx = jax.lax.iota(jnp.int32, n_grid)
    wrapped = jnp.where(idx < (n_grid + 1) // 2, idx, idx - n_grid)
    ks = (2.0 * jnp.pi / box_size) * wrapped.astype(dtype)
    return jnp.sqrt(
        (ks**2)[:, None, None] + (ks**2)[None, :, None] + (ks**2)[None, None, :]
    )


def gaussian_random_field(
    key: jax.Array,
    n_grid: int,
    box_size: float,
    spectral_index: float = -11.0 / 3.0,
    amplitude: float = 1.0,
    n_components: int = 3,
    dtype=jnp.float32,
) -> jax.Array:
    """CHANNELS-FIRST (C, N, N, N) real Gaussian random field with isotropic power
    ``P(|k|) ~ amplitude * |k|^spectral_index`` (Kolmogorov-like default,
    matching the turbulence context of the reference,
    ``docs/source/index.rst:10-22``).

    Built by filtering white noise in k-space: real noise -> FFT ->
    multiply by ``sqrt(P(|k|))`` -> inverse FFT.  The radial filter is
    real, so Hermitian symmetry (and thus a real field) is preserved.
    """
    kmag = _k_magnitude(n_grid, box_size, jnp.float32)
    kmin = 2.0 * jnp.pi / box_size
    safe_k = jnp.where(kmag > 0, kmag, kmin)
    filt = jnp.sqrt(amplitude * safe_k**spectral_index)
    filt = jnp.where(kmag > 0, filt, 0.0)  # zero the DC mode

    comps = []
    for c in range(n_components):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (n_grid, n_grid, n_grid), jnp.float32)
        fk = jnp.fft.fftn(noise) * filt
        comps.append(jnp.real(jnp.fft.ifftn(fk)).astype(dtype))
    return jnp.stack(comps, axis=0)  # CHANNELS-FIRST (C, N, N, N)


def grid_positions(
    n_grid: int,
    box_size: float,
    key: Optional[jax.Array] = None,
    jitter: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array:
    """(N^3, 3) cell-center lattice, optionally jittered by a fraction of a
    cell.  Centers are at ``(i + 1/2) * Lcell`` — the corrected version of
    the reference's ``make_grid_coords`` whose linspace put the last
    center outside the box (``interp.py:1060-1069``, SURVEY.md §7)."""
    cell = box_size / n_grid
    axis = (jnp.arange(n_grid, dtype=dtype) + 0.5) * cell
    xx, yy, zz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    pos = jnp.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)
    if jitter > 0.0 and key is not None:
        pos = pos + jax.random.uniform(
            key, pos.shape, dtype, minval=-0.5, maxval=0.5
        ) * (jitter * cell)
        pos = pos % box_size
    return pos


def particles_from_field(
    field: jax.Array,
    box_size: float,
    pos: jax.Array,
    density: float = 1.0,
    dtype=jnp.float32,
) -> Particles:
    """Sample a channels-first (3, N, N, N) velocity field at particle
    positions (NGP gather) and return uniform-density particles."""
    n_grid = field.shape[-1]
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    vel = field[:, ijk[:, 0], ijk[:, 1], ijk[:, 2]].T.astype(dtype)
    n = pos.shape[0]
    rho = jnp.full((n,), density, dtype)
    # Uniform partition of the total box mass among particles.
    mass = jnp.full((n,), density * box_size**3 / n, dtype)
    return Particles(
        pos=pos.astype(dtype), mass=mass, density=rho, vel=vel, box_size=box_size
    )


def synthetic_particles(
    key: jax.Array,
    n_grid: int,
    box_size: float = 1.0,
    spectral_index: float = -11.0 / 3.0,
    jitter: float = 0.0,
    dtype=jnp.float32,
) -> Particles:
    """One particle per cell, velocities from a Gaussian random field with
    known spectral slope — the golden-test workload (SURVEY.md §4b)."""
    kf, kj = jax.random.split(key)
    field = gaussian_random_field(
        kf, n_grid, box_size, spectral_index=spectral_index, dtype=dtype
    )
    pos = grid_positions(n_grid, box_size, key=kj, jitter=jitter, dtype=dtype)
    return particles_from_field(field, box_size, pos, dtype=dtype)
