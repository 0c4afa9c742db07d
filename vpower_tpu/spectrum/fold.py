"""Folding technique: extend the spectral dynamic range by factor ``m``
without growing the FFT.

A fold by ``m`` maps ``x -> x mod (L/m)``; combined with the phase
``exp(-i 2 pi beta . x / L)`` for ``beta in {0..m-1}^3``, each folded FFT
of size ``(N/m)^3`` samples the full k-lattice modulo m, so the m^3
phase-shifted small FFTs reconstruct the shell-averaged spectrum of the
full N^3 box (SURVEY.md §5; reference theory comment
``vpower/interp.py:939-944``).

Conventions (reference ``interp.py:1204-1252`` and
``parallel_optimized.py:377-388``):

* phase ``exp(-i * (2 pi / Ntot) * (bx*ix + by*iy + bz*iz))`` on the
  *unfolded* index lattice;
* folded field normalized by ``m^1.5`` so P(k) keeps its normalization;
* binning of a folded spectrum uses ``k_eff = k_grid + 2 pi beta / Ltot``
  (see :func:`vpower_tpu.spectrum.power.bin_grid`).

TPU idiom shifts: the fold-sum is a reshape + axis reduction (no Python
block loop, reference ``fold_field`` ``interp.py:1227-1252``), and for
particle pipelines the phase is fused directly into the deposition
weights (:func:`fold_deposit_weights`) — the optimization the reference
left as a TODO (``parallel_optimized.py:377-378``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.field import BoxField, FoldedField

__all__ = [
    "get_phase",
    "apply_phase",
    "fold_field",
    "fold_box_field",
    "fold_particles",
    "fold_phase_at_positions",
    "fold_deposit_weights",
    "fold_scatter_targets",
]


def get_phase(
    beta: Sequence[int],
    total_n: int,
    n_local: int,
    offset: Sequence[int] = (0, 0, 0),
    dtype=jnp.complex64,
) -> jax.Array:
    """(n, n, n) complex phase lattice
    ``exp(-i 2 pi / Ntot * (bx*(x0+ix) + by*(y0+iy) + bz*(z0+iz)))``.

    Reference ``_get_phase`` (``interp.py:1215-1224``); ``offset`` is the
    brick origin used by the out-of-core path (``interp.py:843-850``).
    """
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    scale = 2.0 * jnp.pi / total_n

    def axis(i0):
        return (jnp.arange(n_local, dtype=rdtype) + i0) * scale

    theta = (
        beta[0] * axis(offset[0])[:, None, None]
        + beta[1] * axis(offset[1])[None, :, None]
        + beta[2] * axis(offset[2])[None, None, :]
    )
    return jax.lax.complex(jnp.cos(theta), -jnp.sin(theta)).astype(dtype)


def apply_phase(f: jax.Array, phase: jax.Array) -> jax.Array:
    """Multiply a real/complex ([C,]N,N,N) CHANNELS-FIRST field by an
    (N,N,N) phase (reference ``_apply_phase``, ``interp.py:1204-1213``)."""
    if f.ndim == phase.ndim:
        return f * phase
    return f * phase[None]


def fold_field(f: jax.Array, m: int) -> jax.Array:
    """Sum the m^3 sub-blocks of a ([C,]N,N,N) CHANNELS-FIRST field onto
    a ([C,]N/m, N/m, N/m) field.

    Reference ``fold_field`` (``interp.py:1227-1252``) re-expressed as a
    reshape + reduction — one fused XLA op instead of an m^3 Python loop.
    """
    if m == 1:
        return f
    n = f.shape[-1]
    assert n % m == 0, "grid size must be divisible by the fold factor"
    nb = n // m
    lead = f.shape[:-3]
    g = f.reshape(lead + (m, nb, m, nb, m, nb))
    return jnp.sum(g, axis=(-6, -4, -2))


def fold_box_field(
    field: BoxField,
    m: int,
    beta: Sequence[int],
    quantity: str = "velocity",
) -> FoldedField:
    """Phase-weight, fold and normalize a gridded field.

    Reference ``BoxField.fold`` (``interp.py:598-608``): phase -> fold ->
    divide by ``m^1.5`` (P'(k) = m^3 P(k), so the field scales by m^-1.5;
    derivation at ``interp.py:939-944``).
    """
    if quantity == "velocity":
        data = field.velocity
    elif quantity == "momentum":
        data = field.momentum()
    elif quantity == "energy":
        data = field.kinetic_energy()
    else:
        raise ValueError(f"Unsupported quantity {quantity!r}")
    n = field.n_grid
    cdtype = jnp.complex128 if data.dtype == jnp.float64 else jnp.complex64
    phase = get_phase(beta, total_n=n, n_local=n, dtype=cdtype)
    phi = apply_phase(data.astype(phase.dtype), phase)
    phi = fold_field(phi, m) / m**1.5
    return FoldedField(
        field=phi,
        fold_factor=m,
        beta=tuple(int(b) for b in beta),
        box_size=field.box_size / m,
        total_box_size=field.box_size,
    )


def fold_particles(pos: jax.Array, m: int, box_size: float) -> jax.Array:
    """Particle-space folding ``x -> x mod (L/m)`` (reference
    ``fold_particles``, ``interp.py:1170-1201``, simplified to a box
    anchored at the origin)."""
    return pos % (box_size / m)


def fold_phase_at_positions(
    pos: jax.Array,
    beta: Sequence[int],
    box_size: float,
    n_total: int = 0,
    dtype=jnp.complex64,
) -> jax.Array:
    """(N,) complex phase ``exp(-i 2 pi beta . x / L)`` evaluated at
    *unfolded* particle positions — the deposition-fused form used by the
    MPI scripts (``parallel_optimized.py:377-379``).

    If ``n_total > 0`` the position is quantized to its full-resolution
    cell index first (``theta = 2 pi beta . floor(x / Lcell) / Ntot``),
    which makes the fused path bit-match the grid path: the reference
    phases the index lattice, not continuous positions
    (``interp.py:1215-1224``).
    """
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    b = jnp.asarray(beta, rdtype)
    if n_total > 0:
        cell = box_size / n_total
        idx = (jnp.floor(pos / cell).astype(jnp.int32) % n_total).astype(rdtype)
        theta = (2.0 * jnp.pi / n_total) * (idx @ b)
    else:
        theta = (2.0 * jnp.pi / box_size) * (pos.astype(rdtype) @ b)
    return jax.lax.complex(jnp.cos(theta), -jnp.sin(theta)).astype(dtype)


def fold_scatter_targets(
    pos: jax.Array,
    values: jax.Array,
    m: int,
    box_size: float,
    n_grid: int,
    method: str = "ngp",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Beta-INDEPENDENT scatter targets for a fold-fused deposition:
    ``(flat folded cell ids, weighted values, full-res cell indices)``.

    This is the hoisted half of the fused fold: per deposition target
    (one per particle for NGP, eight phased corners per particle for
    CIC) it yields the folded-grid cell, the deposition-weighted value,
    and the FULL-RESOLUTION (n_total = m * n_grid) cell index whose
    phase ``exp(-i 2 pi beta . idx / n_total)`` must multiply the value
    for a given beta.  Phasing each CIC corner by its own full-res cell
    makes the fused path bit-match deposit-at-full-res -> phase -> fold
    (the grid path, reference ``interp.py:1204-1252``); phasing per
    particle (as a naive fusion would) does not commute with the CIC
    spread.  The ``m^-1.5`` fold normalization is folded into the
    values.
    """
    if values.ndim == 1:
        values = values[:, None]
    n_total = m * n_grid
    cell = box_size / n_total
    norm = 1.0 / float(m) ** 1.5

    if method == "ngp":
        idx_full = jnp.floor(pos / cell).astype(jnp.int32) % n_total
        idx_fold = idx_full % n_grid
        ids = (idx_fold[:, 0] * n_grid + idx_fold[:, 1]) * n_grid + (
            idx_fold[:, 2]
        )
        return ids, values * norm, idx_full

    if method != "cic":
        raise ValueError(f"Unsupported fused-fold method {method!r}")

    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = (u - base).astype(values.dtype)
    ids_all, vals_all, idx_all = [], [], []
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        gx = (base[:, 0] + dx) % n_total
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            gy = (base[:, 1] + dy) % n_total
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                gz = (base[:, 2] + dz) % n_total
                idx_full = jnp.stack([gx, gy, gz], axis=1)
                fx, fy, fz = gx % n_grid, gy % n_grid, gz % n_grid
                ids_all.append((fx * n_grid + fy) * n_grid + fz)
                vals_all.append(values * ((wx * wy * wz) * norm)[:, None])
                idx_all.append(idx_full)
    return (
        jnp.concatenate(ids_all),
        jnp.concatenate(vals_all),
        jnp.concatenate(idx_all),
    )


def fold_deposit_weights(
    pos: jax.Array,
    values: jax.Array,
    m: int,
    beta: Sequence[int],
    box_size: float,
    n_total: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Fuse fold + phase into deposition inputs.

    Returns ``(folded_pos, phased_values)``: deposit the complex
    ``phased_values`` at ``folded_pos`` on an (N/m)-grid of box
    ``L/m`` and you get the folded, phase-weighted field directly —
    no full-resolution intermediate grid (SURVEY.md §5 "fused-into-
    deposition"; the reference applies the phase to query buffers at
    ``parallel_optimized.py:382-388``).  The ``m^1.5`` normalization is
    folded into the weights.  Pass ``n_total = m * n_grid`` for exact
    parity with the grid fold path (see
    :func:`fold_phase_at_positions`).
    """
    cdtype = jnp.complex128 if values.dtype == jnp.float64 else jnp.complex64
    phase = fold_phase_at_positions(pos, beta, box_size, n_total=n_total,
                                    dtype=cdtype)
    phased = values.astype(phase.dtype) * (
        phase[:, None] if values.ndim == 2 else phase
    )
    return fold_particles(pos, m, box_size), phased / m**1.5
