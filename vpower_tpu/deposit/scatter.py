"""Point deposition (scatter) kernels: NGP and CIC.

Multi-channel outputs are CHANNELS-FIRST (C, N, N, N) — see
:mod:`vpower_tpu.core.field` for the TPU layout rationale.

TPU-native re-design of the reference's ``deposit_to_grid``
(``vpower/interp.py:996-1015``, ``np.add.at`` scatter).  TPUs have no
float atomics, so the scatter is expressed as a sort-free XLA
scatter-add (small N) or a sort + ``segment_sum`` with
``indices_are_sorted=True`` (large N) — both deterministic.

All kernels use the reference's periodic-wrap cell assignment
``index = floor(pos / Lcell) mod N`` (``interp.py:1011``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["cell_index", "deposit_ngp", "deposit_cic", "sort_by_cell"]


def cell_index(pos: jax.Array, n_grid: int, box_size: float) -> jax.Array:
    """(N,) flat int32 cell id with periodic wrap (reference
    ``interp.py:1011``)."""
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    return (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]


def sort_by_cell(pos: jax.Array, *arrays, n_grid: int, box_size: float):
    """Sort particles by flat cell id — the TPU analog of the reference's
    persisted Annoy index (``parallel_optimized.py:297-313``): a reusable
    spatial ordering that makes every later deposition/NN pass
    segment-contiguous.

    Returns ``(cell_ids_sorted, order, pos_sorted, *arrays_sorted)``.
    """
    ids = cell_index(pos, n_grid, box_size)
    order = jnp.argsort(ids)
    out = [ids[order], order, pos[order]]
    out.extend(a[order] for a in arrays)
    return tuple(out)


def _segment_deposit(
    values: jax.Array, ids: jax.Array, n_cells: int, sorted_ids: bool
) -> jax.Array:
    """Deterministic scatter-add of ``values`` (N,) or (N, C) into
    ``n_cells`` buckets."""
    return jax.ops.segment_sum(
        values, ids, num_segments=n_cells, indices_are_sorted=sorted_ids
    )


def deposit_ngp(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    sort: bool = True,
) -> jax.Array:
    """Nearest-grid-point scatter: each particle adds ``values`` to its
    containing cell.  Equivalent semantics to ``deposit_to_grid``
    (reference ``interp.py:996-1015``).

    Parameters
    ----------
    values : (N,) or (N, C).
    sort : pre-sort by cell id so the segment reduction runs on
        contiguous runs — the fast path for large N on TPU.

    Returns (n, n, n) or CHANNELS-FIRST (C, n, n, n).
    """
    ids = cell_index(pos, n_grid, box_size)
    if sort:
        order = jnp.argsort(ids)
        ids = ids[order]
        values = values[order]
    grid = _segment_deposit(values, ids, n_grid**3, sort)
    if values.ndim == 2:
        # CHANNELS-FIRST output: a trailing small channel dim in a
        # materialized TPU layout pads to 128 lanes (~43x HBM)
        return grid.T.reshape((values.shape[1],) + (n_grid,) * 3)
    return grid.reshape((n_grid,) * 3)


def deposit_cic(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    sort: bool = True,
) -> jax.Array:
    """Cloud-in-cell (trilinear) scatter with periodic wrap.

    Not present in the reference (which offers only NGP and the external
    Voxelize SPH kernel); CIC is the standard middle ground and the
    mass-conserving baseline for the SPH path
    (SURVEY.md §2.3 "Voxelize" replacement).
    """
    cell = box_size / n_grid
    # Offset by half a cell: CIC weights are relative to cell centers.
    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base  # in [0, 1)

    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]

    grids = []
    ids_all = []
    w_all = []
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        ix = (base[:, 0] + dx) % n_grid
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            iy = (base[:, 1] + dy) % n_grid
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                iz = (base[:, 2] + dz) % n_grid
                ids_all.append((ix * n_grid + iy) * n_grid + iz)
                w_all.append(wx * wy * wz)

    ids = jnp.concatenate(ids_all)
    w = jnp.concatenate(w_all)
    vals = jnp.tile(values, (8, 1)) * w[:, None]
    if sort:
        order = jnp.argsort(ids)
        ids = ids[order]
        vals = vals[order]
    grid = jax.ops.segment_sum(
        vals, ids, num_segments=n_grid**3, indices_are_sorted=sort
    )
    grid = grid.T.reshape((values.shape[1],) + (n_grid,) * 3)
    if squeeze:
        grid = grid[0]
    return grid
