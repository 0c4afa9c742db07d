"""Point deposition (scatter) kernels: NGP and CIC.

Multi-channel outputs are CHANNELS-FIRST (C, N, N, N) — see
:mod:`vpower_tpu.core.field` for the TPU layout rationale.

TPU-native re-design of the reference's ``deposit_to_grid``
(``vpower/interp.py:996-1015``, ``np.add.at`` scatter).  TPUs have no
float atomics, so the scatter is deterministic by construction; two
engines implement it:

* ``xla``: sort + ``segment_sum`` (``indices_are_sorted=True``) — runs
  everywhere, used on CPU meshes and grids the MXU kernel can't tile.
* ``mxu``: sort + the Pallas outer-product one-hot matmul kernel
  (:mod:`vpower_tpu.deposit.mxu_scatter`) — ~10x faster on TPU (XLA
  lowers segment_sum to a serialized scatter-add).

CIC under the ``mxu`` engine uses the ROLL formulation: all eight
corners deposit at the particle's BASE cell (so one sort serves all
eight), and the final grid is assembled with seven single-axis
periodic rolls — ``sum_d roll(G_d, d)`` factored per axis.

All kernels use the reference's periodic-wrap cell assignment
``index = floor(pos / Lcell) mod N`` (``interp.py:1011``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import mxu_scatter

__all__ = ["cell_index", "deposit_ngp", "deposit_cic", "sort_by_cell",
           "resolve_engine"]


def cell_index(pos: jax.Array, n_grid: int, box_size: float) -> jax.Array:
    """(N,) flat int32 cell id with periodic wrap (reference
    ``interp.py:1011``)."""
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    return (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]


def resolve_engine(engine: str, n_grid: int) -> str:
    """``auto`` -> ``mxu`` on a TPU backend when the grid tiles into the
    kernel's blocks, else ``xla``.  Explicit values pass through
    (``mxu_interpret`` exercises the kernel on CPU for tests)."""
    if engine == "auto":
        if (jax.default_backend() == "tpu"
                and mxu_scatter.mxu_supported(n_grid)):
            return "mxu"
        return "xla"
    if engine in ("mxu", "mxu_interpret") and not mxu_scatter.mxu_supported(
            n_grid):
        raise ValueError(
            f"mxu deposit engine cannot tile n_grid={n_grid} "
            f"(n_grid^3 must divide a {mxu_scatter._CBL}-lane block)"
        )
    return engine


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


def _sort_with_payload(ids: jax.Array, *payload: jax.Array):
    """Joint sort of int32 ids with 1-D float payload columns (faster
    than argsort + gathers for few columns)."""
    res = jax.lax.sort((ids,) + payload, num_keys=1)
    return res[0], res[1:]


def deposit_ngp(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    sort: bool = True,
    engine: str = "auto",
) -> jax.Array:
    """Nearest-grid-point scatter: each particle adds ``values`` to its
    containing cell.  Equivalent semantics to ``deposit_to_grid``
    (reference ``interp.py:996-1015``).

    Parameters
    ----------
    values : (N,) or (N, C).
    sort : pre-sort by cell id so the segment reduction runs on
        contiguous runs — the fast path for large N on TPU (the mxu
        engine always sorts).
    engine : ``auto`` | ``xla`` | ``mxu`` | ``mxu_interpret``.

    Returns (n, n, n) or CHANNELS-FIRST (C, n, n, n).
    """
    engine = resolve_engine(engine, n_grid)
    squeeze = values.ndim == 1
    vals2 = values[:, None] if squeeze else values
    ids = cell_index(pos, n_grid, box_size)

    if engine in ("mxu", "mxu_interpret"):
        sids, cols = _sort_with_payload(
            ids, *(vals2[:, c] for c in range(vals2.shape[1]))
        )
        svals = jnp.stack(cols, axis=1)
        grid = mxu_scatter.mxu_deposit_sorted(
            sids, svals, n_grid, interpret=engine == "mxu_interpret"
        )
        return grid[0] if squeeze else grid

    if sort:
        order = jnp.argsort(ids)
        ids = ids[order]
        vals2 = vals2[order]
    grid = jax.ops.segment_sum(
        vals2, ids, num_segments=n_grid**3, indices_are_sorted=sort
    )
    # CHANNELS-FIRST output: a trailing small channel dim in a
    # materialized TPU layout pads to 128 lanes (~43x HBM)
    grid = grid.T.reshape((vals2.shape[1],) + (n_grid,) * 3)
    return grid[0] if squeeze else grid


def _cic_base_frac(pos: jax.Array, n_grid: int, box_size: float):
    cell = box_size / n_grid
    # Offset by half a cell: CIC weights are relative to cell centers.
    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base  # in [0, 1)
    return base, frac


def deposit_cic(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    sort: bool = True,
    engine: str = "auto",
) -> jax.Array:
    """Cloud-in-cell (trilinear) scatter with periodic wrap.

    Not present in the reference (which offers only NGP and the external
    Voxelize SPH kernel); CIC is the standard middle ground and the
    mass-conserving baseline for the SPH path
    (SURVEY.md §2.3 "Voxelize" replacement).
    """
    engine = resolve_engine(engine, n_grid)
    squeeze = values.ndim == 1
    vals2 = values[:, None] if squeeze else values
    base, frac = _cic_base_frac(pos, n_grid, box_size)

    if engine in ("mxu", "mxu_interpret"):
        interpret = engine == "mxu_interpret"
        n_chan = vals2.shape[1]
        basew = base % n_grid
        ids = (basew[:, 0] * n_grid + basew[:, 1]) * n_grid + basew[:, 2]
        # One sort serves all 8 corners (deposit at base + roll).
        sids, cols = _sort_with_payload(
            ids,
            *(vals2[:, c] for c in range(n_chan)),
            frac[:, 0], frac[:, 1], frac[:, 2],
        )
        svals = jnp.stack(cols[:n_chan], axis=1)
        fx, fy, fz = cols[n_chan], cols[n_chan + 1], cols[n_chan + 2]
        plan = mxu_scatter.make_deposit_plan(sids, n_grid**3)

        def corner_weight(d):
            dx, dy, dz = d
            return ((fx if dx else 1.0 - fx)
                    * (fy if dy else 1.0 - fy)
                    * (fz if dz else 1.0 - fz))

        grid = mxu_scatter.deposit_offsets_rolled(
            plan, svals, corner_weight, (0, 1), n_grid,
            interpret=interpret,
        )
        return grid[0] if squeeze else grid

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
    vals = jnp.tile(vals2, (8, 1)) * w[:, None]
    if sort:
        order = jnp.argsort(ids)
        ids = ids[order]
        vals = vals[order]
    grid = jax.ops.segment_sum(
        vals, ids, num_segments=n_grid**3, indices_are_sorted=sort
    )
    grid = grid.T.reshape((vals2.shape[1],) + (n_grid,) * 3)
    return grid[0] if squeeze else grid
