"""Sharded deposition: particles -> locally-owned grid blocks.

The reference broadcast every query buffer to every rank with
``comm.allgather`` (``parallel_optimized.py:362-389``).  Here the grid
is sharded (X/px, Y/py, Z full) and each device scatters only the
particles whose target cells it owns — out-of-slab contributions are
dropped via out-of-bounds scatter indices, so there is NO bulk exchange
at all for NGP, and CIC straddlers are handled corner-wise (SURVEY.md
§5: "eliminate the allgather entirely").

All functions are local functions to be called inside ``jax.shard_map``
with the particle arrays replicated.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["local_block_info", "deposit_ngp_local", "deposit_cic_local"]


def local_block_info(n_grid: int, axis_names: Tuple[str, str] = ("x", "y")):
    """((nlx, nly, nlz), (x0, y0, z0)) of this device's grid block in the
    deposition layout (X/px, Y/py, Z full)."""
    ax, ay = axis_names
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    rx = jax.lax.axis_index(ax)
    ry = jax.lax.axis_index(ay)
    nlx, nly = n_grid // px, n_grid // py
    return (nlx, nly, n_grid), (rx * nlx, ry * nly, jnp.zeros_like(rx))


def _scatter_local(ids, values, n_cells, shape):
    grid = jax.ops.segment_sum(values, ids, num_segments=n_cells + 1)[:n_cells]
    if values.ndim == 2:
        # CHANNELS-FIRST output (TPU layout, see core.field)
        return grid.T.reshape((values.shape[1],) + shape)
    return grid.reshape(shape)


def deposit_ngp_local(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    axis_names: Tuple[str, str] = ("x", "y"),
) -> jax.Array:
    """NGP scatter into this device's (N/px, N/py, N) block; particles
    outside the slab are dropped (their scatter index is out of range).

    Semantics per cell identical to the replicated
    :func:`vpower_tpu.deposit.scatter.deposit_ngp` (reference
    ``interp.py:996-1015``).
    """
    (nlx, nly, nlz), (x0, y0, _) = local_block_info(n_grid, axis_names)
    cell = box_size / n_grid
    ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
    lx = ijk[:, 0] - x0
    ly = ijk[:, 1] - y0
    lz = ijk[:, 2]
    inside = (lx >= 0) & (lx < nlx) & (ly >= 0) & (ly < nly)
    n_cells = nlx * nly * nlz
    flat = jnp.where(inside, (lx * nly + ly) * nlz + lz, n_cells)
    return _scatter_local(flat, values, n_cells, (nlx, nly, nlz))


def deposit_cic_local(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    axis_names: Tuple[str, str] = ("x", "y"),
) -> jax.Array:
    """CIC scatter into the local block; slab-straddling corners fall in
    whichever device owns them (every corner is scattered exactly once
    globally, so conservation is exact across the mesh)."""
    (nlx, nly, nlz), (x0, y0, _) = local_block_info(n_grid, axis_names)
    cell = box_size / n_grid
    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base

    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]

    n_cells = nlx * nly * nlz
    ids_all, w_all = [], []
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        gx = (base[:, 0] + dx) % n_grid
        lx = gx - x0
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            gy = (base[:, 1] + dy) % n_grid
            ly = gy - y0
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                lz = (base[:, 2] + dz) % n_grid
                inside = (lx >= 0) & (lx < nlx) & (ly >= 0) & (ly < nly)
                ids_all.append(
                    jnp.where(inside, (lx * nly + ly) * nlz + lz, n_cells)
                )
                w_all.append(wx * wy * wz)

    ids = jnp.concatenate(ids_all)
    w = jnp.concatenate(w_all)
    vals = jnp.tile(values, (8, 1)) * w[:, None]
    grid = _scatter_local(ids, vals, n_cells, (nlx, nly, nlz))
    if squeeze:
        grid = grid[0]
    return grid
