"""Sharded deposition: particles -> locally-owned grid blocks.

The reference broadcast every query buffer to every rank with
``comm.allgather`` (``parallel_optimized.py:362-389``).  Here the grid
is sharded (X/px, Y/py, Z full) and particles are PRE-BUCKETED to the
device that owns their (folded) base cell (:func:`shard_particles_host`)
so each device scatters only ~Np / n_devices particles — deposit work
scales with the mesh instead of every chip rescanning the full set
(SURVEY.md §2.3 MPI row: "shard particles to the chip that owns their
folded cell").  CIC corners that straddle a block boundary land in a
one-cell halo plane that a cyclic ``ppermute`` adds to the +x / +y
neighbor — two nearest-neighbor ICI hops replace the reference's
all-to-all query exchange.

The ``*_local`` functions (replicated particles, out-of-block scatters
dropped) are kept for small runs and as the correctness oracle for the
sharded path.  All functions here are local functions to be called
inside ``jax.shard_map``.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "local_block_info",
    "deposit_ngp_local",
    "deposit_cic_local",
    "deposit_cic_sharded",
    "halo_add",
    "fold_local_targets",
    "shard_particles_host",
]


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


def _scatter_local(ids, values, n_cells, shape, engine="auto"):
    """Deterministic scatter-add into this device's flat local id
    space; ids == n_cells marks dropped (out-of-slab) particles.

    On TPU the per-device scatter runs through the MXU deposit kernel
    (:mod:`vpower_tpu.deposit.mxu_scatter` — it accepts any flat id
    space, slabs included; the drop id is exactly the plan's sentinel).
    """
    from ..deposit import mxu_scatter

    if engine == "auto":
        engine = ("mxu" if jax.default_backend() == "tpu"
                  and mxu_scatter.mxu_supported_cells(n_cells) else "xla")
    if engine in ("mxu", "mxu_interpret"):
        vals2 = values[:, None] if values.ndim == 1 else values
        res = jax.lax.sort(
            (ids,) + tuple(vals2[:, c] for c in range(vals2.shape[1])),
            num_keys=1,
        )
        plan = mxu_scatter.make_deposit_plan(res[0], n_cells)
        flat = mxu_scatter.deposit_planned(
            plan, jnp.stack(res[1:], axis=1), n_cells,
            interpret=engine == "mxu_interpret",
        )
        if values.ndim == 2:
            return flat.reshape((values.shape[1],) + shape)
        return flat[0].reshape(shape)

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


# ---------------------------------------------------------------------- #
# owner-bucketed (sharded-particle) deposition                           #
# ---------------------------------------------------------------------- #
def halo_add(g: jax.Array, axis_names: Tuple[str, str] = ("x", "y")) -> jax.Array:
    """Fold the +1 halo planes of an extended local block
    ``(C, nlx+1, nly+1, nlz)`` into the +x / +y neighbors (cyclic, so
    the periodic wrap at the global edge is the same hop).  Two
    nearest-neighbor ``ppermute``s — the entire inter-device traffic of
    sharded CIC deposition."""
    ax, ay = axis_names
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    halo_x = jax.lax.ppermute(
        g[:, -1:, :, :], ax, [(i, (i + 1) % px) for i in range(px)]
    )
    g = g[:, :-1].at[:, :1].add(halo_x)
    halo_y = jax.lax.ppermute(
        g[:, :, -1:, :], ay, [(i, (i + 1) % py) for i in range(py)]
    )
    return g[:, :, :-1].at[:, :, :1].add(halo_y)


def deposit_cic_sharded(
    pos: jax.Array,
    values: jax.Array,
    n_grid: int,
    box_size: float,
    axis_names: Tuple[str, str] = ("x", "y"),
) -> jax.Array:
    """CIC scatter of THIS DEVICE'S particle shard (bucketed by base
    corner, :func:`shard_particles_host`) into its block, straddling
    corners via the halo.  Output ``(C, nlx, nly, nlz)``."""
    (nlx, nly, nlz), (x0, y0, _) = local_block_info(n_grid, axis_names)
    cell = box_size / n_grid
    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base

    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    n_ext = (nlx + 1) * (nly + 1) * nlz
    ids_all, w_all = [], []
    # base is owned: local base in [0, nl*), +1 corners reach the halo
    lx0 = (base[:, 0] % n_grid) - x0
    ly0 = (base[:, 1] % n_grid) - y0
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        lx = lx0 + dx
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            ly = ly0 + dy
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                lz = (base[:, 2] + dz) % n_grid
                inside = (lx >= 0) & (lx <= nlx) & (ly >= 0) & (ly <= nly)
                ids_all.append(
                    jnp.where(inside, (lx * (nly + 1) + ly) * nlz + lz, n_ext)
                )
                w_all.append(wx * wy * wz)
    ids = jnp.concatenate(ids_all)
    w = jnp.concatenate(w_all)
    vals = jnp.tile(values, (8, 1)) * w[:, None]
    g = _scatter_local(ids, vals, n_ext, (nlx + 1, nly + 1, nlz))
    if g.ndim == 3:
        g = g[None]
    g = halo_add(g, axis_names)
    return g[0] if squeeze else g


def fold_local_targets(
    pos: jax.Array,
    n_grid: int,
    n_total: int,
    box_size: float,
    method: str,
    axis_names: Tuple[str, str] = ("x", "y"),
):
    """Beta-independent fused-fold scatter targets of this device's
    particle shard: ``(flat extended-block ids, corner weights, full-res
    phase indices)``.

    The local analog of
    :func:`vpower_tpu.spectrum.fold.fold_scatter_targets`: same
    per-corner full-resolution phase indices (exact CIC folding), but
    cell ids address the device's extended block — NGP targets its
    ``(nlx, nly, nlz)`` block directly, CIC targets ``(nlx+1, nly+1,
    nlz)`` with straddlers resolved by :func:`halo_add`.
    """
    (nlx, nly, nlz), (x0, y0, _) = local_block_info(n_grid, axis_names)
    cell = box_size / n_total

    if method == "ngp":
        idx_full = jnp.floor(pos / cell).astype(jnp.int32) % n_total
        fold = idx_full % n_grid
        lx = fold[:, 0] - x0
        ly = fold[:, 1] - y0
        inside = (lx >= 0) & (lx < nlx) & (ly >= 0) & (ly < nly)
        n_cells = nlx * nly * nlz
        ids = jnp.where(inside, (lx * nly + ly) * nlz + fold[:, 2], n_cells)
        return ids, jnp.ones(pos.shape[:1], pos.dtype), idx_full

    if method != "cic":
        raise ValueError(f"Unsupported fused-fold method {method!r}")

    u = pos / cell - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base
    # folded local base (owned by bucketing); +1 corners live in the halo
    lx0 = ((base[:, 0] % n_total) % n_grid) - x0
    ly0 = ((base[:, 1] % n_total) % n_grid) - y0
    lz0 = (base[:, 2] % n_total) % n_grid
    n_ext = (nlx + 1) * (nly + 1) * nlz
    ids_all, w_all, qidx_all = [], [], []
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        lx = lx0 + dx
        gx = (base[:, 0] + dx) % n_total
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            ly = ly0 + dy
            gy = (base[:, 1] + dy) % n_total
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                lz = (lz0 + dz) % n_grid
                gz = (base[:, 2] + dz) % n_total
                inside = (lx >= 0) & (lx <= nlx) & (ly >= 0) & (ly <= nly)
                ids_all.append(
                    jnp.where(inside, (lx * (nly + 1) + ly) * nlz + lz, n_ext)
                )
                w_all.append(wx * wy * wz)
                qidx_all.append(jnp.stack([gx, gy, gz], axis=1))
    return (
        jnp.concatenate(ids_all),
        jnp.concatenate(w_all),
        jnp.concatenate(qidx_all),
    )


def shard_particles_host(
    pos,
    values,
    mesh_shape: Tuple[int, int],
    n_grid: int,
    box_size: float,
    fold_m: int = 1,
    method: str = "ngp",
):
    """Host-side owner bucketing: partition particles by the device that
    owns their (folded) base cell in the (X/px, Y/py, Z) deposition
    layout, pad every bucket to the max count with zero-value rows
    inside the owner's block, and return
    ``(pos (px, py, Pmax, 3), values (px, py, Pmax, C))`` numpy arrays
    ready for ``NamedSharding(mesh, P('x', 'y'))``.

    This is the owner-scatter replacing the reference's per-rank full
    snapshot load + allgather (``parallel_optimized.py:272-276,
    365-368``): after bucketing, deposition is O(Np / n_devices) per
    chip and the only communication is the CIC halo hop.
    """
    px, py = mesh_shape
    assert n_grid % px == 0 and n_grid % py == 0, (
        "n_grid must divide evenly over the mesh"
    )
    nlx, nly = n_grid // px, n_grid // py
    n_total = fold_m * n_grid
    cell = box_size / n_total

    pos = np.asarray(pos, np.float32)
    values = np.asarray(values, np.float32)
    if values.ndim == 1:
        values = values[:, None]

    if method == "ngp":
        base = np.floor(pos / cell).astype(np.int64) % n_total
    else:  # cic/base-corner methods
        base = np.floor(pos / cell - 0.5).astype(np.int64) % n_total
    fold = base % n_grid
    owner = (fold[:, 0] // nlx) * py + (fold[:, 1] // nly)

    order = np.argsort(owner, kind="stable")
    owner_s = owner[order]
    counts = np.bincount(owner_s, minlength=px * py)
    p_max = max(int(counts.max()), 1)

    pos_out = np.zeros((px * py, p_max, 3), np.float32)
    val_out = np.zeros((px * py, p_max, values.shape[1]), np.float32)
    # zero-value padding rows must still target an owned cell: the
    # owner's first cell center (safe for both NGP and CIC bases)
    for ox in range(px):
        for oy in range(py):
            d = ox * py + oy
            pos_out[d, :, 0] = (ox * nlx + 0.5) * cell
            pos_out[d, :, 1] = (oy * nly + 0.5) * cell
            pos_out[d, :, 2] = 0.5 * cell
    starts = np.zeros((px * py,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos_s = pos[order]
    val_s = values[order]
    for d in range(px * py):
        c = counts[d]
        pos_out[d, :c] = pos_s[starts[d]: starts[d] + c]
        val_out[d, :c] = val_s[starts[d]: starts[d] + c]
    return (
        pos_out.reshape(px, py, p_max, 3),
        val_out.reshape(px, py, p_max, values.shape[1]),
    )
