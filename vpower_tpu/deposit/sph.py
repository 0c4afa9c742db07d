"""SPH / adaptive-kernel deposition — the Voxelize replacement.

The reference deposits ``[rho*v, rho]`` through the external C++
Voxelize library with per-particle radii h (``vpower/interp.py:280-340``,
SURVEY.md §2.3): each particle spreads its field over the cells its
sphere overlaps, conservatively.  TPU-native re-design:

* Each particle scatters ``[m*v, m]`` into every cell within its kernel
  support, weighted by the kernel evaluated at the cell center and
  NORMALIZED over the particle's sampled footprint — so total deposited
  mass/momentum equals the particle totals exactly (the property the
  reference obtained from Voxelize's exact sphere-cell overlap).
  Dividing by the cell volume recovers the ``[rho*v, rho]`` grid, from
  which ``v = (rho v)/rho`` and ``mass = rho * Lcell^3`` exactly as the
  reference does (``interp.py:325-326``).
* The footprint loop runs over a STATIC (2 s_max + 1)^3 offset set
  (``lax.scan``); kernel weights vanish naturally beyond each
  particle's own support, so no per-size-class bucketing or dynamic
  shapes are needed.  Particles whose support exceeds ``s_max`` cells
  have their h clamped (the analog of the reference's padding cap,
  ``interp.py:216-243``); at power-spectrum resolutions this affects
  only the largest, least-resolved particles.
* No float atomics: the per-offset scatter is an XLA scatter-add with
  deterministic combine.

Kernels: ``cubic_spline`` (standard SPH M4, support radius = h) and
``sphere`` (top-hat, the closest analog of Voxelize's uniform spheres).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.field import BoxField
from ..core.particles import Particles
from . import mxu_scatter
from .scatter import resolve_engine

__all__ = [
    "sph_deposit",
    "sph_deposit_multires",
    "sph_interp_to_field",
    "kernel_weight",
]


def kernel_weight(q: jax.Array, kind: str) -> jax.Array:
    """Unnormalized kernel value at q = r / h (support q < 1).

    Normalization is irrelevant: weights are renormalized per particle
    over the sampled footprint (exact conservation by construction).
    """
    if kind == "cubic_spline":
        # M4 cubic spline with support radius h (Gadget convention).
        w = jnp.where(
            q < 0.5,
            1.0 - 6.0 * q**2 + 6.0 * q**3,
            2.0 * jnp.maximum(1.0 - q, 0.0) ** 3,
        )
        return jnp.maximum(w, 0.0)
    if kind == "sphere":
        return (q < 1.0).astype(q.dtype)
    raise ValueError(f"Unknown kernel {kind!r}")


def _offsets(s_max: int) -> np.ndarray:
    return np.asarray(
        [
            (dx, dy, dz)
            for dx in range(-s_max, s_max + 1)
            for dy in range(-s_max, s_max + 1)
            for dz in range(-s_max, s_max + 1)
        ],
        np.int32,
    )


@partial(
    jax.jit,
    static_argnames=("n_grid", "s_max", "kernel", "periodic", "engine"),
)
def sph_deposit(
    pos: jax.Array,
    values: jax.Array,
    h: jax.Array,
    n_grid: int,
    box_size: float,
    s_max: int = 2,
    kernel: str = "cubic_spline",
    periodic: bool = True,
    engine: str = "auto",
) -> jax.Array:
    """Scatter (N, C) ``values`` with per-particle kernel radii ``h``
    into a CHANNELS-FIRST (C, n, n, n) grid.  Per-particle weights sum
    to exactly 1 over the sampled footprint, so column sums are
    conserved.

    ``engine='mxu'`` (auto on TPU) deposits every offset at the
    particle's BASE cell through the MXU matmul kernel — one cell sort
    shared by all (2 s_max + 1)^3 offsets — and assembles the grid with
    single-axis periodic rolls (measured 23.5 s -> ~2.5 s at 10M
    particles, 512^3, s_max=1 on one v5e chip).
    """
    dtype = pos.dtype
    n_cells = n_grid**3
    cell = box_size / n_grid
    pos = pos % box_size
    # Clamp support to the static footprint (reference analog: uniform
    # padding cap, interp.py:216-243).
    h_eff = jnp.clip(h, 1e-6 * cell, (s_max + 0.5) * cell)
    engine = resolve_engine(engine, n_grid)

    if engine in ("mxu", "mxu_interpret"):
        return _sph_deposit_mxu(
            pos, values, h_eff, n_grid, box_size, s_max, kernel, periodic,
            interpret=engine == "mxu_interpret",
        )

    base = jnp.floor(pos / cell).astype(jnp.int32)  # own cell (pre-wrap)
    offsets = jnp.asarray(_offsets(s_max))

    def offset_weight(off):
        tgt = base + off[None, :]
        center = (tgt.astype(dtype) + 0.5) * cell
        delta = pos - center
        if periodic:
            delta = delta - box_size * jnp.round(delta / box_size)
        r = jnp.sqrt(jnp.sum(delta * delta, axis=1))
        return kernel_weight(r / h_eff, kernel)

    # Pass 1: per-particle normalization (pure VPU, no scatter).
    def norm_body(acc, off):
        return acc + offset_weight(off), None

    wsum, _ = jax.lax.scan(norm_body, jnp.zeros(pos.shape[0], dtype), offsets)
    # Fallback: particles whose kernel misses every sampled center (h
    # much smaller than a cell) deposit NGP-style into their own cell.
    degenerate = wsum <= 0.0
    wsum = jnp.where(degenerate, 1.0, wsum)

    def tgt_flat(off):
        tgt = (base + off[None, :]) % n_grid
        return (tgt[:, 0] * n_grid + tgt[:, 1]) * n_grid + tgt[:, 2]

    zero_off_index = (len(_offsets(s_max)) - 1) // 2  # (0,0,0) position

    def scatter_body(grid, off_i):
        off = offsets[off_i]
        w = offset_weight(off) / wsum
        w = jnp.where(
            degenerate,
            jnp.where(off_i == zero_off_index, 1.0, 0.0),
            w,
        )
        grid = grid.at[tgt_flat(off)].add(values * w[:, None])
        return grid, None

    grid = jnp.zeros((n_cells, values.shape[1]), dtype)
    grid, _ = jax.lax.scan(
        scatter_body, grid, jnp.arange(offsets.shape[0], dtype=jnp.int32)
    )
    # CHANNELS-FIRST output (TPU layout, see core.field)
    return grid.T.reshape((values.shape[1],) + (n_grid,) * 3)


def _sph_deposit_mxu(
    pos, values, h_eff, n_grid, box_size, s_max, kernel, periodic,
    interpret=False,
):
    """MXU-engine SPH scatter: deposit at base, roll to offset.

    Every offset d contributes ``w_d * values`` at the particle's base
    cell of a per-offset grid ``G_d``; the physical grid is
    ``sum_d roll(G_d, d)``.  One sort (+ one deposit plan) serves all
    offsets; rolls are factored per axis.
    """
    dtype = pos.dtype
    cell = box_size / n_grid
    n_chan = values.shape[1]
    base = jnp.floor(pos / cell).astype(jnp.int32)
    basew = jnp.clip(base, 0, n_grid - 1)   # pos in [0, box) up to fp
    ids = (basew[:, 0] * n_grid + basew[:, 1]) * n_grid + basew[:, 2]

    res = jax.lax.sort(
        (ids,)
        + tuple(values[:, c] for c in range(n_chan))
        + (pos[:, 0], pos[:, 1], pos[:, 2], h_eff),
        num_keys=1,
    )
    sids = res[0]
    svals = jnp.stack(res[1:1 + n_chan], axis=1)
    spos = jnp.stack(res[1 + n_chan:4 + n_chan], axis=1)
    sh = res[4 + n_chan]
    sbase = jnp.floor(spos / cell).astype(jnp.int32)
    plan = mxu_scatter.make_deposit_plan(sids, n_grid**3)

    def offset_weight(off):
        center = (sbase.astype(dtype) + jnp.asarray(off, dtype) + 0.5) * cell
        delta = spos - center
        if periodic:
            delta = delta - box_size * jnp.round(delta / box_size)
        r = jnp.sqrt(jnp.sum(delta * delta, axis=1))
        return kernel_weight(r / sh, kernel)

    offs = range(-s_max, s_max + 1)
    wsum = jnp.zeros(spos.shape[0], dtype)
    for dx in offs:
        for dy in offs:
            for dz in offs:
                wsum = wsum + offset_weight((dx, dy, dz))
    degenerate = wsum <= 0.0
    wsum = jnp.where(degenerate, 1.0, wsum)

    def norm_weight(d):
        w = offset_weight(d) / wsum
        return jnp.where(
            degenerate,
            jnp.asarray(1.0 if d == (0, 0, 0) else 0.0, dtype),
            w,
        )

    return mxu_scatter.deposit_offsets_rolled(
        plan, svals, norm_weight, offs, n_grid, interpret=interpret
    )


def _upsample_add(fine: jax.Array, coarse: jax.Array, factor: int) -> jax.Array:
    """Add a (C, n/f, n/f, n/f) coarse block grid into the fine grid,
    spreading each coarse cell's content equally over its f^3 children
    (mass-conservative piecewise-constant refinement)."""
    c = coarse / float(factor**3)
    for ax in (1, 2, 3):
        idx = jnp.arange(c.shape[ax] * factor, dtype=jnp.int32) // factor
        c = jnp.take(c, idx, axis=ax)
    return fine + c


def sph_deposit_multires(
    pos: jax.Array,
    values: jax.Array,
    h: jax.Array,
    n_grid: int,
    box_size: float,
    s_max: int = 2,
    kernel: str = "cubic_spline",
    periodic: bool = True,
    levels: int = 1,
    engine: str = "auto",
) -> jax.Array:
    """Adaptive-support SPH scatter WITHOUT clamping large kernels.

    Level k deposits the particles whose support needs up to
    ``s_max * 2^k`` fine cells onto a 2^k-times coarser grid (where
    their kernel fits the static footprint), then refines the coarse
    grid conservatively.  This removes :func:`sph_deposit`'s h clamp —
    the property the reference preserved with padded exact sphere-cell
    overlap (``interp.py:216-243``) — at a kernel-shape resolution of
    ``support / s_max`` cells (relative error <= 1/s_max), while total
    mass/momentum stay exactly conserved per particle.
    """
    if levels <= 1:
        return sph_deposit(pos, values, h, n_grid, box_size, s_max=s_max,
                           kernel=kernel, periodic=periodic, engine=engine)
    assert n_grid % (2 ** (levels - 1)) == 0, (
        "n_grid must divide by 2^(levels-1)"
    )
    cell = box_size / n_grid
    support = h / cell  # kernel radius in fine cells
    # class k: support in (s_max * 2^(k-1), s_max * 2^k]
    klass = jnp.ceil(
        jnp.log2(jnp.maximum(support / s_max, 1e-9))
    ).astype(jnp.int32)
    klass = jnp.clip(klass, 0, levels - 1)
    grid = None
    for k in range(levels):
        mask = (klass == k).astype(values.dtype)
        vals_k = values * mask[:, None]
        gk = sph_deposit(
            pos, vals_k, h, n_grid >> k, box_size,
            s_max=s_max, kernel=kernel, periodic=periodic,
            engine="auto" if engine == "auto" else engine,
        )
        if k == 0:
            grid = gk
        else:
            grid = _upsample_add(grid, gk, 1 << k)
    return grid


def sph_interp_to_field(
    particles: Particles,
    n_grid: int,
    smoothing_rate: float = 1.0,
    s_max: int = 2,
    kernel: str = "cubic_spline",
    periodic: bool = True,
    clamp_support: bool = True,
    edge_removal: float = 0.0,
    engine: str = "auto",
) -> BoxField:
    """SPH-deposit ``[m*v, m]`` and form a BoxField.

    Equivalent capability to ``GasParticles.voxelize_interp_to_field``
    (reference ``interp.py:280-340``): smoothing length
    ``h = (3 V / 4 pi)^(1/3) * f(smoothing_rate)`` (``interp.py:190-196``),
    conservative spreading, then ``v = p / m``.  Periodic wrap replaces
    the reference's padding + crop (``interp.py:216-243, 333-335``),
    which existed only because Voxelize assumed a periodic box.

    ``clamp_support=False`` handles arbitrarily large kernels via the
    multi-resolution path (:func:`sph_deposit_multires`) instead of
    clamping h to the static footprint.

    ``edge_removal > 0`` deposits an extra coverage channel (ones per
    particle) and zeroes cells whose coverage falls below the threshold
    — the reference's ``edge_removal`` flag (``interp.py:310-323``).
    """
    values = [
        particles.vel * particles.mass[:, None], particles.mass[:, None],
    ]
    if edge_removal > 0:
        values.append(jnp.ones((len(particles), 1), particles.pos.dtype))
    values = jnp.concatenate(values, axis=1)
    h = particles.smoothing_length(smoothing_rate)

    if clamp_support:
        grid = sph_deposit(
            particles.pos, values, h, n_grid, particles.box_size,
            s_max=s_max, kernel=kernel, periodic=periodic, engine=engine,
        )
    else:
        cell = particles.box_size / n_grid
        max_support = float(jnp.max(h)) / cell
        levels = 1
        while s_max * 2 ** (levels - 1) < max_support and \
                n_grid % (2**levels) == 0:
            levels += 1
        grid = sph_deposit_multires(
            particles.pos, values, h, n_grid, particles.box_size,
            s_max=s_max, kernel=kernel, periodic=periodic, levels=levels,
            engine=engine,
        )

    m_grid = grid[3]
    if edge_removal > 0:
        covered = grid[4] >= edge_removal
        m_grid = jnp.where(covered, m_grid, 0.0)
    safe = jnp.where(m_grid > 0, m_grid, 1.0)
    v_grid = jnp.where(m_grid[None] > 0, grid[:3] / safe[None], 0.0)
    return BoxField(
        velocity=v_grid, mass=m_grid, cell_size=particles.box_size / n_grid
    )
