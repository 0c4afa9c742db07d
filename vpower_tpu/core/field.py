"""Gridded 3-D field container (velocity + mass cubes) as a JAX pytree.

TPU-native equivalent of the reference's ``BoxField``
(``vpower/interp.py:456-733``).

**Layout convention: multi-channel grids are CHANNELS-FIRST**
(``velocity`` is ``(3, N, N, N)``).  The TPU memory system tiles the two
minor dims of every materialized array to (8, 128); a channel-last
``(N, N, N, 3)`` cube therefore pads 3 -> 128 lanes — a ~43x HBM blowup
the moment such an array crosses a jit boundary (measured: 68 GB for a
512^3 float32 velocity field).  The reference kept vx/vy/vz as separate
cubes (``interp.py:464-466``) for unrelated reasons; channels-first is
the same idea in one array.

Known reference bugs fixed here (SURVEY.md §7):

* ``momentum_power`` used ``vx`` for all three components
  (``interp.py:523-525``) — fixed.
* ``down_sample`` zero-mass guard used an absolute epsilon
  (``interp.py:629``); we use a ``jnp.where`` guard that returns exactly
  zero velocity in empty cells.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["BoxField", "FoldedField"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["velocity", "mass"],
    meta_fields=["cell_size"],
)
@dataclasses.dataclass(frozen=True)
class BoxField:
    """A regular cubic grid holding a velocity field and a mass field.

    Attributes
    ----------
    velocity : (3, N, N, N) array — CHANNELS-FIRST (see module note).
    mass : (N, N, N) array — mass per cell (density * cell volume).
    cell_size : float — edge length of one cell.  Static metadata.

    Mirrors ``BoxField`` (reference ``vpower/interp.py:456-471``).
    """

    velocity: jax.Array
    mass: jax.Array
    cell_size: float

    def __post_init__(self):
        if self.velocity.ndim == 4 and self.velocity.shape[-1] == 3 \
                and self.velocity.shape[0] != 3:
            raise ValueError(
                "BoxField.velocity must be channels-first (3, N, N, N); "
                "got a channel-last array — transpose with "
                "jnp.moveaxis(v, -1, 0)."
            )

    # ------------------------------------------------------------------ #
    @property
    def n_grid(self) -> int:
        return self.mass.shape[0]

    @property
    def box_size(self) -> float:
        return self.n_grid * self.cell_size

    def density(self) -> jax.Array:
        """Mass per cell / cell volume (reference ``interp.py:491-492``)."""
        return self.mass / self.cell_size**3

    def momentum(self) -> jax.Array:
        """(3, N, N, N) momentum field ``m * v`` — with the per-component
        fix for the reference's vx-only bug (``interp.py:521-525``)."""
        return self.velocity * self.mass[None]

    def kinetic_energy(self) -> jax.Array:
        """(N, N, N) kinetic-energy field ``m * |v|^2`` (reference
        ``interp.py:544-546``)."""
        return self.mass * jnp.sum(self.velocity**2, axis=0)

    # ------------------------------------------------------------------ #
    # conserved totals                                                   #
    # ------------------------------------------------------------------ #
    def total_mass(self) -> jax.Array:
        return jnp.sum(self.mass)

    def total_momentum(self) -> jax.Array:
        return jnp.sum(self.momentum(), axis=(1, 2, 3))

    def total_kinetic_energy(self) -> jax.Array:
        return 0.5 * jnp.sum(self.kinetic_energy())

    def specific_kinetic_energy(self) -> jax.Array:
        return self.total_kinetic_energy() / self.total_mass()

    def mean_kinetic_energy(self) -> jax.Array:
        return 0.5 * jnp.mean(self.kinetic_energy())

    # ------------------------------------------------------------------ #
    # geometry transforms                                                #
    # ------------------------------------------------------------------ #
    def trim(self, n_margin: int, n_keep: int) -> "BoxField":
        """Crop a centered ``n_keep``-cube out of a padded field.

        Reference: ``BoxField.trim`` (``interp.py:611-620``).
        """
        sl = slice(n_margin, n_margin + n_keep)
        return BoxField(
            velocity=self.velocity[:, sl, sl, sl],
            mass=self.mass[sl, sl, sl],
            cell_size=self.cell_size,
        )

    def peek(self, **kwargs):
        """Object-level convenience mirroring the reference's
        ``BoxField.peek`` (``interp.py:669``); delegates to
        :func:`vpower_tpu.utils.plotting.peek_field`."""
        from ..utils.plotting import peek_field

        return peek_field(self, **kwargs)

    def down_sample(self, n: int) -> "BoxField":
        """Mass-weighted down-sample by integer factor ``n``.

        Momentum and mass are block-summed; velocity is re-derived as
        momentum / mass with an exact zero-mass guard.

        Reference: ``BoxField.down_sample`` (``interp.py:623-636``) and
        ``down_sample`` (``interp.py:1255-1266``).
        """
        if n == 1:
            return self
        N = self.n_grid
        assert N % n == 0, "grid size must be divisible by the down-sample factor"
        M = N // n

        def block_sum(x):
            lead = x.shape[:-3]
            return jnp.sum(
                x.reshape(lead + (M, n, M, n, M, n)), axis=(-5, -3, -1)
            )

        new_p = block_sum(self.momentum())
        new_mass = block_sum(self.mass)
        safe_mass = jnp.where(new_mass > 0, new_mass, 1.0)
        new_v = jnp.where(new_mass[None] > 0, new_p / safe_mass[None], 0.0)
        return BoxField(velocity=new_v, mass=new_mass, cell_size=self.cell_size * n)

    def astype(self, dtype) -> "BoxField":
        return BoxField(
            velocity=self.velocity.astype(dtype),
            mass=self.mass.astype(dtype),
            cell_size=self.cell_size,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["field"],
    meta_fields=["fold_factor", "beta", "box_size", "total_box_size"],
)
@dataclasses.dataclass(frozen=True)
class FoldedField:
    """A folded, phase-weighted complex field (vector or scalar).

    Produced by the folding technique: the original box of size
    ``total_box_size`` is folded by ``fold_factor`` with phase offsets
    ``beta``; the stored field covers ``box_size = total_box_size / m``.
    Vector fields are CHANNELS-FIRST ``(C, N, N, N)`` (see module note).

    Mirrors ``FoldedBox`` (reference ``vpower/interp.py:740-811``), minus
    the pickle persistence (see :mod:`vpower_tpu.io.checkpoint`).
    """

    field: jax.Array  # (N, N, N) or (C, N, N, N) complex
    fold_factor: int
    beta: tuple  # (bx, by, bz) ints — static, hashable
    box_size: float
    total_box_size: float

    @property
    def n_grid(self) -> int:
        return self.field.shape[-1]

    @property
    def cell_size(self) -> float:
        return self.box_size / self.n_grid
