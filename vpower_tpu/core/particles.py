"""Particle container: a JAX pytree of SoA arrays.

TPU-native equivalent of the reference's ``GasParticles``
(``vpower/interp.py:135-451``).  Differences by design:

* Immutable pytree (functional transforms): methods return new objects
  instead of mutating in place.
* Geometry metadata (``box_size``) is static so it can be closed over by
  ``jax.jit`` without retracing on value changes of the arrays.
* All derived quantities (smoothing length, momentum-density vector,
  conserved totals) are jittable pure functions.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["Particles"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pos", "mass", "density", "vel"],
    meta_fields=["box_size"],
)
@dataclasses.dataclass(frozen=True)
class Particles:
    """SoA particle set.

    Attributes
    ----------
    pos : (N, 3) float array — particle coordinates.
    mass : (N,) float array — particle masses.
    density : (N,) float array — SPH densities.
    vel : (N, 3) float array — particle velocities.
    box_size : float — side length of the (cubic) simulation box. Static.

    Mirrors ``GasParticles.__init__`` (reference ``vpower/interp.py:137-147``).
    """

    pos: jax.Array
    mass: jax.Array
    density: jax.Array
    vel: jax.Array
    box_size: float

    # ------------------------------------------------------------------ #
    # basic container protocol                                           #
    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        return self.pos.shape[0]

    def __getitem__(self, index) -> "Particles":
        """Sub-population selection (reference ``interp.py:153-160``)."""
        return Particles(
            pos=self.pos[index],
            mass=self.mass[index],
            density=self.density[index],
            vel=self.vel[index],
            box_size=self.box_size,
        )

    @property
    def dtype(self):
        return self.pos.dtype

    # ------------------------------------------------------------------ #
    # transforms (functional versions of reference's in-place mutators)  #
    # ------------------------------------------------------------------ #
    def shift_to_origin(self) -> "Particles":
        """Shift coordinates so the minimum corner is (0, 0, 0).

        Reference: ``GasParticles.shift_to_origin`` (``interp.py:169-175``).
        """
        return dataclasses.replace(
            self, pos=self.pos - jnp.min(self.pos, axis=0, keepdims=True)
        )

    def remove_bulk_velocity(self) -> "Particles":
        """Subtract the mass-weighted mean (center-of-mass) velocity.

        Reference: ``GasParticles.remove_bulk_velocity`` (``interp.py:178-182``).
        """
        total_mass = jnp.sum(self.mass)
        bulk = jnp.sum(self.mass[:, None] * self.vel, axis=0) / total_mass
        return dataclasses.replace(self, vel=self.vel - bulk[None, :])

    # ------------------------------------------------------------------ #
    # derived quantities                                                 #
    # ------------------------------------------------------------------ #
    def rho(self, smoothing_rate: float = 1.0) -> jax.Array:
        """Density rescaled for a larger smoothing volume at fixed mass
        (reference ``interp.py:185-187``)."""
        return self.density / smoothing_rate**3

    def smoothing_length(self, smoothing_rate: float = 1.0) -> jax.Array:
        """SPH smoothing length h = (3 V / 4 pi)^(1/3), V = m / rho.

        Reference: ``GasParticles.h`` (``interp.py:190-196``).
        """
        rho = self.density / smoothing_rate**3
        volume = self.mass / rho
        return (3.0 * volume / (4.0 * jnp.pi)) ** (1.0 / 3.0)

    def density_velocity_vector(self) -> jax.Array:
        """(N, 4) array ``[rho*vx, rho*vy, rho*vz, rho]`` — the quantity all
        deposition schemes interpolate onto the grid.

        Reference: ``GasParticles.density_velocity_vector`` (``interp.py:199-213``).
        """
        return jnp.concatenate(
            [self.vel * self.density[:, None], self.density[:, None]], axis=1
        )

    # ------------------------------------------------------------------ #
    # conserved totals (used by conservation tests)                       #
    # ------------------------------------------------------------------ #
    def total_mass(self) -> jax.Array:
        """Reference ``interp.py:424-427``."""
        return jnp.sum(self.mass)

    def total_momentum(self) -> jax.Array:
        """(3,) total momentum. Reference ``interp.py:430-436``."""
        return jnp.sum(self.mass[:, None] * self.vel, axis=0)

    def total_kinetic_energy(self) -> jax.Array:
        """Reference ``interp.py:439-444``."""
        return 0.5 * jnp.sum(self.mass * jnp.sum(self.vel**2, axis=1))

    def specific_kinetic_energy(self) -> jax.Array:
        """Reference ``interp.py:447-450``."""
        return self.total_kinetic_energy() / self.total_mass()

    # ------------------------------------------------------------------ #
    # utilities                                                          #
    # ------------------------------------------------------------------ #
    def astype(self, dtype) -> "Particles":
        return Particles(
            pos=self.pos.astype(dtype),
            mass=self.mass.astype(dtype),
            density=self.density.astype(dtype),
            vel=self.vel.astype(dtype),
            box_size=self.box_size,
        )
