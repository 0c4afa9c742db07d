"""Nearest-neighbor (Voronoi) deposition tests: JFA vs brute force,
reference-semantics field construction (SURVEY.md §4b: "NN deposition vs
brute-force O(N*M) reference on small N")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu import Particles, deposit
from vpower_tpu.deposit.nn import nn_assign, nn_brute_force, nn_interp_to_field


def _mismatch_rate(pos, n_grid, box, periodic, **kw):
    got = np.asarray(
        nn_assign(pos, n_grid, box, periodic=periodic, **kw)
    )
    ref = np.asarray(nn_brute_force(pos, n_grid, box, periodic=periodic))
    # compare by DISTANCE, not index: exact ties are legitimate either way
    cell = box / n_grid
    axis = (np.arange(n_grid) + 0.5) * cell
    cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
    centers = np.stack([cx, cy, cz], axis=-1)
    p = np.asarray(pos)

    def d2(idx):
        d = centers - p[idx]
        if periodic:
            d = d - box * np.round(d / box)
        return np.sum(d * d, axis=-1)

    return float(np.mean(d2(got) > d2(ref) * (1 + 1e-5) + 1e-12))


EXACT = dict(n_seeds=2, refine_radius=2)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("n_pts", [64, 512, 4096, 20000])
def test_exact_mode_matches_bruteforce(periodic, n_pts):
    """Exact mode (2-rank seeds + radius-2 refine): zero misassignments
    across sparse-to-dense occupancies — the exact-ANN parity contract
    (interp.py:1027-1034, eps=0)."""
    key = jax.random.PRNGKey(n_pts)
    pos = jax.random.uniform(key, (n_pts, 3), jnp.float32)
    rate = _mismatch_rate(pos, 16, 1.0, periodic, **EXACT)
    assert rate == 0.0, f"exact-mode mismatch rate {rate}"


@pytest.mark.parametrize("periodic", [True, False])
def test_fast_mode_error_is_bounded(periodic):
    """Fast mode (1 seed, radius-1 refine): sub-1% misassignment, each
    error bounded by ~a cell diagonal."""
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (512, 3), jnp.float32)
    rate = _mismatch_rate(pos, 16, 1.0, periodic)
    assert rate < 1e-2, f"fast-mode mismatch rate {rate}"


def test_single_particle_owns_everything():
    pos = jnp.array([[0.3, 0.7, 0.1]], jnp.float32)
    idx = np.asarray(nn_assign(pos, 8, 1.0))
    assert (idx == 0).all()


def test_two_particles_halfspace():
    """Two particles on the x axis split the box at the bisector plane
    (open box)."""
    pos = jnp.array([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5]], jnp.float32)
    idx = np.asarray(nn_assign(pos, 16, 1.0, periodic=False))
    # cells with center x < 0.5 -> particle 0, > 0.5 -> particle 1
    centers = (np.arange(16) + 0.5) / 16
    expect = (centers > 0.5).astype(np.int32)
    np.testing.assert_array_equal(idx, np.broadcast_to(expect[:, None, None],
                                                       (16, 16, 16)))


def test_nn_field_reference_semantics():
    """v = (rho v)/rho of the nearest particle; mass = rho * Lcell^3
    (interp.py:272-273)."""
    key = jax.random.PRNGKey(2)
    kp, kv, km, kd = jax.random.split(key, 4)
    n = 100
    particles = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jax.random.uniform(km, (n,), jnp.float32) + 0.5,
        density=jax.random.uniform(kd, (n,), jnp.float32) + 0.5,
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    n_grid = 8
    field = nn_interp_to_field(particles, n_grid, periodic=False)
    idx = np.asarray(nn_brute_force(particles.pos, n_grid, 1.0, periodic=False))
    vel = np.moveaxis(np.asarray(particles.vel)[idx], -1, 0)
    rho = np.asarray(particles.density)[idx]
    np.testing.assert_allclose(np.asarray(field.velocity), vel, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(field.mass), rho * (1.0 / n_grid) ** 3, rtol=1e-6
    )


def test_nn_one_particle_per_cell_is_identity():
    """Exactly one particle at each cell center: NN returns that particle
    per cell — the deterministic golden case."""
    from vpower_tpu.io.synthetic import synthetic_particles

    p = synthetic_particles(jax.random.PRNGKey(3), 8, jitter=0.3)
    idx = np.asarray(nn_assign(p.pos, 8, 1.0))
    expect = np.arange(8**3, dtype=np.int32).reshape(8, 8, 8)
    np.testing.assert_array_equal(idx, expect)


def test_deposit_dispatch_nn():
    from vpower_tpu.io.synthetic import synthetic_particles

    p = synthetic_particles(jax.random.PRNGKey(4), 8, jitter=0.2)
    field = deposit(p, 8, method="nn")
    assert field.velocity.shape == (3, 8, 8, 8)
    # one particle per cell at jitter<0.5 -> exact velocity restoration
    vel = np.moveaxis(np.asarray(p.vel).reshape(8, 8, 8, 3), -1, 0)
    np.testing.assert_allclose(np.asarray(field.velocity), vel, rtol=1e-5)
