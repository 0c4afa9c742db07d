"""SPH (Voxelize-equivalent) deposition tests: conservation, kernel
locality, reference semantics (SURVEY.md build step 5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu import Particles, check_conservation, deposit
from vpower_tpu.deposit.sph import kernel_weight, sph_deposit


def random_particles(key, n, box=1.0):
    kp, kv, km, kd = jax.random.split(key, 4)
    return Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32) * box,
        mass=jax.random.uniform(km, (n,), jnp.float32) + 0.5,
        density=jax.random.uniform(kd, (n,), jnp.float32) + 0.5,
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=box,
    )


def test_kernel_shapes():
    q = jnp.linspace(0, 1.2, 25)
    w = np.asarray(kernel_weight(q, "cubic_spline"))
    assert w[0] == 1.0
    assert (np.diff(w) <= 1e-7).all()  # monotone decreasing
    assert (w[q >= 1.0] == 0).all()
    s = np.asarray(kernel_weight(q, "sphere"))
    assert set(s) <= {0.0, 1.0}


@pytest.mark.parametrize("kernel", ["cubic_spline", "sphere"])
def test_mass_conservation_exact(kernel):
    """Per-particle normalized weights -> column sums conserved exactly
    (the property Voxelize provided via exact overlap volumes)."""
    key = jax.random.PRNGKey(0)
    p = random_particles(key, 500)
    values = jnp.stack([p.mass, p.mass * p.vel[:, 0]], axis=1)
    h = p.smoothing_length()
    grid = sph_deposit(p.pos, values, h, 16, 1.0, kernel=kernel)
    np.testing.assert_allclose(
        np.asarray(grid[0]).sum(), float(p.mass.sum()), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grid[1]).sum(), float((p.mass * p.vel[:, 0]).sum()),
        rtol=1e-4,
    )


def test_tiny_h_falls_back_to_ngp():
    """h << cell: all mass lands in the particle's own cell."""
    pos = jnp.array([[0.31, 0.44, 0.62]], jnp.float32)
    values = jnp.array([[2.0]], jnp.float32)
    h = jnp.array([1e-9], jnp.float32)
    grid = np.asarray(sph_deposit(pos, values, h, 8, 1.0)[0])
    assert grid.sum() == pytest.approx(2.0, rel=1e-6)
    assert grid[2, 3, 4] == pytest.approx(2.0, rel=1e-6)


def test_kernel_locality():
    """A particle with h ~ one cell spreads only within its 3^3
    neighborhood (cubic spline support = h)."""
    n = 8
    cell = 1.0 / n
    pos = jnp.array([[0.5 + cell / 2, 0.5 + cell / 2, 0.5 + cell / 2]],
                    jnp.float32)
    values = jnp.array([[1.0]], jnp.float32)
    h = jnp.array([cell], jnp.float32)
    grid = np.asarray(sph_deposit(pos, values, h, n, 1.0)[0])
    own = (4, 4, 4)
    mask = np.zeros_like(grid, bool)
    mask[3:6, 3:6, 3:6] = True
    assert grid[own] > 0
    assert grid[~mask].sum() == 0


def test_sph_field_conservation_and_dispatch():
    key = jax.random.PRNGKey(1)
    p = random_particles(key, 2000)
    field = deposit(p, 16, method="sph")
    rep = check_conservation(p, field)
    assert abs(rep.mass - 1.0) < 1e-5
    for c in rep.momentum:
        assert abs(c - 1.0) < 1e-3
    assert 0.1 < rep.kinetic_energy <= 1.0 + 1e-6


def test_periodic_wrap_spreads_across_boundary():
    n = 8
    pos = jnp.array([[0.01, 0.5, 0.5]], jnp.float32)  # near x=0 face
    values = jnp.array([[1.0]], jnp.float32)
    h = jnp.array([2.0 / n], jnp.float32)
    grid = np.asarray(sph_deposit(pos, values, h, n, 1.0, periodic=True)[0])
    assert grid[-1].sum() > 0  # wrapped contribution at x = n-1
    np.testing.assert_allclose(grid.sum(), 1.0, rtol=1e-5)
