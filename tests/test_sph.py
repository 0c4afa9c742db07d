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


def test_multires_unclamped_conserves_and_spreads():
    """Large-h particles (support >> s_max cells) deposit through the
    multi-resolution path: exact conservation, and the mass actually
    spreads over ~the kernel support instead of being clamped to the
    (2 s_max + 1)^3 stencil (reference preserved overhanging kernels
    exactly, interp.py:216-243)."""
    from vpower_tpu.deposit.sph import sph_deposit, sph_deposit_multires

    n_grid, box = 32, 1.0
    pos = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
    vals = jnp.array([[2.0]], jnp.float32)
    h = jnp.array([8.5 / n_grid], jnp.float32)  # support ~ 8.5 cells
    g_clamped = sph_deposit(pos, vals, h, n_grid, box, s_max=2)
    g_multi = sph_deposit_multires(pos, vals, h, n_grid, box, s_max=2,
                                   levels=3)
    np.testing.assert_allclose(float(g_clamped.sum()), 2.0, rtol=1e-4)
    np.testing.assert_allclose(float(g_multi.sum()), 2.0, rtol=1e-4)
    # clamped: everything within the 5^3 stencil; multires: spread wide
    occupied = (np.abs(np.asarray(g_multi[0])) > 1e-10).sum()
    assert occupied > 5**3, f"multires occupied only {occupied} cells"
    # multires matches the true normalized kernel much better
    cell = box / n_grid
    axis = (np.arange(n_grid) + 0.5) * cell
    cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
    r = np.sqrt((cx - 0.5) ** 2 + (cy - 0.5) ** 2 + (cz - 0.5) ** 2)
    from vpower_tpu.deposit.sph import kernel_weight
    w = np.asarray(kernel_weight(jnp.asarray(r / float(h[0])), "cubic_spline"))
    truth = 2.0 * w / w.sum()
    err_multi = np.abs(np.asarray(g_multi[0]) - truth).sum()
    err_clamp = np.abs(np.asarray(g_clamped[0]) - truth).sum()
    assert err_multi < 0.5 * err_clamp


def test_multires_field_matches_single_level_for_small_h():
    """When every kernel fits the footprint, multires == single-level."""
    from vpower_tpu.deposit.sph import sph_deposit, sph_deposit_multires

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (500, 3), jnp.float32)
    vals = jnp.ones((500, 2), jnp.float32)
    h = jnp.full((500,), 1.5 / 16, jnp.float32)
    a = sph_deposit(pos, vals, h, 16, 1.0, s_max=2)
    b = sph_deposit_multires(pos, vals, h, 16, 1.0, s_max=2, levels=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-7)


def test_edge_removal_coverage_channel():
    """edge_removal deposits a coverage counter and zeroes uncovered
    cells (reference interp.py:310-323)."""
    from vpower_tpu import synthetic_particles
    from vpower_tpu.deposit.sph import sph_interp_to_field

    # half-filled box: cells far from any particle are uncovered
    p = synthetic_particles(jax.random.PRNGKey(1), 8, jitter=0.2)
    import dataclasses
    half = dataclasses.replace(
        p, pos=p.pos.at[:, 0].multiply(0.45), box_size=1.0
    )
    f_all = sph_interp_to_field(half, 16)
    f_edge = sph_interp_to_field(half, 16, edge_removal=1e-3)
    m_all = np.asarray(f_all.mass)
    m_edge = np.asarray(f_edge.mass)
    assert (m_edge > 0).sum() <= (m_all > 0).sum()
    # covered cells keep their exact mass
    kept = m_edge > 0
    np.testing.assert_allclose(m_edge[kept], m_all[kept], rtol=1e-6)
    # velocity zeroed where mass was removed
    assert np.all(np.asarray(f_edge.velocity)[:, ~kept] == 0)
