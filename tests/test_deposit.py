"""Deposition kernel tests: NGP/CIC vs brute-force references and
conservation invariants (SURVEY.md §4a/§4d)."""
import numpy as np
import jax
import jax.numpy as jnp

from vpower_tpu import Particles, check_conservation, synthetic_particles
from vpower_tpu.deposit.scatter import cell_index, deposit_cic, deposit_ngp
from vpower_tpu.run.pipeline import deposit


def random_particles(key, n, box=1.0, dtype=jnp.float64):
    kp, kv, km, kd = jax.random.split(key, 4)
    pos = jax.random.uniform(kp, (n, 3), dtype) * box
    vel = jax.random.normal(kv, (n, 3), dtype)
    mass = jax.random.uniform(km, (n,), dtype) + 0.5
    density = jax.random.uniform(kd, (n,), dtype) + 0.5
    return Particles(pos=pos, mass=mass, density=density, vel=vel, box_size=box)


def test_ngp_matches_np_add_at():
    """deposit_ngp == reference deposit_to_grid semantics
    (interp.py:996-1015, np.add.at with periodic wrap)."""
    key = jax.random.PRNGKey(0)
    n_p, n_grid, box = 1000, 8, 2.0
    p = random_particles(key, n_p, box)
    f = np.asarray(p.mass)
    grid = np.asarray(deposit_ngp(p.pos, p.mass, n_grid, box))

    ref = np.zeros((n_grid, n_grid, n_grid))
    cell = box / n_grid
    idx = (np.asarray(p.pos) // cell).astype(int) % n_grid
    np.add.at(ref, (idx[:, 0], idx[:, 1], idx[:, 2]), f)
    np.testing.assert_allclose(grid, ref, rtol=1e-12)


def test_ngp_vector_values():
    key = jax.random.PRNGKey(1)
    n_p, n_grid, box = 500, 4, 1.0
    p = random_particles(key, n_p, box)
    vals = np.asarray(p.vel)
    grid = np.asarray(deposit_ngp(p.pos, p.vel, n_grid, box))
    ref = np.zeros((n_grid, n_grid, n_grid, 3))
    cell = box / n_grid
    idx = (np.asarray(p.pos) // cell).astype(int) % n_grid
    np.add.at(ref, (idx[:, 0], idx[:, 1], idx[:, 2]), vals)
    # grid is channels-first
    np.testing.assert_allclose(grid, np.moveaxis(ref, -1, 0),
                               rtol=1e-12, atol=1e-12)


def test_cic_conserves_and_matches_bruteforce():
    key = jax.random.PRNGKey(2)
    n_p, n_grid, box = 300, 8, 1.0
    p = random_particles(key, n_p, box)
    grid = np.asarray(deposit_cic(p.pos, p.mass, n_grid, box))
    # total conservation
    np.testing.assert_allclose(grid.sum(), float(p.mass.sum()), rtol=1e-12)
    # brute-force trilinear reference
    ref = np.zeros((n_grid, n_grid, n_grid))
    cell = box / n_grid
    u = np.asarray(p.pos) / cell - 0.5
    base = np.floor(u).astype(int)
    frac = u - base
    w = np.asarray(p.mass)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wx = frac[:, 0] if dx else 1 - frac[:, 0]
                wy = frac[:, 1] if dy else 1 - frac[:, 1]
                wz = frac[:, 2] if dz else 1 - frac[:, 2]
                np.add.at(
                    ref,
                    (
                        (base[:, 0] + dx) % n_grid,
                        (base[:, 1] + dy) % n_grid,
                        (base[:, 2] + dz) % n_grid,
                    ),
                    w * wx * wy * wz,
                )
    np.testing.assert_allclose(grid, ref, rtol=1e-10, atol=1e-12)


def test_scatter_deposit_conservation_exact():
    """Scatter deposition conserves mass/momentum exactly; KE is smoothed
    (conservation contract, reference interp.py:1269-1319)."""
    key = jax.random.PRNGKey(3)
    p = random_particles(key, 2000, box=1.0)
    for method in ("ngp", "cic"):
        field = deposit(p, 16, method=method)
        rep = check_conservation(p, field)
        assert abs(rep.mass - 1.0) < 1e-12
        for c in rep.momentum:
            assert abs(c - 1.0) < 1e-9
        # NGP preserves per-cell <v> mixing so KE <= particle KE
        assert 0.1 < rep.kinetic_energy <= 1.0 + 1e-12


def test_one_particle_per_cell_roundtrip():
    """With exactly one particle per cell center, NGP deposition restores
    the generating field exactly — the delta-function analytic case."""
    key = jax.random.PRNGKey(4)
    n_grid = 8
    p = synthetic_particles(key, n_grid, box_size=1.0, dtype=jnp.float64)
    field = deposit(p, n_grid, method="ngp")
    vel = np.moveaxis(
        np.asarray(p.vel).reshape(n_grid, n_grid, n_grid, 3), -1, 0
    )
    np.testing.assert_allclose(np.asarray(field.velocity), vel, rtol=1e-12)
    rep = check_conservation(p, field)
    assert abs(rep.kinetic_energy - 1.0) < 1e-12


def test_cell_index_periodic_wrap():
    pos = jnp.array([[0.999999, 0.0, 0.5], [1.0, 1.0, 1.0], [-0.01, 0.0, 0.0]])
    ids = np.asarray(cell_index(pos, 4, 1.0))
    # 1.0 wraps to cell 0; -0.01 wraps to cell 3
    assert ids[1] == 0
    assert ids[2] == 3 * 16
