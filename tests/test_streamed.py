"""Block-streamed folded spectra of derived fields (velocity/energy) —
the reference's canonical memory-bounded workload
(scripts/parallel_optimized.py:337-398).  Exactness is checked against
the full-resolution grid path (deposit -> fold -> spectrum) and the
unfolded spectrum."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpower_tpu import (
    deposit,
    folded_spectrum,
    power_spectrum,
    relative_diff,
    spectrum_from_field,
    streamed_folded_spectrum,
    streamed_folded_sweep,
    synthetic_particles,
    init_beta_space,
)
from vpower_tpu.deposit.nn import nn_assign, nn_brute_force, nn_interp_to_field


@pytest.fixture(scope="module")
def particles16():
    return synthetic_particles(jax.random.PRNGKey(2), 16, box_size=1.0,
                               jitter=0.3)


@pytest.mark.parametrize("method", ["ngp", "cic"])
@pytest.mark.parametrize("quantity", ["velocity", "energy", "momentum"])
def test_streamed_scatter_matches_grid_fold(particles16, method, quantity):
    """Streamed block path == deposit full-res -> fold -> sub-spectrum,
    for every scatter method and derived quantity."""
    n_total, m = 16, 2
    n_grid = n_total // m
    field = deposit(particles16, n_total, method=method)
    sweep = streamed_folded_sweep(
        particles16, n_grid, m, quantity=quantity, method=method,
        beta_batch=3,  # exercise batching with a remainder batch
    )
    for beta in [(0, 0, 0), (1, 0, 1), (1, 1, 1)]:
        sA = folded_spectrum(field, m=m, beta=beta, quantity=quantity)
        sB = sweep[beta]
        np.testing.assert_allclose(sB.Nsample, sA.Nsample)
        np.testing.assert_allclose(sB.Psum, sA.Psum, rtol=5e-5, atol=1e-30)


def test_streamed_velocity_sweep_reconstructs_unfolded(particles16):
    """Full m^3 streamed VELOCITY sweep == unfolded velocity spectrum —
    VERDICT round-1 'done' criterion for the canonical workload."""
    n_total, m = 16, 2
    s_direct = power_spectrum(particles16, n_total, method="cic",
                              quantity="velocity")
    combined = streamed_folded_spectrum(
        particles16, n_total // m, m, quantity="velocity", method="cic",
    )
    n = min(len(combined), len(s_direct))
    np.testing.assert_allclose(combined.Nsample[:n], s_direct.Nsample[:n])
    np.testing.assert_allclose(combined.Psum[:n], s_direct.Psum[:n],
                               rtol=2e-4, atol=1e-30)


def test_streamed_nn_matches_global_nn_fold():
    """NN block gather (margin-bounded, periodic images) == global NN
    interp -> fold, on a clustered configuration where the margin holds
    every true neighbor."""
    key = jax.random.PRNGKey(7)
    n_total, m = 16, 2
    n_grid = n_total // m
    particles = synthetic_particles(key, 16, box_size=1.0, jitter=0.45)
    field = nn_interp_to_field(particles, n_total, exact=True)
    sweep = streamed_folded_sweep(
        particles, n_grid, m, quantity="velocity", method="nn",
        margin_cells=4, exact=True, beta_batch=8,
    )
    for beta in [(0, 0, 0), (1, 1, 0)]:
        sA = folded_spectrum(field, m=m, beta=beta, quantity="velocity")
        sB = sweep[beta]
        np.testing.assert_allclose(sB.Nsample, sA.Nsample)
        np.testing.assert_allclose(sB.Psum, sA.Psum, rtol=5e-5, atol=1e-30)


def test_streamed_nn_velocity_full_sweep_vs_unfolded():
    """Folded NN velocity (all betas) == unfolded NN velocity spectrum
    on the overlap lattice."""
    key = jax.random.PRNGKey(9)
    n_total, m = 16, 2
    particles = synthetic_particles(key, 16, box_size=1.0, jitter=0.45)
    field = nn_interp_to_field(particles, n_total, exact=True)
    s_direct = spectrum_from_field(field, quantity="velocity")
    combined = streamed_folded_spectrum(
        particles, n_total // m, m, quantity="velocity", method="nn",
        margin_cells=4, exact=True,
    )
    n = min(len(combined), len(s_direct))
    np.testing.assert_allclose(combined.Nsample[:n], s_direct.Nsample[:n])
    np.testing.assert_allclose(combined.Psum[:n], s_direct.Psum[:n],
                               rtol=2e-4, atol=1e-30)


def test_device_candidate_builder_matches_host():
    """The device-side expand+sort (used off-CPU, where
    _block_candidates_device does not delegate) produces the same runs
    as the host builder: equal spans, identical per-block row sets."""
    from vpower_tpu.run.streamed import (
        _block_candidates, _cand_expand_sort, _cand_table,
    )

    p = synthetic_particles(jax.random.PRNGKey(23), 11, box_size=2.0,
                            jitter=0.7)
    for m, ng, mc in ((4, 32, 8), (2, 64, 16)):
        rh, sh, ch, ph, ext, mp = _block_candidates(p, m, ng, mc)
        table, c = _cand_table(p.pos, p.vel, p.density, m, 2.0,
                               2.0 / m, mp)
        total = int(jnp.sum(c))
        r_pad = ((total + 1024) // 1024) * 1024
        rows, s0, c0 = _cand_expand_sort(table, c, m, 2.0 / m, r_pad)
        np.testing.assert_array_equal(np.asarray(s0), sh)
        np.testing.assert_array_equal(np.asarray(c0), ch)
        rdn = np.asarray(rows)
        for q in range(m**3):
            a = rh[sh[q]:sh[q] + ch[q]]
            b = rdn[sh[q]:sh[q] + ch[q]]
            ka = a[np.lexsort(np.round(a, 5).T[::-1])]
            kb = b[np.lexsort(np.round(b, 5).T[::-1])]
            assert np.abs(ka - kb).max() < 1e-5 if len(ka) else True


def test_streamed_exact_window_path_vs_unfolded():
    """exact=True with a window-capable extended grid (n_ext % 64 == 0)
    routes blocks through the provably-exact window sweep; the full
    beta sweep must reconstruct the unfolded spectrum of the global
    exact deposition."""
    key = jax.random.PRNGKey(13)
    n_grid, m = 32, 2
    n_total = n_grid * m
    particles = synthetic_particles(key, 14, box_size=1.0, jitter=0.5)
    # margin 16 -> n_ext = 64: the window route (asserted below)
    from vpower_tpu.run.streamed import round_ext

    n_ext, mc = round_ext(n_grid, 16)
    assert n_ext % 64 == 0
    field = nn_interp_to_field(particles, n_total, exact=True)
    s_direct = spectrum_from_field(field, quantity="velocity")
    combined = streamed_folded_spectrum(
        particles, n_grid, m, quantity="velocity", method="nn",
        margin_cells=16, exact=True,
    )
    n = min(len(combined), len(s_direct))
    np.testing.assert_allclose(combined.Nsample[:n], s_direct.Nsample[:n])
    np.testing.assert_allclose(combined.Psum[:n], s_direct.Psum[:n],
                               rtol=2e-4, atol=1e-30)


def test_block_nn_assignment_matches_brute_force():
    """The per-block extended-frame NN (open-box distances on unwrapped
    periodic images, padding masked) reproduces the global periodic
    brute-force assignment on the block interior."""
    key = jax.random.PRNGKey(3)
    n_total, m = 16, 2
    n_grid = n_total // m
    particles = synthetic_particles(key, 8, box_size=1.0, jitter=0.45)
    truth = np.asarray(
        nn_brute_force(particles.pos, n_total, 1.0, periodic=True)
    )
    from vpower_tpu.run.streamed import _block_candidates

    margin_cells = 4
    rows, starts, counts, pad, ext_box, _ = _block_candidates(
        particles, m, n_grid, margin_cells
    )
    pos_np = np.asarray(particles.pos)
    for q in [0, 3, 7]:
        run = rows[starts[q]: starts[q] + counts[q]]
        cand = np.zeros((pad, 7), np.float32)
        cand[: counts[q]] = run
        valid = jnp.arange(pad) < int(counts[q])
        idx = np.asarray(nn_assign(
            jnp.asarray(cand[:, :3]), n_grid + 2 * margin_cells, ext_box,
            periodic=False, n_seeds=3, refine_radius=2, valid=valid,
        ))
        sl = slice(margin_cells, margin_cells + n_grid)
        idx = idx[sl, sl, sl]
        qx, qy, qz = q // (m * m), (q // m) % m, q % m
        tr = truth[
            qx * n_grid:(qx + 1) * n_grid,
            qy * n_grid:(qy + 1) * n_grid,
            qz * n_grid:(qz + 1) * n_grid,
        ]
        # compare by particle POSITION (indices are block-local)
        got = run[idx.ravel(), :3] if counts[q] else None
        want_global = pos_np[tr.ravel()]
        # block-frame -> global frame (undo origin shift + wrap)
        origin = (np.array([qx, qy, qz]) * (1.0 / m)
                  - margin_cells * (1.0 / n_total))
        got_global = (got + origin.astype(np.float32)) % 1.0
        np.testing.assert_allclose(got_global, want_global % 1.0, atol=1e-5)


def test_streamed_beta_subsample_subset():
    """A beta subsequence computes exactly those sub-spectra."""
    particles = synthetic_particles(jax.random.PRNGKey(4), 12, box_size=1.0,
                                    jitter=0.3)
    betas = np.array([[0, 0, 0], [1, 0, 1]])
    sweep = streamed_folded_sweep(
        particles, 6, 2, quantity="velocity", method="ngp",
        beta_sequence=betas, beta_batch=2,
    )
    assert len(sweep) == 2
    assert {s.beta for s in sweep} == {(0, 0, 0), (1, 0, 1)}


def test_margin_too_large_raises():
    particles = synthetic_particles(jax.random.PRNGKey(5), 8, box_size=1.0)
    from vpower_tpu.run.streamed import _block_candidates

    with pytest.raises(ValueError, match="margin"):
        _block_candidates(particles, 2, 4, margin_cells=5)


def test_streamed_sph_matches_direct_sph():
    """Streamed SPH blocks at m=2 reassemble the direct full-grid SPH
    deposition exactly (same weights, block-partitioned targets)."""
    import jax
    import jax.numpy as jnp
    from vpower_tpu import Particles
    from vpower_tpu.deposit.sph import sph_deposit
    from vpower_tpu.run.streamed import _scatter_block_values

    key = jax.random.PRNGKey(3)
    kp, kv = jax.random.split(key)
    n, n_grid, m = 2000, 8, 2
    n_total = m * n_grid
    p = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    h = p.smoothing_length()
    vals = jnp.concatenate([p.vel * p.mass[:, None], p.mass[:, None]], 1)
    full = np.asarray(sph_deposit(
        p.pos, vals, h, n_total, 1.0, s_max=1, engine="xla"))
    mv_full, mg_full = full[:3], full[3]
    safe = np.where(mg_full > 0, mg_full, 1.0)
    v_full = np.where(mg_full[None] > 0, mv_full / safe[None], 0.0)

    got = np.zeros((3, n_total, n_total, n_total), np.float32)
    for qx in range(m):
        for qy in range(m):
            for qz in range(m):
                blk = _scatter_block_values(
                    p.pos, p.vel, p.mass,
                    jnp.asarray([qx, qy, qz], jnp.int32),
                    n_grid, n_total, 1.0, "sph", "velocity", h=h,
                ).reshape(3, n_grid, n_grid, n_grid)
                got[:, qx*n_grid:(qx+1)*n_grid,
                    qy*n_grid:(qy+1)*n_grid,
                    qz*n_grid:(qz+1)*n_grid] = np.asarray(blk)
    np.testing.assert_allclose(got, v_full, rtol=2e-4, atol=1e-6)


def test_streamed_folded_sweep_sph_runs():
    import jax
    import jax.numpy as jnp
    from vpower_tpu import Particles
    from vpower_tpu.run.streamed import streamed_folded_sweep

    key = jax.random.PRNGKey(4)
    kp, kv = jax.random.split(key)
    n = 1500
    p = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    subs = streamed_folded_sweep(p, 8, 2, quantity="velocity",
                                 method="sph", beta_batch=8)
    assert len(subs) == 8
    comb = subs.combine_all()
    assert np.isfinite(comb.Psum).all() and comb.Nsample.sum() > 0


def test_disk_block_cache_roundtrip(tmp_path):
    """cache_dir spills block values to disk (the reference gen-2 disk
    buffer role): a second sweep with the same directory reuses every
    block (no deposition calls) and reproduces the spectra; a manifest
    mismatch (different workload) is rejected."""
    import pytest

    from vpower_tpu.run import streamed as rs

    p = synthetic_particles(jax.random.PRNGKey(5), 12, box_size=1.0,
                            jitter=0.4)
    d = str(tmp_path / "bcache")
    a = streamed_folded_sweep(p, 8, 2, quantity="velocity", method="cic",
                              beta_batch=4, cache_dir=d)
    import os

    files = [f for f in os.listdir(d) if f.startswith("block_")]
    assert len(files) == 8

    # second run must never call the deposition kernel
    def _boom(*a, **k):
        raise AssertionError("block recomputed despite disk cache")

    orig = rs._scatter_block_values
    rs._scatter_block_values = _boom
    try:
        b = streamed_folded_sweep(p, 8, 2, quantity="velocity",
                                  method="cic", beta_batch=4, cache_dir=d)
    finally:
        rs._scatter_block_values = orig
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(sb.Psum, sa.Psum, rtol=1e-6)
        np.testing.assert_array_equal(sb.Nsample, sa.Nsample)

    with pytest.raises(ValueError, match="manifest"):
        streamed_folded_sweep(p, 8, 2, quantity="energy", method="cic",
                              beta_batch=4, cache_dir=d)


def test_disk_block_cache_writer_failure_raises(tmp_path, monkeypatch):
    """A failing cache write (e.g. disk full) surfaces as an error on
    the main thread instead of hanging the sweep behind a dead writer."""
    from vpower_tpu.run import streamed as rs

    p = synthetic_particles(jax.random.PRNGKey(6), 12, box_size=1.0,
                            jitter=0.4)
    orig_save = np.save

    def _fail_block_save(path, arr, *a, **k):
        if "block_" in str(path):
            raise OSError("No space left on device (simulated)")
        return orig_save(path, arr, *a, **k)

    monkeypatch.setattr(rs.np, "save", _fail_block_save)
    with pytest.raises(RuntimeError, match="block-cache writer failed"):
        streamed_folded_sweep(p, 8, 2, quantity="velocity", method="cic",
                              beta_batch=4,
                              cache_dir=str(tmp_path / "bfail"))


def test_disk_block_cache_f16_lo_path(tmp_path):
    """A cache over the f32 byte budget spills float16 block values (the
    on-device lo copy halves the host pull); the reused spectra agree
    to f16 tolerance."""
    p = synthetic_particles(jax.random.PRNGKey(7), 12, box_size=1.0,
                            jitter=0.4)
    d = str(tmp_path / "bcache16")
    a = streamed_folded_sweep(p, 8, 2, quantity="velocity", method="cic",
                              beta_batch=4, cache_dir=d,
                              cache_bytes_limit=1.0)
    import os

    blocks = [f for f in os.listdir(d) if f.startswith("block_")]
    assert len(blocks) == 8
    arr = np.load(os.path.join(d, blocks[0]))
    assert arr.dtype == np.float16
    b = streamed_folded_sweep(p, 8, 2, quantity="velocity", method="cic",
                              beta_batch=4, cache_dir=d,
                              cache_bytes_limit=1.0)
    for sa, sb in zip(a, b):
        np.testing.assert_array_equal(sb.Nsample, sa.Nsample)
        np.testing.assert_allclose(sb.Psum, sa.Psum, rtol=5e-3, atol=1e-12)
