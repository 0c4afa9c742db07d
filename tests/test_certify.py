"""Margin certificate for the streamed NN pipeline.

A block's candidate set only holds particles within ``margin_cells`` of
the block, so a cell whose true NN lies beyond the margin would silently
get its nearest in-margin particle instead (reference contract:
``interp.py:1027-1034`` is exact at ANY distance).  The certificate
(``certify=True``) proves per cell that the margin did not matter —
assigned distance < margin — and re-runs uncertified blocks at doubled
margins, so the density-aware default margin stays safe on arbitrarily
clustered inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpower_tpu import Particles, streamed_folded_sweep


def _cluster_particles(n, hi, seed=0, box=1.0):
    """n particles uniform in [0, hi)^3 — a box with a void of width
    (box - hi) along every axis."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.0, hi, size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    return Particles(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32), box_size=box,
    )


def test_default_margin_density_aware():
    from vpower_tpu.run.streamed import _default_margin_cells

    # 10M particles at 2048 range: ~3 mean spacings ~ 29 cells — well
    # under the former worst-case n_grid // 4 = 64
    d = _default_margin_cells(256, 2048, 10_000_000)
    assert 24 <= d <= 34
    # near-empty box: clamps at the former worst-case, never above
    assert _default_margin_cells(256, 2048, 10) == 64
    # floor
    assert _default_margin_cells(8, 16, 10**9) == 8


def test_certificate_count_matches_bruteforce():
    """The window path's suspect count equals the brute-force count of
    interior cells whose nearest CANDIDATE reaches the margin (the
    window assignment is the true candidate minimum, so the two counts
    are the same quantity)."""
    from vpower_tpu.run.streamed import (
        _block_candidates, _nn_block_values_exact,
    )

    p = _cluster_particles(40, 0.55, seed=3)
    m, n_grid, margin_cells = 2, 32, 16  # n_ext = 64: window-capable
    rows, starts, counts, pad, _, _ = _block_candidates(
        p, m, n_grid, margin_cells
    )
    n_ext = n_grid + 2 * margin_cells
    cell = 1.0 / (m * n_grid)
    ext_box = n_ext * cell
    q = m**3 - 1  # the [0.5, 1)^3 block — deep-void cells
    cand = np.zeros((pad, 7), np.float32)
    cand[: counts[q]] = rows[starts[q]: starts[q] + counts[q]]
    _, nsus = _nn_block_values_exact(
        jnp.asarray(cand), jnp.int32(counts[q]), n_grid, n_ext,
        margin_cells, float(ext_box), float(cell), "velocity",
        certify=True,
    )

    ax = (np.arange(n_grid) + margin_cells + 0.5) * cell
    cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
    centers = np.stack([cx, cy, cz], -1).reshape(-1, 3)
    cpos = cand[: counts[q], :3].astype(np.float64)
    d2min = np.min(
        ((centers[:, None, :] - cpos[None]) ** 2).sum(-1), axis=1
    )
    margin_phys = margin_cells * cell
    want = int((d2min >= margin_phys**2).sum())
    assert want > 0  # the config must actually exercise the margin
    assert int(nsus) == want


def test_single_block_rows_matches_block_candidates():
    """The escalation path's one-block candidate builder produces the
    same row SET as the pre-sorted full builder at the same margin."""
    from vpower_tpu.run.streamed import _block_candidates, _single_block_rows

    p = _cluster_particles(150, 0.9, seed=7)
    m, n_grid, margin_cells = 2, 16, 6
    rows, starts, counts, pad, _, mp = _block_candidates(
        p, m, n_grid, margin_cells
    )
    for q in (0, 3, 7):
        q3 = np.array([q // (m * m), (q // m) % m, q % m], np.int64)
        got, k = _single_block_rows(p, q3, m, mp)
        got = np.asarray(got)[:k]
        want = rows[starts[q]: starts[q] + counts[q]]
        assert k == counts[q]
        ka = got[np.lexsort(np.round(got, 5).T[::-1])]
        kb = want[np.lexsort(np.round(want, 5).T[::-1])]
        np.testing.assert_allclose(ka, kb, atol=1e-5)


def test_certified_sweep_escalates_void_blocks():
    """End-to-end (fast mode): a clustered box whose void exceeds the
    base margin — void blocks escalate, everything ends certified, and
    the spectra are finite."""
    p = _cluster_particles(200, 0.85, seed=11)
    stages = {}
    sweep = streamed_folded_sweep(
        p, 16, 4, quantity="velocity", method="nn",
        margin_cells=4, certify=True, beta_batch=8,
        beta_sequence=np.array([[0, 0, 0], [1, 2, 3]]),
        stage_times=stages,
    )
    assert stages["escalated_blocks"] > 0
    assert stages["suspect_cells"] > 0
    assert stages["uncertified_cells"] == 0
    comb = sweep.combine_all()
    assert np.isfinite(comb.Psum).all() and comb.Nsample.sum() > 0


def test_certificate_warns_on_unrepresentable_void(monkeypatch):
    """A void wider than the largest representable margin normally gets
    the wrap-exact backstop; with the backstop's work budget forced to
    zero the sweep must warn and report the residual cells."""
    from vpower_tpu.run import streamed as run_streamed

    monkeypatch.setattr(run_streamed, "_WRAP_BRUTE_BUDGET", 0.0)
    p = _cluster_particles(60, 0.3, seed=5)
    stages = {}
    with pytest.warns(UserWarning, match="uncertified"):
        streamed_folded_sweep(
            p, 16, 2, quantity="velocity", method="nn",
            margin_cells=4, certify=True, beta_batch=4,
            beta_sequence=np.array([[0, 0, 0]]), stage_times=stages,
        )
    assert stages["uncertified_cells"] > 0


def test_wrap_exact_backstop_matches_bruteforce():
    """Past the representability cap the backstop assigns the TRUE
    periodic NN: escalate every block of a void-heavy box and compare
    the assembled field against a direct host brute force in the wrap
    metric (bit-equal values; certified cells are exact already, capped
    cells are fixed by the backstop)."""
    from vpower_tpu.run.streamed import _escalate_block

    p = _cluster_particles(60, 0.3, seed=5)
    n_grid, m = 16, 2
    n_total = m * n_grid
    cell_total = 1.0 / n_total
    margin_max = (n_total - n_grid) // 2

    pos = np.asarray(p.pos, np.float64)
    vel = np.asarray(p.vel, np.float64)
    axc = (np.arange(n_grid) + 0.5) * cell_total
    n_fixed = 0
    for q in range(m**3):
        vals, left = _escalate_block(
            p, q, m, n_grid, 4, margin_max, cell_total,
            "velocity", False,
        )
        assert left == 0
        q3 = np.array([q // (m * m), (q // m) % m, q % m])
        cx, cy, cz = np.meshgrid(
            *(axc + q3[a] * n_grid * cell_total for a in range(3)),
            indexing="ij",
        )
        centers = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
        d = np.abs(centers[:, None, :] - pos[None, :, :])
        d = np.minimum(d, 1.0 - d)
        nn = np.argmin((d * d).sum(-1), axis=1)
        ref = vel[nn].T.astype(np.float32)
        got = np.asarray(vals)
        np.testing.assert_array_equal(got, ref)
        n_fixed += 1
    assert n_fixed == m**3


def test_certificate_quiet_on_dense_box():
    """Dense near-uniform particles: the density-aware default margin
    certifies every block with zero escalations."""
    from vpower_tpu import synthetic_particles

    p = synthetic_particles(jax.random.PRNGKey(2), 16, box_size=1.0,
                            jitter=0.3)
    stages = {}
    sweep = streamed_folded_sweep(
        p, 8, 2, quantity="velocity", method="nn",
        beta_batch=8, stage_times=stages,
    )
    assert stages["escalated_blocks"] == 0
    assert stages["suspect_cells"] == 0
    assert len(sweep) == 8


def test_native_single_block_rows_parity(monkeypatch):
    """The threaded native escalation selector returns the same rows as
    the numpy fallback (same count, same set, ascending particle
    order)."""
    from vpower_tpu.io import native as native_mod
    from vpower_tpu.run import streamed as rs

    if not native_mod.native_available():
        pytest.skip("native host runtime unavailable")

    p = _cluster_particles(5000, 0.9, seed=13)
    for q in (0, 5, 7):
        q3 = np.array([q // 4, (q // 2) % 2, q % 2], np.int64)
        a, ka = rs._single_block_rows(p, q3, 2, 0.11)
        monkeypatch.setattr(native_mod, "native_available", lambda: False)
        b, kb = rs._single_block_rows(p, q3, 2, 0.11)
        monkeypatch.undo()
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a)[:ka], np.asarray(b)[:kb],
                                   atol=1e-6)
