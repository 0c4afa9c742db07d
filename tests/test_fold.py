"""Folding technique tests: phase/fold kernels, folded-vs-unfolded overlap
agreement, fused deposition parity (SURVEY.md §4b golden tests)."""
import numpy as np
import jax
import jax.numpy as jnp

from vpower_tpu import (
    BoxField,
    folded_spectrum,
    folded_spectrum_sweep,
    fused_fold_spectrum,
    init_beta_space,
    relative_diff,
    spectrum_from_field,
    synthetic_particles,
)
from vpower_tpu.run.pipeline import deposit
from vpower_tpu.spectrum import fold as fold_mod

import pytest

pytestmark = pytest.mark.fast


def np_get_phase(beta, total_n, n_local, offset=(0, 0, 0)):
    """Mirror of reference _get_phase (interp.py:1215-1224)."""
    x = np.arange(offset[0], offset[0] + n_local)
    y = np.arange(offset[1], offset[1] + n_local)
    z = np.arange(offset[2], offset[2] + n_local)
    xxx, yyy, zzz = np.meshgrid(x, y, z, indexing="ij")
    return np.exp(
        -1j * (2 * np.pi / total_n) * (beta[0] * xxx + beta[1] * yyy + beta[2] * zzz)
    )


def test_get_phase_matches_reference():
    phase = np.asarray(
        fold_mod.get_phase((1, 2, 3), total_n=16, n_local=8, offset=(4, 0, 8),
                           dtype=jnp.complex128)
    )
    ref = np_get_phase((1, 2, 3), 16, 8, (4, 0, 8))
    np.testing.assert_allclose(phase, ref, atol=1e-12)


def test_fold_field_matches_block_loop():
    """fold_field reshape-reduction == reference's m^3 block loop
    (interp.py:1227-1252) — channels-first."""
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (3, 12, 12, 12), jnp.float64)
    m = 3
    ours = np.asarray(fold_mod.fold_field(f, m))
    fn = np.asarray(f)
    nb = 12 // m
    ref = np.zeros((3, nb, nb, nb))
    for i in range(m):
        for j in range(m):
            for k in range(m):
                ref += fn[:, i*nb:(i+1)*nb, j*nb:(j+1)*nb, k*nb:(k+1)*nb]
    np.testing.assert_allclose(ours, ref, rtol=1e-13)


def _toy_field(key, n_grid, box=1.0, dtype=jnp.float64):
    kv, km = jax.random.split(key)
    v = jax.random.normal(kv, (3, n_grid, n_grid, n_grid), dtype)
    mass = jax.random.uniform(km, (n_grid, n_grid, n_grid), dtype) + 0.5
    return BoxField(velocity=v, mass=mass, cell_size=box / n_grid)


def test_fold_m1_identity():
    """m=1, beta=0 reproduces the unfolded spectrum on the same lattice."""
    field = _toy_field(jax.random.PRNGKey(1), 16)
    s_direct = spectrum_from_field(field)
    s_fold = folded_spectrum(field, m=1, beta=(0, 0, 0))
    np.testing.assert_allclose(s_fold.k, s_direct.k, rtol=1e-12)
    np.testing.assert_allclose(s_fold.Psum, s_direct.Psum, rtol=1e-8)
    np.testing.assert_allclose(s_fold.Nsample, s_direct.Nsample)


def test_full_beta_sweep_reconstructs_unfolded_spectrum():
    """Combining ALL m^3 sub-spectra reproduces the unfolded spectrum's
    binned Psum/Nsample exactly over the shared k range — the folding
    identity (interp.py:939-944; validated via relative_diff semantics,
    spctrm.py:321-346)."""
    field = _toy_field(jax.random.PRNGKey(2), 16)
    m = 2
    s_direct = spectrum_from_field(field)  # bins: kmin=2pi/L .. pi/Lcell
    subs = folded_spectrum_sweep(field, m=m)
    combined = subs.combine_all()
    # The folded sub-spectra live on the same global lattice but only the
    # folded FFT's modes: combined covers every mode of the original FFT.
    n = min(len(combined), len(s_direct))
    np.testing.assert_allclose(
        combined.Nsample[:n], s_direct.Nsample[:n], atol=0
    )
    np.testing.assert_allclose(combined.Psum[:n], s_direct.Psum[:n], rtol=1e-8)
    assert relative_diff(combined, s_direct, mode="max") < 1e-7


def test_fused_fold_matches_grid_fold():
    """Fold+phase fused into NGP deposition == deposit-then-fold
    (the TODO at parallel_optimized.py:377-378, done)."""
    key = jax.random.PRNGKey(3)
    n_total, m = 16, 2
    n_grid = n_total // m
    particles = synthetic_particles(key, n_total, box_size=1.0,
                                    dtype=jnp.float64)
    beta = (1, 0, 1)
    # Path A: full-resolution momentum field, then grid fold.
    field = deposit(particles, n_total, method="ngp")
    sA = folded_spectrum(field, m=m, beta=beta, quantity="momentum")
    # Path B: fused fold deposition on the (n_total/m) grid.
    sB = fused_fold_spectrum(particles, n_grid, m=m, beta=beta)
    np.testing.assert_allclose(sB.k, sA.k, rtol=1e-12)
    np.testing.assert_allclose(sB.Nsample, sA.Nsample)
    np.testing.assert_allclose(sB.Psum, sA.Psum, rtol=1e-6)


def test_fold_particles():
    pos = jnp.array([[0.9, 0.1, 0.6], [0.3, 0.45, 0.2]])
    folded = np.asarray(fold_mod.fold_particles(pos, 2, 1.0))
    np.testing.assert_allclose(folded, [[0.4, 0.1, 0.1], [0.3, 0.45, 0.2]],
                               atol=1e-12)


def test_init_beta_space():
    b = init_beta_space(2)
    assert b.shape == (8, 3)
    assert set(map(tuple, b)) == {(i, j, k) for i in range(2)
                                  for j in range(2) for k in range(2)}


def test_fused_fold_full_spectrum_matches_sweep_combine():
    """Hoisted-sort beta-scan == per-beta fused folds combined."""
    from vpower_tpu import fused_fold_full_spectrum
    from vpower_tpu.spectrum.spectrum import SpectrumList

    key = jax.random.PRNGKey(5)
    n_total, m = 16, 2
    n_grid = n_total // m
    particles = synthetic_particles(key, n_total, box_size=1.0,
                                    dtype=jnp.float32)
    full = fused_fold_full_spectrum(particles, n_grid, m=m)
    subs = SpectrumList([
        fused_fold_spectrum(particles, n_grid, m=m, beta=tuple(b))
        for b in init_beta_space(m)
    ])
    combined = subs.combine_all()
    np.testing.assert_allclose(full.Nsample, combined.Nsample)
    np.testing.assert_allclose(full.Psum, combined.Psum, rtol=3e-5)


def test_fused_fold_cic_matches_grid_fold():
    """Folded CIC: each corner phased by its own full-res cell ==
    deposit CIC at full res -> phase -> fold (fixes the round-1 silent
    NGP downgrade of folded CIC runs)."""
    key = jax.random.PRNGKey(11)
    n_total, m = 16, 2
    n_grid = n_total // m
    particles = synthetic_particles(key, n_total, box_size=1.0,
                                    dtype=jnp.float64)
    for beta in [(0, 0, 0), (1, 0, 1), (0, 1, 1)]:
        field = deposit(particles, n_total, method="cic")
        sA = folded_spectrum(field, m=m, beta=beta, quantity="momentum")
        sB = fused_fold_spectrum(particles, n_grid, m=m, beta=beta,
                                 method="cic")
        np.testing.assert_allclose(sB.Nsample, sA.Nsample)
        np.testing.assert_allclose(sB.Psum, sA.Psum, rtol=1e-6)


def test_fused_fold_cic_sweep_reconstructs_unfolded():
    """Full m^3 CIC beta sweep == unfolded CIC momentum spectrum."""
    from vpower_tpu import fused_fold_full_spectrum, power_spectrum
    from vpower_tpu.spectrum.spectrum import relative_diff

    key = jax.random.PRNGKey(12)
    n_total, m = 16, 2
    particles = synthetic_particles(key, n_total, box_size=1.0,
                                    dtype=jnp.float32)
    s_direct = power_spectrum(particles, n_total, method="cic",
                              quantity="momentum")
    combined = fused_fold_full_spectrum(particles, n_total // m, m=m,
                                        method="cic")
    n = min(len(combined), len(s_direct))
    np.testing.assert_allclose(combined.Nsample[:n], s_direct.Nsample[:n])
    np.testing.assert_allclose(combined.Psum[:n], s_direct.Psum[:n],
                               rtol=2e-4, atol=1e-12)


@pytest.mark.fast
def test_beta_half_space_reconstructs_full_sweep():
    """P(-K) = P(K) for a real field, so conjugate-pair betas bin
    IDENTICAL folded sub-spectra and the half-space representatives
    with multiplicity weights reproduce the full m^3 sweep exactly —
    the algebraic 2x that lets the full 2048-range sweep compute
    (m^3 + 8) / 2 betas instead of the reference's complete loop
    (``scripts/parallel_optimized.py:323, 470-487``)."""
    from vpower_tpu import beta_half_space, streamed_folded_sweep

    m = 3
    betas_h, w = beta_half_space(m)
    assert len(betas_h) == (m**3 + 1) // 2 and int(w.sum()) == m**3

    key = jax.random.PRNGKey(21)
    particles = synthetic_particles(key, 12, box_size=1.0, jitter=0.4)
    full = streamed_folded_sweep(particles, 4, m, quantity="velocity",
                                 method="cic", beta_batch=9)
    # conjugate pairs bin identical spectra
    sA, sB = full[(1, 2, 0)], full[(2, 1, 0)]
    np.testing.assert_array_equal(sA.Nsample, sB.Nsample)
    np.testing.assert_allclose(sA.Psum, sB.Psum, rtol=2e-5, atol=1e-30)
    # weighted half-space combine == full combine
    half = streamed_folded_sweep(particles, 4, m, quantity="velocity",
                                 method="cic", beta_sequence=betas_h,
                                 beta_batch=9)
    a = full.combine_all()
    b = half.combine_weighted(w)
    np.testing.assert_allclose(b.Nsample, a.Nsample, rtol=1e-12)
    np.testing.assert_allclose(b.Psum, a.Psum, rtol=2e-5, atol=1e-30)


# ---------------------------------------------------------------------- #
# overlap-band residual (VERDICT r4 item 4): what PowerSpectrum.append   #
# splices, and why the recorded folded-vs-unfolded overlap differs       #
# ---------------------------------------------------------------------- #
def test_overlap_residual_is_resolution_class_not_fold():
    """The recorded interlaced-folded overlap diff (max 0.487,
    ``benchmarks/interlaced_folded_1024.json``) compares spectra from
    deposits at DIFFERENT resolutions.  This pins that residual on the
    coarse deposit, not the fold: at equal total resolution the fused
    interlaced fold is exact, and the coarse pass's residual against
    the full-resolution spectrum is bit-for-bit the same whether the
    high-resolution side came from folding or from a direct deposit —
    i.e. the fold contributes nothing to the overlap diff; the
    coarse run's deposition-window aliasing (resolution class) is all
    of it.  (Reference check this generalizes: ``relative_diff``,
    ``vpower/spctrm.py:321-346``.)"""
    from vpower_tpu import power_spectrum
    from vpower_tpu.run.pipeline import fused_fold_full_spectrum
    from vpower_tpu.spectrum.spectrum import PowerSpectrum

    p = synthetic_particles(jax.random.PRNGKey(7), 24, jitter=0.5)

    def dens(s, n_ax):
        # momentum is per-cell (extensive): normalize to momentum
        # DENSITY (P scales by V_cell^2) before comparing resolutions
        v2 = (1.0 / n_ax) ** 6
        return PowerSpectrum(s.k, s.P / v2, s.Psum / v2, s.Nsample)

    kw = dict(method="cic", interlace=True, compensate=True)
    full = dens(power_spectrum(p, 32, quantity="momentum", **kw), 32)
    coarse = dens(power_spectrum(p, 16, quantity="momentum", **kw), 16)
    folded = dens(fused_fold_full_spectrum(p, 16, m=2, **kw), 32)

    lo, hi = 2, len(coarse) // 2 + 2

    def band(s):
        return PowerSpectrum(s.k[lo:hi], s.P[lo:hi], s.Psum[lo:hi],
                             s.Nsample[lo:hi])

    # the fold itself is exact at equal total resolution
    assert relative_diff(band(folded), band(full), "max") < 1e-5
    # the coarse pass's residual is large (measured 0.696 here) ...
    assert relative_diff(band(coarse), band(full), "max") > 0.1
    # ... and IDENTICAL against folded and against full-res per bin
    rd_full = np.abs(band(coarse).P - band(full).P) / np.abs(band(full).P)
    rd_fold = np.abs(band(coarse).P - band(folded).P) / np.abs(band(folded).P)
    np.testing.assert_allclose(rd_fold, rd_full, atol=1e-5)


def test_append_splice_overlap_band_tolerance():
    """Production splice shape (coarse low-k pass + folded high-k pass,
    ``PowerSpectrum.append``): on a smooth field the overlap residual is
    the coarse pass's down-sampling window — small well below the coarse
    Nyquist and growing monotonically toward it (physical, not a fold
    error: the folded side equals the full-resolution spectrum to f64
    rounding).  Asserts the tolerance band append actually splices."""
    from vpower_tpu.io.synthetic import gaussian_random_field

    n = 32
    v = gaussian_random_field(jax.random.PRNGKey(5), n, 1.0).astype(
        jnp.float64
    )
    field = BoxField(velocity=v, mass=jnp.ones((n,) * 3, jnp.float64),
                     cell_size=1.0 / n)
    full = spectrum_from_field(field)
    low = spectrum_from_field(field.down_sample(2))
    folded = folded_spectrum_sweep(field, m=2).combine_all()

    # folded high-k pass == direct full-resolution spectrum (exact)
    assert relative_diff(folded, full, "max") < 1e-12

    # overlap residual: < 5% through k <= kNyq_coarse / 4, monotone
    # growth toward the coarse Nyquist (window suppression; measured
    # [0.013, 0.043, 0.091, 0.145, 0.218, 0.277, 0.318, 0.293])
    res = np.abs(low.P - folded.P[: len(low)]) / np.abs(folded.P[: len(low)])
    assert res[:2].max() < 0.05
    assert res[5:].min() > res[:3].max()

    # the splice: low-k bins from the coarse pass, high-k from folded
    spliced = low.append(folded)
    assert np.all(np.diff(spliced.k) > 0)
    # every folded sample lands exactly once; coarse samples below the
    # folded kmin ride along (folded kmin = coarse kmin here, so total
    # = folded + re-binned coarse overlap)
    assert spliced.Nsample.sum() == folded.Nsample.sum() + low.Nsample.sum()
    np.testing.assert_allclose(spliced.Psum[-5:], folded.Psum[-5:])
