"""Unit tests of the FFT-power + shell-binning core against analytic
cases and a numpy float64 mirror (SURVEY.md §4a test pyramid)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu.spectrum import power as pw

pytestmark = pytest.mark.fast


# ----------------------------------------------------------------------
# numpy float64 mirror of the reference implementation
# (vpower/interp.py:1372-1481, scripts/parallel_optimized.py:145-190)
# ----------------------------------------------------------------------
def np_vector_power(v, box_size):
    # channels-first (C, N, N, N)
    n = v.shape[-1]
    a = (box_size / (2 * np.pi)) ** 1.5 / n**3
    p = np.zeros((n, n, n))
    for c in range(v.shape[0]):
        fk = np.fft.fftn(v[c].astype(np.float64)) * a
        p += 0.5 * np.abs(fk) ** 2
    return p


def np_shell_bin(power, box_size, kshift=(0.0, 0.0, 0.0)):
    n = power.shape[0]
    cell = box_size / n
    kmin = 2 * np.pi / box_size
    kmax = np.pi / cell
    spacing = kmin
    n_bins = int((kmax - kmin) / spacing) + 1
    # Exact-spacing bins (library convention, interp.py:1470-1481).  The
    # script's np.linspace stretches bins when (kmax-kmin)/spacing is not
    # an integer (parallel_optimized.py:179-180); we keep exact spacing.
    centers = kmin + spacing * np.arange(n_bins)
    edges = np.concatenate([centers - spacing / 2, [centers[-1] + spacing / 2]])
    ks = 2 * np.pi * np.fft.fftfreq(n, cell)
    kx, ky, kz = np.meshgrid(
        ks + kshift[0], ks + kshift[1], ks + kshift[2], indexing="ij"
    )
    k = np.sqrt(kx**2 + ky**2 + kz**2).ravel()
    psum, _ = np.histogram(k, bins=edges, weights=power.ravel())
    nsamp, _ = np.histogram(k, bins=edges)
    return centers, psum, nsamp


def test_parseval_vector_power():
    """sum(P) * (2 pi / L)^3 == 0.5 * mean(|v|^2) (reference
    interp.py:1377-1381 normalization contract)."""
    key = jax.random.PRNGKey(0)
    n, box = 32, 2.7
    v = jax.random.normal(key, (3, n, n, n), jnp.float64)
    p = pw.vector_power(v, box)
    lhs = float(jnp.sum(p) * (2 * jnp.pi / box) ** 3)
    rhs = float(0.5 * jnp.mean(jnp.sum(v**2, axis=0)))
    assert abs(lhs - rhs) / rhs < 1e-12


def test_parseval_scalar_power():
    key = jax.random.PRNGKey(1)
    n, box = 24, 1.0
    f = jax.random.normal(key, (n, n, n), jnp.float64)
    p = pw.scalar_power(f, box)
    lhs = float(jnp.sum(p) * (2 * jnp.pi / box) ** 3)
    rhs = float(0.5 * jnp.mean(f**2))
    assert abs(lhs - rhs) / rhs < 1e-12


def test_vector_power_matches_numpy_mirror():
    key = jax.random.PRNGKey(2)
    n, box = 16, 3.1
    v = jax.random.normal(key, (3, n, n, n), jnp.float64)
    ours = np.asarray(pw.vector_power(v, box))
    ref = np_vector_power(np.asarray(v), box)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


def test_single_sine_wave_lands_in_one_bin():
    """A pure sine of wavenumber k0 puts all power in the k0 shell
    (SURVEY.md §4a analytic case)."""
    n, box = 32, 1.0
    mode = 4
    x = (jnp.arange(n) + 0.0) / n * box
    k0 = 2 * jnp.pi * mode / box
    vx = jnp.sin(k0 * x)[:, None, None] * jnp.ones((1, n, n))
    v = jnp.stack([vx, jnp.zeros_like(vx), jnp.zeros_like(vx)], axis=0)
    p = pw.vector_power(v.astype(jnp.float64), box)
    k, psum, nsamp = pw.shell_bin(p, box)
    psum = np.asarray(psum)
    k = np.asarray(k)
    hot = np.argmax(psum)
    assert abs(k[hot] - float(k0)) < 1e-9
    assert psum[hot] / np.sum(psum) > 0.999999


def test_uniform_field_is_dc_only():
    n, box = 16, 1.0
    v = jnp.ones((3, n, n, n), jnp.float64) * 2.5
    p = pw.vector_power(v, box)
    # all power at k=0, which falls below kmin and is dropped by binning
    k, psum, nsamp = pw.shell_bin(p, box)
    assert float(jnp.sum(psum)) < 1e-18
    assert float(p[0, 0, 0]) > 0


@pytest.mark.parametrize("n", [16, 17])  # even and odd grids
def test_shell_bin_matches_numpy_histogram(n):
    key = jax.random.PRNGKey(3)
    box = 2.0
    p = jax.random.uniform(key, (n, n, n), jnp.float64)
    k, psum, nsamp = pw.shell_bin(p, box)
    k_ref, psum_ref, nsamp_ref = np_shell_bin(np.asarray(p), box)
    np.testing.assert_allclose(np.asarray(k), k_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(nsamp), nsamp_ref)
    np.testing.assert_allclose(np.asarray(psum), psum_ref, rtol=1e-10)


def test_shell_bin_with_kshift_matches_numpy():
    """Folded-spectrum k-shift convention: k_eff = k + 2 pi beta / Ltot
    (parallel_optimized.py:159-163, 425)."""
    key = jax.random.PRNGKey(4)
    n, box = 16, 1.0
    total_box = 2 * box  # a fold by m=2
    beta = (1, 0, 1)
    shift = tuple(2 * np.pi * b / total_box for b in beta)
    p = jax.random.uniform(key, (n, n, n), jnp.float64)
    k, psum, nsamp = pw.shell_bin(
        p, box, kmin=2 * np.pi / total_box, spacing=2 * np.pi / total_box,
        kshift=shift,
    )
    # numpy mirror with the same global lattice
    cell = box / n
    kminv = 2 * np.pi / total_box
    kmaxv = np.pi / cell
    n_bins = int((kmaxv - kminv) / kminv) + 1
    centers = kminv + kminv * np.arange(n_bins)
    edges = np.concatenate([centers - kminv / 2, [centers[-1] + kminv / 2]])
    ks = 2 * np.pi * np.fft.fftfreq(n, cell)
    kx, ky, kz = np.meshgrid(
        ks + shift[0], ks + shift[1], ks + shift[2], indexing="ij"
    )
    kk = np.sqrt(kx**2 + ky**2 + kz**2).ravel()
    psum_ref, _ = np.histogram(kk, bins=edges, weights=np.asarray(p).ravel())
    nsamp_ref, _ = np.histogram(kk, bins=edges)
    np.testing.assert_allclose(np.asarray(nsamp), nsamp_ref)
    np.testing.assert_allclose(np.asarray(psum), psum_ref, rtol=1e-10)


def test_float32_binning_accuracy():
    """The two-level cascade keeps f32 binning within ~1e-6 of f64
    (BASELINE.md accuracy target)."""
    key = jax.random.PRNGKey(5)
    n, box = 64, 1.0
    p64 = jax.random.uniform(key, (n, n, n), jnp.float64)
    _, psum64, _ = pw.shell_bin(p64, box)
    _, psum32, _ = pw.shell_bin(p64.astype(jnp.float32), box)
    mask = np.asarray(psum64) > 0
    rel = np.abs(np.asarray(psum32)[mask] - np.asarray(psum64)[mask]) / np.asarray(
        psum64
    )[mask]
    assert rel.max() < 5e-6


# ----------------------------------------------------------------------
# rfft half-space path (VERDICT r4 item 3)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("n", [32, 33, 64])
def test_shell_bin_rfft_matches_full_binning(n):
    """Binning a half grid with Hermitian weights reproduces the full
    grid's (Psum, Nsample) — Nsample exactly (integer arithmetic),
    Psum to f32 cascade rounding — given the SAME power values (the
    half grid is sliced from the fftn power grid, isolating the
    binning equivalence from FFT rounding)."""
    key = jax.random.PRNGKey(7)
    box = 1.9
    v = jax.random.normal(key, (3, n, n, n), jnp.float32)
    p_full = pw.vector_power(v, box)
    p_half = p_full[:, :, : n // 2 + 1]
    k_f, psum_f, nsamp_f = pw.shell_bin(p_full, box)
    k_h, psum_h, nsamp_h = pw.shell_bin_rfft(p_half, box)
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(k_h))
    np.testing.assert_array_equal(np.asarray(nsamp_f), np.asarray(nsamp_h))
    np.testing.assert_allclose(
        np.asarray(psum_f), np.asarray(psum_h), rtol=2e-6, atol=1e-12
    )


@pytest.mark.parametrize("n", [32, 64])
def test_real_power_binned_matches_fftn_route(n):
    """End-to-end rfft route (rfftn power + Hermitian binning) agrees
    with the fftn + shell_bin route on a real field."""
    key = jax.random.PRNGKey(11)
    box = 2.5
    v = jax.random.normal(key, (3, n, n, n), jnp.float32)
    k_r, psum_r, nsamp_r = pw.real_power_binned(v, box)
    k_f, psum_f, nsamp_f = pw.shell_bin(pw.vector_power(v, box), box)
    np.testing.assert_array_equal(np.asarray(nsamp_f), np.asarray(nsamp_r))
    np.testing.assert_allclose(
        np.asarray(psum_f), np.asarray(psum_r), rtol=5e-6, atol=1e-12
    )
    # scalar route too
    k_r, psum_r, nsamp_r = pw.real_power_binned(v[0], box)
    k_f, psum_f, nsamp_f = pw.shell_bin(pw.scalar_power(v[0], box), box)
    np.testing.assert_array_equal(np.asarray(nsamp_f), np.asarray(nsamp_r))
    np.testing.assert_allclose(
        np.asarray(psum_f), np.asarray(psum_r), rtol=5e-6, atol=1e-12
    )


def test_real_power_binned_f64_mirror():
    """rfft route vs the numpy f64 full-FFT mirror — the 1e-6 accuracy
    contract holds through the half-space shortcut."""
    key = jax.random.PRNGKey(13)
    n, box = 32, 1.0
    v = jax.random.normal(key, (3, n, n, n), jnp.float32)
    _, psum, nsamp = pw.real_power_binned(v, box)
    p64 = np_vector_power(np.asarray(v), box)
    _, psum64, nsamp64 = np_shell_bin(p64, box)
    np.testing.assert_array_equal(np.asarray(nsamp), nsamp64)
    mask = psum64 > 0
    rel = np.abs(np.asarray(psum)[mask] - psum64[mask]) / psum64[mask]
    assert rel.max() < 2e-6


def test_hermitian_weights_count():
    """Total weighted mode count equals N^3 (every full-grid mode is
    represented exactly once)."""
    for n in (8, 9, 16, 33):
        w = np.asarray(pw.hermitian_weights(n))
        assert w.sum() * n * n == n**3


def test_window_compensation_rfft_slice():
    """rfft compensation grid is the kz >= 0 slice of the full one."""
    full = np.asarray(pw.window_compensation(16, 2))
    half = np.asarray(pw.window_compensation(16, 2, rfft=True))
    np.testing.assert_array_equal(full[:, :, :9], half)
