"""PowerSpectrum container & merge-algebra tests (reference
vpower/spctrm.py:55-315, with its bugs fixed per SURVEY.md §7)."""
import numpy as np
import pytest

from vpower_tpu.spectrum.spectrum import (
    PowerSpectrum,
    SpectrumList,
    empty_spectrum_like,
    init_beta_space,
    random_beta_sequence,
    relative_diff,
)

pytestmark = pytest.mark.fast


def make_spectrum(n=10, kmin=1.0, spacing=1.0, seed=0, m=0, beta=(-1, -1, -1)):
    rng = np.random.default_rng(seed)
    k = kmin + spacing * np.arange(n)
    nsample = rng.integers(1, 100, n).astype(float)
    psum = rng.uniform(0.1, 10.0, n) * nsample
    p = psum / nsample * 4 * np.pi * k**2
    return PowerSpectrum(k, p, psum, nsample, m=m, beta=beta)


def test_add_remove_roundtrip():
    s1 = make_spectrum(seed=1)
    s2 = make_spectrum(seed=2)
    s = s1.copy()
    s.add(s2)
    np.testing.assert_allclose(s.Psum, s1.Psum + s2.Psum)
    np.testing.assert_allclose(
        s.P, (s1.Psum + s2.Psum) / (s1.Nsample + s2.Nsample) * 4 * np.pi * s.k**2
    )
    s.remove(s2)
    np.testing.assert_allclose(s.Psum, s1.Psum)
    np.testing.assert_allclose(s.P, s1.P)


def test_remove_raises_on_negative():
    s1 = make_spectrum(seed=1)
    s2 = s1.copy()
    s2.Psum = s2.Psum * 2
    with pytest.raises(ValueError):
        s1.remove(s2)


def test_append_splices_and_rebins():
    """append keeps low-k bins of self, re-bins the overlap into the
    (coarser) appending spectrum — and RETURNS the result (reference bug
    spctrm.py:165 discarded it)."""
    low = make_spectrum(n=8, kmin=1.0, spacing=1.0, seed=3)   # k = 1..8
    high = make_spectrum(n=4, kmin=6.0, spacing=2.0, seed=4)  # k = 6,8,10,12
    out = low.append(high)
    # kept bins: below high's first bin edge (6 - 1 = 5), i.e. k = 1..4
    keep = low.k < high.k[0] - high.kres() / 2
    assert len(out) == keep.sum() + len(high)
    np.testing.assert_allclose(out.k, np.concatenate([low.k[keep], high.k]))
    # overlap: low bins k in [5,7) -> high bin k=6; [7,9) -> k=8
    i6 = np.where(out.k == 6.0)[0][0]
    expect = high.Psum[0] + low.Psum[(low.k >= 5) & (low.k < 7)].sum()
    np.testing.assert_allclose(out.Psum[i6], expect)
    # total sample count is conserved
    np.testing.assert_allclose(
        out.Nsample.sum(), low.Nsample.sum() + high.Nsample.sum()
    )


def test_energy_and_index():
    # P(k) = k^-2 exactly -> slope -2
    k = 1.0 + np.arange(20)
    p = k**-2.0
    s = PowerSpectrum(k, p, p, np.ones_like(k))
    assert abs(s.index() + 2.0) < 0.05
    dk = np.diff(k)
    assert abs(s.energy() - np.sum(p[:-1] * dk)) < 1e-14


def test_shot_noise():
    s = make_spectrum()
    p_before = s.P.copy()
    s.subtract_shot_noise(box_size=2.0, n_particles=100)
    np.testing.assert_allclose(s.P, np.maximum(p_before - 8.0 / 100, 0))


def test_save_load_roundtrip(tmp_path):
    s = make_spectrum(m=2, beta=(1, 0, 1))
    s.save(str(tmp_path))
    s2 = PowerSpectrum.load(str(tmp_path), beta=(1, 0, 1))
    np.testing.assert_allclose(s2.Psum, s.Psum)
    assert s2.m == 2 and s2.beta == (1, 0, 1)


def test_txt_roundtrip_and_accumulate(tmp_path):
    """Pk.txt incremental accumulation — the reference's resume mechanism
    (parallel_optimized.py:470-487)."""
    path = str(tmp_path / "Pk.txt")
    s1 = make_spectrum(seed=5)
    s2 = make_spectrum(seed=6)
    s1.accumulate_txt(path)
    total = s2.accumulate_txt(path)
    np.testing.assert_allclose(total.Psum, s1.Psum + s2.Psum, rtol=1e-10)
    on_disk = PowerSpectrum.load_txt(path)
    np.testing.assert_allclose(on_disk.Psum, total.Psum, rtol=1e-10)


def test_spectrum_list(tmp_path):
    betas = init_beta_space(2)
    spectra = [make_spectrum(seed=i, m=2, beta=tuple(b))
               for i, b in enumerate(betas)]
    sl = SpectrumList(spectra)
    assert len(sl) == 8
    np.testing.assert_allclose(sl[(1, 1, 1)].Psum, spectra[-1].Psum)
    combined = sl.combine_all()
    np.testing.assert_allclose(
        combined.Psum, np.sum([s.Psum for s in spectra], axis=0)
    )
    seq = random_beta_sequence(2, seed=7)
    c2 = sl.combine_from_beta_sequence(seq)
    np.testing.assert_allclose(c2.Psum, combined.Psum)
    # save / directory-scan load (spctrm.py:302-315, bug fixed)
    sl.save(str(tmp_path))
    sl2 = SpectrumList.load(str(tmp_path))
    assert len(sl2) == 8


def test_relative_diff_modes():
    s1 = make_spectrum(seed=8)
    s2 = s1.copy()
    s2.P = s1.P * 1.01
    assert abs(relative_diff(s1, s2, "max") - 0.01) < 1e-10
    assert relative_diff(s1, s2, "mean") > 0
    with pytest.raises(ValueError):
        relative_diff(s1, s2, "bogus")


def test_empty_spectrum_like():
    s = make_spectrum(m=3, beta=(1, 2, 0))
    e = empty_spectrum_like(s, keep_m=True, keep_beta=True)
    assert e.m == 3 and e.beta == (1, 2, 0)
    assert np.all(e.Psum == 0) and np.all(e.P == 0)


def test_multidigit_beta_roundtrip(tmp_path):
    """Fold factors m >= 10 need delimited filenames (the reference's
    sub_spctrm_b{}{}{} scheme collides, spctrm.py:224-245)."""
    s = make_spectrum(m=13, beta=(12, 0, 3))
    path = s.save(str(tmp_path))
    assert path.endswith("sub_spctrm_b12_0_3.npz")
    s2 = PowerSpectrum.load(str(tmp_path), beta=(12, 0, 3))
    assert s2.beta == (12, 0, 3) and s2.m == 13
    np.testing.assert_array_equal(s2.Psum, s.Psum)
    # no ambiguity against the single-digit neighbor
    s3 = make_spectrum(m=13, beta=(1, 2, 0), seed=5)
    s3.save(str(tmp_path))
    sl = SpectrumList.load(str(tmp_path))
    assert len(sl) == 2
    np.testing.assert_array_equal(sl[(12, 0, 3)].Psum, s.Psum)


def test_legacy_beta_filename_shim(tmp_path):
    """Old runs saved sub_spctrm_b{x}{y}{z}.npz; loaders still read it."""
    s = make_spectrum(m=2, beta=(1, 0, 1))
    legacy = tmp_path / "sub_spctrm_b101.npz"
    np.savez(str(legacy), k=s.k, P=s.P, Psum=s.Psum, Nsample=s.Nsample,
             m=s.m, beta=np.array(s.beta))
    s2 = PowerSpectrum.load(str(tmp_path), beta=(1, 0, 1))
    np.testing.assert_array_equal(s2.Psum, s.Psum)
    assert len(SpectrumList.load(str(tmp_path))) == 1
