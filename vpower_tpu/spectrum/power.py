"""FFT power grids and spherical k-shell binning — the numeric core.

TPU-native re-design of the reference's numerics layer
(``vpower/interp.py:1372-1481`` and ``scripts/parallel_optimized.py:92-190``):

* FFTs are ``jnp.fft.fftn`` under ``jax.jit`` (XLA TPU FFT) instead of
  FFTW plans; components are transformed sequentially to cap peak memory,
  exactly like the reference's per-component FFTW loop
  (``parallel_disk_vector.py:429-440``).
* Shell binning is a fused ``segment_sum`` over an on-the-fly bin-index
  lattice instead of ``ravel`` + ``np.histogram``
  (reference ``interp.py:1440-1481``) — no (N^3, 2) pair array is ever
  materialized.
* The binning accumulates per-x-slice partial sums and reduces across
  slices in a second pass, which keeps float32 rounding error at the
  1e-6 level even for shells with ~1e7 modes.

Normalization convention (reference ``interp.py:1377-1381``):
``a = (Lbox / 2 pi)^1.5 / N^3``, ``P = 0.5 * sum_c |a F_c(k)|^2`` so that
``sum(P) * (2 pi / Lbox)^3 == 0.5 * mean(|v|^2)`` (Parseval).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "power_norm",
    "vector_power",
    "scalar_power",
    "vector_power_rfft",
    "scalar_power_rfft",
    "vector_power_from_complex",
    "scalar_power_from_complex",
    "cross_power",
    "interlaced_vector_power",
    "interlaced_power_from_complex",
    "window_compensation",
    "bin_grid",
    "shell_bin",
    "shell_bin_rfft",
    "hermitian_weights",
    "default_k_bins",
]


def power_norm(box_size: float, n_grid: int) -> float:
    """FFT normalization ``(L / 2 pi)^1.5 / N^3`` (reference ``interp.py:1381``)."""
    return (box_size / (2.0 * jnp.pi)) ** 1.5 / float(n_grid) ** 3


def vector_power(v: jax.Array, box_size: float) -> jax.Array:
    """Power grid of a real CHANNELS-FIRST (3, N, N, N) vector field.

    ``P(k) = 0.5 * sum_c |a F[v_c](k)|^2`` — reference ``_vector_power``
    (``interp.py:1372-1387``).  Components are FFT'd sequentially so peak
    memory stays at ~2 complex cubes (reference pattern
    ``parallel_optimized.py:104-118``).
    """
    n_grid = v.shape[-1]
    a = power_norm(box_size, n_grid)
    acc = None
    for c in range(v.shape[0]):
        fk = jnp.fft.fftn(v[c])
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def scalar_power(f: jax.Array, box_size: float) -> jax.Array:
    """Power grid of a real (N, N, N) scalar field.

    Reference ``_scalar_power`` (``interp.py:1408-1421``).
    """
    n_grid = f.shape[0]
    a = power_norm(box_size, n_grid)
    fk = jnp.fft.fftn(f)
    return 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2) * (a * a)


def vector_power_rfft(v: jax.Array, box_size: float) -> jax.Array:
    """Half-space power grid (N, N, N//2 + 1) of a real CHANNELS-FIRST
    vector field via ``rfftn``.

    The fields of the unfolded pipelines are real, so the full ``fftn``
    (reference per-component loop, ``parallel_optimized.py:104-118``,
    which likewise burns a full complex transform on real input) wastes
    half its flops, HBM traffic, and power-grid footprint reproducing
    conjugate modes.  ``rfftn`` keeps only ``kz >= 0``; bin with
    :func:`shell_bin_rfft`, whose Hermitian weights restore exactly the
    full-grid ``(Psum, Nsample)``.
    """
    n_grid = v.shape[-1]
    a = power_norm(box_size, n_grid)
    acc = None
    for c in range(v.shape[0]):
        fk = jnp.fft.rfftn(v[c])
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def scalar_power_rfft(f: jax.Array, box_size: float) -> jax.Array:
    """Half-space power grid of a real (N, N, N) scalar field
    (``rfftn`` counterpart of :func:`scalar_power`)."""
    n_grid = f.shape[0]
    a = power_norm(box_size, n_grid)
    fk = jnp.fft.rfftn(f)
    return 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2) * (a * a)


def vector_power_from_complex(f: jax.Array, box_size: float) -> jax.Array:
    """Power grid of a complex CHANNELS-FIRST (C, N, N, N) field
    (folded boxes).  Reference ``_FFTW_vector_power``
    (``interp.py:1390-1405``).
    """
    n_grid = f.shape[-1]
    a = power_norm(box_size, n_grid)
    acc = None
    for c in range(f.shape[0]):
        fk = jnp.fft.fftn(f[c])
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def scalar_power_from_complex(f: jax.Array, box_size: float) -> jax.Array:
    """Reference ``_FFTW_scalar_power`` (``interp.py:1424-1437``)."""
    n_grid = f.shape[0]
    a = power_norm(box_size, n_grid)
    fk = jnp.fft.fftn(f)
    return 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2) * (a * a)


def cross_power(a: jax.Array, b: jax.Array, box_size: float) -> jax.Array:
    """Cross-power grid of two real fields (scalar or CHANNELS-FIRST
    vector): ``P_ab = 0.5 * sum_c Re(a F[a_c] conj(a F[b_c]))``.

    Extends the reference's auto-spectra (it has none of this; SURVEY.md
    §7 build step 6 "cross-spectra") with the same normalization so the
    a == b case reduces exactly to :func:`vector_power` /
    :func:`scalar_power`.
    """
    assert a.shape == b.shape, "cross_power requires matching shapes"
    n_grid = a.shape[-1]
    norm = power_norm(box_size, n_grid)
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    acc = None
    for c in range(a.shape[0]):
        fa = jnp.fft.fftn(a[c])
        fb = jnp.fft.fftn(b[c])
        p = 0.5 * (jnp.real(fa) * jnp.real(fb) + jnp.imag(fa) * jnp.imag(fb))
        acc = p if acc is None else acc + p
    return acc * (norm * norm)


def interlaced_vector_power(
    v: jax.Array, v_shifted: jax.Array, box_size: float
) -> jax.Array:
    """Power grid with interlacing of CHANNELS-FIRST (C, N, N, N)
    fields: ``v_shifted`` is the same field deposited from positions
    shifted by half a cell along each axis; the two Fourier transforms
    are combined with the half-cell phase, which cancels the odd images
    of the deposition window (Hockney & Eastwood interlacing; the
    'interlaced spectra' scale target of BASELINE.md).
    """
    n_grid = v.shape[-1]
    a = power_norm(box_size, n_grid)
    idx = jax.lax.iota(jnp.int32, n_grid)
    wrapped = jnp.where(idx < (n_grid + 1) // 2, idx, idx - n_grid)
    theta_1d = jnp.pi * wrapped.astype(v.dtype) / n_grid
    theta = (
        theta_1d[:, None, None]
        + theta_1d[None, :, None]
        + theta_1d[None, None, :]
    )
    # the shift by +Lcell/2 multiplies true modes by e^{+i k.delta};
    # align with e^{-i theta}, theta = pi (nx+ny+nz) / N
    phase = jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))
    acc = None
    for c in range(v.shape[0]):
        fk = 0.5 * (jnp.fft.fftn(v[c]) + phase * jnp.fft.fftn(v_shifted[c]))
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def interlaced_power_from_complex(
    f1: jax.Array, f2: jax.Array, box_size: float, theta: jax.Array
) -> jax.Array:
    """Interlaced power grid of two complex CHANNELS-FIRST (C, N, N, N)
    fields — the FOLDED-pipeline form of :func:`interlaced_vector_power`:
    ``f2`` is the fold-accumulated deposit of positions shifted by half
    a FULL-RESOLUTION cell per axis, and ``theta`` is the alignment
    angle ``pi * (Kx + Ky + Kz) / N_total`` evaluated on the GLOBAL mode
    lattice ``K = m * t + beta`` (the half-cell shift multiplies true
    modes by ``e^{+i K . delta}``, so ``F2`` is rotated back by
    ``e^{-i theta}`` before averaging; odd aliasing images of the
    deposition window pick up ``e^{i pi j}`` and cancel)."""
    n_grid = f1.shape[-1]
    a = power_norm(box_size, n_grid)
    phase = jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))
    acc = None
    for c in range(f1.shape[0]):
        fk = 0.5 * (jnp.fft.fftn(f1[c]) + phase * jnp.fft.fftn(f2[c]))
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def window_compensation(
    n_grid: int, order: int, dtype=jnp.float32, rfft: bool = False
) -> jax.Array:
    """(N, N, N) multiplicative correction ``1 / W(k)^2`` for the
    deposition window: ``W(k) = prod_i sinc(pi n_i / N)^order`` with
    order 1 = NGP, 2 = CIC, 3 = TSC.  Apply to the power grid BEFORE
    binning.  ``rfft=True`` emits the (N, N, N//2 + 1) half-space form
    (sinc is even, so the kz plane is just the leading slice).  (Not
    present in the reference — a standard particle-mesh correction,
    flag-gated off by default for parity.)"""
    idx = jax.lax.iota(jnp.int32, n_grid)
    wrapped = jnp.where(idx < (n_grid + 1) // 2, idx, idx - n_grid)
    x = jnp.pi * wrapped.astype(dtype) / n_grid
    sinc = jnp.where(x != 0, jnp.sin(x) / jnp.where(x != 0, x, 1.0), 1.0)
    w1d = sinc**order
    wz = w1d[: n_grid // 2 + 1] if rfft else w1d
    w = (
        w1d[:, None, None] * w1d[None, :, None] * wz[None, None, :]
    )
    return 1.0 / (w * w)


def real_power_binned(
    data: jax.Array,
    box_size: float,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
    compensate_order: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused rfft fast path for REAL fields: half-space power grid +
    optional window compensation + Hermitian-weighted shell binning.
    Produces the same ``(k, Psum, Nsample)`` as the full-FFT
    ``vector_power``/``scalar_power`` + ``shell_bin`` route at half the
    FFT flops, HBM traffic, and power-grid footprint.  ``data`` is a
    CHANNELS-FIRST (C, N, N, N) vector or an (N, N, N) scalar."""
    if data.ndim == 4:
        p_grid = vector_power_rfft(data, box_size)
    else:
        p_grid = scalar_power_rfft(data, box_size)
    if compensate_order > 0:
        p_grid = p_grid * window_compensation(
            data.shape[-1], compensate_order, dtype=p_grid.dtype, rfft=True
        )
    return shell_bin_rfft(p_grid, box_size, kmin=kmin, kmax=kmax,
                          spacing=spacing)


# ---------------------------------------------------------------------- #
# spherical k-shell binning                                              #
# ---------------------------------------------------------------------- #
def default_k_bins(
    box_size: float,
    cell_size: float,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
) -> Tuple[float, float, float, int]:
    """Default bin lattice: fundamental mode to Nyquist, linear spacing.

    ``kmin = 2 pi / Lbox`` (pixel freq), ``kmax = pi / Lcell`` (Nyquist),
    ``spacing = kmin`` — reference ``BoxField.spctrm`` (``interp.py:564-570``)
    and ``parallel_optimized.py:430``.  Bin centers are
    ``kmin + i * spacing`` with half-open edges at ``center +- spacing/2``.
    When ``(kmax - kmin) / spacing`` is not an integer the reference
    script stretches the bins with ``np.linspace``
    (``parallel_optimized.py:179-180``) while the reference library keeps
    exact spacing (``interp.py:1472-1473``); we follow the library
    (exact spacing), which the two agree on for even grids.
    """
    if kmin is None:
        kmin = 2.0 * float(jnp.pi) / box_size
    if kmax is None:
        kmax = float(jnp.pi) / cell_size
    if spacing is None:
        spacing = kmin
    n_bins = int((kmax - kmin) / spacing) + 1
    return float(kmin), float(kmax), float(spacing), n_bins


def _axis_freqs(n_grid: int, box_size: float, dtype) -> jax.Array:
    """1-D angular frequencies ``2 pi * fftfreq(N, Lcell)`` (reference
    ``interp.py:1448-1449``), computed with iota so it stays on device."""
    idx = jax.lax.iota(jnp.int32, n_grid)
    # fftfreq: [0, 1, ..., ceil(N/2)-1, -floor(N/2), ..., -1] / (N * Lcell)
    wrapped = jnp.where(idx < (n_grid + 1) // 2, idx, idx - n_grid)
    cell = box_size / n_grid
    return (2.0 * jnp.pi / (n_grid * cell)) * wrapped.astype(dtype)


def bin_grid(
    n_grid: int,
    box_size: float,
    kmin: float,
    spacing: float,
    n_bins: int,
    kshift: Sequence[float] = (0.0, 0.0, 0.0),
    dtype=jnp.float32,
) -> jax.Array:
    """(N, N, N) int32 lattice of shell-bin indices; ``n_bins`` = dropped.

    ``|k|`` uses the folded-spectrum shift convention
    ``k_eff = k_grid + 2 pi beta / L_total``: the reference library passes
    ``shift=+2 pi beta / totalLbox`` and adds it (``interp.py:781-783,
    1453-1458``); the canonical script passes ``-2 pi beta / LTOT`` and
    subtracts it (``parallel_optimized.py:159-163, 425``) — both reduce to
    the same ``+`` convention implemented here.
    """
    ks = _axis_freqs(n_grid, box_size, dtype)
    kx = ks + jnp.asarray(kshift[0], dtype)
    ky = ks + jnp.asarray(kshift[1], dtype)
    kz = ks + jnp.asarray(kshift[2], dtype)
    k2 = (
        (kx**2)[:, None, None]
        + (ky**2)[None, :, None]
        + (kz**2)[None, None, :]
    )
    k = jnp.sqrt(k2)
    # half-open bins [center - spacing/2, center + spacing/2)
    idx = jnp.floor((k - (kmin - spacing / 2.0)) / spacing).astype(jnp.int32)
    return jnp.where((idx >= 0) & (idx < n_bins), idx, n_bins)


def bin_grid_local(
    local_shape: Sequence[int],
    n_full: int,
    box_size: float,
    kmin: float,
    spacing: float,
    n_bins: int,
    starts,
    kshift: Sequence[float] = (0.0, 0.0, 0.0),
    dtype=jnp.float32,
) -> jax.Array:
    """Shell-bin indices for a LOCAL block of a distributed power grid.

    ``starts`` is the (3,) global index offset of this device's block
    (traced values from ``jax.lax.axis_index`` inside ``shard_map``);
    the |k| lattice is the full-grid one sliced to the block, so every
    device bins onto the same global bin set and the results can simply
    be ``psum``-ed — the TPU replacement for the reference's
    ``comm.Reduce`` spectrum combine (``parallel_optimized.py:455-456``).
    """
    ks = _axis_freqs(n_full, box_size, dtype)

    def ax(i):
        return jax.lax.dynamic_slice(ks, (starts[i],), (local_shape[i],)) + (
            jnp.asarray(kshift[i], dtype)
        )

    kx, ky, kz = ax(0), ax(1), ax(2)
    k = jnp.sqrt(
        (kx**2)[:, None, None]
        + (ky**2)[None, :, None]
        + (kz**2)[None, None, :]
    )
    idx = jnp.floor((k - (kmin - spacing / 2.0)) / spacing).astype(jnp.int32)
    return jnp.where((idx >= 0) & (idx < n_bins), idx, n_bins)


def _cascade_bin(power: jax.Array, bins: jax.Array, n_bins: int,
                 weights: Optional[jax.Array] = None):
    """Two-level accumulation cascade shared by local and global binning.

    Per-x-slice partial sums, then a cross-slice reduction (bounds f32
    rounding).  The per-slice reduction is a ONE-HOT MATMUL — a
    histogram on the MXU — rather than ``segment_sum``: XLA lowers
    segment_sum to scatter-add, which on TPU serializes to ~70M
    updates/s (measured 2.2 s for a 512^3 grid; the matmul form takes
    ~0.3 s and a planned Pallas variant keeps the one-hot in VMEM).
    ``lax.map`` keeps one slice's one-hot transient at a time.

    ``weights`` (broadcastable to ``power.shape[1:]``) multiplies both
    the power and the mode count — the Hermitian multiplicity of the
    rfft half-space (2 for planes whose conjugate was dropped).
    """
    n0 = power.shape[0]
    flat_bins = bins.reshape(n0, -1)
    flat_power = power.reshape(n0, -1)
    if weights is not None:
        w_row = jnp.broadcast_to(
            weights.astype(power.dtype), power.shape[1:]
        ).reshape(-1)
    bin_ids = jnp.arange(n_bins + 1, dtype=bins.dtype)

    def slice_sums(args):
        p_row, b_row = args
        onehot = (b_row[:, None] == bin_ids[None, :]).astype(p_row.dtype)
        if weights is None:
            psum = jnp.dot(p_row, onehot, preferred_element_type=p_row.dtype)
            nsamp = jnp.sum(onehot, axis=0)
        else:
            psum = jnp.dot(
                p_row * w_row, onehot, preferred_element_type=p_row.dtype
            )
            nsamp = jnp.dot(w_row, onehot, preferred_element_type=p_row.dtype)
        return psum[:n_bins], nsamp[:n_bins]

    psums, nsamps = jax.lax.map(slice_sums, (flat_power, flat_bins))
    return jnp.sum(psums, axis=0), jnp.sum(nsamps, axis=0)


def hermitian_weights(n_grid: int, dtype=jnp.float32) -> jax.Array:
    """(N//2 + 1,) multiplicity of each rfft kz plane in the full FFT
    grid: planes 0 < kz < N/2 stand for themselves AND their dropped
    conjugate at N - kz (weight 2); kz = 0 and (even N) kz = N/2 are
    self-conjugate planes the full grid also holds exactly once
    (weight 1)."""
    nz = n_grid // 2 + 1
    idx = jax.lax.iota(jnp.int32, nz)
    w = jnp.full((nz,), 2.0, dtype)
    w = jnp.where(idx == 0, 1.0, w)
    if n_grid % 2 == 0:
        w = jnp.where(idx == n_grid // 2, 1.0, w)
    return w


def shell_bin_rfft(
    power_half: jax.Array,
    box_size: float,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bin an (N, N, N//2 + 1) rfft half-space power grid into spherical
    k-shells, reproducing the full-grid :func:`shell_bin` ``(Psum,
    Nsample)`` via Hermitian plane weights.

    ``Nsample`` is exactly the full-grid count (integer arithmetic in
    f32); ``Psum`` agrees to f32 rounding of the cascade (a dropped
    conjugate's power enters as ``2 * p`` instead of ``p + p`` — equal
    in f32 — but the reduction tree differs).  No ``kshift`` parameter:
    a shifted |k| lattice breaks the +-kz symmetry the weights encode,
    and folded (shifted) fields are complex anyway — use the full-grid
    path there.
    """
    n_grid = power_half.shape[0]
    cell_size = box_size / n_grid
    kmin, kmax, spacing, n_bins = default_k_bins(
        box_size, cell_size, kmin, kmax, spacing
    )
    ks = _axis_freqs(n_grid, box_size, power_half.dtype)
    nz = n_grid // 2 + 1
    kz = ks[:nz]
    if n_grid % 2 == 0:
        # fftfreq puts the Nyquist index at -N/2; rfft uses +N/2 —
        # same |k|, flip the sign for clarity
        kz = jnp.abs(kz.at[n_grid // 2].set(-ks[n_grid // 2]))
    k = jnp.sqrt(
        (ks**2)[:, None, None]
        + (ks**2)[None, :, None]
        + (kz**2)[None, None, :]
    )
    idx = jnp.floor((k - (kmin - spacing / 2.0)) / spacing).astype(jnp.int32)
    bins = jnp.where((idx >= 0) & (idx < n_bins), idx, n_bins)
    w = hermitian_weights(n_grid, power_half.dtype)
    psum, nsample = _cascade_bin(power_half, bins, n_bins, weights=w)
    k_centers = kmin + spacing * jnp.arange(n_bins, dtype=power_half.dtype)
    return k_centers, psum, nsample


def shell_bin_local(
    power_local: jax.Array,
    n_full: int,
    box_size: float,
    starts,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
    kshift: Sequence[float] = (0.0, 0.0, 0.0),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bin a local block; caller ``psum``s the results over the mesh."""
    cell_size = box_size / n_full
    kmin, kmax, spacing, n_bins = default_k_bins(
        box_size, cell_size, kmin, kmax, spacing
    )
    bins = bin_grid_local(
        power_local.shape, n_full, box_size, kmin, spacing, n_bins,
        starts, kshift, dtype=power_local.dtype,
    )
    psum, nsample = _cascade_bin(power_local, bins, n_bins)
    k_centers = kmin + spacing * jnp.arange(n_bins, dtype=power_local.dtype)
    return k_centers, psum, nsample


def shell_bin(
    power: jax.Array,
    box_size: float,
    kmin: Optional[float] = None,
    kmax: Optional[float] = None,
    spacing: Optional[float] = None,
    kshift: Sequence[float] = (0.0, 0.0, 0.0),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bin an (N, N, N) power grid into spherical k-shells.

    Returns ``(k_centers, Psum, Nsample)`` with ``len == n_bins``.
    The mean power is ``P = Psum / Nsample`` and the energy spectral
    density is ``P * 4 pi k^2`` — both left to the caller
    (:class:`vpower_tpu.spectrum.PowerSpectrum`), matching the reference
    split between ``_hist_sample`` and ``spctrm``
    (``interp.py:1470-1481, 586-591``).

    Implementation: per-x-slice ``segment_sum`` (each slice sums <= N^2
    modes) followed by a cross-slice reduction — a two-level cascade that
    bounds float32 rounding while staying one fused XLA computation.
    """
    n_grid = power.shape[0]
    cell_size = box_size / n_grid
    kmin, kmax, spacing, n_bins = default_k_bins(
        box_size, cell_size, kmin, kmax, spacing
    )
    bins = bin_grid(
        n_grid, box_size, kmin, spacing, n_bins, kshift, dtype=power.dtype
    )
    psum, nsample = _cascade_bin(power, bins, n_bins)
    k_centers = kmin + spacing * jnp.arange(n_bins, dtype=power.dtype)
    return k_centers, psum, nsample
