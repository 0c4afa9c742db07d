"""Sorted-segment window-sweep exact NN: parity with the host kd-tree
oracle across uniform / clustered / near-empty occupancies — the exact
ANN (eps=0) contract of the reference (``vpower/interp.py:1027-1034``)
that the multigrid + ring-refine path could only approximate on
clustered inputs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpower_tpu.deposit.nn_window import (
    nn_exact_assign, nn_window_gather,
)


def _d2_of(idx, pos, n_grid, box, periodic):
    p = np.asarray(pos)
    cell = box / n_grid
    ax = (np.arange(n_grid) + 0.5) * cell
    cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
    c = np.stack([cx, cy, cz], -1)
    d = c - p[idx]
    if periodic:
        d = d - box * np.round(d / box)
    return np.sum(d * d, -1)


def _assert_exact(pos, n_grid, box, periodic, **kw):
    from vpower_tpu.io.native import native_available, nn_exact_host

    if not native_available():
        pytest.skip("native host library unavailable")
    idx = np.asarray(
        nn_exact_assign(pos, n_grid, box, periodic=periodic, impl="xla")
    )
    ref = nn_exact_host(np.asarray(pos), n_grid, box, periodic=periodic)
    # distances, not indices: exact ties are legitimate either way
    dd = np.abs(
        _d2_of(idx, pos, n_grid, box, periodic)
        - _d2_of(ref, pos, n_grid, box, periodic)
    )
    assert idx.min() >= 0
    assert dd.max() <= 1e-9, f"misassignments: {(dd > 1e-9).sum()}"


@pytest.mark.parametrize("periodic", [True, False])
def test_uniform(periodic):
    pos = jax.random.uniform(jax.random.PRNGKey(0), (4000, 3), jnp.float32)
    _assert_exact(pos, 64, 1.0, periodic)


@pytest.mark.parametrize("periodic", [True, False])
def test_clustered_with_voids(periodic):
    """Three dense clusters + stragglers: void tiles force tier-2 and
    pass-C escalation — the regime where every seed-based scheme has an
    error class and the window sweep must not."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    parts = []
    for kk in (k1, k2, k3):
        c0 = jax.random.uniform(kk, (1, 3))
        parts.append(
            c0 + 0.008 * jax.random.normal(jax.random.fold_in(kk, 1),
                                           (1500, 3))
        )
    parts.append(jax.random.uniform(k4, (15, 3)))
    pos = (jnp.concatenate(parts) % 1.0).astype(jnp.float32)
    _assert_exact(pos, 64, 1.0, periodic)


@pytest.mark.parametrize("periodic", [True, False])
def test_near_empty(periodic):
    """25 particles in a 64^3 box: every tile needs halo > 8 -> the
    whole grid resolves through the full-span pass C."""
    pos = jax.random.uniform(jax.random.PRNGKey(3), (25, 3), jnp.float32)
    _assert_exact(pos, 64, 1.0, periodic)


def test_payload_matches_oracle_gather():
    """nn_window_gather(payload) == vals[kd-tree assignment] wherever the
    NN is unique (compared through distances via the index channels)."""
    from vpower_tpu.io.native import native_available, nn_exact_host

    if not native_available():
        pytest.skip("native host library unavailable")
    key = jax.random.PRNGKey(11)
    pos = jax.random.uniform(key, (3000, 3), jnp.float32)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (3000, 4)).astype(
        jnp.float32
    )
    pay, d2, occ = nn_window_gather(pos, vals, 64, 1.0, impl="xla")
    assert float(occ) == 1.0
    ref = nn_exact_host(np.asarray(pos), 64, 1.0, periodic=True)
    want = np.asarray(vals)[ref]  # (N, N, N, 4)
    got = np.moveaxis(np.asarray(pay), 0, -1)
    # returned d2 equals the true NN distance everywhere
    d2_ref = _d2_of(ref, pos, 64, 1.0, True)
    np.testing.assert_allclose(np.asarray(d2), d2_ref, atol=1e-8)
    # payload matches except where an f32 near-tie legitimately picked
    # a different (equidistant to rounding) particle
    mism = np.any(got != want, axis=-1)
    assert mism.mean() < 1e-4
    if mism.any():
        np.testing.assert_allclose(
            np.asarray(d2)[mism], d2_ref[mism], atol=1e-8
        )


def test_valid_mask_equals_subset():
    """nn_window_gather(valid=mask) == nn_window_gather on the compacted
    valid subset — invalid rows never become candidates (the streamed
    pipeline's padded-window contract)."""
    key = jax.random.PRNGKey(17)
    pos = jax.random.uniform(key, (3000, 3), jnp.float32)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (3000, 2)).astype(
        jnp.float32
    )
    mask = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (3000,))
    pa, d2a, oa = nn_window_gather(pos, vals, 64, 1.0, impl="xla",
                                   valid=mask)
    sel = np.flatnonzero(np.asarray(mask))
    pb, d2b, ob = nn_window_gather(pos[sel], vals[sel], 64, 1.0,
                                   impl="xla")
    assert float(oa) == float(ob) == 1.0
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b),
                               rtol=1e-6, atol=1e-9)
    same = np.asarray(pa) == np.asarray(pb)
    assert same.mean() > 0.9999  # ties only


def test_d2_seed_is_upper_bound():
    """The d2-only descent (zero payload channels) returns a valid
    upper bound on the true NN distance at every cell — the property
    the window sweep's exactness certificate rests on — in BOTH the
    normal and the pre-merged descent modes."""
    from vpower_tpu.deposit import nn as nnmod

    pos = jax.random.uniform(jax.random.PRNGKey(0), (3000, 3), jnp.float32)
    vals0 = jnp.zeros((3000, 0), jnp.float32)
    p = np.asarray(pos)
    cell = 1.0 / 64
    ax = (np.arange(64, dtype=np.float32) + 0.5) * cell
    cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
    q = np.stack([cx, cy, cz], -1).reshape(-1, 3)
    true_d2 = np.empty(q.shape[0], np.float32)
    for i0 in range(0, q.shape[0], 16384):
        d = q[i0:i0 + 16384, None, :] - p[None, :, :]
        d -= np.round(d)
        true_d2[i0:i0 + 16384] = (d * d).sum(-1).min(1)
    true_d2 = true_d2.reshape(64, 64, 64)

    orig = nnmod._PREMERGE_MIN
    try:
        for premerge_min in (256, 64):  # normal / forced-premerge
            nnmod._PREMERGE_MIN = premerge_min
            pay, occ, d2 = nnmod.nn_gather_grid(
                pos, vals0, 64, 1.0, return_d2=True
            )
            assert pay.shape == (0, 64, 64, 64)
            assert float(occ) == 1.0
            gap = np.asarray(d2) - true_d2
            # >= up to f32 rounding (absorbed by the +0.01-cell slack
            # in _h_required and the 1e-5 nudge)
            assert gap.min() > -1e-8, gap.min()
    finally:
        nnmod._PREMERGE_MIN = orig


def test_interpret_kernel_matches_xla_mirror():
    """The actual Pallas kernel (interpret mode) and the XLA mirror make
    identical decisions — chunk clamping, span edges, tie order."""
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (700, 3), jnp.float32)
    vals = jnp.arange(700, dtype=jnp.float32)[:, None]
    pa, d2a, _ = nn_window_gather(pos, vals, 64, 1.0, impl="interpret")
    pb, d2b, _ = nn_window_gather(pos, vals, 64, 1.0, impl="xla")
    # d2 differs only by accumulation order (dx*dx+dy*dy+dz*dz vs a
    # stacked sum-reduce); a same-rounding-class tie may flip payload
    same = np.asarray(pa) == np.asarray(pb)
    assert same.mean() > 0.9999
    np.testing.assert_allclose(
        np.asarray(d2a), np.asarray(d2b), rtol=1e-6, atol=1e-9
    )


def test_interp_to_field_exact_routes_window():
    """nn_interp_to_field(exact=True) on a window-capable grid gives the
    oracle's field values."""
    from vpower_tpu.core.particles import Particles
    from vpower_tpu.deposit.nn import nn_interp_to_field
    from vpower_tpu.io.native import native_available, nn_exact_host

    if not native_available():
        pytest.skip("native host library unavailable")
    key = jax.random.PRNGKey(21)
    kp, kv, kd = jax.random.split(key, 3)
    n = 2500
    particles = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jax.random.uniform(kd, (n,), jnp.float32) + 0.5,
        box_size=1.0,
    )
    field = nn_interp_to_field(particles, 64, exact=True)
    ref = nn_exact_host(np.asarray(particles.pos), 64, 1.0, periodic=True)
    want_v = np.asarray(particles.vel)[ref]
    got_v = np.moveaxis(np.asarray(field.velocity), 0, -1)
    close = np.isclose(got_v, want_v, rtol=2e-6, atol=2e-6).all(axis=-1)
    assert (~close).mean() < 1e-4  # f32 near-ties only
    want_m = np.asarray(particles.density)[ref] * (1.0 / 64) ** 3
    close_m = np.isclose(np.asarray(field.mass), want_m, rtol=1e-6)
    assert (~close_m).mean() < 1e-4
