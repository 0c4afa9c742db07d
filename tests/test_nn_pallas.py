"""Pallas sweep kernel vs the XLA scan sweep (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu.deposit import nn as nnmod
from vpower_tpu.deposit.nn_pallas import sweep_tiles


@pytest.mark.parametrize("periodic", [True, False])
def test_sweep_kernel_matches_xla_sweep(periodic):
    """One kernel invocation == non-chained stride-2+1 compare set.
    Verify against a direct numpy evaluation of the same candidate set."""
    key = jax.random.PRNGKey(0)
    n, k, box = 16, 2, 1.0
    pos = jax.random.uniform(key, (500, 3), jnp.float32)

    si, sp = nnmod._seed_grids(pos % box, n, box, k)
    dist2 = nnmod._make_dist2(n, box, periodic, jnp.float32)
    big = jnp.float32(3.0e38)
    # initial state: upsampled-from-nothing -> use rank-0 seeds as state
    bi0, bp0 = si[0], sp[0]

    out_i, out_p, out_d = sweep_tiles(
        bi0, bp0, si, sp.reshape(k * 3, n, n, n), box,
        periodic=periodic, tile=8, interpret=True,
    )
    out_i = np.asarray(out_i)
    out_d = np.asarray(out_d)

    # numpy reference: per cell, min over {state, seeds} x offsets
    # (strides 2 and 1, full 3^3 including center for seeds)
    sin = np.asarray(si)
    spn = np.asarray(sp)
    p = np.asarray(pos % box)
    cell = box / n
    axis = (np.arange(n) + 0.5) * cell
    cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
    centers = np.stack([cx, cy, cz], axis=0)

    def d2_of(posfield):
        d = centers - posfield
        if periodic:
            d = d - box * np.round(d / box)
        return np.sum(d * d, axis=0)

    best_d = np.where(sin[0] >= 0, d2_of(spn[0]), 3.0e38)
    best_i = sin[0].copy()
    for s in (2, 1):
        for dx in (-s, 0, s):
            for dy in (-s, 0, s):
                for dz in (-s, 0, s):
                    fields = range(k) if (dx, dy, dz) == (0, 0, 0) \
                        else [-1] + list(range(k))
                    for f in fields:
                        fi = sin[0] if f < 0 else sin[f]
                        fp = spn[0] if f < 0 else spn[f]
                        ci = np.roll(fi, (dx, dy, dz), axis=(0, 1, 2))
                        cp = np.roll(fp, (dx, dy, dz), axis=(1, 2, 3))
                        cd = np.where(ci >= 0, d2_of(cp), 3.0e38)
                        take = cd < best_d
                        best_i = np.where(take, ci, best_i)
                        best_d = np.where(take, cd, best_d)

    np.testing.assert_allclose(out_d, best_d, rtol=1e-5)
    # indices may differ only on exact distance ties
    diff = out_i != best_i
    if diff.any():
        np.testing.assert_allclose(out_d[diff], best_d[diff], rtol=1e-5)


def test_nn_assign_pallas_path_matches_fallback():
    """Full nn_assign with use_pallas (interpret via CPU not supported in
    auto mode — force through both code paths at a small grid)."""
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (2000, 3), jnp.float32)
    a = nnmod.nn_assign(pos, 32, 1.0, use_pallas=False)
    # pallas path on CPU only works in interpret mode; monkeypatch through
    from vpower_tpu.deposit import nn_pallas as kp
    orig = kp.sweep_tiles
    kp.sweep_tiles = lambda *args, **kw: orig(*args, **{**kw, "interpret": True})
    try:
        b = nnmod.nn_assign(pos, 32, 1.0, use_pallas=True)
    finally:
        kp.sweep_tiles = orig
    an, bn = np.asarray(a), np.asarray(b)
    # the two sweeps differ in chaining; compare by assignment quality
    p = np.asarray(pos % 1.0)
    cell = 1.0 / 32
    axis = (np.arange(32) + 0.5) * cell
    cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
    c = np.stack([cx, cy, cz], axis=-1)

    def d2(idx):
        d = c - p[idx]
        d = d - np.round(d)
        return np.sum(d * d, axis=-1)

    da, db = d2(an), d2(bn)
    worse = np.mean(db > da * (1 + 1e-5) + 1e-12)
    assert worse < 2e-3, f"pallas path notably worse: {worse}"


# ----------------------------------------------------------------------
# scoped-VMEM budget guard (VERDICT r4 item 1 — the BENCH_r04 crash)
# ----------------------------------------------------------------------
def test_fit_iters_degrades_the_r4_crash_config():
    """The exact configuration that overflowed scoped VMEM on chip in
    round 4 (256^3 seeded level of the 512^3 velocity descent: n_ch=7,
    k=2, zc=256, iters=2 -> 19.93 MB > 16 MB) must be degraded, while
    the probed-safe configs keep their fused iterations."""
    from vpower_tpu.deposit.nn_pallas import fit_iters

    assert fit_iters(7, 2, 256, 2) == 1          # the crash config
    assert fit_iters(8, 2, 256, 2) == 1
    assert fit_iters(7, 2, 128, 2) == 2          # probed 5.25 MB
    assert fit_iters(8, 2, 128, 2) == 2          # probed 6.00 MB
    assert fit_iters(6, 0, 512, 2) == 2          # state-only, r4 A/B
    assert fit_iters(7, 0, 512, 2) == 2
    assert fit_iters(7, 2, 384, 2) == 1          # unprobed -> safe
    assert fit_iters(7, 2, 256, 1) == 1          # iters=1 always legal


def test_sweep_tiles_vals_refuses_overbudget_compile():
    """Tracing the r4 crash configuration raises at TRACE time (a clear
    ValueError pointing at fit_iters) instead of compiling a kernel
    doomed to a chip-side scoped-VMEM OOM.  eval_shape traces without
    allocating the 470 MB state."""
    from functools import partial

    from vpower_tpu.deposit.nn_pallas import sweep_tiles_vals

    n = 256
    state = jax.ShapeDtypeStruct((7, n, n, n), jnp.float32)
    seeds = jax.ShapeDtypeStruct((14, n, n, n), jnp.float32)
    fn = partial(sweep_tiles_vals, box_size=1.0, zc=256, iters=2)
    with pytest.raises(ValueError, match="fit_iters"):
        jax.eval_shape(fn, state, seeds)
    # the degraded configurations trace fine
    jax.eval_shape(partial(sweep_tiles_vals, box_size=1.0, zc=256,
                           iters=1), state, seeds)
    jax.eval_shape(partial(sweep_tiles_vals, box_size=1.0, zc=128,
                           iters=2), state, seeds)


def test_descent_seeded_level_replans_to_small_chunk():
    """The 512^3 descent's seeded 256^3 level must trace with the
    seeded-once + state-only plan — eval_shape of the full
    nn_gather_grid with use_pallas=True exercises exactly the nn.py
    planning that shipped the r4 crash (it raised through
    sweep_tiles_vals before the replan)."""
    from functools import partial

    pos = jax.ShapeDtypeStruct((1000, 3), jnp.float32)
    vals = jax.ShapeDtypeStruct((1000, 3), jnp.float32)
    fn = partial(nnmod.nn_gather_grid, n_grid=512, box_size=1.0,
                 use_pallas=True)
    out = jax.eval_shape(fn, pos, vals)
    assert out[0].shape == (3, 512, 512, 512)


@pytest.mark.parametrize("periodic", [True, False])
def test_later_pass_seed_redundancy(periodic):
    """Pass 2 of a seeded level may drop the seed fields with a
    BIT-IDENTICAL result (the nn.py seeded-once + state-only split):
    the merge is a strict-less min over the same offset set each pass,
    seeds never change, and every candidate is scored against the same
    cell center — so pass 1's output already lower-bounds anything the
    seeds could re-offer in pass 2."""
    from vpower_tpu.deposit.nn_pallas import sweep_tiles_vals

    key = jax.random.PRNGKey(3)
    n, k, box = 16, 2, 1.0
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (400, 3), jnp.float32) % box
    vals = jax.random.normal(kv, (400, 3), jnp.float32)

    seed_ch = nnmod._seed_grids_vals(pos, vals, n, box, k)  # (k, C, n^3)
    n_ch = seed_ch.shape[1]
    seeds = seed_ch.reshape(k * n_ch, n, n, n)
    state0 = seed_ch[0]

    def seeded(st):
        return sweep_tiles_vals(st, seeds, box, periodic=periodic,
                                zc=n, interpret=True)

    out1 = seeded(state0)
    both_seeded = seeded(out1)
    state_only = sweep_tiles_vals(out1, None, box, periodic=periodic,
                                  zc=n, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(both_seeded), np.asarray(state_only)
    )

    # same property for the index kernel (the nn_assign split)
    si, sp = nnmod._seed_grids(pos, n, box, k)
    sp_flat = sp.reshape(k * 3, n, n, n)
    i1, p1, _ = sweep_tiles(si[0], sp[0], si, sp_flat, box,
                            periodic=periodic, interpret=True)
    i2s, p2s, d2s = sweep_tiles(i1, p1, si, sp_flat, box,
                                periodic=periodic, interpret=True)
    i2, p2, d2 = sweep_tiles(i1, p1, None, None, box,
                             periodic=periodic, interpret=True)
    np.testing.assert_array_equal(np.asarray(i2s), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d2s), np.asarray(d2))
