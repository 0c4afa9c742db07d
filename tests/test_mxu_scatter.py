"""MXU outer-product deposit kernel: parity with the segment_sum
engine (interpret mode on CPU), including the window/block boundary
cases the pair enumeration must mask."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu.deposit import mxu_scatter
from vpower_tpu.deposit.scatter import deposit_cic, deposit_ngp


def _segsum_grid(sids, svals, n_grid):
    g = jax.ops.segment_sum(
        svals, sids, num_segments=n_grid**3, indices_are_sorted=True
    )
    return np.asarray(g.T.reshape((svals.shape[1],) + (n_grid,) * 3))


def _mxu_grid(sids, svals, n_grid):
    return np.asarray(
        mxu_scatter.mxu_deposit_sorted(sids, svals, n_grid, interpret=True)
    )


def _check(sids, svals, n_grid):
    sids = jnp.sort(jnp.asarray(sids, jnp.int32))
    svals = jnp.asarray(svals, jnp.float32)
    ref = _segsum_grid(sids, svals, n_grid)
    got = _mxu_grid(sids, svals, n_grid)
    np.testing.assert_allclose(got, ref, atol=1e-5 * max(
        1.0, float(np.abs(ref).max())))


def test_supported():
    assert mxu_scatter.mxu_supported(32)     # 32768 cells = 4 blocks
    assert mxu_scatter.mxu_supported(512)
    assert not mxu_scatter.mxu_supported(10)  # 1000 cells
    assert not mxu_scatter.mxu_supported(2048)  # ids overflow int32


def test_uniform_random():
    rng = np.random.default_rng(0)
    n_grid, n = 32, 5000
    sids = rng.integers(0, n_grid**3, n)
    svals = rng.normal(size=(n, 4))
    _check(sids, svals, n_grid)


def test_all_one_cell():
    """Heavy clustering: every particle in one cell — many windows
    revisit one block; accumulation across consecutive steps."""
    rng = np.random.default_rng(1)
    n_grid, n = 32, 4096
    sids = np.full(n, 17)
    svals = rng.normal(size=(n, 2))
    _check(sids, svals, n_grid)


def test_block_boundary_cells():
    """Ids straddling block boundaries (CB multiples) and the grid
    edges — the in-kernel range mask must split them correctly."""
    rng = np.random.default_rng(2)
    n_grid = 32
    cb = mxu_scatter._choose_cbh(n_grid**3) * mxu_scatter._CBL
    edges = np.concatenate([
        np.arange(cb - 5, cb + 5),
        np.arange(2 * cb - 3, 2 * cb + 3),
        np.array([0, 1, n_grid**3 - 1, n_grid**3 - 2]),
    ])
    sids = np.repeat(edges, 300)
    svals = rng.normal(size=(len(sids), 3))
    _check(sids, svals, n_grid)


def test_sparse_with_gaps():
    """Mostly-empty grid: gap blocks must come out exactly zero."""
    rng = np.random.default_rng(3)
    n_grid = 64
    sids = np.array([5, 5, 100000, 250000, 262143])
    svals = rng.normal(size=(5, 1))
    _check(sids, svals, n_grid)
    # zero blocks are written
    grid = _mxu_grid(jnp.asarray(sids, jnp.int32),
                     jnp.asarray(svals, jnp.float32), n_grid)
    flat = grid.reshape(1, -1)
    occupied = set(sids.tolist())
    mask = np.ones(n_grid**3, bool)
    mask[list(occupied)] = False
    assert np.all(flat[0][mask] == 0.0)


def test_single_channel_and_many_channels():
    rng = np.random.default_rng(4)
    n_grid, n = 32, 2000
    sids = rng.integers(0, n_grid**3, n)
    for c in (1, 6, 8):
        _check(sids, rng.normal(size=(n, c)), n_grid)


def test_deposit_ngp_engine_parity():
    rng = np.random.default_rng(5)
    n_grid, n, box = 32, 3000, 2.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    ref = np.asarray(deposit_ngp(pos, vals, n_grid, box, engine="xla"))
    got = np.asarray(deposit_ngp(pos, vals, n_grid, box,
                                 engine="mxu_interpret"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_deposit_cic_engine_parity():
    """Roll-formulated MXU CIC == direct 8-target CIC."""
    rng = np.random.default_rng(6)
    n_grid, n, box = 32, 3000, 1.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ref = np.asarray(deposit_cic(pos, vals, n_grid, box, engine="xla"))
    got = np.asarray(deposit_cic(pos, vals, n_grid, box,
                                 engine="mxu_interpret"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_deposit_cic_engine_parity_scalar():
    rng = np.random.default_rng(7)
    n_grid, n, box = 32, 1000, 3.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    ref = np.asarray(deposit_cic(pos, vals, n_grid, box, engine="xla"))
    got = np.asarray(deposit_cic(pos, vals, n_grid, box,
                                 engine="mxu_interpret"))
    assert got.shape == ref.shape == (n_grid,) * 3
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_auto_engine_on_cpu_is_xla():
    from vpower_tpu.deposit.scatter import resolve_engine
    assert resolve_engine("auto", 32) == "xla"  # tests force CPU


def test_unsupported_grid_raises():
    with pytest.raises(ValueError):
        from vpower_tpu.deposit.scatter import resolve_engine
        resolve_engine("mxu", 10)


def test_sph_engine_parity():
    """MXU roll-formulated SPH == XLA scan scatter."""
    from vpower_tpu.deposit.sph import sph_deposit
    rng = np.random.default_rng(8)
    n_grid, n, box = 32, 2000, 1.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    h = jnp.asarray(rng.uniform(0.3, 2.5, n) / n_grid, jnp.float32)
    ref = np.asarray(sph_deposit(pos, vals, h, n_grid, box, s_max=1,
                                 engine="xla"))
    got = np.asarray(sph_deposit(pos, vals, h, n_grid, box, s_max=1,
                                 engine="mxu_interpret"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # conservation through the mxu path
    np.testing.assert_allclose(got.sum(axis=(1, 2, 3)),
                               np.asarray(vals.sum(axis=0)), rtol=1e-4)


def test_seed_grids_engine_parity():
    """MXU-deposited seed grids == scatter-built seed grids."""
    from vpower_tpu.deposit.nn import _seed_grids
    rng = np.random.default_rng(9)
    n_grid, n = 32, 3000
    pos = jnp.asarray(rng.uniform(0, 1.0, (n, 3)), jnp.float32)
    si_ref, sp_ref = _seed_grids(pos, n_grid, 1.0, 2, engine="xla")
    si_got, sp_got = _seed_grids(pos, n_grid, 1.0, 2,
                                 engine="mxu_interpret")
    np.testing.assert_array_equal(np.asarray(si_got), np.asarray(si_ref))
    np.testing.assert_allclose(np.asarray(sp_got), np.asarray(sp_ref),
                               atol=1e-6)


def test_scatter_local_slab_parity():
    """Flat slab id spaces (sharded local deposits) through the kernel,
    including the drop bucket (ids == n_cells)."""
    from vpower_tpu.parallel.deposit import _scatter_local
    rng = np.random.default_rng(10)
    shape = (16, 32, 64)                  # slab, n_cells = 32768
    n_cells = int(np.prod(shape))
    n = 4000
    ids = rng.integers(0, n_cells + 1, n)  # includes dropped rows
    vals = rng.normal(size=(n, 4))
    ref = np.asarray(_scatter_local(
        jnp.asarray(ids, jnp.int32), jnp.asarray(vals, jnp.float32),
        n_cells, shape, engine="xla"))
    got = np.asarray(_scatter_local(
        jnp.asarray(ids, jnp.int32), jnp.asarray(vals, jnp.float32),
        n_cells, shape, engine="mxu_interpret"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_adaptive_block_width_large_id_space():
    """1024^3-scale flat id spaces widen blocks so the pair tables fit
    SMEM (round-2 regression: SMEM overflow at n_cells = 2^30)."""
    assert mxu_scatter._choose_cbh(512**3) == 64
    assert mxu_scatter._choose_cbh(1024**3) == 128
    assert mxu_scatter.mxu_supported(1024)
    # parity at a wide-block size (n_cells small enough to force cbh
    # via a divisibility gap is hard; exercise 128 directly)
    rng = np.random.default_rng(11)
    n_cells = 128 * 128 * 1024       # chooses cbh=64; still verify path
    sids = np.sort(rng.integers(0, n_cells, 3000)).astype(np.int32)
    svals = rng.normal(size=(3000, 2)).astype(np.float32)
    plan = mxu_scatter.make_deposit_plan(jnp.asarray(sids), n_cells)
    flat = np.asarray(mxu_scatter.deposit_planned(
        plan, jnp.asarray(svals), n_cells, interpret=True))
    ref = np.asarray(jax.ops.segment_sum(
        jnp.asarray(svals), jnp.asarray(sids), num_segments=n_cells,
        indices_are_sorted=True)).T
    np.testing.assert_allclose(flat, ref, atol=1e-5)


@pytest.mark.fast
def test_segmented_pair_tables(monkeypatch):
    """SMEM segmentation: when the (win, blk) pair tables exceed the
    per-call ceiling the deposit chains multiple pallas_calls through
    the carry alias.  Forced tiny _G_SEG so segment boundaries land
    mid-block-run; parity with segment_sum, with and without a user
    carry."""
    monkeypatch.setattr(mxu_scatter, "_G_SEG", 7)
    rng = np.random.default_rng(7)
    n_grid, n = 32, 4000
    # clustered ids so same-block runs straddle segment boundaries
    sids = np.sort(
        np.concatenate([
            rng.integers(0, 300, n // 2),          # dense head
            rng.integers(0, n_grid**3, n - n // 2),
        ])
    )
    svals = rng.normal(size=(n, 3))
    _check(sids, svals, n_grid)

    # carry chaining on top of segmentation
    sids_j = jnp.asarray(sids, jnp.int32)
    svals_j = jnp.asarray(svals, jnp.float32)
    plan = mxu_scatter.make_deposit_plan(sids_j, n_grid**3)
    base = jnp.asarray(
        rng.normal(size=(3, n_grid**3)), jnp.float32
    )
    got = np.asarray(mxu_scatter.deposit_planned(
        plan, svals_j, n_grid**3, interpret=True, carry=base
    ))
    ref = np.asarray(base) + _segsum_grid(
        sids_j, svals_j, n_grid
    ).reshape(3, -1)
    np.testing.assert_allclose(
        got, ref, atol=1e-5 * max(1.0, float(np.abs(ref).max()))
    )
