"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4c:
the TPU-native analog of multi-node testing without a cluster)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vpower_tpu import synthetic_particles, deposit, spectrum_from_field
from vpower_tpu.parallel import (
    distributed_spectrum,
    distributed_folded_sweep,
    make_mesh,
    mesh_shape_for,
    plan_run,
)
from vpower_tpu.fft.distributed import pencil_fftn, pencil_output_starts
from vpower_tpu.run.pipeline import folded_spectrum, fused_fold_spectrum


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_shape():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(16) == (4, 4)
    assert mesh_shape_for(4) == (2, 2)


def test_pencil_fft_matches_fftn(mesh):
    """Distributed pencil FFT == single-device jnp.fft.fftn."""
    key = jax.random.PRNGKey(0)
    n = 16
    x = jax.random.normal(key, (n, n, n), jnp.float32)

    f = jax.jit(
        jax.shard_map(
            lambda b: pencil_fftn(b.astype(jnp.complex64)),
            mesh=mesh,
            in_specs=P("x", "y"),
            out_specs=P(None, "x", "y"),  # output layout: X full, Y/x, Z/y
        )
    )
    got = np.asarray(f(x))
    ref = np.fft.fftn(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_pencil_output_starts(mesh):
    n = 16
    f = jax.jit(
        jax.shard_map(
            lambda: pencil_output_starts(n).reshape(1, 3),
            mesh=mesh,
            in_specs=(),
            out_specs=P(("x", "y")),
        )
    )
    starts = np.asarray(f())  # (8, 3) — one row per device
    assert set(starts[:, 0]) == {0}
    assert set(starts[:, 1]) == {0, 4, 8, 12}  # N/px = 4
    assert set(starts[:, 2]) == {0, 8}  # N/py = 8


@pytest.mark.parametrize("method", ["ngp", "cic"])
@pytest.mark.parametrize("quantity", ["velocity", "momentum", "energy"])
def test_distributed_matches_single_device(mesh, method, quantity):
    """Sharded deposit + pencil FFT + psum binning == the single-device
    pipeline, bit-for-bin."""
    particles = synthetic_particles(
        jax.random.PRNGKey(1), 16, box_size=1.0, jitter=0.4
    )
    s_dist = distributed_spectrum(
        particles, 16, mesh, method=method, quantity=quantity
    )
    field = deposit(particles, 16, method=method)
    s_ref = spectrum_from_field(field, quantity=quantity)
    np.testing.assert_allclose(s_dist.k, s_ref.k, rtol=1e-6)
    np.testing.assert_allclose(s_dist.Nsample, s_ref.Nsample)
    np.testing.assert_allclose(s_dist.Psum, s_ref.Psum, rtol=2e-4)


def test_distributed_fused_fold_matches_single_device(mesh):
    particles = synthetic_particles(
        jax.random.PRNGKey(2), 16, box_size=1.0, jitter=0.3
    )
    beta = (1, 0, 1)
    s_dist = distributed_spectrum(
        particles, 8, mesh, method="ngp", quantity="momentum", fold=(2, beta)
    )
    s_ref = fused_fold_spectrum(particles, 8, m=2, beta=beta)
    np.testing.assert_allclose(s_dist.Nsample, s_ref.Nsample)
    np.testing.assert_allclose(s_dist.Psum, s_ref.Psum, rtol=2e-4)


def test_distributed_folded_sweep_reconstructs(mesh):
    """Full beta sweep on the mesh == unfolded momentum spectrum
    (folding identity, distributed)."""
    particles = synthetic_particles(
        jax.random.PRNGKey(3), 16, box_size=1.0, jitter=0.3
    )
    subs = distributed_folded_sweep(particles, 8, mesh, m=2, method="ngp")
    combined = subs.combine_all()
    s_ref = distributed_spectrum(particles, 16, mesh, method="ngp",
                                 quantity="momentum")
    n = min(len(combined), len(s_ref))
    np.testing.assert_allclose(combined.Nsample[:n], s_ref.Nsample[:n])
    np.testing.assert_allclose(combined.Psum[:n], s_ref.Psum[:n], rtol=2e-4)


def test_fold_requires_momentum(mesh):
    particles = synthetic_particles(jax.random.PRNGKey(4), 8)
    with pytest.raises(ValueError):
        distributed_spectrum(
            particles, 4, mesh, quantity="velocity", fold=(2, (0, 0, 0))
        )


def test_planner():
    plan = plan_run(n_total=2048, n_devices=16, hbm_bytes=16e9,
                    n_particles=10_000_000)
    assert plan.n_total == plan.fold_m * plan.n_grid
    assert plan.mesh_shape == (4, 4)
    assert plan.n_grid % 4 == 0
    assert plan.bytes_per_device < 16e9
    assert plan.fold_m >= 2  # 2048^3 can't fit one chip
    assert "Planner" in plan.describe()

    # small case: no folding needed
    plan2 = plan_run(n_total=128, n_devices=8, hbm_bytes=16e9)
    assert plan2.fold_m == 1 and plan2.n_grid == 128


def test_shard_particles_host_owner_partition():
    """Owner bucketing: every particle lands exactly once, on the device
    owning its (folded) base cell — deposit work is O(Np / n_devices)
    (round 1 replicated all particles to every chip)."""
    from vpower_tpu.parallel.deposit import shard_particles_host

    particles = synthetic_particles(jax.random.PRNGKey(5), 16, box_size=1.0,
                                    jitter=0.4)
    pos = np.asarray(particles.pos)
    vals = np.asarray(particles.mass)[:, None]
    pos_sh, val_sh = shard_particles_host(pos, vals, (4, 2), 16, 1.0)
    # mass conservation across buckets: padding rows are zero-valued
    np.testing.assert_allclose(val_sh.sum(), vals.sum(), rtol=1e-6)
    # each device's non-padding rows belong to its block
    n_real = (val_sh != 0).sum()
    assert n_real == len(pos)
    nlx, nly = 16 // 4, 16 // 2
    for ox in range(4):
        for oy in range(2):
            rows = pos_sh[ox, oy]
            real = val_sh[ox, oy, :, 0] != 0
            cells = np.floor(rows[real] / (1.0 / 16)).astype(int) % 16
            assert (cells[:, 0] // nlx == ox).all()
            assert (cells[:, 1] // nly == oy).all()
    # balanced (uniform jittered lattice): padded size ~ Np / n_devices
    assert pos_sh.shape[2] < 2 * len(pos) // 8


def test_distributed_folded_cic_matches_single_device(mesh):
    """Folded CIC on the mesh uses per-corner phases — exact parity with
    the single-chip fused CIC fold and the grid path."""
    particles = synthetic_particles(
        jax.random.PRNGKey(6), 16, box_size=1.0, jitter=0.4
    )
    beta = (1, 1, 0)
    s_dist = distributed_spectrum(
        particles, 8, mesh, method="cic", quantity="momentum", fold=(2, beta)
    )
    s_ref = fused_fold_spectrum(particles, 8, m=2, beta=beta, method="cic")
    np.testing.assert_allclose(s_dist.Nsample, s_ref.Nsample)
    np.testing.assert_allclose(s_dist.Psum, s_ref.Psum, rtol=2e-4)


def test_distributed_sweep_beta_batching(mesh):
    """Host-chunked sweep == single-scan sweep (watchdog batching)."""
    particles = synthetic_particles(
        jax.random.PRNGKey(7), 16, box_size=1.0, jitter=0.3
    )
    full = distributed_folded_sweep(particles, 8, mesh, m=2, method="cic")
    chunked = distributed_folded_sweep(particles, 8, mesh, m=2, method="cic",
                                       beta_batch=3)
    assert len(full) == len(chunked) == 8
    for s in full:
        np.testing.assert_allclose(chunked[s.beta].Psum, s.Psum, rtol=1e-6)
        np.testing.assert_allclose(chunked[s.beta].Nsample, s.Nsample)


def test_planner_pipeline_aware():
    """The planner models the pipeline that actually runs: streamed
    gather plans ignore the mesh divisibility, folded plans carry the
    complex working set, and the particle budget matters."""
    from vpower_tpu.parallel.planner import estimate_peak_bytes

    # complex (folded) pipelines cost more than real ones
    real = estimate_peak_bytes(256, 1, 0, method="ngp", fold_m=1)
    cplx = estimate_peak_bytes(256, 1, 0, method="ngp", fold_m=4)
    assert cplx > real
    # particle count raises the estimate
    assert estimate_peak_bytes(256, 1, 10_000_000, method="cic") > \
        estimate_peak_bytes(256, 1, 0, method="cic")
    # streamed nn plan includes the extended NN block working set
    s = estimate_peak_bytes(256, 1, 0, method="nn", quantity="velocity",
                            fold_m=8, beta_batch=8)
    assert s > estimate_peak_bytes(256, 1, 0, method="ngp", fold_m=8)

    # a 2048 velocity/nn plan on 8 devices picks a streamed-feasible grid
    plan = plan_run(n_total=2048, n_devices=8, hbm_bytes=16e9,
                    n_particles=10_000_000, method="nn",
                    quantity="velocity", beta_batch=8)
    assert plan.streamed
    assert plan.bytes_per_device < 0.9 * 16e9
    assert "block-streamed" in plan.describe()


def test_multihost_single_process_noop_and_mesh(mesh):
    """Single-process initialize is a no-op; global_mesh lays the inner
    axis within the local device set (ICI-first layout)."""
    from vpower_tpu.parallel import multihost

    multihost.initialize()  # no coordinator: must not raise
    assert not multihost.is_multiprocess()
    gm = multihost.global_mesh(inner=2)
    assert gm.devices.shape == (4, 2)
    particles = synthetic_particles(jax.random.PRNGKey(8), 8, jitter=0.3)
    s = distributed_spectrum(particles, 8, gm, method="ngp",
                             quantity="momentum")
    assert np.isfinite(s.Psum).all() and s.Nsample.sum() > 0


def test_distributed_streamed_sweep_matches_single_chip():
    """Block-parallel streamed folded sweep over the mesh == the
    single-chip streamed sweep (same block values, psum-combined)."""
    import jax.numpy as jnp
    from vpower_tpu import Particles
    from vpower_tpu.parallel import make_mesh, distributed_streamed_sweep
    from vpower_tpu.run.streamed import streamed_folded_sweep

    key = jax.random.PRNGKey(7)
    kp, kv = jax.random.split(key)
    n = 3000
    p = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    mesh = make_mesh(8)
    for method in ("ngp", "nn"):
        ref = streamed_folded_sweep(
            p, 8, 2, quantity="velocity", method=method, beta_batch=8,
            margin_cells=2)
        got = distributed_streamed_sweep(
            p, 8, 2, mesh, quantity="velocity", method=method,
            beta_batch=8, margin_cells=2)
        assert len(ref) == len(got) == 8
        for sr, sg in zip(ref, got):
            np.testing.assert_allclose(sg.Psum, sr.Psum,
                                       rtol=2e-4, atol=1e-8)
            np.testing.assert_array_equal(sg.Nsample, sr.Nsample)


def test_streamed_sweep_candidate_sharding_memory():
    """NN candidate rows are partitioned by device block ownership: each
    device's shard is ~1/ndev of the whole-run array (plus per-block
    padding), not a full replica (VERDICT r2 item 3)."""
    import jax.numpy as jnp
    from vpower_tpu import Particles
    from vpower_tpu.run import streamed as run_streamed

    key = jax.random.PRNGKey(11)
    kp, kv = jax.random.split(key)
    n = 20000
    p = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    m, n_grid, margin = 2, 16, 4
    rows, starts, counts, pad, _, _ = run_streamed._block_candidates(
        p, m, n_grid, margin
    )
    ndev = 8
    nb_local = m**3 // ndev
    counts_dev = counts.reshape(ndev, nb_local)
    r_dev = int(counts_dev.sum(axis=1).max()) + pad
    # each shard must be well under the full candidate array; with 8
    # roughly-balanced blocks the max shard is ~1/8 plus slack
    assert r_dev < 0.3 * len(rows), (r_dev, len(rows))


def test_distributed_exact_roundrobin_matches_global_exact():
    """distributed_streamed_sweep(exact=True) routes blocks round-robin
    over devices (window-exact + certified + escalating); the full
    sweep must reconstruct the unfolded spectrum of the GLOBAL exact
    deposition.  3 devices deliberately do NOT divide the 8 blocks —
    round-robin has no divisibility constraint."""
    from vpower_tpu import Particles
    from vpower_tpu.deposit.nn import nn_interp_to_field
    from vpower_tpu.parallel import distributed_streamed_sweep
    from jax.sharding import Mesh

    key = jax.random.PRNGKey(17)
    kp, kv = jax.random.split(key)
    n = 2000
    p = Particles(
        pos=jax.random.uniform(kp, (n, 3), jnp.float32),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        vel=jax.random.normal(kv, (n, 3), jnp.float32),
        box_size=1.0,
    )
    n_grid, m = 32, 2
    field = nn_interp_to_field(p, n_grid * m, exact=True)
    s_direct = spectrum_from_field(field, quantity="velocity")

    mesh = Mesh(np.array(jax.devices()[:3]), ("b",))
    combined = distributed_streamed_sweep(
        p, n_grid, m, mesh, quantity="velocity", method="nn",
        beta_batch=8, margin_cells=16, exact=True,
    ).combine_all()
    k = min(len(combined), len(s_direct))
    np.testing.assert_allclose(combined.Nsample[:k], s_direct.Nsample[:k])
    np.testing.assert_allclose(combined.Psum[:k], s_direct.Psum[:k],
                               rtol=2e-4, atol=1e-30)


def test_distributed_streamed_cache_and_escalation_on_mesh():
    """The sharded block-value cache: blocks are deposited ONCE (extra
    beta batches reuse the cached values), per-block suspect counts
    survive the mesh, void blocks escalate exactly like the single-chip
    certified sweep, and the spectra match it (VERDICT r3 items 4+6)."""
    import jax.numpy as jnp
    from vpower_tpu import Particles
    from vpower_tpu.parallel import make_mesh, distributed_streamed_sweep
    from vpower_tpu.run.streamed import streamed_folded_sweep

    rng = np.random.default_rng(11)
    n = 200
    pos = rng.uniform(0.0, 0.85, size=(n, 3)).astype(np.float32)
    p = Particles(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        mass=jnp.ones((n,), jnp.float32),
        density=jnp.ones((n,), jnp.float32), box_size=1.0,
    )
    betas = np.array([[0, 0, 0], [1, 2, 3], [3, 1, 0]])
    mesh = make_mesh(8)
    st_mesh = {}
    got = distributed_streamed_sweep(
        p, 16, 4, mesh, quantity="velocity", method="nn",
        margin_cells=4, beta_sequence=betas, beta_batch=2,
        cache_values=True, stage_times=st_mesh,
    )
    assert st_mesh["escalated_blocks"] > 0
    assert st_mesh["suspect_cells"] > 0
    assert st_mesh["uncertified_cells"] == 0

    st_ref = {}
    ref = streamed_folded_sweep(
        p, 16, 4, quantity="velocity", method="nn",
        margin_cells=4, beta_sequence=betas, beta_batch=2,
        stage_times=st_ref,
    )
    assert st_ref["escalated_blocks"] == st_mesh["escalated_blocks"]
    assert st_ref["suspect_cells"] == st_mesh["suspect_cells"]
    for sr, sg in zip(ref, got):
        np.testing.assert_array_equal(sg.Nsample, sr.Nsample)
        np.testing.assert_allclose(sg.Psum, sr.Psum, rtol=2e-4, atol=1e-8)


def test_distributed_interlaced_compensated_fold_matches_single_chip(mesh):
    """Mesh fused-fold with interlacing + window compensation == the
    single-chip fused path (VERDICT r4 item 9: the dryrun's
    interlace/compensate coverage rests on this parity)."""
    from vpower_tpu.run.pipeline import fused_fold_full_spectrum

    particles = synthetic_particles(
        jax.random.PRNGKey(11), 16, box_size=1.0, jitter=0.4
    )
    sweep = distributed_folded_sweep(
        particles, 8, mesh, m=2, method="cic",
        interlace=True, compensate=True,
    )
    s_dist = sweep.combine_all()
    s_ref = fused_fold_full_spectrum(
        particles, 8, m=2, method="cic", interlace=True, compensate=True
    )
    n = min(len(s_dist), len(s_ref))
    np.testing.assert_allclose(s_dist.Nsample[:n], s_ref.Nsample[:n])
    np.testing.assert_allclose(s_dist.Psum[:n], s_ref.Psum[:n], rtol=2e-4)


def test_distributed_unfolded_compensate_interlace_momentum(mesh):
    """fold_m = 1 interlace/compensate on the mesh == the single-chip
    power_spectrum flags (the fused route's phases are all 1 at m=1)."""
    from vpower_tpu import power_spectrum

    particles = synthetic_particles(
        jax.random.PRNGKey(12), 16, box_size=1.0, jitter=0.4
    )
    s_dist = distributed_spectrum(
        particles, 16, mesh, method="cic", quantity="momentum",
        interlace=True, compensate=True,
    )
    s_ref = power_spectrum(particles, 16, method="cic",
                           quantity="momentum", interlace=True,
                           compensate=True)
    n = min(len(s_dist), len(s_ref))
    np.testing.assert_allclose(s_dist.Nsample[:n], s_ref.Nsample[:n])
    np.testing.assert_allclose(s_dist.Psum[:n], s_ref.Psum[:n], rtol=2e-4)
